"""TPU compute primitives: audio frontend, recurrent cells, linear algebra."""

from hop_tpu.ops.mel import log_mel_spectrogram, mel_filterbank  # noqa: F401
from hop_tpu.ops.gru import GRU  # noqa: F401
from hop_tpu.ops.sqrtm import sqrtm_psd, trace_sqrtm_product  # noqa: F401
