"""Log-mel spectrogram frontend as MXU matmuls.

Replaces the reference's per-sample host-side librosa call inside the
DataLoader workers (reference data_loader/lmdb_data_loader.py:216-218 and
data_loader/data_utils.py:34-38) with an on-device, batched implementation:
frame -> windowed real DFT expressed as two matmuls -> mel projection as a
third matmul. For n_fft=1024 this is faster on TPU than an FFT because all
three steps tile directly onto the 128x128 systolic array and XLA fuses the
squaring/add between them.

Semantics match librosa 0.8.1:
  * stft: hann window (periodic), center=True with reflect padding, |.|^2
  * mel filterbank: slaney scale, slaney area normalisation, fmin=0, fmax=sr/2
  * power_to_db: ref = per-sample max, amin=1e-10, top_db=80
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freq >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filterbank(sr: int = 16000, n_fft: int = 1024, n_mels: int = 128,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) slaney-normalised triangular filterbank."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_window_matrices(n_fft: int):
    """Windowed real-DFT as (n_fft, n_bins) cos/sin matrices.

    The periodic hann window is folded into the matrices so framing feeds
    straight into two matmuls.
    """
    n_bins = 1 + n_fft // 2
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    cos_m = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_m = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_m, sin_m


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int,
                 center: bool = True) -> jnp.ndarray:
    """(..., n_samples) -> (..., n_frames, n_fft), librosa centering."""
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :])
    return y[..., idx]


def power_spectrogram(y: jnp.ndarray, n_fft: int = 1024, hop: int = 512,
                      center: bool = True) -> jnp.ndarray:
    """|STFT|^2 as (..., n_frames, n_bins) via matmul DFT."""
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop, center)
    cos_m, sin_m = _dft_window_matrices(n_fft)
    re = frames @ jnp.asarray(cos_m)
    im = frames @ jnp.asarray(sin_m)
    return re * re + im * im


def power_to_db(s: jnp.ndarray, amin: float = 1e-10, top_db: float = 80.0,
                ref_axes: tuple | None = None) -> jnp.ndarray:
    """librosa.power_to_db with ref=max over `ref_axes` (default: all axes).

    For batched input pass ref_axes=(-2, -1) so each sample normalises by its
    own max — this is the semantics the reference gets by calling librosa
    per sample in the data loader.
    """
    if ref_axes is None:
        ref_axes = tuple(range(s.ndim))
    ref = jnp.max(s, axis=ref_axes, keepdims=True)
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, s))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        peak = jnp.max(log_spec, axis=ref_axes, keepdims=True)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop", "n_mels"))
def log_mel_spectrogram(audio: jnp.ndarray, sr: int = 16000,
                        n_fft: int = 1024, hop: int = 1096,
                        n_mels: int = 128) -> jnp.ndarray:
    """(..., n_samples) -> (..., n_frames, n_mels) log-mel, frames-first.

    With the reference's hop of 1096 a 36267-sample window yields exactly 34
    frames, matching lmdb_data_loader.py:216-218 (which then transposes to
    time-major — we produce time-major directly).
    """
    power = power_spectrogram(audio, n_fft=n_fft, hop=hop)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    mel = power @ fb.T  # (..., frames, mels)
    batch_axes = tuple(range(mel.ndim - 2, mel.ndim))
    return power_to_db(mel, ref_axes=batch_axes)


@functools.partial(jax.jit, static_argnames=("sr",))
def extract_melspectrogram(y: jnp.ndarray, sr: int = 16000) -> jnp.ndarray:
    """Dataset-cache spectrogram (mels x time), reference data_utils.py:34-38."""
    out = log_mel_spectrogram(y, sr=sr, n_fft=1024, hop=512)
    return jnp.swapaxes(out, -1, -2)
