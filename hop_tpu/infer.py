"""Long-form inference: sliding-window synthesis with cross-fade.

Counterpart of reference test_checkpoint.py:370-480: 34-frame units at a
30-frame stride, each window seeded with the previous window's last 16
output frames, 4-frame linear cross-fade between consecutive windows. The
per-window mel is computed on device (the reference calls librosa per
window); the model forward is jitted once and reused for every window.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hop_tpu.config import Config
from hop_tpu.data.preprocessor import get_words_in_time_range
from hop_tpu.ops import mel as mel_ops


def _forward_and_shapes(model, variables, cfg: Config, batch_size: int):
    """The serving forward (weights as a runtime argument — constants would
    bloat the HLO) and its fixed argument shapes."""
    d = cfg.data

    def forward(v, in_audio, log_mel, text, pre_seq, vid, rng):
        out, *_ = model.apply(v, in_audio, log_mel, text, pre_seq,
                              vid, rng=rng, train=False)
        return out

    var_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        variables)
    shapes = (
        var_shapes,
        jax.ShapeDtypeStruct((batch_size, int(d.n_poses / d.pose_resampling_fps
                                              * d.sample_rate)), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, d.n_poses, d.mel_bins), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, d.n_poses), jnp.int32),
        jax.ShapeDtypeStruct((batch_size, d.n_seed_frames, d.pose_dim),
                             jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    return forward, shapes


def compile_forward(model, variables, cfg: Config, batch_size: int = 1):
    """AOT-compile the HOP generation forward for serving.

    Returns a compiled executable with fixed shapes (no retracing at request
    time); the per-window host work in generate_long_form is then pure
    numpy slicing.
    """
    forward, shapes = _forward_and_shapes(model, variables, cfg, batch_size)
    compiled = jax.jit(forward).lower(*shapes).compile()
    return lambda *args: compiled(variables, *args)


def export_forward(model, variables, cfg: Config, batch_size: int = 1,
                   platforms=None) -> bytes:
    """Serialize the generation forward as a portable StableHLO artifact
    (jax.export): a serving runtime can deserialize and execute it without
    any model code, passing the checkpoint's variables as the first
    argument. The reference has no deployment story beyond test_checkpoint's
    in-process demo (test_checkpoint.py:395-471).

    platforms: lowering targets, e.g. ("tpu",) or ("cpu", "tpu");
    default = the current default backend.

    The artifact's first argument is the UNBOXED variable tree (plain
    arrays): flax's Partitioned metadata boxes are not serializable in an
    exported pytree and carry no meaning for a serving runtime.
    """
    from jax import export as jax_export
    from flax.core import meta as flax_meta
    variables = flax_meta.unbox(variables)
    forward, shapes = _forward_and_shapes(model, variables, cfg, batch_size)
    exp = jax_export.export(jax.jit(forward),
                            platforms=platforms)(*shapes)
    return exp.serialize()


def load_exported(blob: bytes):
    """Deserialize an export_forward artifact; returns a jit-compatible
    callable(variables, in_audio, log_mel, text, pre_seq, vid, rng)."""
    from jax import export as jax_export
    return jax_export.deserialize(blob).call


def generate_long_form(cfg: Config,
                       forward_fn: Callable,
                       clip_audio: np.ndarray,
                       clip_words: list,
                       seed_dir_vec: np.ndarray,
                       lang_model,
                       vid_index: int,
                       tokenizer=None,
                       rng: Optional[jax.Array] = None) -> np.ndarray:
    """forward_fn(in_audio, log_mel, text_ids, pre_seq, vid, rng) ->
    (1, 34, pose_dim). Returns stitched (total_frames, pose_dim)."""
    d = cfg.data
    sr = d.sample_rate
    n_frames = d.n_poses
    fps = d.pose_resampling_fps
    unit_time = n_frames / fps
    stride_time = (n_frames - d.n_pre_poses) / fps
    clip_length = len(clip_audio) / sr
    if clip_length < unit_time:
        num_subdivision = 1
    else:
        num_subdivision = math.ceil((clip_length - unit_time)
                                    / stride_time) + 1
    audio_sample_length = int(unit_time * sr)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    pre_seq = jnp.asarray(seed_dir_vec[: d.n_seed_frames],
                          jnp.float32)[None]
    vid = jnp.asarray([vid_index])

    out_list = []
    outputs = None
    for a in range(num_subdivision):
        start_time = a * stride_time
        end_time = start_time + unit_time
        audio_start = math.floor(start_time / clip_length * len(clip_audio))
        in_audio = clip_audio[audio_start: audio_start + audio_sample_length]
        in_audio = np.pad(in_audio,
                          (0, audio_sample_length - len(in_audio)),
                          "constant")
        in_audio_j = jnp.asarray(in_audio, jnp.float32)[None]
        log_mel = mel_ops.log_mel_spectrogram(
            in_audio_j, sr=sr, n_fft=d.mel_n_fft, hop=d.mel_hop,
            n_mels=d.mel_bins)

        words = get_words_in_time_range(clip_words, start_time, end_time)
        frame_dur = unit_time / n_frames
        if tokenizer is not None and d.use_hf_token_stream:
            # HOP is driven by HF tokenizer ids, not fasttext-vocab ids
            # (test_checkpoint.py:438-446): tokenize the window text
            # (add_special_tokens=False, truncated), then scatter token ids
            # to frame slots indexed by the word's position in the window
            # (the reference uses w_i, not the number placed so far) and
            # stop once the token stream is exhausted.
            hf_ids = tokenizer(" ".join(w[0] for w in words))
            hf_ids = hf_ids[: d.max_text_tokens]
            word_ids = np.zeros(n_frames, np.int64)
            for w_i, w in enumerate(words):
                if w_i >= len(hf_ids):
                    break
                idx = max(0, int(np.floor((w[1] - start_time) / frame_dur)))
                if idx < n_frames:
                    word_ids[idx] = hf_ids[w_i]
        else:
            word_ids = np.zeros(n_frames, np.int64)
            for w in words:
                idx = max(0, int(np.floor((w[1] - start_time) / frame_dur)))
                if idx < n_frames:
                    word_ids[idx] = lang_model.get_word_index(w[0])
        text = jnp.asarray(word_ids)[None]

        if a > 0:
            pre_seq = outputs[:, -d.n_seed_frames:]

        rng, rng_step = jax.random.split(rng)
        outputs = forward_fn(in_audio_j, log_mel, text, pre_seq, vid,
                             rng_step)
        out_seq = np.array(outputs[0])  # writable copy for the cross-fade

        if out_list:
            # 4-frame linear cross-fade (test_checkpoint.py:462-471)
            last_poses = out_list[-1][-d.n_pre_poses:]
            out_list[-1] = out_list[-1][:-d.n_pre_poses]
            n = len(last_poses)
            for j in range(n):
                out_seq[j] = (last_poses[j] * (n - j) / (n + 1)
                              + out_seq[j] * (j + 1) / (n + 1))
        out_list.append(out_seq)

    return np.vstack(out_list)
