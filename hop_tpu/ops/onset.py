"""On-device audio onset detection (librosa-compatible) for beat consistency.

Replaces the reference's per-sample host round-trip through
librosa.onset.onset_detect inside the eval loop (reference
Evaluate.py:207,250) with a batched jnp implementation. Parameters are
pinned to what librosa 0.8.1 resolves for
onset_detect(y, sr=16000, units='time'):

  onset_strength: mel spectrogram n_fft=2048, hop=512, n_mels=128,
                  fmax=11025.0 (librosa onset_strength_multi's hardcoded
                  melspectrogram default — NOT sr/2; for sr=16000 the top
                  mel triangles fall beyond the Nyquist bins and read 0),
                  power_to_db(ref=1.0), spectral flux lag=1, mean
                  aggregate, centered (lag + n_fft//(2*hop) leading
                  zeros, then truncate)
  normalisation:  envelope -> (env - min) / max
  peak_pick:      pre_max=0.03*sr//hop, post_max=1, pre_avg=0.10*sr//hop,
                  post_avg=pre_avg+1, wait=0.03*sr//hop, delta=0.07
                  (for sr=16000/hop=512: 0, 1, 3, 4, 0, 0.07)

For the live sr=16000/hop=512 case pre_max=0/post_max=1 degenerate to a
size-1 max filter and wait=0 disables peak suppression, so peak picking
reduces to thresholding against the 7-tap moving average; the general
max filter, moving-average edge corrections, and wait-based greedy
suppression are implemented so other rates stay exact too. The whole
chain (including this degenerate-case derivation) is machine-checked
against an independent numpy transcription of librosa 0.8.1 over an
(sr, hop) grid in tests/test_onset_oracle.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hop_tpu.ops import mel as mel_ops

# librosa onset_strength_multi: kwargs.setdefault('fmax', 11025.0)
ONSET_FMAX = 11025.0


def onset_strength(audio: jnp.ndarray, sr: int = 16000, hop: int = 512,
                   n_fft: int = 2048, n_mels: int = 128) -> jnp.ndarray:
    """(..., n_samples) -> (..., n_frames) spectral-flux onset envelope."""
    power = mel_ops.power_spectrogram(audio, n_fft=n_fft, hop=hop)
    fb = jnp.asarray(mel_ops.mel_filterbank(sr, n_fft, n_mels,
                                            fmax=ONSET_FMAX))
    s = power @ fb.T  # (..., frames, mels)
    # power_to_db with ref=1.0 (librosa onset_strength default)
    s_db = 10.0 * jnp.log10(jnp.maximum(1e-10, s))
    top = jnp.max(s_db, axis=(-2, -1), keepdims=True) - 80.0
    s_db = jnp.maximum(s_db, top)
    flux = jnp.maximum(0.0, s_db[..., 1:, :] - s_db[..., :-1, :])
    env = jnp.mean(flux, axis=-1)  # (..., frames-1)
    pad = 1 + n_fft // (2 * hop)
    widths = [(0, 0)] * (env.ndim - 1) + [(pad, 0)]
    env = jnp.pad(env, widths)
    n_frames = s.shape[-2]
    return env[..., :n_frames]


def _moving_average(x: jnp.ndarray, pre: int, post: int) -> jnp.ndarray:
    """mean(x[n-pre : n+post]) with truncation at both edges (librosa
    peak_pick's corrected uniform filter)."""
    n = x.shape[-1]
    idx = jnp.arange(n)
    starts = jnp.maximum(idx - pre, 0)
    ends = jnp.minimum(idx + post, n)  # exclusive
    csum = jnp.cumsum(x, axis=-1)
    csum = jnp.concatenate([jnp.zeros(x.shape[:-1] + (1,), x.dtype), csum],
                           axis=-1)
    totals = jnp.take(csum, ends, axis=-1) - jnp.take(csum, starts, axis=-1)
    return totals / (ends - starts)


def _moving_max(x: jnp.ndarray, pre: int, post: int) -> jnp.ndarray:
    """max(x[n-pre : n+post]) — matches scipy maximum_filter1d(mode=constant,
    cval=0, origin=ceil(0.5*(pre-post))) as used by librosa (window
    truncation fills 0)."""
    if pre + post <= 1:
        return x
    n = x.shape[-1]
    outs = []
    for off in range(-pre, post):
        shifted = jnp.roll(x, -off, axis=-1)
        idx = jnp.arange(n) + off
        valid = (idx >= 0) & (idx < n)
        outs.append(jnp.where(valid, shifted, 0.0))
    return jnp.max(jnp.stack(outs, axis=0), axis=0)


def _wait_suppress(mask: jnp.ndarray, wait: int) -> jnp.ndarray:
    """librosa peak_pick's greedy suppression: walk detections in time
    order, keep frame i only if i > last_kept + wait. A no-op for wait=0
    (distinct indices always satisfy i > last)."""
    if wait <= 0:
        return mask
    n = mask.shape[-1]

    def step(last_kept, im):
        i, m = im
        keep = m & (i > last_kept + wait)
        return jnp.where(keep, i, last_kept), keep

    init = jnp.full(mask.shape[:-1], -(wait + 1), jnp.int32)
    mask_t = jnp.moveaxis(mask, -1, 0)
    _, kept = jax.lax.scan(step, init, (jnp.arange(n, dtype=jnp.int32),
                                        mask_t))
    return jnp.moveaxis(kept, 0, -1)


def peak_pick_mask(env: jnp.ndarray, sr: int = 16000, hop: int = 512,
                   delta: float = 0.07) -> jnp.ndarray:
    """librosa peak_pick on a normalised envelope -> boolean frame mask.

    Parameters resolve exactly as librosa onset_detect's defaults
    (float floor-division then int(), reference librosa 0.8.1
    onset.py); frame i is an onset iff env[i] equals the local max,
    env[i] >= truncated moving average + delta, and the greedy wait
    suppression keeps it.
    """
    pre_max = int(0.03 * sr // hop)
    post_max = int(0.00 * sr // hop + 1)
    pre_avg = int(0.10 * sr // hop)
    post_avg = int(0.10 * sr // hop + 1)
    wait = int(0.03 * sr // hop)

    mov_max = _moving_max(env, pre_max, post_max)
    mov_avg = _moving_average(env, pre_avg, post_avg)
    detections = env * (env == mov_max)
    mask = detections >= (mov_avg + delta)
    return _wait_suppress(mask, wait)


def onset_detect_mask(audio: jnp.ndarray, sr: int = 16000, hop: int = 512,
                      delta: float = 0.07) -> jnp.ndarray:
    """Boolean onset mask per frame, (..., n_frames) — librosa 0.8.1
    onset_detect(y, sr, units='frames') as a mask."""
    env = onset_strength(audio, sr=sr, hop=hop)
    env = env - jnp.min(env, axis=-1, keepdims=True)
    mx = jnp.max(env, axis=-1, keepdims=True)
    env = jnp.where(mx > 0, env / jnp.where(mx > 0, mx, 1.0), env)
    return peak_pick_mask(env, sr=sr, hop=hop, delta=delta)


def onset_frame_times(n_frames: int, sr: int = 16000, hop: int = 512
                      ) -> jnp.ndarray:
    return jnp.arange(n_frames) * (hop / sr)
