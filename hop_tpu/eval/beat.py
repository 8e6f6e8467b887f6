"""Beat consistency (BC): audio onsets vs gesture motion beats, on device.

Counterpart of reference Evaluate.py:175-255. Motion beats are strict local
minima of the normalised inter-bone angle-change signal whose drop from a
neighbour exceeds `thres`; audio beats come from the onset detector
(ops/onset.py). The score is mean over audio onsets of
exp(-min_t (t_onset - t_beat)^2 / (2 sigma^2)), averaged over samples
weighted by onset counts — exactly the reference's AverageMeter weighting.

Everything is computed with masks over static shapes: no per-sample Python,
no host round-trips.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hop_tpu import geometry
from hop_tpu.ops import onset as onset_ops

THRES = 0.03   # Evaluate.py:24
SIGMA = 0.1    # Evaluate.py:25


def angle_diff_signal(out_dir_vec: jnp.ndarray,
                      skeleton: geometry.Skeleton) -> jnp.ndarray:
    """(B, T, pose_dim) mean-centred dir-vecs -> (B, T) angle-change signal."""
    mean = jnp.asarray(skeleton.mean_dir_vec)
    vec = out_dir_vec + mean[None, None, :]
    B, T = vec.shape[:2]

    if skeleton.name == "expressive":
        # palm pseudo-bones: cross(left wrist-index1, left wrist-ring1) etc.
        # (Evaluate.py:218-220)
        left = jnp.cross(vec[:, :, 11 * 3:12 * 3], vec[:, :, 17 * 3:18 * 3])
        right = jnp.cross(vec[:, :, 28 * 3:29 * 3], vec[:, :, 34 * 3:35 * 3])
        vec = jnp.concatenate([vec, left, right], axis=-1)

    v = vec.reshape(B, T, -1, 3)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    pairs = np.asarray(skeleton.angle_pairs)
    change = jnp.asarray(skeleton.change_angle)
    v1 = v[:, :, pairs[:, 0]]
    v2 = v[:, :, pairs[:, 1]]
    inner = jnp.clip(jnp.sum(v1 * v2, axis=-1), -1.0, 1.0)
    angle = jnp.arccos(inner) / math.pi          # (B, T, P)
    d = jnp.abs(angle[:, 1:] - angle[:, :-1])    # (B, T-1, P)
    d = jnp.sum(d / change[None, None, :], axis=-1) / len(skeleton.change_angle)
    return jnp.concatenate([jnp.zeros((B, 1)), d], axis=1)  # (B, T)


def motion_beat_mask(angle_diff: jnp.ndarray, thres: float = THRES
                     ) -> jnp.ndarray:
    """Strict local minima with a >= thres drop, frames 2..T-2
    (Evaluate.py:198-203)."""
    B, T = angle_diff.shape
    prev = angle_diff[:, :-2]
    cur = angle_diff[:, 1:-1]
    nxt = angle_diff[:, 2:]
    is_min = (cur < prev) & (cur < nxt)
    big_drop = ((prev - cur) >= thres) | ((nxt - cur) >= thres)
    inner = is_min & big_drop                    # frames 1..T-2
    mask = jnp.zeros((B, T), bool)
    mask = mask.at[:, 1:-1].set(inner)
    # the reference loop runs t in [2, 32] only — zero out frame 1
    mask = mask.at[:, 1].set(False)
    return mask


def beat_consistency(out_dir_vec: jnp.ndarray, in_audio: jnp.ndarray,
                     skeleton: geometry.Skeleton, fps: float = 15.0,
                     sigma: float = SIGMA) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (weighted score sum, weight sum) over the batch.

    Aggregate BC = sum(score_b * n_onsets_b) / sum(n_onsets_b), skipping
    samples without motion beats — identical to the reference's
    bc.update(sum/len, len) accumulation (Evaluate.py:214).
    """
    ad = angle_diff_signal(out_dir_vec, skeleton)
    beats = motion_beat_mask(ad)                           # (B, T)
    beat_times = jnp.arange(ad.shape[1]) / fps             # (T,)

    onsets = onset_ops.onset_detect_mask(in_audio)         # (B, F)
    onset_times = onset_ops.onset_frame_times(onsets.shape[1])

    # pairwise squared gaps (F, T), min over *detected* motion beats
    gap2 = (onset_times[:, None] - beat_times[None, :]) ** 2
    masked = jnp.where(beats[:, None, :], gap2[None], jnp.inf)
    min_gap2 = jnp.min(masked, axis=-1)                    # (B, F)
    scores = jnp.exp(-min_gap2 / (2 * sigma * sigma))
    scores = jnp.where(jnp.isfinite(min_gap2), scores, 0.0)

    n_onsets = jnp.sum(onsets, axis=1)                     # (B,)
    has_beats = jnp.any(beats, axis=1)
    per_sample = jnp.sum(jnp.where(onsets, scores, 0.0), axis=1)
    valid = has_beats & (n_onsets > 0)
    # per-sample mean * weight n_onsets = plain sum; weight = n_onsets
    score_sum = jnp.sum(jnp.where(valid, per_sample, 0.0))
    weight_sum = jnp.sum(jnp.where(valid, n_onsets, 0))
    return score_sum, weight_sum
