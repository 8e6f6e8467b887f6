"""Pointwise metrics: joint-coordinate MAE after forward kinematics.

Counterpart of reference Evaluate.py:262-274: un-mean both generated and
target dir-vecs, convert to joint positions, mean absolute difference over
frames 4+ (the non-seed frames). On device — the reference does this in
numpy per batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from hop_tpu import geometry


def joint_mae(out_dir_vec: jnp.ndarray, target_dir_vec: jnp.ndarray,
              skeleton: geometry.Skeleton, n_pre_poses: int = 4
              ) -> jnp.ndarray:
    mean = jnp.asarray(skeleton.mean_dir_vec)
    out_pose = geometry.convert_dir_vec_to_pose(
        out_dir_vec + mean[None, None], skeleton)
    tgt_pose = geometry.convert_dir_vec_to_pose(
        target_dir_vec + mean[None, None], skeleton)
    diff = out_pose[:, n_pre_poses:] - tgt_pose[:, n_pre_poses:]
    return jnp.mean(jnp.abs(diff))


def l1_loss(out: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(out - target))
