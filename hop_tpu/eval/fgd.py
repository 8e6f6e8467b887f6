"""Embedding-space evaluator: FGD / feature distance / diversity, on device.

Counterpart of reference model/EmbeddingSpaceEvaluator.py:387-594. The
frozen feature network is EmbeddingNet(mode='pose') for pose_dim 27 (TED) or
MotionAE for pose_dim 126 (expressive); features are accumulated on device
and the Fréchet distance uses the eigh-based sqrtm (ops/sqrtm.py), so
nothing round-trips through the host until the final scalar.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hop_tpu.ops.sqrtm import frechet_distance


def _gather_replicated(x: jnp.ndarray) -> jnp.ndarray:
    """All-gather a batch-sharded feature block to replicated, on device.

    SURVEY §5.8's distributed-eval design: the expensive feature-net
    forward runs data-parallel over the mesh (evaluate_testset shards the
    eval batches), then each tiny (B, 32) feature block is gathered
    device-to-device so the downstream mean/cov/Fréchet math is identical
    to the single-device computation — no host round-trip (the reference
    instead accumulates features in host numpy,
    EmbeddingSpaceEvaluator.py:438-496). Replicating here (rather than
    concatenating mixed-sharded blocks later) also keeps the partitioner
    out of involuntary-rematerialization fallbacks on the ragged tail
    batch. No-op without an ambient mesh.
    """
    from hop_tpu.parallel import ambient_mesh
    m = ambient_mesh()
    if m is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec
    return jax.device_put(x, NamedSharding(m, PartitionSpec()))


@jax.jit
def _fgd_stats(gen: jnp.ndarray, real: jnp.ndarray):
    """mean/cov/Fréchet + feature distance as ONE compiled program
    (reference EmbeddingSpaceEvaluator.py:510-539 does this in host
    numpy + scipy sqrtm)."""
    mu_g, mu_r = jnp.mean(gen, axis=0), jnp.mean(real, axis=0)

    # np.cov(rowvar=False) normalises by N-1
    def cov(x, mu):
        xc = x - mu
        return xc.T @ xc / (x.shape[0] - 1)

    fd = frechet_distance(mu_g, cov(gen, mu_g), mu_r, cov(real, mu_r))
    feat_dist = jnp.mean(jnp.sum(jnp.abs(real - gen), axis=-1))
    return fd, feat_dist


class EmbeddingSpaceEvaluator:
    """Accumulates real/generated features; scores FGD + diversity."""

    def __init__(self, feature_fn, n_pre_poses: int = 4,
                 trained: bool = True):
        """feature_fn(poses) -> (recon, features): jitted frozen net apply.

        trained=False marks a randomly-initialised feature net (no
        --eval-net weights): FGD/diversity are then only relative numbers
        within one run, never comparable to the reference's (which loads
        gesture_autoencoder_checkpoint_best.bin,
        EmbeddingSpaceEvaluator.py:393-414).
        """
        self._feature_fn = jax.jit(feature_fn)
        self.n_pre_poses = n_pre_poses
        self.trained = trained
        self.reset()

    def reset(self):
        self._real_feats = []
        self._gen_feats = []
        self._recon_err_diff = []

    @property
    def n_samples(self) -> int:
        return sum(f.shape[0] for f in self._real_feats)

    def push_samples(self, generated_poses: jnp.ndarray,
                     real_poses: jnp.ndarray):
        real_recon, real_feat = self._feature_fn(real_poses)
        gen_recon, gen_feat = self._feature_fn(generated_poses)
        self._real_feats.append(_gather_replicated(real_feat))
        self._gen_feats.append(_gather_replicated(gen_feat))
        err_real = jnp.mean(jnp.abs(real_poses - real_recon))
        err_fake = jnp.mean(jnp.abs(generated_poses - gen_recon))
        self._recon_err_diff.append(err_fake - err_real)

    def get_scores(self):
        """(frechet_dist, feat_dist) — reference :510-539."""
        gen = jnp.concatenate(self._gen_feats, axis=0)
        real = jnp.concatenate(self._real_feats, axis=0)
        fd, feat_dist = _fgd_stats(gen, real)
        return float(fd), float(feat_dist)

    def get_diversity_scores(self, rng: Optional[np.random.Generator] = None,
                             n: int = 500):
        """Mean feature L1 between the first n generated BATCH blocks and a
        random permutation of the batch blocks (reference :498-508: vstack of
        generated_feat_list[:500] vs vstack of a randperm over the batch
        list). The shuffle granularity is whole batches, not rows."""
        feats = [np.asarray(f) for f in self._gen_feats]
        feat1 = np.vstack(feats[:n])
        rng = rng or np.random.default_rng(0)
        perm = rng.permutation(len(feats))[:n]
        feat2 = np.vstack([feats[x] for x in perm])
        # the reference assumes equal-size batches (drop_last=True loaders);
        # guard the ragged-tail case instead of crashing like :507 would
        m = min(feat1.shape[0], feat2.shape[0])
        return float(np.mean(np.sum(np.abs(feat1[:m] - feat2[:m]), axis=-1)))


def make_ted_feature_fn(net, variables):
    """EmbeddingNet(mode='pose'): features = pose encoder latent."""
    def fn(poses):
        _, _, _, feat, _, _, recon = net.apply(
            variables, None, None, poses[:, :4], poses,
            input_mode="pose", variational=False, train=False)
        return recon, feat
    return fn


def make_expressive_feature_fn(net, variables):
    """MotionAE: features = encoder latent."""
    def fn(poses):
        recon, feat = net.apply(variables, poses, train=False)
        return recon, feat
    return fn
