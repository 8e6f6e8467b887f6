"""Motion autoencoder — FGD feature extractor for TED-Expressive.

Counterpart of reference model/motion_ae.py:33-130 (34-frame conv encoder to
latent_dim, conv decoder back to pose space). Consumed frozen by the FGD
evaluator (EmbeddingSpaceEvaluator.py:411-414).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from hop_tpu.models import common
from hop_tpu.models.embedding_net import ConvNormRelu


class MotionPoseEncoder(nn.Module):
    latent_dim: int

    @nn.compact
    def __call__(self, poses, train: bool = False):
        x = ConvNormRelu(32)(poses, train)
        x = ConvNormRelu(64)(x, train)
        x = ConvNormRelu(64, downsample=True)(x, train)
        x = nn.Conv(32, (3,), padding="VALID")(x)
        # channel-major flatten, matching torch's (B, C, L).flatten(1)
        x = jnp.swapaxes(x, 1, 2).reshape(x.shape[0], -1)  # (B, 384)
        x = nn.Dense(256)(x)
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, common.IDENTITY_SLOPE)
        x = nn.Dense(128)(x)
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, common.IDENTITY_SLOPE)
        return nn.Dense(self.latent_dim)(x)


class MotionPoseDecoder(nn.Module):
    pose_dim: int

    @nn.compact
    def __call__(self, feat, train: bool = False):
        x = nn.Dense(64)(feat)
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, common.IDENTITY_SLOPE)
        x = nn.Dense(136)(x)
        x = jnp.swapaxes(x.reshape(feat.shape[0], 4, 34), 1, 2)
        x = nn.ConvTranspose(32, (3,), padding="VALID")(x)
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, 0.2)
        x = nn.ConvTranspose(32, (3,), padding="VALID")(x)
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, 0.2)
        x = nn.Conv(32, (3,), padding="VALID")(x)
        return nn.Conv(self.pose_dim, (3,), padding="VALID")(x)


class MotionAE(nn.Module):
    """pose (B, 34, pose_dim) -> (reconstruction, latent)."""
    pose_dim: int
    latent_dim: int = 128

    @nn.compact
    def __call__(self, pose, train: bool = False):
        pose = pose.reshape(pose.shape[0], pose.shape[1], -1)
        z = MotionPoseEncoder(self.latent_dim, name="encoder")(pose, train)
        pred = MotionPoseDecoder(self.pose_dim, name="decoder")(z, train)
        return pred, z
