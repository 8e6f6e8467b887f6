"""Joint embedding network / gesture autoencoder (FGD feature extractor).

Counterpart of reference model/embedding_net.py:42-316 (duplicated inside
EmbeddingSpaceEvaluator.py): ContextEncoder (text TCN + wave CNN + GRU ->
z/mu/logvar), PoseEncoderConv, PoseDecoderGRU / PoseDecoderConv / FC, and
the EmbeddingNet wrapper. The mode='pose' network is the frozen FGD feature
extractor for TED (EmbeddingSpaceEvaluator.py:407-410).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hop_tpu.models import common
from hop_tpu.models.tcn import TextEncoderTCN
from hop_tpu.ops.gru import GRU


class ConvNormRelu(nn.Module):
    """Conv1d(+BN)+LeakyReLU(0.2) (reference embedding_net.py:16-39)."""
    features: int
    downsample: bool = False
    padding: int = 0
    batchnorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s = (4, 2) if self.downsample else (3, 1)
        x = nn.Conv(self.features, (k,), strides=(s,),
                    padding=[(self.padding, self.padding)])(x)
        if self.batchnorm:
            x = common.BatchNorm(use_running_average=not train)(x)
        return common.leaky_relu(x, 0.2)


class PoseEncoderConv(nn.Module):
    """Pose sequence -> 32-d latent (+ mu/logvar heads).

    reference embedding_net.py:42-84 for 34-frame windows.
    """
    latent_dim: int = 32

    @nn.compact
    def __call__(self, poses, variational: bool = False,
                 rng: Optional[jax.Array] = None, train: bool = False):
        x = ConvNormRelu(32)(poses, train)          # T 34 -> 32
        x = ConvNormRelu(64)(x, train)              # -> 30
        x = ConvNormRelu(64, downsample=True)(x, train)  # -> 14
        x = nn.Conv(32, (3,), padding="VALID")(x)   # -> 12 (12*32 = 384)
        # torch flattens channel-major (B, C, L) -> (B, C*L); match that
        # order so reference checkpoints import exactly
        x = jnp.swapaxes(x, 1, 2).reshape(x.shape[0], -1)
        x = nn.Dense(256)(x)
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, common.IDENTITY_SLOPE)
        x = nn.Dense(128)(x)
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, common.IDENTITY_SLOPE)
        x = nn.Dense(self.latent_dim)(x)
        mu = nn.Dense(self.latent_dim)(x)
        logvar = nn.Dense(self.latent_dim)(x)
        z = common.reparameterize(rng, mu, logvar) if variational else mu
        return z, mu, logvar


class PoseDecoderConv(nn.Module):
    """Latent -> pose sequence via transposed convs (embedding_net.py:167-219)."""
    length: int
    pose_dim: int
    use_pre_poses: bool = False

    @nn.compact
    def __call__(self, feat, pre_poses=None, train: bool = False):
        if self.use_pre_poses:
            pp = nn.Dense(32)(pre_poses.reshape(pre_poses.shape[0], -1))
            pp = common.BatchNorm(use_running_average=not train)(pp)
            pp = nn.relu(pp)
            pp = nn.Dense(32)(pp)
            feat = jnp.concatenate([pp, feat], axis=1)

        assert self.length == 34, "reference supports 34 (and 64) frames"
        x = nn.Dense(64)(feat)
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, common.IDENTITY_SLOPE)
        x = nn.Dense(136)(x)
        # torch: view(B, 4, 34) channel-major, we transpose to feature-last
        x = jnp.swapaxes(x.reshape(feat.shape[0], 4, 34), 1, 2)
        x = nn.ConvTranspose(32, (3,), padding="VALID")(x)  # 34 -> 36
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, 0.2)
        x = nn.ConvTranspose(32, (3,), padding="VALID")(x)  # 36 -> 38
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, 0.2)
        x = nn.Conv(32, (3,), padding="VALID")(x)           # -> 36
        x = nn.Conv(self.pose_dim, (3,), padding="VALID")(x)  # -> 34
        return x


class PoseDecoderFC(nn.Module):
    """Latent (+ seed poses) -> MLP -> full pose window
    (reference embedding_net.py:87-129; kept for checkpoint compatibility,
    the reference instantiates the GRU decoder in the live path)."""
    gen_length: int
    pose_dim: int
    use_pre_poses: bool = False

    @nn.compact
    def __call__(self, latent, pre_poses=None, train: bool = False):
        feat = latent
        if self.use_pre_poses:
            pp = nn.Dense(32)(pre_poses.reshape(pre_poses.shape[0], -1))
            pp = common.BatchNorm(use_running_average=not train)(pp)
            pp = nn.relu(pp)
            pp = nn.Dense(32)(pp)
            feat = jnp.concatenate([pp, latent], axis=1)
        for width in (128, 128, 256, 512):
            feat = nn.Dense(width)(feat)
            feat = common.BatchNorm(use_running_average=not train)(feat)
            feat = nn.relu(feat)
        out = nn.Dense(self.gen_length * self.pose_dim)(feat)
        return out.reshape(-1, self.gen_length, self.pose_dim)


class PoseDecoderGRU(nn.Module):
    """Latent + seed poses -> BiGRU -> poses (embedding_net.py:132-164)."""
    gen_length: int
    pose_dim: int

    @nn.compact
    def __call__(self, latent, pre_poses, train: bool = False):
        pp = nn.Dense(32)(pre_poses.reshape(pre_poses.shape[0], -1))
        pp = common.BatchNorm(use_running_average=not train)(pp)
        pp = nn.relu(pp)
        pp = nn.Dense(32)(pp)
        feat = jnp.concatenate([pp, latent], axis=1)
        feat = jnp.broadcast_to(feat[:, None, :],
                                (feat.shape[0], self.gen_length, feat.shape[1]))
        out, _ = GRU(300, 4, bidirectional=True, dropout_rate=0.3)(
            feat, deterministic=not train)
        out = out[..., :300] + out[..., 300:]
        out = nn.Dense(150)(out)
        out = common.leaky_relu(out, common.IDENTITY_SLOPE)
        return nn.Dense(self.pose_dim)(out)


class ContextEncoder(nn.Module):
    """Text TCN + wave CNN -> GRU -> 32-d context latent
    (embedding_net.py:222-261)."""
    n_words: int
    embed_size: int = 300

    @nn.compact
    def __call__(self, in_text, in_audio, rng, train: bool = False):
        text_feat = TextEncoderTCN(n_words=self.n_words,
                                   embed_size=self.embed_size)(in_text, train)
        audio_feat = common.WavEncoder()(in_audio, train)
        x = jnp.concatenate([audio_feat, text_feat], axis=-1)
        out, _ = GRU(256, 2)(x)
        last = out[:, -1]
        h = nn.Dense(128)(last)
        h = common.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Dense(32)(h)
        mu = nn.Dense(32)(h)
        logvar = nn.Dense(32)(h)
        z = common.reparameterize(rng, mu, logvar)
        return z, mu, logvar


class EmbeddingNet(nn.Module):
    """reference embedding_net.EmbeddingNet (:264-316).

    mode='pose': PoseEncoderConv + PoseDecoderConv (the FGD feature net).
    otherwise:   adds the ContextEncoder and a GRU decoder.
    """
    pose_dim: int
    n_frames: int
    n_words: int
    mode: str = "pose"

    def setup(self):
        if self.mode != "pose":
            self.context_encoder = ContextEncoder(self.n_words)
            self.decoder = PoseDecoderGRU(self.n_frames, self.pose_dim)
        else:
            self.decoder = PoseDecoderConv(self.n_frames, self.pose_dim)
        self.pose_encoder = PoseEncoderConv()

    def __call__(self, in_text, in_audio, pre_poses, poses,
                 input_mode: Optional[str] = None,
                 variational: bool = False,
                 rng: Optional[jax.Array] = None, train: bool = False):
        input_mode = input_mode or self.mode
        context_feat = context_mu = context_logvar = None
        if self.mode != "pose" and in_text is not None and in_audio is not None:
            context_feat, context_mu, context_logvar = self.context_encoder(
                in_text, in_audio, rng, train)
        poses_feat = pose_mu = pose_logvar = None
        if poses is not None:
            poses_feat, pose_mu, pose_logvar = self.pose_encoder(
                poses, variational, rng, train)
        latent = context_feat if input_mode == "speech" else poses_feat
        if self.mode != "pose":
            out_poses = self.decoder(latent, pre_poses, train)
        else:
            out_poses = self.decoder(latent, pre_poses, train)
        return (context_feat, context_mu, context_logvar,
                poses_feat, pose_mu, pose_logvar, out_poses)
