"""Trimodal-context GAN generator and discriminators.

Counterparts of reference model/multimodal_context_net.py:
  PoseGenerator (:66-172), Discriminator (:175-216),
  ConvDiscriminator (:219-268).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hop_tpu.models import common
from hop_tpu.models.tcn import TextEncoderTCN
from hop_tpu.ops.gru import GRU


class PoseGenerator(nn.Module):
    """pre_seq(pose_dim+1) ++ wav(32) ++ text(32) ++ z(16) -> BiGRU -> poses."""

    pose_dim: int
    n_words: int
    n_speakers: int
    hidden_size: int = 300
    n_layers: int = 4
    dropout: float = 0.3
    input_context: str = "both"  # both | audio | text | none
    z_size: int = 16
    use_speaker: bool = True     # z_obj is a Vocab in the reference

    @nn.compact
    def __call__(self, pre_seq: jnp.ndarray, in_text: jnp.ndarray,
                 in_audio: jnp.ndarray,
                 vid_indices: Optional[jnp.ndarray] = None,
                 *, rng: Optional[jax.Array] = None, train: bool = False):
        feats = [pre_seq]
        if self.input_context in ("both", "audio"):
            feats_audio = common.WavEncoder()(in_audio, train)
        if self.input_context in ("both", "text"):
            # reference multimodal_context_net.py:47: [hidden_size]*n_layers
            feats_text = TextEncoderTCN(
                n_words=self.n_words,
                num_channels=(self.hidden_size,) * self.n_layers,
                dropout=self.dropout)(in_text, train)
        if self.input_context == "both":
            feats = [pre_seq, feats_audio, feats_text]
        elif self.input_context == "audio":
            feats = [pre_seq, feats_audio]
        elif self.input_context == "text":
            feats = [pre_seq, feats_text]

        z_mu = z_logvar = z_context = None
        if self.use_speaker:
            z_context, z_mu, z_logvar = common.SpeakerLatent(
                self.n_speakers, self.z_size)(vid_indices, rng)
        elif rng is not None:
            z_context = jax.random.normal(
                rng, (pre_seq.shape[0], self.z_size))

        in_data = jnp.concatenate(feats, axis=-1)
        if z_context is not None:
            rep = jnp.broadcast_to(z_context[:, None, :],
                                   (z_context.shape[0], in_data.shape[1],
                                    self.z_size))
            in_data = jnp.concatenate([in_data, rep], axis=-1)

        out, _ = GRU(self.hidden_size, self.n_layers, bidirectional=True,
                     dropout_rate=self.dropout)(
            in_data, deterministic=not train)
        out = out[..., :self.hidden_size] + out[..., self.hidden_size:]
        out = nn.Dense(self.hidden_size // 2)(out)
        out = common.leaky_relu(out, common.IDENTITY_SLOPE)
        out = nn.Dense(self.pose_dim)(out)
        return out, z_context, z_mu, z_logvar


class Discriminator(nn.Module):
    """Text-conditioned BiGRU discriminator (reference :175-216)."""

    input_size: int
    n_poses: int = 34
    hidden_size: int = 300
    n_layers: int = 4
    dropout: float = 0.3
    n_words: Optional[int] = None

    @nn.compact
    def __call__(self, poses: jnp.ndarray,
                 in_text: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        x = poses
        if self.n_words is not None:
            text_feat = TextEncoderTCN(n_words=self.n_words)(in_text, train)
            x = jnp.concatenate([x, text_feat], axis=-1)
        out, _ = GRU(self.hidden_size, self.n_layers, bidirectional=True,
                     dropout_rate=self.dropout)(x, deterministic=not train)
        out = out[..., :self.hidden_size] + out[..., self.hidden_size:]
        out = nn.Dense(1)(out)[..., 0]           # per-step score (B, T)
        out = nn.Dense(1)(out)                   # (B, 1)
        return jax.nn.sigmoid(out)


class ConvDiscriminator(nn.Module):
    """Conv1d 27->16->8->8 -> 4-layer BiGRU(64) -> per-step Linear -> Linear.

    reference multimodal_context_net.py:219-268; used by both HOP and the
    trimodal GAN. Input (B, 34, pose_dim); valid convs shrink T 34->28.
    """

    @nn.compact
    def __call__(self, poses: jnp.ndarray,
                 in_text: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        x = nn.Conv(16, (3,), padding="VALID")(poses)
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, common.IDENTITY_SLOPE)
        x = nn.Conv(8, (3,), padding="VALID")(x)
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, common.IDENTITY_SLOPE)
        x = nn.Conv(8, (3,), padding="VALID")(x)

        out, _ = GRU(64, 4, bidirectional=True, dropout_rate=0.3)(
            x, deterministic=not train)
        out = out[..., :64] + out[..., 64:]
        out = nn.Dense(1)(out)[..., 0]   # (B, 28)
        out = nn.Dense(1)(out)           # (B, 1)
        return jax.nn.sigmoid(out)
