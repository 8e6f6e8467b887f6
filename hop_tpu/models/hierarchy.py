"""Hierarchical (HA2G) generator stack: coarse-to-fine bone cascades.

Counterparts of reference model/hierarchy_net.py:55-242 plus the cascade
slice-routing encoded procedurally in train_eval/train_hierarchy.py:100-170
(TED, 3 stages) and train_eval/train_hierarchy_expressive.py:140-213
(expressive, 6 stages). The reference routes previous-stage outputs into the
next stage's seed tensor with hand-written slice pairs; inspection shows
every pair simply matches *global bone ids* between consecutive stages'
bone subsets, so we encode the subsets declaratively and derive the routing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from hop_tpu.models import common
from hop_tpu.models.tcn import TextEncoderTCN
from hop_tpu.ops.gru import GRU

# Bone subsets per cascade stage (global bone indices into the dir-vec
# tables in geometry.py). Derived from the reference's target slices:
# train_hierarchy.py:86-88 and train_hierarchy_expressive.py:140-145.
TED_STAGE_BONES = (
    (0, 1, 2, 3, 6),
    (0, 1, 2, 3, 4, 6, 7),
    tuple(range(9)),
)

EXPRESSIVE_STAGE_BONES = (
    (0, 1, 2, 37, 38, 39, 40, 41),
    (0, 1, 2, 3, 20, 37, 38, 39, 40, 41),
    (0, 1, 2, 3, 4, 20, 21, 37, 38, 39, 40, 41),
    (0, 1, 2, 3, 4, 5, 8, 11, 14, 17, 20, 21, 22, 25, 28, 31, 34,
     37, 38, 39, 40, 41),
    (0, 1, 2, 3, 4, 5, 6, 8, 9, 11, 12, 14, 15, 17, 18, 20, 21, 22, 23,
     25, 26, 28, 29, 31, 32, 34, 35, 37, 38, 39, 40, 41),
    tuple(range(42)),
)

# Physical-prior statistics (train_hierarchy.py:15-16 /
# train_hierarchy_expressive.py:52-70)
TED_AVG_ANGLE = (0.22037504613399506, 0.4590071439743042,
                 0.22463147342205048, 0.45562979578971863)
TED_VAR_ANGLE = (0.0018439559498801827, 0.013570506125688553,
                 0.0017794054001569748, 0.013684595935046673)


def stage_bones(dataset: str) -> tuple:
    return TED_STAGE_BONES if dataset == "TED" else EXPRESSIVE_STAGE_BONES


def routing_tail(dataset: str) -> int:
    """Trailing face-bone block routed via the reference's off-by-one
    ``-5*3:`` column write (expressive only); see route_pre_seq."""
    return 0 if dataset == "TED" else 5


def bone_slice_indices(bones: Sequence[int]) -> np.ndarray:
    """Flattened dir-vec channel indices for a bone subset."""
    return np.concatenate([np.arange(b * 3, b * 3 + 3) for b in bones])


def slice_target(target: jnp.ndarray, bones: Sequence[int]) -> jnp.ndarray:
    return target[..., jnp.asarray(bone_slice_indices(bones))]


def route_pre_seq(target_k: jnp.ndarray, prev_out: Optional[jnp.ndarray],
                  bones_k: Sequence[int], bones_prev: Optional[Sequence[int]],
                  n_pre_poses: int, tail_bones: int = 0) -> jnp.ndarray:
    """Build stage-k seed: target seed frames + indicator bit, then overwrite
    frames >= n_pre with the previous stage's output for shared bones.

    tail_bones reproduces the reference's expressive routing EXACTLY: every
    expressive stage transition ends with
    ``pre_seq_k[:, n_pre:, -5*3:] = out_prev[:, n_pre:, -5*3:]``
    (train_hierarchy_expressive.py:163-165,176,190,211) — but pre_seq has
    D+1 channels (the indicator bit), so the destination block is shifted
    one channel late: the first face-bone x channel keeps its zero, the
    remaining 14 slide over by one, and the indicator column receives the
    last face bone's z. tail_bones=5 replicates that quirk (the published
    expressive checkpoints were trained with it); tail_bones=0 gives the
    bone-aligned routing (all of TED's hand-written pairs are aligned,
    train_hierarchy.py:100-170)."""
    B, T, D = target_k.shape
    pre = jnp.zeros((B, T, D + 1), target_k.dtype)
    pre = pre.at[:, :n_pre_poses, :D].set(target_k[:, :n_pre_poses])
    pre = pre.at[:, :n_pre_poses, D].set(1.0)
    if prev_out is not None:
        pos_k = {b: i for i, b in enumerate(bones_k)}
        aligned_prev = (bones_prev[:-tail_bones] if tail_bones
                        else bones_prev)
        dst, src = [], []
        for j, b in enumerate(aligned_prev):
            i = pos_k[b]
            dst.extend(range(i * 3, i * 3 + 3))
            src.extend(range(j * 3, j * 3 + 3))
        pre = pre.at[:, n_pre_poses:, jnp.asarray(dst)].set(
            prev_out[:, n_pre_poses:, jnp.asarray(src)])
        if tail_bones:
            w = tail_bones * 3
            pre = pre.at[:, n_pre_poses:, D + 1 - w:].set(
                prev_out[:, n_pre_poses:, prev_out.shape[-1] - w:])
    return pre


class HierarchicalPoseGenerator(nn.Module):
    """One cascade stage: seed ++ blended audio feat ++ text feat ++ z -> BiGRU.

    reference hierarchy_net.py:55-149 — like the trimodal PoseGenerator but
    the audio features arrive precomputed from the shared ResNetSE encoder.
    """
    pose_dim: int
    n_words: int
    n_speakers: int
    hidden_size: int = 300
    n_layers: int = 4
    dropout: float = 0.3
    z_size: int = 16

    @nn.compact
    def __call__(self, pre_seq: jnp.ndarray, in_text: jnp.ndarray,
                 audio_feat_seq: jnp.ndarray,
                 vid_indices: Optional[jnp.ndarray] = None,
                 *, rng: Optional[jax.Array] = None, train: bool = False):
        # reference hierarchy_net.py:36: TCN channels [hidden_size]*n_layers
        text_feat = TextEncoderTCN(
            n_words=self.n_words,
            num_channels=(self.hidden_size,) * self.n_layers,
            dropout=self.dropout)(in_text, train)
        z_context, z_mu, z_logvar = common.SpeakerLatent(
            self.n_speakers, self.z_size)(vid_indices, rng)
        in_data = jnp.concatenate([pre_seq, audio_feat_seq, text_feat],
                                  axis=-1)
        rep = jnp.broadcast_to(z_context[:, None, :],
                               (z_context.shape[0], in_data.shape[1],
                                self.z_size))
        in_data = jnp.concatenate([in_data, rep], axis=-1)
        out, _ = GRU(self.hidden_size, self.n_layers, bidirectional=True,
                     dropout_rate=self.dropout)(in_data,
                                                deterministic=not train)
        out = out[..., :self.hidden_size] + out[..., self.hidden_size:]
        out = nn.Dense(self.hidden_size // 2)(out)
        out = common.leaky_relu(out, 0.01)  # LeakyReLU(inplace=True)
        out = nn.Dense(self.pose_dim)(out)
        return out, z_context, z_mu, z_logvar


class HierarchicalConvDiscriminator(nn.Module):
    """reference hierarchy_net.py:197-242 (ConvDiscriminator with default
    0.01 LeakyReLU slopes)."""

    @nn.compact
    def __call__(self, poses: jnp.ndarray, in_text=None, train: bool = False):
        x = nn.Conv(16, (3,), padding="VALID")(poses)
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, 0.01)
        x = nn.Conv(8, (3,), padding="VALID")(x)
        x = common.BatchNorm(use_running_average=not train)(x)
        x = common.leaky_relu(x, 0.01)
        x = nn.Conv(8, (3,), padding="VALID")(x)
        out, _ = GRU(64, 4, bidirectional=True, dropout_rate=0.3)(
            x, deterministic=not train)
        out = out[..., :64] + out[..., 64:]
        out = nn.Dense(1)(out)[..., 0]
        out = nn.Dense(1)(out)
        return jax.nn.sigmoid(out)


class HierarchicalDiscriminator(nn.Module):
    """GRU discriminator variant (reference hierarchy_net.py:153-194) —
    structurally the trimodal Discriminator; kept for checkpoint parity."""
    input_size: int
    n_poses: int = 34
    hidden_size: int = 300
    n_layers: int = 4
    dropout: float = 0.3

    @nn.compact
    def __call__(self, poses: jnp.ndarray, in_text=None, train: bool = False):
        out, _ = GRU(self.hidden_size, self.n_layers, bidirectional=True,
                     dropout_rate=self.dropout)(poses,
                                                deterministic=not train)
        out = out[..., :self.hidden_size] + out[..., self.hidden_size:]
        out = nn.Dense(1)(out)[..., 0]
        out = nn.Dense(1)(out)
        return jax.nn.sigmoid(out)


class HierarchicalTextEncoder(nn.Module):
    """TextEncoderTCN variant returning features only (hierarchy_net.py:22-52)."""
    n_words: int
    hidden_size: int = 300
    n_layers: int = 4
    dropout: float = 0.3

    @nn.compact
    def __call__(self, tokens, train: bool = False):
        return TextEncoderTCN(
            n_words=self.n_words,
            num_channels=(self.hidden_size,) * self.n_layers,
            dropout=self.dropout)(tokens, train)
