"""Shared model blocks: wave CNN encoder, reparameterisation, conv helpers.

Counterparts of reference model/HOP.py:50-69 (WavEncoder, duplicated at
multimodal_context_net.py:10-30), model/embedding_net.py:10-39
(reparameterize, ConvNormRelu). Layout convention is feature-last
(B, T, C) throughout — the TPU-friendly layout for XLA convolutions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def leaky_relu(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


# The reference frequently writes nn.LeakyReLU(True), which torch parses as
# negative_slope=1.0, i.e. the identity (HOP.py:172, multimodal_context
# PoseGenerator.out:104, ConvDiscriminator pre_conv:229). We reproduce that
# behaviour so weight-for-weight parity holds.
IDENTITY_SLOPE = 1.0


def reparameterize(rng: jax.Array, mu: jnp.ndarray,
                   logvar: jnp.ndarray) -> jnp.ndarray:
    """z = mu + eps * exp(0.5 logvar) (reference embedding_net.py:10-13)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, std.shape, std.dtype)
    return mu + eps * std


class BatchNorm(nn.Module):
    """torch-default BatchNorm over the channel (last) axis.

    torch momentum 0.1 (new = 0.9*old + 0.1*batch) == flax momentum 0.9.
    """
    use_running_average: bool

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=self.use_running_average,
                            momentum=0.9, epsilon=1e-5)(x)


class Conv1dBNLeaky(nn.Module):
    """Conv1d + BatchNorm + LeakyReLU stack element."""
    features: int
    kernel: int
    stride: int = 1
    padding: int | str = 0
    slope: float = 0.2
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding if isinstance(self.padding, str) else \
            [(self.padding, self.padding)]
        x = nn.Conv(self.features, (self.kernel,), strides=(self.stride,),
                    padding=pad)(x)
        if self.use_bn:
            x = BatchNorm(use_running_average=not train)(x)
        return leaky_relu(x, self.slope)


class WavEncoder(nn.Module):
    """Raw-waveform CNN: 36267 samples -> (B, 34, 32).

    reference model/HOP.py:50-69: Conv1d 1->16 (k15,s5,p1600) -> BN -> LReLU.3
    -> 16->32 (k15,s6) -> BN -> LReLU.3 -> 32->64 -> BN -> LReLU.3 -> 64->32.
    """

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = wav[..., None]  # (B, n_samples, 1)
        x = nn.Conv(16, (15,), strides=(5,), padding=[(1600, 1600)])(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 0.3)
        x = nn.Conv(32, (15,), strides=(6,), padding=[(0, 0)])(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 0.3)
        x = nn.Conv(64, (15,), strides=(6,), padding=[(0, 0)])(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 0.3)
        x = nn.Conv(32, (15,), strides=(6,), padding=[(0, 0)])(x)
        return x  # (B, 34, 32)


class SpeakerLatent(nn.Module):
    """Speaker CVAE head: Embedding -> Linear -> (mu, logvar) -> z.

    reference model/HOP.py:96-107,184-190 (same block reused by the trimodal
    and hierarchical generators).
    """
    n_speakers: int
    z_size: int = 16

    @nn.compact
    def __call__(self, vid_indices: jnp.ndarray, rng: jax.Array):
        emb = nn.Embed(self.n_speakers, self.z_size,
                       embedding_init=nn.initializers.normal(1.0))(vid_indices)
        ctx = nn.Dense(self.z_size)(emb)
        mu = nn.Dense(self.z_size)(ctx)
        logvar = nn.Dense(self.z_size)(ctx)
        z = reparameterize(rng, mu, logvar)
        return z, mu, logvar


def pre_emphasis(audio: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """FIR pre-emphasis y[t] = x[t] - coef*x[t-1] with edge replication
    (reference model/utils.py:24-38 PreEmphasis conv [-0.97, 1])."""
    padded = jnp.concatenate([audio[..., :1], audio], axis=-1)
    return padded[..., 1:] - coef * padded[..., :-1]


def topk_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                  topk=(1,)) -> list:
    """Top-k accuracy percentages (reference model/utils.py:7-21)."""
    order = jnp.argsort(logits, axis=-1)[..., ::-1]
    out = []
    for k in topk:
        hit = jnp.any(order[..., :k] == targets[..., None], axis=-1)
        out.append(jnp.mean(hit.astype(jnp.float32)) * 100.0)
    return out


def kld_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """-0.5 * mean(1 + logvar - mu^2 - exp(logvar)) (train_llm.py:73)."""
    return -0.5 * jnp.mean(1 + logvar - mu ** 2 - jnp.exp(logvar))


def huber(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 0.1,
          reduce: bool = True) -> jnp.ndarray:
    """smooth_l1(pred/beta, target/beta) * beta (train_llm.py:46).

    Equivalent to a Huber loss with transition at `beta`.
    """
    d = jnp.abs(pred - target) / beta
    out = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5) * beta
    return jnp.mean(out) if reduce else out
