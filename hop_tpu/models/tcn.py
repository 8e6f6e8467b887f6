"""Temporal convolutional network (causal dilated convs with weight norm).

Counterpart of reference model/tcn.py:7-64 (and its duplicate inside
EmbeddingSpaceEvaluator.py:37-93): TemporalBlock = weight-normed Conv1d x2
with causal left-cropping (Chomp1d), ReLU, dropout, residual 1x1. The causal
crop is implemented as asymmetric left padding instead of pad-both+chop —
identical output, ~half the conv FLOPs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class WeightNormConv1d(nn.Module):
    """Conv1d with torch-style weight normalisation (dim=0 over out-chan).

    Parameterised as direction `v` and per-output-channel gain `g`:
    kernel = g * v / ||v||, norm over (kernel width, in channels).
    """
    features: int
    kernel: int
    dilation: int = 1
    causal_left_pad: int = 0
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(0.01)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        v = self.param("v", self.kernel_init,
                       (self.kernel, in_dim, self.features))
        # torch initialises g = ||v|| so the initial effective kernel == v
        g = self.param("g", lambda key, shape: jnp.linalg.norm(
            v.reshape(-1, self.features), axis=0), (self.features,))
        b = self.param("b", nn.initializers.zeros, (self.features,))
        norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
        kernel = v * (g / jnp.maximum(norm, 1e-12))[None, None, :]
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1,),
            padding=[(self.causal_left_pad, 0)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y + b


class TemporalBlock(nn.Module):
    features: int
    kernel: int
    dilation: int
    dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = (self.kernel - 1) * self.dilation
        y = WeightNormConv1d(self.features, self.kernel, self.dilation,
                             causal_left_pad=pad)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=not train)
        y = WeightNormConv1d(self.features, self.kernel, self.dilation,
                             causal_left_pad=pad)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=not train)
        if x.shape[-1] != self.features:
            res = nn.Conv(self.features, (1,), padding="VALID",
                          kernel_init=nn.initializers.normal(0.01))(x)
        else:
            res = x
        return nn.relu(y + res)


class TemporalConvNet(nn.Module):
    """Stack of TemporalBlocks with dilation 2^i (reference tcn.py:49-64)."""
    num_channels: tuple
    kernel: int = 2
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, ch in enumerate(self.num_channels):
            x = TemporalBlock(ch, self.kernel, 2 ** i, self.dropout)(x, train)
        return x


class TextEncoderTCN(nn.Module):
    """fasttext embedding -> TCN -> Linear(32).

    reference model/HOP.py:18-48 (HOP variant: channels [300]*4) and
    multimodal_context_net.py:33-63 ([hidden_size]*n_layers variant).
    """
    n_words: int
    embed_size: int = 300
    num_channels: tuple = (300, 300, 300, 300)
    kernel: int = 2
    dropout: float = 0.3
    emb_dropout: float = 0.1
    freeze_embedding: bool = False

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, train: bool = False):
        emb_table = self.param(
            "embedding", nn.initializers.normal(1.0),
            (self.n_words, self.embed_size))
        if self.freeze_embedding:
            emb_table = jax.lax.stop_gradient(emb_table)
        emb = jnp.take(emb_table, tokens, axis=0)
        emb = nn.Dropout(self.emb_dropout)(emb, deterministic=not train)
        y = TemporalConvNet(self.num_channels, self.kernel,
                            self.dropout)(emb, train)
        y = nn.Dense(32, kernel_init=nn.initializers.normal(0.01),
                     bias_init=nn.initializers.zeros)(y)
        return y
