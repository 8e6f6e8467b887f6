"""Graph WaveNet over the skeleton graph.

Counterpart of reference model/gwnet.py:8-249: adaptive adjacency
softmax(relu(E1 @ E2)) from learned node embeddings, 4 blocks x 2 layers of
dilated gated temporal convs (kernel (1,2), dilations 1,2) each followed by a
diffusion GCN (order 2) over the adaptive support, skip/residual paths, and
two 1x1 end convs.

Layout is feature-last (B, T, N, C); the temporal axis is the conv "height"
so every 1xK conv lowers to an MXU-tileable XLA convolution, and the GCN's
node mixing is an einsum that fuses with the following 1x1 conv. The torch
original's skip-slice try/except (gwnet.py:213-217) is replaced with static
length bookkeeping — everything here is shape-static for one-time
compilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def _temporal_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                   dilation: int) -> jnp.ndarray:
    """(B, T, N, Cin) -> (B, T', N, Cout), VALID conv over T with dilation."""
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=(dilation, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


class _TemporalConv(nn.Module):
    features: int
    width: int = 2
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        scale = 1.0 / (in_dim * self.width) ** 0.5  # torch conv default init
        init = nn.initializers.uniform(scale=2 * scale)
        kernel = self.param("kernel",
                            lambda k, s: init(k, s) - scale,
                            (self.width, 1, in_dim, self.features))
        bias = self.param("bias", lambda k, s: init(k, s) - scale,
                          (self.features,))
        return _temporal_conv(x, kernel, bias, self.dilation)


class GCN(nn.Module):
    """Diffusion GCN: concat powers of the support, then 1x1 conv.

    reference gwnet.py:24-46 with support_len=1 (adaptive only), order=2:
    h = mlp(concat[x, xA, xA^2]).
    """
    features: int
    order: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, support: jnp.ndarray) -> jnp.ndarray:
        outs = [x]
        xk = x
        for _ in range(self.order):
            xk = jnp.einsum("btvc,vw->btwc", xk, support)
            outs.append(xk)
        h = jnp.concatenate(outs, axis=-1)
        return nn.Dense(self.features)(h)


class GraphWaveNet(nn.Module):
    """reference gwnet.gwnet (model/gwnet.py:49-249), adaptive-adjacency path."""

    num_nodes: int
    in_dim: int
    out_dim: int
    residual_channels: int = 64
    dilation_channels: int = 64
    skip_channels: int = 256
    end_channels: int = 512
    kernel_size: int = 2
    blocks: int = 4
    layers: int = 2
    node_emb_dim: int = 10
    gcn_order: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, T, N, in_dim) -> (B, T_out, N, out_dim)."""
        receptive_field = 1
        d = 1
        dilations = []
        for _ in range(self.blocks):
            add = self.kernel_size - 1
            d = 1
            for _ in range(self.layers):
                dilations.append(d)
                receptive_field += add
                d *= 2
                add *= 2
        if x.shape[1] < receptive_field:
            pad = receptive_field - x.shape[1]
            x = jnp.pad(x, [(0, 0), (pad, 0), (0, 0), (0, 0)])

        e1 = self.param("nodevec1", nn.initializers.normal(1.0),
                        (self.num_nodes, self.node_emb_dim))
        e2 = self.param("nodevec2", nn.initializers.normal(1.0),
                        (self.node_emb_dim, self.num_nodes))
        adp = jax.nn.softmax(nn.relu(e1 @ e2), axis=1)

        x = nn.Dense(self.residual_channels, name="start_conv")(x)

        skip = None
        for i, dil in enumerate(dilations):
            residual = x
            filt = jnp.tanh(_TemporalConv(
                self.dilation_channels, self.kernel_size, dil,
                name=f"filter_{i}")(residual))
            gate = jax.nn.sigmoid(_TemporalConv(
                self.dilation_channels, self.kernel_size, dil,
                name=f"gate_{i}")(residual))
            x = filt * gate

            s = nn.Dense(self.skip_channels, name=f"skip_{i}")(x)
            if skip is None:
                skip = s
            else:
                skip = s + skip[:, -s.shape[1]:]

            x = GCN(self.residual_channels, self.gcn_order,
                    name=f"gcn_{i}")(x, adp)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=not train)
            x = x + residual[:, -x.shape[1]:]
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn_{i}")(x)

        out = nn.relu(skip)
        out = nn.relu(nn.Dense(self.end_channels, name="end_conv_1")(out))
        out = nn.Dense(self.out_dim, name="end_conv_2")(out)
        return out
