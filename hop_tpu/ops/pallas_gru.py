"""Fused Pallas GRU sequence kernel.

The GRU stacks are the one truly sequential hot op in this workload (the
4-layer BiGRU(350) head runs every training forward, reference
model/HOP.py:166-167). The scan formulation in ops/gru.py already feeds the
MXU with one large input projection; this kernel removes the remaining
per-step overhead by keeping the hidden state and the recurrent weights
resident in VMEM for the whole sequence: one pallas_call per (layer,
direction), grid over batch tiles, T recurrent (Bt, H) x (H, H) matmuls on
the MXU with fused gate elementwise ops on the VPU.

Gates are passed pre-split (r/z/n as separate refs) so in-kernel slicing
never crosses lane boundaries. Forward-only; outputs match the scan (tested
in interpret mode and on hardware).

MEASURED (v5e, B=256, T=34, H=350): the lax.scan formulation in ops/gru.py
runs this workload at ~0.03 ms/call — already at the latency floor of 34
dependent MXU ops — while this kernel's batch-tiled grid serialises tiles
and lands at ~590 ms/call. The scan path is therefore the production path;
this kernel is kept as the starting point for a future fused
multi-layer/direction variant (single grid step, both directions + all
layers resident, where pallas could beat the scan by removing the per-layer
HBM round-trips).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_seq_kernel(xr_ref, xz_ref, xn_ref, wr_ref, wz_ref, wn_ref,
                    br_ref, bz_ref, bn_ref, h0_ref, out_ref):
    seq_len = xr_ref.shape[1]

    def step(t, h):
        hr = jnp.dot(h, wr_ref[:], preferred_element_type=jnp.float32)
        hz = jnp.dot(h, wz_ref[:], preferred_element_type=jnp.float32)
        hn = jnp.dot(h, wn_ref[:], preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(xr_ref[:, t, :] + hr + br_ref[:])
        z = jax.nn.sigmoid(xz_ref[:, t, :] + hz + bz_ref[:])
        n = jnp.tanh(xn_ref[:, t, :] + r * (hn + bn_ref[:]))
        h_new = (1.0 - z) * n + z * h
        out_ref[:, pl.ds(t, 1), :] = h_new[:, None, :]
        return h_new

    jax.lax.fori_loop(0, seq_len, step, h0_ref[:])


def pallas_gru_layer(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                     b_hh: jnp.ndarray, h0: jnp.ndarray,
                     reverse: bool = False, batch_tile: int = 32,
                     interpret: bool = False) -> jnp.ndarray:
    """One GRU direction. x_proj (B, T, 3H) with b_ih already added
    (torch gate order r, z, n); w_hh (3H, H); b_hh (3H,); h0 (B, H)."""
    B, T, threeH = x_proj.shape
    H = threeH // 3
    if reverse:
        x_proj = jnp.flip(x_proj, axis=1)

    xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
    wr, wz, wn = (w.T for w in jnp.split(w_hh, 3, axis=0))  # each (H, H)
    br, bz, bn = (b[None, :] for b in jnp.split(b_hh, 3, axis=0))

    bt = min(batch_tile, B)
    n_tiles = pl.cdiv(B, bt)
    pad_b = n_tiles * bt - B
    if pad_b:
        pad = [(0, pad_b), (0, 0), (0, 0)]
        xr, xz, xn = (jnp.pad(a, pad) for a in (xr, xz, xn))
        h0 = jnp.pad(h0, [(0, pad_b), (0, 0)])

    batch_spec = pl.BlockSpec((bt, T, H), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    weight_spec = pl.BlockSpec((H, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    h0_spec = pl.BlockSpec((bt, H), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _gru_seq_kernel,
        grid=(n_tiles,),
        in_specs=[batch_spec, batch_spec, batch_spec,
                  weight_spec, weight_spec, weight_spec,
                  bias_spec, bias_spec, bias_spec, h0_spec],
        out_specs=batch_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * bt, T, H), jnp.float32),
        interpret=interpret,
    )(xr, xz, xn, wr, wz, wn, br, bz, bn, h0)

    out = out[:B]
    if reverse:
        out = jnp.flip(out, axis=1)
    return out


def gru_forward_pallas(x: jnp.ndarray, params: dict, hidden_size: int,
                       num_layers: int, bidirectional: bool,
                       interpret: bool = False) -> jnp.ndarray:
    """Full stack forward with torch-layout params (ops/gru.GRU's tree)."""
    B = x.shape[0]
    layer_in = x
    for layer in range(num_layers):
        sfx = f"_l{layer}"
        h0 = jnp.zeros((B, hidden_size), jnp.float32)
        x_proj = layer_in @ params[f"w_ih{sfx}"].T + params[f"b_ih{sfx}"]
        fw = pallas_gru_layer(x_proj, params[f"w_hh{sfx}"],
                              params[f"b_hh{sfx}"], h0, False,
                              interpret=interpret)
        if bidirectional:
            x_proj_r = (layer_in @ params[f"w_ih{sfx}_reverse"].T
                        + params[f"b_ih{sfx}_reverse"])
            bw = pallas_gru_layer(x_proj_r, params[f"w_hh{sfx}_reverse"],
                                  params[f"b_hh{sfx}_reverse"], h0, True,
                                  interpret=interpret)
            layer_in = jnp.concatenate([fw, bw], axis=-1)
        else:
            layer_in = fw
    return layer_in
