"""Fused time-grid Pallas GRU (round 2 of the custom-kernel attempt).

Round 1 (ops/pallas_gru.py) tiled the *batch* over the grid, which
serialises `n_tiles x T` dependent steps on the sequential TPU grid and
loses to the lax.scan formulation. This kernel instead puts **time on
the grid** — the one axis that is genuinely sequential:

- ``grid = (2 directions, T)``; pallas grids execute in order, so a VMEM
  scratch carry implements the recurrence h_t = f(h_{t-1}) across grid
  steps with the FULL batch per step (34 steps, not 34 x tiles);
- per-gate input projections stream HBM->VMEM through BlockSpec index
  maps (auto double-buffered by the pipeline emitter), with the
  *backward direction expressed purely as a reversed index map* — the
  jnp.flip copies of the scan path disappear;
- the three (H, H) recurrent weights + biases stay VMEM-resident for a
  whole direction;
- the backward pass is a second time-grid kernel running the reversed
  traversal, accumulating dW_hh / db_hh directly in its output blocks
  (index maps constant in t, so the block lives in VMEM for the whole
  direction) — 6 MXU ops per step, no host-visible residail reshuffling.

Gate math and layout match torch.nn.GRU / ops/gru.py exactly (gates
r, z, n; hn saved *with* b_hn as the reference multiplies r into
(W_hn h + b_hn)). The public entry `gru_stack` carries a custom VJP whose
residuals are the gate streams the forward kernel already emits.

The custom-VJP boundary is the recurrence only: the big (B*T, in) @
(in, 3H) input projections and their gradients stay in XLA where the MXU
already runs them at full tilt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(xr_ref, xz_ref, xn_ref, w_ref, b_ref, h0_ref,
                h_ref, r_ref, z_ref, n_ref, hnb_ref, h_scr):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    wr, wz, wn = w_ref[0, 0], w_ref[0, 1], w_ref[0, 2]
    br, bz, bn = b_ref[0, 0], b_ref[0, 1], b_ref[0, 2]
    hr = jnp.dot(h, wr, preferred_element_type=jnp.float32) + br
    hz = jnp.dot(h, wz, preferred_element_type=jnp.float32) + bz
    hnb = jnp.dot(h, wn, preferred_element_type=jnp.float32) + bn
    r = jax.nn.sigmoid(xr_ref[0, 0] + hr)
    z = jax.nn.sigmoid(xz_ref[0, 0] + hz)
    n = jnp.tanh(xn_ref[0, 0] + r * hnb)
    h_new = (1.0 - z) * n + z * h

    h_ref[0, 0] = h_new
    r_ref[0, 0] = r
    z_ref[0, 0] = z
    n_ref[0, 0] = n
    hnb_ref[0, 0] = hnb
    h_scr[:] = h_new


def _fwd_kernel_lean(xr_ref, xz_ref, xn_ref, w_ref, b_ref, h0_ref,
                     h_ref, h_scr):
    """Inference variant: h stream only (no residual gate outputs) —
    saves 4x (D, T, B, H) of HBM write bandwidth on every non-VJP call
    (generation / eval run this path)."""
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    hr = jnp.dot(h, w_ref[0, 0], preferred_element_type=jnp.float32) \
        + b_ref[0, 0]
    hz = jnp.dot(h, w_ref[0, 1], preferred_element_type=jnp.float32) \
        + b_ref[0, 1]
    hnb = jnp.dot(h, w_ref[0, 2], preferred_element_type=jnp.float32) \
        + b_ref[0, 2]
    r = jax.nn.sigmoid(xr_ref[0, 0] + hr)
    z = jax.nn.sigmoid(xz_ref[0, 0] + hz)
    n = jnp.tanh(xn_ref[0, 0] + r * hnb)
    h_new = (1.0 - z) * n + z * h
    h_ref[0, 0] = h_new
    h_scr[:] = h_new


def _time_idx(d, t, T):
    # forward direction walks t = 0..T-1; backward walks T-1..0 — the
    # reversal is purely an index-map, no data movement
    return t + d * (T - 1 - 2 * t)


#: largest batch slab held in VMEM at once; bigger batches get an extra
#: (sequential) batch-tile grid dimension. 256 x 350 f32 streams with
#: double-buffered in/out blocks stay well under the 16 MB VMEM budget
#: (B=512 untiled was measured to need 18.5 MB).
MAX_BATCH_TILE = 256


def _batch_tiles(B):
    if B <= MAX_BATCH_TILE:
        return B, 1
    nbt = -(-B // MAX_BATCH_TILE)
    bt = -(-B // nbt)
    return bt, nbt


def _pad_batch(arrs, B, bt, nbt):
    padded = bt * nbt
    if padded == B:
        return arrs
    pad = padded - B
    return [jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, pad), (0, 0)])
            for a in arrs]


def _fwd_call(xr, xz, xn, w, b, h0, interpret=False,
              with_residuals=True):
    D, T, B, H = xr.shape
    bt, nbt = _batch_tiles(B)
    xr, xz, xn = _pad_batch([xr, xz, xn], B, bt, nbt)
    (h0,) = _pad_batch([h0], B, bt, nbt)
    Bp = bt * nbt

    def x_map(d, i, t):
        return (d, _time_idx(d, t, T), i, 0)

    x_spec = pl.BlockSpec((1, 1, bt, H), x_map, memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 3, H, H), lambda d, i, t: (d, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, 3, 1, H), lambda d, i, t: (d, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    h0_spec = pl.BlockSpec((bt, H), lambda d, i, t: (i, 0),
                           memory_space=pltpu.VMEM)
    out_stream = jax.ShapeDtypeStruct((D, T, Bp, H), jnp.float32)

    n_out = 5 if with_residuals else 1
    outs = pl.pallas_call(
        _fwd_kernel if with_residuals else _fwd_kernel_lean,
        grid=(D, nbt, T),
        in_specs=[x_spec, x_spec, x_spec, w_spec, b_spec, h0_spec],
        out_specs=[x_spec] * n_out,
        out_shape=[out_stream] * n_out,
        scratch_shapes=[pltpu.VMEM((bt, H), jnp.float32)],
        interpret=interpret,
    )(xr, xz, xn, w, b, h0)
    if Bp != B:
        outs = [o[:, :, :B] for o in outs]
    return outs   # [h_seq] or [h_seq, r, z, n, hnb]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(g_ref, r_ref, z_ref, n_ref, hnb_ref, hprev_ref, wt_ref,
                dx_r_ref, dx_z_ref, dx_n_ref, dw_ref, db_ref, dh0_ref,
                dh_scr):
    i = pl.program_id(1)
    t = pl.program_id(2)
    T = pl.num_programs(2)

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    @pl.when((t == 0) & (i == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    g = g_ref[0, 0] + dh_scr[:]
    r, z, n = r_ref[0, 0], z_ref[0, 0], n_ref[0, 0]
    hnb, hprev = hnb_ref[0, 0], hprev_ref[0, 0]

    dn_pre = g * (1.0 - z) * (1.0 - n * n)
    dz_pre = g * (hprev - n) * z * (1.0 - z)
    dr_pre = dn_pre * hnb * r * (1.0 - r)
    dn_h = dn_pre * r

    # input-stream cotangents are emitted in the PRIMAL stream dtype —
    # under bf16 gate streams (HOP_TPU_GRU_BF16_STREAMS) the halved
    # bandwidth only materialises if the kernel writes bf16 natively
    # (an XLA-side cast after an f32 write would ADD a round trip)
    dx_r_ref[0, 0] = dr_pre.astype(dx_r_ref.dtype)
    dx_z_ref[0, 0] = dz_pre.astype(dx_z_ref.dtype)
    dx_n_ref[0, 0] = dn_pre.astype(dx_n_ref.dtype)

    wrt, wzt, wnt = wt_ref[0, 0], wt_ref[0, 1], wt_ref[0, 2]
    dh = (g * z
          + jnp.dot(dr_pre, wrt, preferred_element_type=jnp.float32)
          + jnp.dot(dz_pre, wzt, preferred_element_type=jnp.float32)
          + jnp.dot(dn_h, wnt, preferred_element_type=jnp.float32))

    hp_t = hprev.T
    dw_ref[0, 0] += jnp.dot(hp_t, dr_pre,
                            preferred_element_type=jnp.float32)
    dw_ref[0, 1] += jnp.dot(hp_t, dz_pre,
                            preferred_element_type=jnp.float32)
    dw_ref[0, 2] += jnp.dot(hp_t, dn_h,
                            preferred_element_type=jnp.float32)
    db_ref[0, 0] += jnp.sum(dr_pre, axis=0, keepdims=True)
    db_ref[0, 1] += jnp.sum(dz_pre, axis=0, keepdims=True)
    db_ref[0, 2] += jnp.sum(dn_h, axis=0, keepdims=True)

    dh_scr[:] = dh

    @pl.when(t == T - 1)
    def _():
        dh0_ref[0] = dh


def _bwd_call(g, r, z, n, hnb, hprev, w, dx_dtype=jnp.float32,
              interpret=False):
    D, T, B, H = g.shape
    bt, nbt = _batch_tiles(B)
    g, r, z, n, hnb, hprev = _pad_batch([g, r, z, n, hnb, hprev],
                                        B, bt, nbt)
    Bp = bt * nbt
    # the backward traversal reverses each direction's forward order
    # (fw processed 0..T-1 -> walk T-1..0; bw processed T-1..0 -> 0..T-1)

    def x_map(d, i, t):
        return (d, _time_idx(1 - d, t, T), i, 0)

    x_spec = pl.BlockSpec((1, 1, bt, H), x_map, memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 3, H, H), lambda d, i, t: (d, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_acc_spec = pl.BlockSpec((1, 3, 1, H), lambda d, i, t: (d, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    dh0_spec = pl.BlockSpec((1, bt, H), lambda d, i, t: (d, i, 0),
                            memory_space=pltpu.VMEM)

    w_t = jnp.swapaxes(w, -1, -2)   # per-gate W^T, still (D, 3, H, H)

    dxr, dxz, dxn, dw, db, dh0 = pl.pallas_call(
        _bwd_kernel,
        grid=(D, nbt, T),
        in_specs=[x_spec] * 6 + [w_spec],
        out_specs=[x_spec, x_spec, x_spec, w_spec, b_acc_spec, dh0_spec],
        out_shape=[jax.ShapeDtypeStruct((D, T, Bp, H), dx_dtype)] * 3
        + [jax.ShapeDtypeStruct((D, 3, H, H), jnp.float32),
           jax.ShapeDtypeStruct((D, 3, 1, H), jnp.float32),
           jax.ShapeDtypeStruct((D, Bp, H), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bt, H), jnp.float32)],
        interpret=interpret,
    )(g, r, z, n, hnb, hprev, w_t)
    if Bp != B:
        dxr, dxz, dxn = (a[:, :, :B] for a in (dxr, dxz, dxn))
        dh0 = dh0[:, :B]
    return dxr, dxz, dxn, dw, db, dh0


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def gru_stack(xr, xz, xn, w, b, h0, interpret=False):
    """Bidirectional multi-stream GRU recurrence.

    xr/xz/xn: (D, T, B, H) per-gate input projections (+ b_ih), with
      stream d=0 the forward direction and d=1 the reverse direction
      (when D == 2). Time-major on purpose: every kernel block is a
      well-tiled (B, H) slab.
    w: (D, 3, H, H) recurrent weights (gate g maps h -> h @ w[d, g]).
    b: (D, 3, 1, H) recurrent biases.
    h0: (B, H) shared initial state.
    Returns h_seq (D, T, B, H) in *natural* time order for both
    directions (the reverse stream is un-reversed by construction).
    """
    (h_seq,) = _fwd_call(xr, xz, xn, w, b, h0, interpret=interpret,
                         with_residuals=False)
    return h_seq


def _gru_stack_fwd(xr, xz, xn, w, b, h0, interpret=False):
    h_seq, r, z, n, hnb = _fwd_call(xr, xz, xn, w, b, h0,
                                    interpret=interpret)
    # the zero-size carrier records the primal stream dtype for the
    # backward's native-dtype dx writes (bf16 under bf16 gate streams)
    dt = jnp.zeros((0,), xr.dtype)
    return h_seq, (r, z, n, hnb, h_seq, w, h0, dt)


def _gru_stack_bwd(interpret, res, g):
    r, z, n, hnb, h_seq, w, h0, dt = res
    D, T, B, H = g.shape
    # h_prev stream: previous hidden state in each direction's own
    # processing order (fw: h_{t-1} with h0 at t=0; bw: h_{t+1} with h0
    # at t=T-1)
    prev_fw = jnp.concatenate([h0[None], h_seq[0, :-1]], axis=0)
    if D == 2:
        prev_bw = jnp.concatenate([h_seq[1, 1:], h0[None]], axis=0)
        hprev = jnp.stack([prev_fw, prev_bw])
    else:
        hprev = prev_fw[None]
    dxr, dxz, dxn, dw, db, dh0 = _bwd_call(g, r, z, n, hnb, hprev, w,
                                           dx_dtype=dt.dtype,
                                           interpret=interpret)
    return dxr, dxz, dxn, dw, db, jnp.sum(dh0, axis=0)


gru_stack.defvjp(_gru_stack_fwd, _gru_stack_bwd)
