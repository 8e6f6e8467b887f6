"""Fully-fused time-grid Pallas GRU layer (round 3 of the kernel line).

ops/pallas_gru_stack.py (v2) moved the recurrence onto a time grid but
left the per-gate input projections in XLA: three (T*B, in) @ (in, H)
einsums per direction whose (D, T, B, H) outputs round-trip HBM before
the kernel streams them back in. The round-3 device trace prices that
split at ~6.3 ms/step of the 53 ms fused GAN step (einsum fwd 1.5 ms +
its transpose 3.3 ms + the add_any/broadcast/reduce_sum formatting the
einsum layout forces), on top of the 4.3 ms recurrence kernel.

v3 folds the projection INTO the kernel:

- ``grid = (D directions, batch tiles, T)``; per grid step the kernel
  loads one (bt, in) slab of the raw layer input and computes all three
  gate projections on the MXU right there — w_ih lives in VMEM for the
  whole direction, and the (D, T, B, H) gate streams never exist in HBM;
- the recurrence is unchanged from v2 (VMEM scratch carry, backward
  direction as a reversed BlockSpec index map);
- the backward kernel is one reversed traversal computing EVERYTHING in
  place per step: gate grads, dh carry (3 MXU), dW_hh/db_hh accumulation
  (3 MXU), dx emission through w_ih (3 MXU) and dW_ih/db_ih accumulation
  (3 MXU) — 12 well-shaped matmuls per step, weight-gradient blocks
  VMEM-resident for a whole direction (index maps constant in t/tile);
- dx is emitted per direction into a (D, T, B, in) tensor and summed in
  XLA (both directions read the same input slab, so neither may own the
  HBM block alone);
- projections are recomputed in the backward from the streamed x — only
  r/z/n/hnb and the h sequence are saved, same residual budget as v2.

Gate math and the (w_ih, w_hh, b_ih, b_hh) torch layouts are identical
to ops/gru.py's scan path, so checkpoints and parity tests are shared by
all three implementations. Counterpart of the reference's cuDNN
nn.GRU stacks (model/HOP.py:166-167 and the discriminator GRUs,
model/multimodal_context_net.py).

Numerics: f32 operands with f32 accumulation on every dot (TPU MXU
default bf16 multiply passes, same as the XLA path it replaces);
interpret-mode tests pin the kernel against the lax.scan formulation at
1e-5 (tests/test_pallas_gru_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hop_tpu.ops.pallas_gru_stack import _pad_batch, _time_idx

#: The fused kernel keeps w_ih + w_hh AND their gradient blocks
#: VMEM-resident (I=700, H=350 -> ~8.8 MB of weights/grads), so its
#: streaming blocks must be smaller than v2's: bt=256 put the backward
#: at 17.25 MB scoped VMEM (measured OOM on v5e, limit 16 MB); bt=128
#: fits with room for double-buffering.
MAX_BATCH_TILE = 128


def _batch_tiles(B):
    if B <= MAX_BATCH_TILE:
        return B, 1
    nbt = -(-B // MAX_BATCH_TILE)
    bt = -(-B // nbt)
    return bt, nbt


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _gates(x, h, wih_ref, bih_ref, whh_ref, bhh_ref):
    """Projections + gate math for one step. x (bt, I), h (bt, H).
    wih_ref/whh_ref are (3, I, H)/(3, H, H) VMEM scratch refs;
    bih_ref/bhh_ref are (1, 3, 1, H) streamed blocks."""
    xs, hs = [], []
    for gidx in range(3):
        xs.append(jax.lax.dot_general(
            x, wih_ref[gidx], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bih_ref[0, gidx])
        hs.append(jax.lax.dot_general(
            h, whh_ref[gidx], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bhh_ref[0, gidx])
    r = jax.nn.sigmoid(xs[0] + hs[0])
    z = jax.nn.sigmoid(xs[1] + hs[1])
    hnb = hs[2]
    n = jnp.tanh(xs[2] + r * hnb)
    return r, z, n, hnb


def _load_dir_weights(D, wih_hbm, whh_hbm, wih_scr, whh_scr, sems):
    """DMA direction d's weights HBM -> VMEM scratch once, at the first
    (i, t) grid step of that direction. Scratch staging is single-buffered
    by construction — streamed weight blocks get double-buffered by the
    pipeline emitter (~5 MB extra at the HOP head's I=992 first layer)
    and measured marginally slower end-to-end (full GAN step 19.23 vs
    19.38 steps/s, bench.py 2026-08-18)."""
    d = pl.program_id(0)
    i = pl.program_id(1)
    t = pl.program_id(2)
    for dd in range(D):
        @pl.when((t == 0) & (i == 0) & (d == dd))
        def _(dd=dd):
            ld_w = pltpu.make_async_copy(wih_hbm[dd], wih_scr, sems.at[0])
            ld_h = pltpu.make_async_copy(whh_hbm[dd], whh_scr, sems.at[1])
            ld_w.start()
            ld_h.start()
            ld_w.wait()
            ld_h.wait()


def _make_fwd_kernel(D, with_residuals):
    def kernel(*refs):
        x_ref = refs[0]
        wih_hbm = refs[1:1 + D]
        bih_ref = refs[1 + D]
        whh_hbm = refs[2 + D:2 + 2 * D]
        bhh_ref = refs[2 + 2 * D]
        h0_ref = refs[3 + 2 * D]
        o = 4 + 2 * D
        n_out = 5 if with_residuals else 1
        out_refs = refs[o:o + n_out]
        h_scr, wih_scr, whh_scr, sems = refs[o + n_out:]

        _load_dir_weights(D, wih_hbm, whh_hbm, wih_scr, whh_scr, sems)
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _():
            h_scr[:] = h0_ref[:]

        h = h_scr[:]
        r, z, n, hnb = _gates(x_ref[0], h, wih_scr, bih_ref,
                              whh_scr, bhh_ref)
        h_new = (1.0 - z) * n + z * h

        out_refs[0][0, 0] = h_new
        if with_residuals:
            for ref, val in zip(out_refs[1:], (r, z, n, hnb)):
                ref[0, 0] = val
        h_scr[:] = h_new

    return kernel


def _fwd_call(x, wih, bih, whh, bhh, h0, interpret=False,
              with_residuals=True):
    T, B, I = x.shape
    D, _, _, H = wih.shape
    bt, nbt = _batch_tiles(B)
    (x,) = _pad_batch([x[None]], B, bt, nbt)
    x = x[0]
    (h0,) = _pad_batch([h0], B, bt, nbt)
    Bp = bt * nbt

    x_spec = pl.BlockSpec((1, bt, I), lambda d, i, t: (_time_idx(d, t, T), i, 0),
                          memory_space=pltpu.VMEM)
    # weights are manually DMA'd into scratch, unpipelined
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    b_spec = pl.BlockSpec((1, 3, 1, H), lambda d, i, t: (d, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    h0_spec = pl.BlockSpec((bt, H), lambda d, i, t: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, bt, H),
                            lambda d, i, t: (d, _time_idx(d, t, T), i, 0),
                            memory_space=pltpu.VMEM)
    out_stream = jax.ShapeDtypeStruct((D, T, Bp, H), jnp.float32)

    n_out = 5 if with_residuals else 1
    outs = pl.pallas_call(
        _make_fwd_kernel(D, with_residuals),
        grid=(D, nbt, T),
        in_specs=([x_spec] + [hbm_spec] * D + [b_spec]
                  + [hbm_spec] * D + [b_spec, h0_spec]),
        out_specs=[out_spec] * n_out,
        out_shape=[out_stream] * n_out,
        scratch_shapes=[pltpu.VMEM((bt, H), jnp.float32),
                        pltpu.VMEM((3, I, H), jnp.float32),
                        pltpu.VMEM((3, H, H), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        # XLA's memory-space assignment keeps the HBM weight operands
        # VMEM-resident across the call (S(1) layouts) on top of the
        # kernel's own scratch; at the HOP head's I=992 first layer that
        # totals 18.3 MB and trips the default 16 MB scoped-VMEM limit.
        # v5e has 128 MB VMEM/core — raise the per-kernel cap instead of
        # spilling the weights back to HBM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, *[wih[d] for d in range(D)], bih,
      *[whh[d] for d in range(D)], bhh, h0)
    if Bp != B:
        outs = [o[:, :, :B] for o in outs]
    return outs   # [h_seq] or [h_seq, r, z, n, hnb]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _make_bwd_kernel(D):
    """Backward kernel builder. Weights and weight grads go through VMEM
    *scratch* (single-buffered by construction) with manual HBM DMAs at
    direction boundaries: as streamed blocks the pipeline emitter
    double-buffers them, and 2 x (wih + whh + dwih + dwhh) = 17.6 MB
    blows the 16 MB VMEM budget at I=700/H=350 (measured OOM on v5e).
    Each direction's weights are separate (3, I, H) HBM refs — a full-ref
    DMA has no slice, so the tiled dims need no 8/128 alignment (Mosaic
    rejects `.at[d]` slices of a stacked (D, 3, I, H) ref at I=700)."""

    def kernel(*refs):
        g_ref, x_ref, r_ref, z_ref, n_ref, hnb_ref, hprev_ref = refs[:7]
        wih_hbm = refs[7:7 + D]
        whh_hbm = refs[7 + D:7 + 2 * D]
        o = 7 + 2 * D
        dx_ref = refs[o]
        dwih_hbm = refs[o + 1:o + 1 + D]
        dbih_ref = refs[o + 1 + D]
        dwhh_hbm = refs[o + 2 + D:o + 2 + 2 * D]
        dbhh_ref = refs[o + 2 + 2 * D]
        dh0_ref = refs[o + 3 + 2 * D]
        (dh_scr, wih_scr, whh_scr, dwih_scr, dwhh_scr,
         sems) = refs[o + 4 + 2 * D:]

        d = pl.program_id(0)
        i = pl.program_id(1)
        t = pl.program_id(2)
        nbt = pl.num_programs(1)
        T = pl.num_programs(2)

        @pl.when(t == 0)
        def _():
            dh_scr[:] = jnp.zeros_like(dh_scr)

        for dd in range(D):
            @pl.when((t == 0) & (i == 0) & (d == dd))
            def _(dd=dd):
                ld_w = pltpu.make_async_copy(wih_hbm[dd], wih_scr,
                                             sems.at[0])
                ld_h = pltpu.make_async_copy(whh_hbm[dd], whh_scr,
                                             sems.at[1])
                ld_w.start()
                ld_h.start()
                # overlap accumulator zeroing with the weight loads
                dwih_scr[:] = jnp.zeros_like(dwih_scr)
                dwhh_scr[:] = jnp.zeros_like(dwhh_scr)
                dbih_ref[:] = jnp.zeros_like(dbih_ref)
                dbhh_ref[:] = jnp.zeros_like(dbhh_ref)
                ld_w.wait()
                ld_h.wait()

        g = g_ref[0, 0] + dh_scr[:]
        x = x_ref[0]
        r, z, n = r_ref[0, 0], z_ref[0, 0], n_ref[0, 0]
        hnb, hprev = hnb_ref[0, 0], hprev_ref[0, 0]

        dn_pre = g * (1.0 - z) * (1.0 - n * n)
        dz_pre = g * (hprev - n) * z * (1.0 - z)
        dr_pre = dn_pre * hnb * r * (1.0 - r)
        dn_h = dn_pre * r
        # gate-grad triples: the input projection sees (dr, dz, dn_pre);
        # the hidden projection sees (dr, dz, dn_h = dn_pre * r)
        d_in = (dr_pre, dz_pre, dn_pre)
        d_hid = (dr_pre, dz_pre, dn_h)

        dx = None
        dh = g * z
        for gidx in range(3):
            # dx += dgate @ w_ih[g]^T   (contract the H axes)
            part = jax.lax.dot_general(
                d_in[gidx], wih_scr[gidx], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dx = part if dx is None else dx + part
            dh = dh + jax.lax.dot_general(
                d_hid[gidx], whh_scr[gidx], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # weight grads: x^T @ dgate and hprev^T @ dgate via dim-0
            # contraction (no in-kernel transposes)
            dwih_scr[gidx] += jax.lax.dot_general(
                x, d_in[gidx], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwhh_scr[gidx] += jax.lax.dot_general(
                hprev, d_hid[gidx], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbih_ref[0, gidx] += jnp.sum(d_in[gidx], axis=0,
                                         keepdims=True)
            dbhh_ref[0, gidx] += jnp.sum(d_hid[gidx], axis=0,
                                         keepdims=True)

        dx_ref[0, 0] = dx
        dh_scr[:] = dh

        @pl.when(t == T - 1)
        def _():
            dh0_ref[0] = dh

        for dd in range(D):
            @pl.when((t == T - 1) & (i == nbt - 1) & (d == dd))
            def _(dd=dd):
                st_w = pltpu.make_async_copy(dwih_scr, dwih_hbm[dd],
                                             sems.at[2])
                st_h = pltpu.make_async_copy(dwhh_scr, dwhh_hbm[dd],
                                             sems.at[3])
                st_w.start()
                st_h.start()
                st_w.wait()
                st_h.wait()

    return kernel


def _bwd_call(g, x, r, z, n, hnb, hprev, wih, whh, interpret=False):
    D, T, B, H = g.shape
    I = x.shape[-1]
    bt, nbt = _batch_tiles(B)
    g, r, z, n, hnb, hprev = _pad_batch([g, r, z, n, hnb, hprev],
                                        B, bt, nbt)
    (x,) = _pad_batch([x[None]], B, bt, nbt)
    x = x[0]
    Bp = bt * nbt
    # the backward traversal reverses each direction's forward order

    def s_map(d, i, t):
        return (d, _time_idx(1 - d, t, T), i, 0)

    s_spec = pl.BlockSpec((1, 1, bt, H), s_map, memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, bt, I),
                          lambda d, i, t: (_time_idx(1 - d, t, T), i, 0),
                          memory_space=pltpu.VMEM)
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    dx_spec = pl.BlockSpec((1, 1, bt, I), s_map, memory_space=pltpu.VMEM)
    b_acc_spec = pl.BlockSpec((1, 3, 1, H), lambda d, i, t: (d, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    dh0_spec = pl.BlockSpec((1, bt, H), lambda d, i, t: (d, i, 0),
                            memory_space=pltpu.VMEM)

    wg_shape = jax.ShapeDtypeStruct((3, I, H), jnp.float32)
    hg_shape = jax.ShapeDtypeStruct((3, H, H), jnp.float32)
    outs = pl.pallas_call(
        _make_bwd_kernel(D),
        grid=(D, nbt, T),
        in_specs=([s_spec, x_spec] + [s_spec] * 5 + [hbm_spec] * 2 * D),
        out_specs=([dx_spec] + [hbm_spec] * D + [b_acc_spec]
                   + [hbm_spec] * D + [b_acc_spec, dh0_spec]),
        out_shape=([jax.ShapeDtypeStruct((D, T, Bp, I), jnp.float32)]
                   + [wg_shape] * D
                   + [jax.ShapeDtypeStruct((D, 3, 1, H), jnp.float32)]
                   + [hg_shape] * D
                   + [jax.ShapeDtypeStruct((D, 3, 1, H), jnp.float32),
                      jax.ShapeDtypeStruct((D, Bp, H), jnp.float32)]),
        scratch_shapes=[pltpu.VMEM((bt, H), jnp.float32),
                        pltpu.VMEM((3, I, H), jnp.float32),
                        pltpu.VMEM((3, H, H), jnp.float32),
                        pltpu.VMEM((3, I, H), jnp.float32),
                        pltpu.VMEM((3, H, H), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        # see _fwd_call: weights + weight-grads ride VMEM end-to-end
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(g, x, r, z, n, hnb, hprev,
      *[wih[d] for d in range(D)], *[whh[d] for d in range(D)])
    dx = outs[0]
    dwih = jnp.stack(outs[1:1 + D])
    dbih = outs[1 + D]
    dwhh = jnp.stack(outs[2 + D:2 + 2 * D])
    dbhh = outs[2 + 2 * D]
    dh0 = outs[3 + 2 * D]
    if Bp != B:
        dx = dx[:, :, :B]
        dh0 = dh0[:, :B]
    return dx, dwih, dbih, dwhh, dbhh, dh0


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def gru_fused_layer(x, wih, bih, whh, bhh, h0, interpret=False):
    """One bidirectional GRU layer, projection + recurrence in-kernel.

    x:   (T, B, in) time-major layer input, shared by both directions.
    wih: (D, 3, in, H) per-gate input weights (gate g maps x -> x @
         wih[d, g]); bih: (D, 3, 1, H).
    whh: (D, 3, H, H) recurrent weights (h -> h @ whh[d, g]);
         bhh: (D, 3, 1, H).
    h0:  (B, H) shared initial state.
    Returns h_seq (D, T, B, H) in natural time order for both directions.
    """
    (h_seq,) = _fwd_call(x, wih, bih, whh, bhh, h0, interpret=interpret,
                         with_residuals=False)
    return h_seq


def _fused_fwd(x, wih, bih, whh, bhh, h0, interpret=False):
    h_seq, r, z, n, hnb = _fwd_call(x, wih, bih, whh, bhh, h0,
                                    interpret=interpret)
    return h_seq, (x, r, z, n, hnb, h_seq, wih, whh, h0)


def _fused_bwd(interpret, res, g):
    x, r, z, n, hnb, h_seq, wih, whh, h0 = res
    D = g.shape[0]
    prev_fw = jnp.concatenate([h0[None], h_seq[0, :-1]], axis=0)
    if D == 2:
        prev_bw = jnp.concatenate([h_seq[1, 1:], h0[None]], axis=0)
        hprev = jnp.stack([prev_fw, prev_bw])
    else:
        hprev = prev_fw[None]
    dx, dwih, dbih, dwhh, dbhh, dh0 = _bwd_call(
        g, x, r, z, n, hnb, hprev, wih, whh, interpret=interpret)
    return (jnp.sum(dx, axis=0), dwih, dbih, dwhh, dbhh,
            jnp.sum(dh0, axis=0))


gru_fused_layer.defvjp(_fused_fwd, _fused_bwd)
