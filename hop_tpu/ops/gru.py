"""Multi-layer bidirectional GRU for TPU.

Replaces the reference's cuDNN nn.GRU stacks (e.g. the 4-layer BiGRU(350)
decoder head, reference model/HOP.py:166-167, and the discriminator /
baseline GRUs) with a scan formulation that keeps the MXU busy:

  * the input projection for ALL timesteps of a layer is one large matmul
    (B*T, in) @ (in, 3H) — this is where most FLOPs live;
  * the sequential part inside `lax.scan` is only the (B, H) @ (H, 3H)
    hidden recurrence plus elementwise gates, the minimum that is truly
    serial in T;
  * both directions share the scan via stacking, so forward and backward
    recurrences run as one batched matmul per step.

Gate maths and parameter layout match torch.nn.GRU exactly (gates ordered
r, z, n; two bias vectors), so weights round-trip with the reference and
parity tests can copy tensors 1:1.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def _pallas_gru_enabled():
    """Mode switch for the Pallas GRU kernels. Values of
    HOP_TPU_PALLAS_GRU:

      0               lax.scan path everywhere
      1               v2 time-grid kernel (ops/pallas_gru_stack: input
                      projections in XLA, recurrence in-kernel)
      auto (default)  v3 fused kernel on TPU v5 and newer, v2 time-grid
                      on older generations (VMEM gate — see the hardware
                      note below)
      fused           v3 fully-fused kernel (ops/pallas_gru_fused:
                      projections + recurrence in one kernel, gate
                      streams never touch HBM). At the real HOP head
                      (B=256, T=34, I=992, H=350, 4-layer bidir) the
                      isolated microbench has v2 and v3 within noise
                      (fwd+bwd 4.32 vs 4.40 ms; scan 18.6 ms), but the
                      FULL GAN step is decisively faster with v3 —
                      fused 19.38 vs 18.57 steps/s, parity 13.60 vs
                      13.06 (bench.py, v5e, 2026-08-18) — because the
                      (D,T,B,H) gate streams v2 round-trips through HBM
                      also drag relayout/fusion boundaries into the
                      surrounding step. TPU max |scan - fused| = 7.8e-4
                      (benchmarks/bench_gru_kernels.py).
      interpret / interpret-fused   CPU tests of the pallas branches

    CPU always uses the scan unless an interpret mode is forced.

    Hardware note: the fused (v3) kernel raises its per-call scoped-VMEM
    cap to 64 MB (pallas_gru_fused.py compiler_params) because XLA keeps
    the weight operands VMEM-resident across the call — sized for v5e's
    128 MB VMEM/core. On older generations with 16-32 MB VMEM the v3
    kernel may fail to compile at wide input shapes (e.g. the I=992 HOP
    head), so the default ('auto') selects it only on v5-or-newer device
    kinds and uses the v2 time-grid kernel (16 MB footprint) elsewhere;
    HOP_TPU_PALLAS_GRU=fused forces v3 regardless, =1 forces v2, =0 the
    scan."""
    flag = os.environ.get("HOP_TPU_PALLAS_GRU", "auto")
    if flag == "0":
        return False
    if flag in ("interpret", "interpret-fused"):
        return flag
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    if dev.platform != "tpu":
        return False
    if flag == "fused":
        return "fused"
    if flag == "auto":
        return "fused" if _vmem_fits_fused(dev) else "stack"
    return "stack"


def _vmem_fits_fused(dev) -> bool:
    """True when the device generation has the VMEM headroom for the v3
    kernel's 64 MB scoped cap (v5e/v5p: 128 MB/core; v2/v3/v4: 16-32 MB).
    Parses the generation number out of device_kind strings like
    'TPU v4', 'TPU v5 lite', 'TPU v5p chip', 'TPU7x'; unknown kinds get
    the conservative v2 path (still 4x faster than the scan)."""
    kind = getattr(dev, "device_kind", "") or ""
    m = re.search(r"v?(\d+)", kind.lower().removeprefix("tpu"))
    return bool(m) and int(m.group(1)) >= 5


def _pallas_layer_tm(x_tm, dir_params, h0, h, interpret=False):
    """One (bi)directional layer through the fused kernel, fully
    time-major: x_tm (T, B, in); dir_params is a list of
    (w_ih, w_hh, b_ih, b_hh) per direction. The per-gate input
    projections are einsums whose OUTPUT is already (T, B, H) — the
    gate layout the kernel streams — so no relayout copies exist
    between layers (these copies were 10+ ms/step in the device trace
    of the first integration). Returns y (D, T, B, H)."""
    from hop_tpu.ops.pallas_gru_stack import gru_stack

    # per-gate direction-stacked input projections in ONE einsum each —
    # the direction axis lives on the (tiny) weight operand, so the
    # (D, T, B, H) gate stream is the dot's own output layout and no
    # 14 MB jnp.stack copies appear in the HLO
    xg, wg, bg = [], [], []
    for g in range(3):
        sl = slice(g * h, (g + 1) * h)
        wih = jnp.stack([p[0][sl] for p in dir_params])     # (D, H, in)
        bih = jnp.stack([p[2][sl] for p in dir_params])     # (D, H)
        xg.append(jnp.einsum("tbi,dhi->dtbh", x_tm, wih)
                  + bih[:, None, None, :])
        wg.append(jnp.stack([p[1][sl, :].T for p in dir_params]))
        bg.append(jnp.stack([p[3][sl][None, :] for p in dir_params]))
    if os.environ.get("HOP_TPU_GRU_BF16_STREAMS", "0") == "1":
        # opt-in: store the per-gate input-projection streams (the
        # kernel's dominant HBM traffic) in bf16 — halves the forward
        # stream reads AND the backward dx writes (the kernel emits dx
        # in the primal dtype natively). Gate pre-activations and their
        # cotangents are quantised to bf16; the recurrent h-path stays
        # f32. Measure FGD equivalence (benchmarks/compare_fused_step
        # multi-seed harness) before making this a default.
        xg = [x.astype(jnp.bfloat16) for x in xg]
    w = jnp.stack(wg, axis=1)    # (D, 3, H, H)
    b = jnp.stack(bg, axis=1)    # (D, 3, 1, H)
    return gru_stack(xg[0], xg[1], xg[2], w, b, h0, interpret)


def _fused_layer_tm(x_tm, dir_params, h, interpret=False):
    """One (bi)directional layer through the fully-fused v3 kernel
    (ops/pallas_gru_fused): per-gate input projections happen INSIDE the
    time-grid kernel, so the (D, T, B, H) gate streams never exist in
    HBM. dir_params: list of torch-layout (w_ih, w_hh, b_ih, b_hh) per
    direction. Returns y (D, T, B, H)."""
    from hop_tpu.ops.pallas_gru_fused import gru_fused_layer

    wih, bih, whh, bhh = [], [], [], []
    for g in range(3):
        sl = slice(g * h, (g + 1) * h)
        wih.append(jnp.stack([p[0][sl].T for p in dir_params]))   # (D,I,H)
        bih.append(jnp.stack([p[2][sl][None, :] for p in dir_params]))
        whh.append(jnp.stack([p[1][sl].T for p in dir_params]))   # (D,H,H)
        bhh.append(jnp.stack([p[3][sl][None, :] for p in dir_params]))
    wih = jnp.stack(wih, axis=1)     # (D, 3, I, H)
    bih = jnp.stack(bih, axis=1)     # (D, 3, 1, H)
    whh = jnp.stack(whh, axis=1)     # (D, 3, H, H)
    bhh = jnp.stack(bhh, axis=1)     # (D, 3, 1, H)
    B = x_tm.shape[1]
    h0 = jnp.zeros((B, h), x_tm.dtype)
    return gru_fused_layer(x_tm, wih, bih, whh, bhh, h0, interpret)


def _gru_layer_scan(x_proj: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray,
                    h0: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """One direction of one layer.

    x_proj: (B, T, 3H) precomputed input projection (+ b_ih already added)
    w_hh:   (3H, H) torch layout;  b_hh: (3H,);  h0: (B, H)
    Returns (B, T, H) hidden states.
    """
    from hop_tpu.parallel.mesh import constrain_batch
    w_hh_t = w_hh.T  # (H, 3H)

    def step(h, xp):
        # in-body constraints: the recurrence is data-parallel only (see
        # GRU.__call__) — without them the partitioner shards the gate
        # tensors over 'model' inside the while-loop
        hp = constrain_batch(h @ w_hh_t + b_hh)
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = constrain_batch((1.0 - z) * n + z * h)
        return h_new, h_new

    xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 3H)
    _, ys = jax.lax.scan(step, h0, xs, reverse=reverse, unroll=4)
    return jnp.swapaxes(ys, 0, 1)


def _bidir_layer_scan(x_proj_fw: jnp.ndarray, x_proj_bw: jnp.ndarray,
                      w_hh_fw: jnp.ndarray, b_hh_fw: jnp.ndarray,
                      w_hh_bw: jnp.ndarray, b_hh_bw: jnp.ndarray,
                      h0: jnp.ndarray) -> tuple:
    """Both directions in ONE scan: stack (fw, time-reversed bw) on batch.

    Halves the number of sequential matmuls vs two scans; the backward
    stream consumes the time-flipped sequence and its output is flipped
    back, which is exactly a reverse-direction recurrence.
    """
    x_bw_flipped = jnp.flip(x_proj_bw, axis=1)
    # every tensor in the scan keeps the explicit (D=2, B, ·) layout; a
    # flat (2B, ·) stack would need a reshape whose natural sharding
    # propagation ((2B)['data'] view of (2,B)) is NOT the axis-1 batch
    # pin — the partitioner then falls back to involuntary full
    # rematerialization collective-permutes every step (seen in sharded
    # eval of the seq2seq encoder; same class as MULTICHIP_r03)
    x_stacked = jnp.stack([x_proj_fw, x_bw_flipped])   # (2, B, T, 3H)
    w_stacked = jnp.stack([w_hh_fw.T, w_hh_bw.T])      # (2, H, 3H)
    b_stacked = jnp.stack([b_hh_fw, b_hh_bw])[:, None]  # (2, 1, 3H)

    from hop_tpu.parallel.mesh import constrain_batch

    def step(h, xp):
        # in-body constraints: pin the (D,B,·) gate tensors to the batch
        # axis only — this is what stops the partitioner sharding them
        # over 'model' inside the while-loop (MULTICHIP_r03)
        hp = constrain_batch(
            jnp.einsum("dbh,dhg->dbg", h, w_stacked), axis=1) + b_stacked
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = constrain_batch((1.0 - z) * n + z * h, axis=1)
        return h_new, h_new

    h0_stacked = jnp.stack([h0, h0])                   # (2, B, H)
    xs = jnp.moveaxis(x_stacked, 2, 0)                 # (T, 2, B, 3H)
    # unroll=4 amortises per-step scheduling overhead (~12% on v5e)
    _, ys = jax.lax.scan(step, h0_stacked, xs, unroll=4)
    ys = jnp.moveaxis(ys, 0, 2)                        # (2, B, T, H)
    y_fw = ys[0]
    y_bw = jnp.flip(ys[1], axis=1)
    return y_fw, y_bw


def torch_gru_uniform(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


class GRU(nn.Module):
    """torch.nn.GRU-compatible stack (batch_first semantics).

    Returns (outputs, last_hidden):
      outputs: (B, T, H) or (B, T, 2H) when bidirectional
      last_hidden: (num_layers * num_directions, B, H), torch ordering.
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout_rate: float = 0.0  # between layers, like torch.nn.GRU(dropout=)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 initial_hidden: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        batch = x.shape[0]
        h = self.hidden_size
        n_dir = 2 if self.bidirectional else 1
        init = torch_gru_uniform(1.0 / (h ** 0.5))

        # Pin the recurrence to data-parallel-only layouts: under a
        # (data, model) mesh XLA's propagation otherwise shards the scan's
        # (D,B,H) gate tensors over 'model' and pays involuntary full
        # rematerialization collective-permutes every step (see
        # parallel.mesh.constrain_batch; no-op without an ambient mesh).
        from hop_tpu.parallel.mesh import constrain_batch
        x = constrain_batch(x)

        if initial_hidden is None and _pallas_gru_enabled():
            return self._pallas_forward(x, deterministic)

        layer_in = x.astype(self.dtype)
        last_hiddens = []
        for layer in range(self.num_layers):
            if layer > 0 and self.dropout_rate > 0.0:
                layer_in = nn.Dropout(self.dropout_rate)(
                    layer_in, deterministic=deterministic)
            in_dim = layer_in.shape[-1]
            suffix = f"_l{layer}"
            w_ih = self.param(f"w_ih{suffix}", init, (3 * h, in_dim))
            w_hh = self.param(f"w_hh{suffix}", init, (3 * h, h))
            b_ih = self.param(f"b_ih{suffix}", init, (3 * h,))
            b_hh = self.param(f"b_hh{suffix}", init, (3 * h,))

            if initial_hidden is not None:
                h0_fw = initial_hidden[layer * n_dir]
            else:
                h0_fw = jnp.zeros((batch, h), self.dtype)

            x_proj = layer_in @ w_ih.T + b_ih  # (B, T, 3H): bulk MXU work

            if self.bidirectional:
                w_ih_r = self.param(f"w_ih{suffix}_reverse", init, (3 * h, in_dim))
                w_hh_r = self.param(f"w_hh{suffix}_reverse", init, (3 * h, h))
                b_ih_r = self.param(f"b_ih{suffix}_reverse", init, (3 * h,))
                b_hh_r = self.param(f"b_hh{suffix}_reverse", init, (3 * h,))
                if initial_hidden is not None:
                    h0_bw = initial_hidden[layer * n_dir + 1]
                else:
                    h0_bw = jnp.zeros((batch, h), self.dtype)
                x_proj_r = layer_in @ w_ih_r.T + b_ih_r
                if (h0_fw is h0_bw) or initial_hidden is None:
                    y_fw, y_bw = _bidir_layer_scan(
                        x_proj, x_proj_r, w_hh, b_hh, w_hh_r, b_hh_r, h0_fw)
                else:
                    y_fw = _gru_layer_scan(x_proj, w_hh, b_hh, h0_fw, False)
                    y_bw = _gru_layer_scan(x_proj_r, w_hh_r, b_hh_r, h0_bw, True)
                layer_in = jnp.concatenate([y_fw, y_bw], axis=-1)
                last_hiddens.append(y_fw[:, -1])
                last_hiddens.append(y_bw[:, 0])
            else:
                y = _gru_layer_scan(x_proj, w_hh, b_hh, h0_fw, False)
                layer_in = y
                last_hiddens.append(y[:, -1])
            layer_in = constrain_batch(layer_in)

        return layer_in, jnp.stack(last_hiddens, axis=0)

    def _pallas_forward(self, x: jnp.ndarray, deterministic: bool):
        # plain helper (runs inside __call__'s compact context; a second
        # @nn.compact method is not allowed). Declares the SAME param
        # names/shapes as the scan branch, so checkpoints are
        # interchangeable between the two implementations/platforms.
        """Whole stack through the fused time-grid kernel, keeping every
        inter-layer activation time-major (T, B, F) — one transpose in,
        one out, zero per-gate relayouts."""
        batch = x.shape[0]
        h = self.hidden_size
        init = torch_gru_uniform(1.0 / (h ** 0.5))
        h0 = jnp.zeros((batch, h), self.dtype)

        x_tm = jnp.swapaxes(x.astype(self.dtype), 0, 1)
        last_hiddens = []
        for layer in range(self.num_layers):
            if layer > 0 and self.dropout_rate > 0.0:
                x_tm = nn.Dropout(self.dropout_rate)(
                    x_tm, deterministic=deterministic)
            in_dim = x_tm.shape[-1]
            suffix = f"_l{layer}"
            dir_params = [
                (self.param(f"w_ih{suffix}", init, (3 * h, in_dim)),
                 self.param(f"w_hh{suffix}", init, (3 * h, h)),
                 self.param(f"b_ih{suffix}", init, (3 * h,)),
                 self.param(f"b_hh{suffix}", init, (3 * h,)))]
            if self.bidirectional:
                dir_params.append(
                    (self.param(f"w_ih{suffix}_reverse", init,
                                (3 * h, in_dim)),
                     self.param(f"w_hh{suffix}_reverse", init, (3 * h, h)),
                     self.param(f"b_ih{suffix}_reverse", init, (3 * h,)),
                     self.param(f"b_hh{suffix}_reverse", init, (3 * h,))))
            mode = _pallas_gru_enabled()
            if mode in ("fused", "interpret-fused"):
                y = _fused_layer_tm(x_tm, dir_params, h,
                                    interpret=mode == "interpret-fused")
            else:
                y = _pallas_layer_tm(x_tm, dir_params, h0, h,
                                     interpret=mode == "interpret")
            if self.bidirectional:
                x_tm = jnp.concatenate([y[0], y[1]], axis=-1)
                last_hiddens.append(y[0, -1])
                last_hiddens.append(y[1, 0])
            else:
                x_tm = y[0]
                last_hiddens.append(y[0, -1])
        return (jnp.swapaxes(x_tm, 0, 1),
                jnp.stack(last_hiddens, axis=0))


class GRUCell(nn.Module):
    """Single-step GRU cell (torch layout) for autoregressive decoders."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        hdim = self.hidden_size
        scale = 1.0 / (hdim ** 0.5)
        init = torch_gru_uniform(scale)
        w_ih = self.param("w_ih", init, (3 * hdim, x.shape[-1]))
        w_hh = self.param("w_hh", init, (3 * hdim, hdim))
        b_ih = self.param("b_ih", init, (3 * hdim,))
        b_hh = self.param("b_hh", init, (3 * hdim,))
        xp = x @ w_ih.T + b_ih
        hp = h @ w_hh.T + b_hh
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h
