"""Block-diagonal Pallas attention for the frozen backbone (v2).

STATUS: measured LOSER at the HOP shape, like v1 — kept OFF by default
as an engineering record. Measured on v5e (2026-08-17): standalone at
(B=256, T=34, H=12, D=64) bf16 the kernel is 2.50 ms fwd / 4.21 ms
fwd+bwd vs XLA's 2.09 / 2.18, and bench.py full-step rates regress
(parity 12.87 -> 11.29, fused 18.11 -> 16.04 steps/s). The big-matmul
restructuring works (the MXU part is ~0.1 ms), but the masked softmax
does NB x more VPU work (exp/max/sum over the full (272, 272) matrix
where XLA touches only the real (34, 34) scores), and the in-VMEM
(nb*T, H, D) -> (H, nb*T, D) head transposes cost more than the XLA
layout copies they replace. Conclusion recorded for future shapes: the
block-diagonal trick pays when the per-sample matmul is MXU-starved AND
softmax is not the bottleneck — at T=34 with H*D=768 the whole attention
is so small that XLA's fused path is already near the floor.

Why v1 lost and v2 was attempted: self-attention at the HOP shape has no
large matmul — per-(batch, head) score matmuls are 34x64 @ 64x34, which
pad to a fraction of the 128x128 MXU, and the v1 kernel
(ops/pallas_attention.py) spent more on in-kernel relayouts than the XLA
copies it removed. v2 restructures the math so the MXU sees one big
matmul per head:

  * a grid program loads a (NB, T, H, D) slab and flattens NB x T into a
    single M = NB*34 = 272 row dimension;
  * per head, scores = (272, 64) @ (64, 272) — one well-tiled MXU
    matmul that also computes CROSS-sample products;
  * a static block-diagonal mask (row // T == col // T) sets the
    cross-sample scores to -inf before the f32 softmax, so their
    probabilities are exactly zero and probs @ V yields the correct
    per-sample context — full MXU utilisation in exchange for NB x more
    attention FLOPs (~7 GFLOP/step, noise at this model's 6.5 TF/step);
  * probabilities never leave VMEM; XLA's path round-trips four
    (B, 12, 34, 34) tensors per layer through HBM with layout copies
    (~1 ms/layer fwd+bwd in the round-3 trace);
  * attention dropout (active in steady-state epochs; the reference's
    backbone is flipped to train mode by evaluate_testset's
    model.train(True), Evaluate.py:290) is drawn IN-KERNEL from the TPU
    PRNG per (call, block, head); the backward reseeds identically and
    regenerates the mask, so only q/k/v are saved. Dropout on the
    masked full matrix is safe: zero probabilities stay zero under
    mask-and-scale. The stream differs from flax's threefry Dropout
    (same rate, independent Bernoulli) — a documented implementation
    detail of the TPU path, same policy as ops/pallas_reprogramming.py;
  * the backward recomputes probs (one extra fwd matmul) and emits
    dq/dk/dv in the incoming (NB, T, H, D) layout; each grid block owns
    its output rows, so there is no cross-block accumulation.

Counterpart of the torch reference's BertSelfAttention use inside the
frozen LLM (run_ted.py:177-196; transformers sdpa at T=34).

Numerics: without dropout the kernel matches the jnp einsum reference to
f32 tolerance in interpret mode (tests/test_pallas_block_attention.py);
on TPU the wrapper feeds bf16 operands, mirroring XLA's DEFAULT matmul
precision on the path it replaces, with f32 softmax and accumulation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hop_tpu.ops.pallas_attention import _keep_mask


def _interpret() -> bool:
    return os.environ.get("HOP_TPU_PALLAS_BLOCK_ATTN", "1") == "interpret"


def block_attention_enabled() -> bool:
    """Default OFF — the kernel measures slower than XLA's fused
    attention at the HOP shape (see module docstring). Set
    HOP_TPU_PALLAS_BLOCK_ATTN=1 to opt in on TPU, =interpret to run the
    kernel in interpreter mode (CPU tests)."""
    flag = os.environ.get("HOP_TPU_PALLAS_BLOCK_ATTN", "0")
    if flag == "interpret":
        return True
    if flag != "1":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def operand_dtype(dtype):
    return dtype if _interpret() else jnp.bfloat16


def _compiler_params():
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _block_mask(nb: int, T: int):
    """(nb*T, nb*T) bool: True where row and col belong to the same
    sample. Built from iota comparisons (static at trace time)."""
    M = nb * T
    row = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    return (row // T) == (col // T)


def _probs(s, mask):
    s = jnp.where(mask, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _to_heads(block_ref):
    """(nb, T, H, D) VMEM block -> (H, nb*T, D)."""
    nb, T, H, D = block_ref.shape
    return jnp.transpose(block_ref[:].reshape(nb * T, H, D), (1, 0, 2))


def _head_seed(seed_ref, h: int, n_heads: int):
    return seed_ref[0] + pl.program_id(0) * n_heads + h


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale, rate):
    nb, T, H, D = q_ref.shape
    mask = _block_mask(nb, T)
    q = _to_heads(q_ref)
    k = _to_heads(k_ref)
    v = _to_heads(v_ref)
    outs = []
    for h in range(H):
        s = jax.lax.dot_general(
            q[h], k[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (M, M) f32
        p = _probs(s, mask)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, _head_seed(seed_ref, h, H),
                              _interpret()) / (1.0 - rate)
            p = p * keep
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))           # (M, D)
    o = jnp.stack(outs, axis=1)                            # (M, H, D)
    o_ref[:] = o.reshape(nb, T, H, D).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, rate):
    nb, T, H, D = q_ref.shape
    mask = _block_mask(nb, T)
    q = _to_heads(q_ref)
    k = _to_heads(k_ref)
    v = _to_heads(v_ref)
    do = _to_heads(do_ref).astype(q.dtype)
    dqs, dks, dvs = [], [], []
    for h in range(H):
        s = jax.lax.dot_general(
            q[h], k[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = _probs(s, mask)                                # (M, M) f32
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, _head_seed(seed_ref, h, H),
                              _interpret()) / (1.0 - rate)
            pd = p * keep
        else:
            pd = p
        dvs.append(jax.lax.dot_general(
            pd.astype(do.dtype), do[h], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))           # (M, D)
        dpd = jax.lax.dot_general(
            do[h], v[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (M, M)
        dp = dpd * keep if rate > 0.0 else dpd
        # softmax backward on the pre-dropout probs; cross-sample entries
        # have p == 0 so they contribute nothing
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(q.dtype)
        dqs.append(jax.lax.dot_general(
            ds, k[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))           # (M, D)
        dks.append(jax.lax.dot_general(
            ds, q[h], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))           # (M, D)
    def pack(ts):
        return jnp.stack(ts, axis=1).reshape(nb, T, H, D)
    dq_ref[:] = pack(dqs)
    dk_ref[:] = pack(dks)
    dv_ref[:] = pack(dvs)


def _block_size(B: int) -> int:
    for nb in (8, 4, 2, 1):
        if B % nb == 0:
            return nb
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def block_attention(q, k, v, seed, scale: float, rate: float):
    """Per-sample softmax(q k^T * scale) [dropout(rate)] v.

    q, k, v: (B, T, H, D); returns (B, T, H, D) f32. `seed` is a traced
    (1,) int32 folded with the grid position and head for the dropout
    stream (ignored when rate == 0).
    """
    return _fwd_call(q, k, v, seed, scale, rate)


def _specs(B, T, H, D, nb):
    spec = pl.BlockSpec((nb, T, H, D), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return seed_spec, spec


def _fwd_call(q, k, v, seed, scale, rate):
    B, T, H, D = q.shape
    nb = _block_size(B)
    seed_spec, spec = _specs(B, T, H, D, nb)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate),
        grid=(B // nb,),
        in_specs=[seed_spec, spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, T, H, D), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(seed, q, k, v)


def _fwd_rule(q, k, v, seed, scale, rate):
    return _fwd_call(q, k, v, seed, scale, rate), (q, k, v, seed)


def _bwd_rule(scale, rate, residuals, g):
    import numpy as np
    q, k, v, seed = residuals
    B, T, H, D = q.shape
    nb = _block_size(B)
    seed_spec, spec = _specs(B, T, H, D, nb)
    spec_f32 = pl.BlockSpec((nb, T, H, D), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate),
        grid=(B // nb,),
        in_specs=[seed_spec, spec, spec, spec, spec],
        out_specs=[spec_f32, spec_f32, spec_f32],
        out_shape=[jax.ShapeDtypeStruct((B, T, H, D), jnp.float32)] * 3,
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(seed, q, k, v, g.astype(q.dtype))
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dseed)


block_attention.defvjp(_fwd_rule, _bwd_rule)
