"""Fused multi-head attention Pallas kernel for the frozen backbone.

STATUS: measured LOSER at the HOP shape — kept OFF by default as an
engineering record (same policy as ops/pallas_gru.py). The hypothesis was
that XLA's (B, H, 34, 34) attention-probability relayouts between the
softmax fusion and probs@V (~0.11 ms per layer per direction in the
round-2 parity-step trace) could be eliminated by keeping probabilities
in VMEM. Measured on v5e (2026-08-17, bench.py full-step rates — the
only timing trustworthy through the axon relay): with the kernel
enabled the parity GAN step REGRESSES 11.45→11.05 steps/s and the fused
step 15.95→15.53, reproducibly across runs. At T=34 the per-head
matmuls pad 34→40 sublanes and
64→128 lanes, so MXU utilisation is poor, and the in-kernel (0,2,1,3)
transposes cost more than the relayouts they replace. XLA's fused
attention wins at this shape; the kernel would only pay at much longer
sequence lengths than this model ever uses.

Design (kept for reference): one `pallas_call` per attention (and one
for its backward via custom VJP), blocks laid out exactly as the
surrounding network produces them ((B, T, H, D), straight from the QKV
dense reshape — no relayout on either side).

Design (see /opt/skills/guides/pallas_guide.md):
  * grid over the batch only; each program loads a (NB, T, H, D) slab of
    q/k/v and computes all heads with a two-batch-dim `dot_general`
    ((b-block, h) batched, D contracted) — transposes happen on VMEM
    registers, never through HBM;
  * softmax in f32 regardless of the input dtype (the XLA bf16 path
    softmaxes in bf16; f32 here is strictly more accurate);
  * attention dropout (the reference trains with p=0.1, HOP.py:266) is
    generated IN-KERNEL with the TPU PRNG, seeded per (call, program) —
    the backward kernel reseeds identically and regenerates the same
    mask, so nothing but q/k/v needs to be saved;
  * backward recomputes scores/probs (cheap at T=34) and emits dq/dk/dv
    in the same (B, T, H, D) layout.

Numerics: without dropout the kernel matches the jnp reference to f32
tolerance (tests/test_pallas_attention.py, interpret mode on CPU). The
dropout mask stream differs from flax's threefry Dropout — same rate,
independent Bernoulli, documented implementation detail of the TPU path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return os.environ.get("HOP_TPU_PALLAS_ATTN", "1") == "interpret"


def pallas_attention_enabled() -> bool:
    """Default OFF — the kernel measures slower than XLA's fused
    attention at the HOP shape (see module docstring). Set
    HOP_TPU_PALLAS_ATTN=1 to opt in on TPU, =interpret to run the
    kernel in interpreter mode (CPU tests)."""
    flag = os.environ.get("HOP_TPU_PALLAS_ATTN", "0")
    if flag == "interpret":
        return True
    if flag != "1":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _random_bits(shape, seed_scalar, interpret=None):
    """uint32 bits: hardware PRNG on TPU; a deterministic integer hash in
    interpret mode (pltpu.prng_* is NotImplemented there) — the interpret
    stream differs from the TPU stream, which only matters for tests."""
    if _interpret() if interpret is None else interpret:
        x = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
        for d in range(len(shape) - 1):
            x = x + jax.lax.broadcasted_iota(jnp.uint32, shape, d) \
                * jnp.uint32(2654435761 + 40503 * d)
        x = x + seed_scalar.astype(jnp.uint32) * jnp.uint32(2246822519)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(2246822519)
        x = x ^ (x >> 13)
        x = x * jnp.uint32(3266489917)
        return x ^ (x >> 16)
    pltpu.prng_seed(seed_scalar)
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _keep_mask(shape, rate: float, seed_scalar, interpret=None):
    """Bernoulli(1-rate) keep mask from the in-kernel PRNG."""
    bits = _random_bits(shape, seed_scalar, interpret)
    threshold = jnp.uint32(int(rate * 2 ** 32))
    return (bits >= threshold).astype(jnp.float32)


def _to_xtd(a):
    """(NB, T, H, D) VMEM block -> (NB*H, T, D); Mosaic's matmul supports
    a single batch dim, so the (block, head) pair is merged up front (all
    relayout happens on-chip)."""
    nb, t, h, d = a.shape
    return jnp.transpose(a, (0, 2, 1, 3)).reshape(nb * h, t, d)


def _from_xtd(a, nb):
    x, t, d = a.shape
    return jnp.transpose(a.reshape(nb, x // nb, t, d), (0, 2, 1, 3))


def _bdot(a, b, contract_a, contract_b):
    """Single-batch-dim (axis 0) dot_general with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _probs(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale, rate):
    nb = q_ref.shape[0]
    q, k, v = _to_xtd(q_ref[:]), _to_xtd(k_ref[:]), _to_xtd(v_ref[:])
    p = _probs(_bdot(q, k, 2, 2) * scale)                  # (X,Tq,Tk) f32
    if rate > 0.0:
        seed_scalar = seed_ref[0] + pl.program_id(0)
        p = p * _keep_mask(p.shape, rate, seed_scalar) * (1.0 / (1.0 - rate))
    o = _bdot(p.astype(v.dtype), v, 2, 1)                  # (X,Tq,D)
    o_ref[:] = _from_xtd(o, nb).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, rate):
    nb = q_ref.shape[0]
    q, k, v = _to_xtd(q_ref[:]), _to_xtd(k_ref[:]), _to_xtd(v_ref[:])
    do = _to_xtd(do_ref[:])
    p = _probs(_bdot(q, k, 2, 2) * scale)                  # (X,Tq,Tk) f32
    if rate > 0.0:
        seed_scalar = seed_ref[0] + pl.program_id(0)
        mask = _keep_mask(p.shape, rate, seed_scalar) * (1.0 / (1.0 - rate))
        pd = p * mask
    else:
        pd = p
    # dv[x,tk,d] = sum_tq pd[x,tq,tk] * do[x,tq,d]
    dv = _bdot(jnp.swapaxes(pd, 1, 2).astype(do.dtype), do, 2, 1)
    dv_ref[:] = _from_xtd(dv, nb).astype(dv_ref.dtype)
    # dpd[x,tq,tk] = sum_d do[x,tq,d] * v[x,tk,d]
    dpd = _bdot(do, v, 2, 2)
    dp = dpd * mask if rate > 0.0 else dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(q.dtype)
    dq = _bdot(ds, k, 2, 1)                                # (X,Tq,D)
    dq_ref[:] = _from_xtd(dq, nb).astype(dq_ref.dtype)
    dk = _bdot(jnp.swapaxes(ds, 1, 2), q, 2, 1)            # (X,Tk,D)
    dk_ref[:] = _from_xtd(dk, nb).astype(dk_ref.dtype)


def _block_size(B: int) -> int:
    for nb in (8, 4, 2, 1):
        if B % nb == 0:
            return nb
    return 1


def _specs(B, T, H, D, nb, n_tensors):
    spec = pl.BlockSpec((nb, T, H, D), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return [seed_spec] + [spec] * n_tensors, spec


def _compiler_params():
    """The (X, T, T) f32 score/prob intermediates are stack-allocated in
    scoped vmem; at nb=8 the backward needs ~36 MB, over the 16 MB default
    scoped limit — raise it (v5e has 128 MB physical VMEM; block buffers
    stay small so the total fits comfortably)."""
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q, k, v, seed, scale: float, rate: float):
    """softmax(q k^T * scale) [dropout(rate)] v, all heads fused.

    q, k, v: (B, T, H, D); returns (B, T, H, D). `seed` is a traced (1,)
    int32 folded with the grid position for the dropout stream (ignored
    when rate == 0); the backward regenerates the identical mask from it.
    """
    return _attention_fwd_call(q, k, v, seed, scale, rate)


def _attention_fwd_call(q, k, v, seed, scale, rate):
    B, T, H, D = q.shape
    nb = _block_size(B)
    in_specs, out_spec = _specs(B, T, H, D, nb, 3)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate),
        grid=(B // nb,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, H, D), q.dtype),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(seed, q, k, v)


def _attention_fwd(q, k, v, seed, scale, rate):
    return _attention_fwd_call(q, k, v, seed, scale, rate), (q, k, v, seed)


def _attention_bwd(scale, rate, residuals, g):
    import numpy as np
    q, k, v, seed = residuals
    B, T, H, D = q.shape
    nb = _block_size(B)
    in_specs, out_spec = _specs(B, T, H, D, nb, 4)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate),
        grid=(B // nb,),
        in_specs=in_specs,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, T, H, D), q.dtype)] * 3,
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(seed, q, k, v, g.astype(q.dtype))
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dseed


fused_attention.defvjp(_attention_fwd, _attention_bwd)
