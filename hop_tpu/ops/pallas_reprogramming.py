"""Flash-style Pallas kernel for the reprogramming cross-attention.

The hot spot it removes (round-3 parity-step device trace): the layer's
`blhe,she->bhls` / `bhls,she->blhe` einsums at (B=256, H=8, L=34,
S=1500, E=128) materialise the (B, H, L, S) score/probability tensor —
139 MB in f32 — in HBM between the QK^T fusion, the softmax, the
dropout and the probs@V matmul. Four such ops cost ~9.2 ms/step and the
layer ~16.2 ms of the 86 ms parity step (reprogramming.py:43-47 lines
in the trace).

The shape is ideal for a single-pass flash kernel, better than standard
self-attention:
  * keys/values are the S=1500 PROTOTYPE embeddings (HOP.py:255-299) —
    shared across the batch, so the full (H, S, E) K and V (3 MB each in
    bf16) sit resident in VMEM while the grid walks batch blocks;
  * per head, (block*L, E) @ (E, S) is one well-tiled MXU matmul
    (M=NB*34, K=128, N=1500) — no online-softmax passes needed because a
    head's full (NB*L, S) score slab fits in VMEM in f32;
  * probabilities never touch HBM; softmax runs in f32 (XLA's bf16 path
    softmaxes the scores after a bf16 matmul — f32 here is strictly more
    accurate);
  * attention dropout (reference trains with p=0.1, HOP.py:266) is drawn
    IN-KERNEL from the TPU PRNG per (call, block, head); the backward
    reseeds identically and regenerates the mask, so only q/k/v are
    saved — the dropout mask stream differs from flax's threefry
    Dropout (same rate, independent Bernoulli), a documented
    implementation detail of the TPU path;
  * the backward recomputes probs (cheap: the fwd matmul again) and
    accumulates dk/dv across batch blocks in a VMEM-resident f32
    accumulator (constant out index_map — TPU grids run sequentially).

Numerics: without dropout the kernel matches the jnp einsum reference to
f32 tolerance in interpret mode (tests/test_pallas_reprogramming.py); on
TPU the wrapper feeds bf16 operands, mirroring XLA's DEFAULT matmul
precision on the path it replaces, with f32 softmax and accumulation.

Measured on v5e (bench.py full-step rates, bs256, 2026-08-17): parity
GAN step 11.45 -> 13.04 steps/s, fused 15.82 -> 18.46 steps/s.
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
    return os.environ.get("HOP_TPU_PALLAS_REPROG", "1") == "interpret"


def reprogramming_attention_enabled() -> bool:
    """Default ON on TPU; HOP_TPU_PALLAS_REPROG=0 opts out, =interpret
    runs the kernel in interpreter mode (CPU tests)."""
    flag = os.environ.get("HOP_TPU_PALLAS_REPROG", "1")
    if flag == "0":
        return False
    if flag == "interpret":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _compiler_params():
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def operand_dtype(dtype):
    """On real TPU the wrapper feeds bf16 operands (mirroring XLA's
    DEFAULT matmul precision on the einsum path this kernel replaces);
    interpret mode keeps the incoming dtype so CPU tests are exact."""
    return dtype if _interpret() else jnp.bfloat16


def seed_from_key(key):
    """(1,) int32 dropout seed from a flax rng key (typed or raw)."""
    data = (jax.random.key_data(key)
            if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key)
    return data.reshape(-1)[:1].astype(jnp.int32)


def _probs(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _to_heads(block_ref):
    """(nb, L, H, E) VMEM block -> (H, nb*L, E), one on-chip relayout per
    program so the per-head matmuls read contiguous rows instead of
    sublane-strided head slices."""
    nb, L, H, E = block_ref.shape
    return jnp.transpose(block_ref[:].reshape(nb * L, H, E), (1, 0, 2))


def _head_seed(seed_ref, h: int, n_heads: int):
    return seed_ref[0] + pl.program_id(0) * n_heads + h


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale, rate):
    nb, L, H, E = q_ref.shape
    q = _to_heads(q_ref)                                     # (H, nb*L, E)
    outs = []
    for h in range(H):
        s = jax.lax.dot_general(
            q[h], k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (nb*L, S) f32
        p = _probs(s)
        if rate > 0.0:
            mask = _keep_mask(p.shape, rate, _head_seed(seed_ref, h, H),
                              _interpret()) / (1.0 - rate)
            p = p * mask
        outs.append(jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))             # (nb*L, E)
    o = jnp.stack(outs, axis=1)                              # (nb*L, H, E)
    o_ref[:] = o.reshape(nb, L, H, E).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, rate):
    nb, L, H, E = q_ref.shape
    first = pl.program_id(0) == 0
    q = _to_heads(q_ref)                                     # (H, nb*L, E)
    do = _to_heads(do_ref).astype(q.dtype)
    dqs = []
    for h in range(H):
        s = jax.lax.dot_general(
            q[h], k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = _probs(s)                                        # (nb*L, S) f32
        if rate > 0.0:
            mask = _keep_mask(p.shape, rate, _head_seed(seed_ref, h, H),
                              _interpret()) / (1.0 - rate)
            pd = p * mask
        else:
            pd = p
        # dv[s, e] += pd^T @ do
        dvh = jax.lax.dot_general(
            pd.astype(do.dtype), do[h], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (S, E)
        # dpd = do @ v^T; softmax backward on the PRE-dropout probs
        dpd = jax.lax.dot_general(
            do[h], v_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (nb*L, S)
        dp = dpd * mask if rate > 0.0 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(q.dtype)
        dqs.append(jax.lax.dot_general(
            ds, k_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))             # (nb*L, E)
        dkh = jax.lax.dot_general(
            ds, q[h], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (S, E)

        @pl.when(first)
        def _():
            dk_ref[h] = dkh
            dv_ref[h] = dvh

        @pl.when(jnp.logical_not(first))
        def _():
            dk_ref[h] += dkh
            dv_ref[h] += dvh

    dq = jnp.stack(dqs, axis=1)                              # (nb*L, H, E)
    dq_ref[:] = dq.reshape(nb, L, H, E)


def _block_size(B: int) -> int:
    for nb in (8, 4, 2, 1):
        if B % nb == 0:
            return nb
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_reprogramming_attention(q, k, v, seed, scale: float, rate: float):
    """softmax(q k^T * scale) [dropout(rate)] v over shared prototypes.

    q: (B, L, H, E); k, v: (H, S, E) shared across the batch; returns
    (B, L, H, E) f32. `seed` is a traced (1,) int32 folded with the grid
    position and head for the dropout stream (ignored when rate == 0).
    """
    return _fwd_call(q, k, v, seed, scale, rate)


def _specs(B, L, H, E, S, nb):
    qspec = pl.BlockSpec((nb, L, H, E), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((H, S, E), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return seed_spec, qspec, kvspec


def _fwd_call(q, k, v, seed, scale, rate):
    B, L, H, E = q.shape
    S = k.shape[1]
    nb = _block_size(B)
    seed_spec, qspec, kvspec = _specs(B, L, H, E, S, nb)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate),
        grid=(B // nb,),
        in_specs=[seed_spec, qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, L, H, E), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(seed, q, k, v)


def _fwd_rule(q, k, v, seed, scale, rate):
    return _fwd_call(q, k, v, seed, scale, rate), (q, k, v, seed)


def _bwd_rule(scale, rate, residuals, g):
    import numpy as np
    q, k, v, seed = residuals
    B, L, H, E = q.shape
    S = k.shape[1]
    nb = _block_size(B)
    seed_spec, qspec, kvspec = _specs(B, L, H, E, S, nb)
    kvspec_f32 = pl.BlockSpec((H, S, E), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate),
        grid=(B // nb,),
        in_specs=[seed_spec, qspec, kvspec, kvspec, qspec],
        out_specs=[pl.BlockSpec((nb, L, H, E), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   kvspec_f32, kvspec_f32],
        out_shape=[jax.ShapeDtypeStruct((B, L, H, E), jnp.float32),
                   jax.ShapeDtypeStruct((H, S, E), jnp.float32),
                   jax.ShapeDtypeStruct((H, S, E), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(seed, q, k, v, g.astype(q.dtype))
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dseed)


fused_reprogramming_attention.defvjp(_fwd_rule, _bwd_rule)
