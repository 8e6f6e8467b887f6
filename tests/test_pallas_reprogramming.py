"""Flash reprogramming-attention Pallas kernel vs the jnp einsum
reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("HOP_TPU_PALLAS_REPROG", "interpret")


def _ref_attention(q, k, v, scale):
    """q (B,L,H,E); k,v (H,S,E) — the reference einsum path
    (reprogramming.py XLA branch, with k/v pre-transposed)."""
    s = jnp.einsum("blhe,hse->bhls", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhls,hse->blhe", p, v.astype(jnp.float32))


def _inputs(B=4, L=34, H=8, E=128, S=100, seed=0, dtype=jnp.float32):
    r = np.random.default_rng(seed)
    q = jnp.asarray(r.standard_normal((B, L, H, E)), dtype)
    k = jnp.asarray(r.standard_normal((H, S, E)), dtype)
    v = jnp.asarray(r.standard_normal((H, S, E)), dtype)
    return q, k, v


def test_forward_matches_reference():
    from hop_tpu.ops.pallas_reprogramming import fused_reprogramming_attention
    q, k, v = _inputs()
    scale = 1.0 / 128 ** 0.5
    out = fused_reprogramming_attention(q, k, v,
                                        jnp.asarray([3], jnp.int32),
                                        scale, 0.0)
    want = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_odd_batch_block():
    from hop_tpu.ops.pallas_reprogramming import fused_reprogramming_attention
    q, k, v = _inputs(B=6, S=37)   # block size falls back to 2; odd S
    out = fused_reprogramming_attention(q, k, v,
                                        jnp.asarray([0], jnp.int32),
                                        0.125, 0.0)
    want = _ref_attention(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    """dq, dk, dv including the cross-block dk/dv accumulation (B=4 with
    block 4 -> exercise via B=6/block 2 too)."""
    from hop_tpu.ops.pallas_reprogramming import fused_reprogramming_attention
    for B, S in ((4, 64), (6, 37)):
        q, k, v = _inputs(B=B, S=S, seed=B)
        scale = 0.125
        seed = jnp.asarray([7], jnp.int32)
        tgt = jnp.asarray(
            np.random.default_rng(1).standard_normal(q.shape), jnp.float32)

        def loss_pallas(q, k, v):
            return jnp.sum(
                (fused_reprogramming_attention(q, k, v, seed, scale, 0.0)
                 - tgt) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum((_ref_attention(q, k, v, scale) - tgt) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gp, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"B={B} d{name}")


def test_dropout_determinism_and_rate():
    from hop_tpu.ops.pallas_reprogramming import fused_reprogramming_attention
    q, k, v = _inputs(B=4, S=64, seed=2)
    s1 = jnp.asarray([11], jnp.int32)
    s2 = jnp.asarray([12], jnp.int32)
    a = fused_reprogramming_attention(q, k, v, s1, 0.125, 0.5)
    b = fused_reprogramming_attention(q, k, v, s1, 0.125, 0.5)
    c = fused_reprogramming_attention(q, k, v, s2, 0.125, 0.5)
    d = fused_reprogramming_attention(q, k, v, s1, 0.125, 0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert not np.allclose(np.asarray(a), np.asarray(d))
    # inverted scaling keeps the mean roughly unbiased
    assert np.abs(np.asarray(a).mean() - np.asarray(d).mean()) < 0.05


def test_dropout_backward_reuses_mask():
    """out is LINEAR in v for a fixed mask, so with a linear loss the
    directional finite difference equals the VJP to float precision —
    a re-drawn backward mask would be off by ~the dropout rate."""
    from hop_tpu.ops.pallas_reprogramming import fused_reprogramming_attention
    q, k, v = _inputs(B=2, S=48, seed=3)
    seed = jnp.asarray([5], jnp.int32)
    w = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, 34, 8, 128)), jnp.float32)

    def loss(v):
        return jnp.sum(
            fused_reprogramming_attention(q, k, v, seed, 0.125, 0.3) * w)

    g = jax.grad(loss)(v)
    dv = jnp.asarray(np.random.default_rng(4).standard_normal(v.shape),
                     jnp.float32)
    fd = float(loss(v + dv) - loss(v - dv)) / 2.0
    vjp = float(jnp.sum(g * dv))
    assert fd == pytest.approx(vjp, rel=1e-3)


def test_layer_matches_xla_path(monkeypatch):
    """The wired-in kernel (interpret) reproduces the einsum path through
    the full ReprogrammingLayer, eval mode."""
    from hop_tpu.models.reprogramming import ReprogrammingLayer

    layer = ReprogrammingLayer(d_model=128, n_heads=8, d_keys=128,
                               d_llm=768)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((2, 34, 128)), jnp.float32)
    src = jnp.asarray(r.standard_normal((100, 768)), jnp.float32)
    monkeypatch.setenv("HOP_TPU_PALLAS_REPROG", "0")
    variables = layer.init(jax.random.PRNGKey(0), x, src, src, True)
    want = layer.apply(variables, x, src, src, True)
    monkeypatch.setenv("HOP_TPU_PALLAS_REPROG", "interpret")
    got = layer.apply(variables, x, src, src, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
