"""Fused attention Pallas kernel vs the jnp reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("HOP_TPU_PALLAS_ATTN", "interpret")


def _ref_attention(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


def _inputs(B=4, T=34, H=12, D=64, seed=0, dtype=jnp.float32):
    r = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(r.standard_normal((B, T, H, D)), dtype)
    return mk(), mk(), mk()


def test_forward_matches_reference():
    from hop_tpu.ops.pallas_attention import fused_attention
    q, k, v = _inputs()
    scale = 1.0 / 8.0
    out = fused_attention(q, k, v, jnp.asarray([3], jnp.int32), scale, 0.0)
    want = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_odd_batch_block():
    from hop_tpu.ops.pallas_attention import fused_attention
    q, k, v = _inputs(B=6)  # block size falls back to 2
    out = fused_attention(q, k, v, jnp.asarray([0], jnp.int32), 0.125, 0.0)
    want = _ref_attention(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    from hop_tpu.ops.pallas_attention import fused_attention
    q, k, v = _inputs(B=2)
    scale = 0.125
    seed = jnp.asarray([7], jnp.int32)
    tgt = jnp.asarray(np.random.default_rng(1).standard_normal(q.shape),
                      jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum((fused_attention(q, k, v, seed, scale, 0.0) - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((_ref_attention(q, k, v, scale) - tgt) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_dropout_statistics_and_determinism():
    from hop_tpu.ops.pallas_attention import fused_attention
    q, k, v = _inputs(B=4, seed=2)
    # with v == identity-ish rows we can't directly see the mask; instead
    # check determinism (same seed -> same output; different seed ->
    # different) and that rate=0.5 output differs from rate=0
    s1 = jnp.asarray([11], jnp.int32)
    s2 = jnp.asarray([12], jnp.int32)
    a = fused_attention(q, k, v, s1, 0.125, 0.5)
    b = fused_attention(q, k, v, s1, 0.125, 0.5)
    c = fused_attention(q, k, v, s2, 0.125, 0.5)
    d = fused_attention(q, k, v, s1, 0.125, 0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert not np.allclose(np.asarray(a), np.asarray(d))
    # dropout keeps the output mean roughly unbiased (inverted scaling)
    assert np.abs(np.asarray(a).mean() - np.asarray(d).mean()) < 0.05


def test_dropout_backward_uses_same_mask():
    """grad through the dropout path must reuse the forward mask. The
    output is LINEAR in v for a fixed mask (out = dropout(probs) @ v and
    probs don't depend on v), so with a linear loss the directional
    finite difference equals the VJP to float precision — a re-drawn or
    stale backward mask would be off by ~the dropout rate."""
    from hop_tpu.ops.pallas_attention import fused_attention
    q, k, v = _inputs(B=2, seed=3)
    seed = jnp.asarray([5], jnp.int32)
    w = jnp.asarray(np.random.default_rng(5).standard_normal(v.shape),
                    jnp.float32)

    def loss(v):
        return jnp.sum(fused_attention(q, k, v, seed, 0.125, 0.3) * w)

    g = jax.grad(loss)(v)
    dv = jnp.asarray(np.random.default_rng(4).standard_normal(v.shape),
                     jnp.float32)
    fd = float(loss(v + dv) - loss(v - dv)) / 2.0
    vjp = float(jnp.sum(g * dv))
    assert fd == pytest.approx(vjp, rel=1e-3)


def test_bf16_inputs():
    from hop_tpu.ops.pallas_attention import fused_attention
    q, k, v = _inputs(B=2, dtype=jnp.bfloat16)
    out = fused_attention(q, k, v, jnp.asarray([0], jnp.int32), 0.125, 0.0)
    assert out.dtype == jnp.bfloat16
    want = _ref_attention(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_bert_encoder_matches_xla_path(monkeypatch):
    """The wired-in kernel (interpret) reproduces the einsum attention
    path through the full BertEncoder, eval mode."""
    from hop_tpu.config import LLMConfig
    from hop_tpu.models.bert import BertEncoder

    cfg = LLMConfig(n_layers=2, compute_bf16=False)
    enc = BertEncoder(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 34, cfg.dim)), jnp.float32)
    monkeypatch.setenv("HOP_TPU_PALLAS_ATTN", "0")
    v = enc.init({"params": jax.random.PRNGKey(0)}, x, True)
    want = enc.apply(v, x, True)
    monkeypatch.setenv("HOP_TPU_PALLAS_ATTN", "interpret")
    got = enc.apply(v, x, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
