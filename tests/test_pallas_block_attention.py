"""Block-diagonal Pallas attention (v2) vs the jnp einsum reference
(interpret mode). The kernel fuses NB samples' T=34 rows into one
M=NB*T matmul per head and masks cross-sample scores — these tests pin
that the masking makes it exactly per-sample attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("HOP_TPU_PALLAS_BLOCK_ATTN", "interpret")


def _ref_attention(q, k, v, scale):
    """q, k, v (B, T, H, D) — the BertSelfAttention einsum path
    (models/bert.py XLA branch)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


def _inputs(B=8, T=34, H=12, D=64, seed=0, dtype=jnp.float32):
    r = np.random.default_rng(seed)
    q = jnp.asarray(r.standard_normal((B, T, H, D)), dtype)
    k = jnp.asarray(r.standard_normal((B, T, H, D)), dtype)
    v = jnp.asarray(r.standard_normal((B, T, H, D)), dtype)
    return q, k, v


def test_forward_matches_reference():
    from hop_tpu.ops.pallas_block_attention import block_attention
    q, k, v = _inputs()
    scale = 1.0 / 64 ** 0.5
    out = block_attention(q, k, v, jnp.asarray([3], jnp.int32), scale, 0.0)
    want = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_multi_block_and_odd_batch():
    """B=16 -> two grid programs of nb=8; B=6 -> nb=2 fallback. The
    cross-sample masking must hold inside every fused block."""
    from hop_tpu.ops.pallas_block_attention import block_attention
    for B in (16, 6):
        q, k, v = _inputs(B=B, seed=B)
        out = block_attention(q, k, v, jnp.asarray([0], jnp.int32),
                              0.125, 0.0)
        want = _ref_attention(q, k, v, 0.125)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=f"B={B}")


def test_no_cross_sample_leakage():
    """Perturbing sample j must not change sample i's output even though
    they share one fused score matrix."""
    from hop_tpu.ops.pallas_block_attention import block_attention
    q, k, v = _inputs(B=4, seed=7)
    base = np.asarray(block_attention(q, k, v, jnp.asarray([0], jnp.int32),
                                      0.125, 0.0))
    k2 = k.at[3].set(k[3] * 100.0 + 5.0)
    v2 = v.at[3].set(-v[3])
    pert = np.asarray(block_attention(q, k2, v2,
                                      jnp.asarray([0], jnp.int32),
                                      0.125, 0.0))
    np.testing.assert_array_equal(base[:3], pert[:3])
    assert not np.allclose(base[3], pert[3])


def test_gradients_match_reference():
    from hop_tpu.ops.pallas_block_attention import block_attention
    for B in (4, 6):
        q, k, v = _inputs(B=B, T=17, H=4, D=32, seed=B)
        scale = 0.2
        seed = jnp.asarray([7], jnp.int32)
        tgt = jnp.asarray(
            np.random.default_rng(1).standard_normal(q.shape), jnp.float32)

        def loss_pallas(q, k, v):
            return jnp.sum(
                (block_attention(q, k, v, seed, scale, 0.0) - tgt) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum((_ref_attention(q, k, v, scale) - tgt) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gp, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"B={B} d{name}")


def test_dropout_determinism_and_rate():
    from hop_tpu.ops.pallas_block_attention import block_attention
    q, k, v = _inputs(B=4, seed=2)
    s1 = jnp.asarray([11], jnp.int32)
    s2 = jnp.asarray([12], jnp.int32)
    a = block_attention(q, k, v, s1, 0.125, 0.5)
    b = block_attention(q, k, v, s1, 0.125, 0.5)
    c = block_attention(q, k, v, s2, 0.125, 0.5)
    d = block_attention(q, k, v, s1, 0.125, 0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert not np.allclose(np.asarray(a), np.asarray(d))
    assert np.abs(np.asarray(a).mean() - np.asarray(d).mean()) < 0.05


def test_dropout_backward_reuses_mask():
    """out is LINEAR in v for a fixed mask: directional finite difference
    equals the VJP only if the backward regenerates the same mask."""
    from hop_tpu.ops.pallas_block_attention import block_attention
    q, k, v = _inputs(B=2, T=9, H=2, D=16, seed=3)
    seed = jnp.asarray([5], jnp.int32)
    w = jnp.asarray(np.random.default_rng(5).standard_normal(q.shape),
                    jnp.float32)

    def loss(v):
        return jnp.sum(block_attention(q, k, v, seed, 0.125, 0.3) * w)

    g = jax.grad(loss)(v)
    dv = jnp.asarray(np.random.default_rng(4).standard_normal(v.shape),
                     jnp.float32)
    fd = float(loss(v + dv) - loss(v - dv)) / 2.0
    vjp = float(jnp.sum(g * dv))
    assert fd == pytest.approx(vjp, rel=1e-3)


def test_bert_layer_matches_xla_path(monkeypatch):
    """The wired-in kernel (interpret) reproduces the einsum path through
    the full BertEncoder, eval mode (deterministic, no dropout)."""
    import dataclasses
    from hop_tpu.config import ted_config
    from hop_tpu.models.bert import BertEncoder

    # f32 compute so the comparison is exact: with the bf16 default the
    # einsum path softmaxes in bf16 while the kernel softmaxes in f32
    # (a strictly-more-accurate documented deviation, ~1e-2 apart)
    cfg = dataclasses.replace(ted_config().llm, n_layers=2, vocab_size=64,
                              compute_bf16=False)
    enc = BertEncoder(cfg)
    r = np.random.default_rng(0)
    tok = jnp.asarray(r.integers(0, 64, (2, 34)), jnp.int32)
    monkeypatch.setenv("HOP_TPU_PALLAS_BLOCK_ATTN", "0")
    variables = enc.init(jax.random.PRNGKey(0), tok,
                         method="encode_tokens")
    want = enc.apply(variables, tok, method="encode_tokens")
    monkeypatch.setenv("HOP_TPU_PALLAS_BLOCK_ATTN", "interpret")
    got = enc.apply(variables, tok, method="encode_tokens")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
