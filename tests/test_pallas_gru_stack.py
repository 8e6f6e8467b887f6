"""Time-grid Pallas GRU (ops/pallas_gru_stack) vs the lax.scan reference:
forward parity and custom-VJP gradient parity, in interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hop_tpu.ops.gru import _gru_layer_scan
from hop_tpu.ops.pallas_gru_stack import gru_stack

B, T, H = 4, 7, 16


def _make(seed, with_bw=True):
    rng = np.random.default_rng(seed)
    D = 2 if with_bw else 1

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           * 0.3)
    xg = [arr(D, T, B, H) for _ in range(3)]
    w = arr(D, 3, H, H)
    b = arr(D, 3, 1, H)
    h0 = arr(B, H)
    return xg, w, b, h0


def _scan_reference(xg, w, b, h0):
    """Same math via ops/gru's scan layer, per direction."""
    xr, xz, xn = xg
    D = xr.shape[0]
    outs = []
    for d in range(D):
        # assemble (B, T, 3H) x_proj and torch-layout (3H, H) weights
        x_proj = jnp.concatenate(
            [jnp.swapaxes(xr[d], 0, 1), jnp.swapaxes(xz[d], 0, 1),
             jnp.swapaxes(xn[d], 0, 1)], axis=-1)
        w_hh = jnp.concatenate([w[d, 0].T, w[d, 1].T, w[d, 2].T], axis=0)
        b_hh = jnp.concatenate([b[d, 0, 0], b[d, 1, 0], b[d, 2, 0]])
        y = _gru_layer_scan(x_proj, w_hh, b_hh, h0, reverse=(d == 1))
        outs.append(jnp.swapaxes(y, 0, 1))   # back to (T, B, H)
    return jnp.stack(outs)


@pytest.mark.parametrize("with_bw", [False, True])
def test_forward_matches_scan(with_bw):
    xg, w, b, h0 = _make(0, with_bw)
    ours = gru_stack(*xg, w, b, h0, True)
    ref = _scan_reference(xg, w, b, h0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_scan():
    xg, w, b, h0 = _make(1)
    key = jax.random.normal(jax.random.PRNGKey(0), (2, T, B, H)) * 0.1

    def loss_ours(xr, xz, xn, w, b, h0):
        y = gru_stack(xr, xz, xn, w, b, h0, True)
        return jnp.sum(y * key)

    def loss_ref(xr, xz, xn, w, b, h0):
        y = _scan_reference((xr, xz, xn), w, b, h0)
        return jnp.sum(y * key)

    args = (*xg, w, b, h0)
    g_ours = jax.grad(loss_ours, argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    names = ["dxr", "dxz", "dxn", "dw", "db", "dh0"]
    for name, a, r in zip(names, g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_bf16_streams_close_to_f32():
    """HOP_TPU_GRU_BF16_STREAMS path: bf16 per-gate input streams must
    track the f32 kernel within bf16 quantisation error, and the
    backward must emit dx natively in bf16."""
    xg, w, b, h0 = _make(3)
    xg16 = [x.astype(jnp.bfloat16) for x in xg]
    key = jax.random.normal(jax.random.PRNGKey(2), (2, T, B, H)) * 0.1

    y32 = gru_stack(*xg, w, b, h0, True)
    y16 = gru_stack(*xg16, w, b, h0, True)
    assert y16.dtype == jnp.float32    # h-path stays f32
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               rtol=0, atol=2e-2)

    def loss(xr, xz, xn):
        return jnp.sum(gru_stack(xr, xz, xn, w, b, h0, True) * key)

    g32 = jax.grad(loss, argnums=(0, 1, 2))(*xg)
    g16 = jax.grad(loss, argnums=(0, 1, 2))(*xg16)
    for a32, a16 in zip(g32, g16):
        assert a16.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a16, np.float32),
                                   np.asarray(a32), rtol=0, atol=2e-2)


def test_unidirectional_gradients():
    xg, w, b, h0 = _make(2, with_bw=False)
    key = jax.random.normal(jax.random.PRNGKey(1), (1, T, B, H))

    def loss(fn):
        def f(xr, xz, xn, w, b, h0):
            if fn == "ours":
                y = gru_stack(xr, xz, xn, w, b, h0, True)
            else:
                y = _scan_reference((xr, xz, xn), w, b, h0)
            return jnp.sum(jnp.tanh(y) * key)
        return f

    args = (*xg, w, b, h0)
    g_ours = jax.grad(loss("ours"), argnums=(3, 4, 5))(*args)
    g_ref = jax.grad(loss("ref"), argnums=(3, 4, 5))(*args)
    for a, r in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_gru_module_pallas_branch_matches_scan(monkeypatch):
    """The GRU module's pallas branch (time-major stack) matches the scan
    branch bit-for-tolerance, params interchangeable (same names/shapes)."""
    from hop_tpu.ops.gru import GRU
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (5, 9, 12)).astype(np.float32))
    gru = GRU(hidden_size=16, num_layers=2, bidirectional=True)
    variables = gru.init(jax.random.PRNGKey(0), x)
    out_scan, hid_scan = gru.apply(variables, x)

    monkeypatch.setenv("HOP_TPU_PALLAS_GRU", "interpret")
    variables2 = gru.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(variables2)
    out_pl, hid_pl = gru.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_scan),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hid_pl), np.asarray(hid_scan),
                               rtol=1e-5, atol=1e-5)


def test_batch_tiling_matches_untiled(monkeypatch):
    """B > MAX_BATCH_TILE adds a batch-tile grid dim (with padding when
    B doesn't divide); results and grads must match the untiled kernel."""
    from hop_tpu.ops import pallas_gru_stack as pgs
    xg, w, b, h0 = _make(4)
    key = jax.random.normal(jax.random.PRNGKey(2), (2, T, B, H))

    def loss(xr, xz, xn, w, b, h0):
        return jnp.sum(gru_stack(xr, xz, xn, w, b, h0, True) * key)

    args = (*xg, w, b, h0)
    y_ref = gru_stack(*args, True)
    g_ref = jax.grad(loss, argnums=(0, 3, 4, 5))(*args)

    monkeypatch.setattr(pgs, "MAX_BATCH_TILE", 3)   # B=4 -> 2 tiles of 2
    y_tiled = gru_stack(*args, True)
    g_tiled = jax.grad(loss, argnums=(0, 3, 4, 5))(*args)
    np.testing.assert_allclose(np.asarray(y_tiled), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for a, r in zip(g_tiled, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)
