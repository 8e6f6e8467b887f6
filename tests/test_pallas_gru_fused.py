"""Fully-fused time-grid Pallas GRU (ops/pallas_gru_fused) vs the
lax.scan reference: forward parity and custom-VJP gradient parity (incl.
dW_ih/db_ih/dx now computed in-kernel), in interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hop_tpu.ops.gru import _gru_layer_scan
from hop_tpu.ops.pallas_gru_fused import gru_fused_layer

B, T, H, I = 4, 7, 16, 12


def _make(seed, with_bw=True):
    rng = np.random.default_rng(seed)
    D = 2 if with_bw else 1

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           * 0.3)
    x = arr(T, B, I)
    wih = arr(D, 3, I, H)
    bih = arr(D, 3, 1, H)
    whh = arr(D, 3, H, H)
    bhh = arr(D, 3, 1, H)
    h0 = arr(B, H)
    return x, wih, bih, whh, bhh, h0


def _scan_reference(x, wih, bih, whh, bhh, h0):
    """Same math via ops/gru's scan layer, per direction."""
    D = wih.shape[0]
    x_bt = jnp.swapaxes(x, 0, 1)            # (B, T, I)
    outs = []
    for d in range(D):
        # per-gate projections + b_ih, assembled into (B, T, 3H)
        x_proj = jnp.concatenate(
            [x_bt @ wih[d, g] + bih[d, g, 0] for g in range(3)], axis=-1)
        w_hh = jnp.concatenate([whh[d, g].T for g in range(3)], axis=0)
        b_hh = jnp.concatenate([bhh[d, g, 0] for g in range(3)])
        y = _gru_layer_scan(x_proj, w_hh, b_hh, h0, reverse=(d == 1))
        outs.append(jnp.swapaxes(y, 0, 1))  # back to (T, B, H)
    return jnp.stack(outs)


@pytest.mark.parametrize("with_bw", [False, True])
def test_forward_matches_scan(with_bw):
    args = _make(0, with_bw)
    ours = gru_fused_layer(*args, True)
    ref = _scan_reference(*args)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_scan():
    args = _make(1)
    key = jax.random.normal(jax.random.PRNGKey(0), (2, T, B, H)) * 0.1

    def loss_ours(*a):
        return jnp.sum(gru_fused_layer(*a, True) * key)

    def loss_ref(*a):
        return jnp.sum(_scan_reference(*a) * key)

    g_ours = jax.grad(loss_ours, argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    names = ["dx", "dwih", "dbih", "dwhh", "dbhh", "dh0"]
    for name, a, r in zip(names, g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_unidirectional_gradients():
    args = _make(2, with_bw=False)
    key = jax.random.normal(jax.random.PRNGKey(1), (1, T, B, H))

    def loss(which):
        def f(*a):
            y = (gru_fused_layer(*a, True) if which == "ours"
                 else _scan_reference(*a))
            return jnp.sum(jnp.tanh(y) * key)
        return f

    g_ours = jax.grad(loss("ours"), argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss("ref"), argnums=tuple(range(6)))(*args)
    for a, r in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_batch_tiling_matches_untiled(monkeypatch):
    """B > MAX_BATCH_TILE adds a batch-tile grid dim (with padding when B
    doesn't divide); both directions read the same x slab, dx must still
    sum correctly across directions and tiles."""
    from hop_tpu.ops import pallas_gru_fused as pgf
    args = _make(4)
    key = jax.random.normal(jax.random.PRNGKey(2), (2, T, B, H))

    def loss(*a):
        return jnp.sum(gru_fused_layer(*a, True) * key)

    y_ref = gru_fused_layer(*args, True)
    g_ref = jax.grad(loss, argnums=(0, 1, 2, 5))(*args)

    monkeypatch.setattr(pgf, "MAX_BATCH_TILE", 3)   # B=4 -> 2 tiles of 2
    y_tiled = gru_fused_layer(*args, True)
    g_tiled = jax.grad(loss, argnums=(0, 1, 2, 5))(*args)
    np.testing.assert_allclose(np.asarray(y_tiled), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for a, r in zip(g_tiled, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_gru_module_fused_branch_matches_scan(monkeypatch):
    """GRU module's fused-kernel branch matches the scan branch; params
    interchangeable (same names/shapes)."""
    from hop_tpu.ops.gru import GRU
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (5, 9, 12)).astype(np.float32))
    gru = GRU(hidden_size=16, num_layers=2, bidirectional=True)
    variables = gru.init(jax.random.PRNGKey(0), x)
    out_scan, hid_scan = gru.apply(variables, x)

    monkeypatch.setenv("HOP_TPU_PALLAS_GRU", "interpret-fused")
    variables2 = gru.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(variables2)
    out_pl, hid_pl = gru.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_scan),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hid_pl), np.asarray(hid_scan),
                               rtol=1e-5, atol=1e-5)
