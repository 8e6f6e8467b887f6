"""Pallas GRU kernel (interpret mode on CPU) vs the scan implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hop_tpu.ops.gru import GRU
from hop_tpu.ops.pallas_gru import gru_forward_pallas, pallas_gru_layer


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.slow
def test_pallas_gru_matches_scan(rng, bidirectional):
    B, T, in_dim, H, layers = 5, 9, 12, 16, 2
    x = rng.normal(size=(B, T, in_dim)).astype(np.float32)
    m = GRU(hidden_size=H, num_layers=layers, bidirectional=bidirectional)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    want, _ = m.apply({"params": params}, jnp.asarray(x))
    got = gru_forward_pallas(jnp.asarray(x), params, H, layers,
                             bidirectional, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pallas_layer_batch_padding(rng):
    """Batch not divisible by the tile must still match."""
    B, T, H = 7, 6, 8
    x_proj = rng.normal(size=(B, T, 3 * H)).astype(np.float32)
    w_hh = rng.normal(size=(3 * H, H)).astype(np.float32) * 0.2
    b_hh = rng.normal(size=(3 * H,)).astype(np.float32) * 0.1
    h0 = rng.normal(size=(B, H)).astype(np.float32)

    got = pallas_gru_layer(jnp.asarray(x_proj), jnp.asarray(w_hh),
                           jnp.asarray(b_hh), jnp.asarray(h0),
                           batch_tile=4, interpret=True)

    # direct reference recurrence
    h = h0.copy()
    outs = []
    for t in range(T):
        hp = h @ w_hh.T + b_hh
        xr, xz, xn = np.split(x_proj[:, t], 3, axis=-1)
        hr, hz, hn = np.split(hp, 3, axis=-1)
        r = 1 / (1 + np.exp(-(xr + hr)))
        z = 1 / (1 + np.exp(-(xz + hz)))
        n = np.tanh(xn + r * hn)
        h = (1 - z) * n + z * h
        outs.append(h.copy())
    want = np.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
