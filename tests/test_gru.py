"""GRU parity against torch.nn.GRU with identical weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hop_tpu.ops.gru import GRU, GRUCell


def _copy_torch_gru_params(tg, flax_params):
    """Overwrite flax GRU params with a torch GRU's tensors."""
    new = dict(flax_params)
    for name, tensor in tg.named_parameters():
        # torch names: weight_ih_l0, bias_hh_l1_reverse, ...
        key = (name.replace("weight_", "w_").replace("bias_", "b_"))
        assert key in new, (key, list(new))
        new[key] = jnp.asarray(tensor.detach().numpy())
    return new


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("num_layers", [1, 4])
@pytest.mark.slow
def test_gru_matches_torch(rng, bidirectional, num_layers):
    torch.manual_seed(0)
    in_dim, hidden, batch, T = 12, 17, 3, 9
    tg = torch.nn.GRU(in_dim, hidden, num_layers=num_layers, batch_first=True,
                      bidirectional=bidirectional)
    x = rng.normal(size=(batch, T, in_dim)).astype(np.float32)

    with torch.no_grad():
        t_out, t_h = tg(torch.from_numpy(x))

    m = GRU(hidden_size=hidden, num_layers=num_layers,
            bidirectional=bidirectional)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = _copy_torch_gru_params(tg, params)
    j_out, j_h = m.apply({"params": params}, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_h), t_h.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_gru_initial_hidden(rng):
    torch.manual_seed(1)
    in_dim, hidden, batch, T = 5, 7, 2, 6
    tg = torch.nn.GRU(in_dim, hidden, num_layers=2, batch_first=True)
    x = rng.normal(size=(batch, T, in_dim)).astype(np.float32)
    h0 = rng.normal(size=(2, batch, hidden)).astype(np.float32)
    with torch.no_grad():
        t_out, _ = tg(torch.from_numpy(x), torch.from_numpy(h0))

    m = GRU(hidden_size=hidden, num_layers=2)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = _copy_torch_gru_params(tg, params)
    j_out, _ = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(h0))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_gru_cell_matches_torch(rng):
    torch.manual_seed(2)
    in_dim, hidden, batch = 6, 11, 4
    tc = torch.nn.GRUCell(in_dim, hidden)
    x = rng.normal(size=(batch, in_dim)).astype(np.float32)
    h = rng.normal(size=(batch, hidden)).astype(np.float32)
    with torch.no_grad():
        t_h = tc(torch.from_numpy(x), torch.from_numpy(h))

    m = GRUCell(hidden_size=hidden)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(h))["params"]
    params = {
        "w_ih": jnp.asarray(tc.weight_ih.detach().numpy()),
        "w_hh": jnp.asarray(tc.weight_hh.detach().numpy()),
        "b_ih": jnp.asarray(tc.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(tc.bias_hh.detach().numpy()),
    }
    j_h = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(j_h), t_h.numpy(),
                               rtol=1e-4, atol=1e-5)
