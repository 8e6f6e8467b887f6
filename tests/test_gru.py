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


class _FakeDev:
    def __init__(self, kind, platform="tpu"):
        self.device_kind = kind
        self.platform = platform


def test_vmem_gate_by_device_generation():
    """HOP_TPU_PALLAS_GRU=auto picks the v3 fused kernel only on TPU v5+
    (the kernel's 64 MB scoped-VMEM cap exceeds v2/v3/v4's 16-32 MB)."""
    from hop_tpu.ops.gru import _vmem_fits_fused

    assert _vmem_fits_fused(_FakeDev("TPU v5 lite"))
    assert _vmem_fits_fused(_FakeDev("TPU v5e"))
    assert _vmem_fits_fused(_FakeDev("TPU v5p chip"))
    assert _vmem_fits_fused(_FakeDev("TPU v6 lite"))
    assert _vmem_fits_fused(_FakeDev("TPU7x"))
    assert not _vmem_fits_fused(_FakeDev("TPU v2"))
    assert not _vmem_fits_fused(_FakeDev("TPU v3"))
    assert not _vmem_fits_fused(_FakeDev("TPU v4"))
    assert not _vmem_fits_fused(_FakeDev(""))          # unknown -> v2 path


def test_pallas_gru_flag_resolution(monkeypatch):
    """Flag semantics: auto gates on generation, fused forces v3, 1 forces
    v2, 0 forces the scan; non-TPU platforms always scan."""
    from hop_tpu.ops import gru as gru_mod

    def with_dev(kind, platform="tpu"):
        monkeypatch.setattr(gru_mod.jax, "devices",
                            lambda: [_FakeDev(kind, platform)])

    with_dev("TPU v5 lite")
    monkeypatch.setenv("HOP_TPU_PALLAS_GRU", "auto")
    assert gru_mod._pallas_gru_enabled() == "fused"
    monkeypatch.delenv("HOP_TPU_PALLAS_GRU")
    assert gru_mod._pallas_gru_enabled() == "fused"    # unset == auto

    with_dev("TPU v4")
    assert gru_mod._pallas_gru_enabled() == "stack"    # auto falls back
    monkeypatch.setenv("HOP_TPU_PALLAS_GRU", "fused")
    assert gru_mod._pallas_gru_enabled() == "fused"    # explicit force
    monkeypatch.setenv("HOP_TPU_PALLAS_GRU", "1")
    assert gru_mod._pallas_gru_enabled() == "stack"
    monkeypatch.setenv("HOP_TPU_PALLAS_GRU", "0")
    assert gru_mod._pallas_gru_enabled() is False

    with_dev("cpu-0", platform="cpu")
    monkeypatch.setenv("HOP_TPU_PALLAS_GRU", "auto")
    assert gru_mod._pallas_gru_enabled() is False
