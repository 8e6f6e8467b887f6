"""GraphWaveNet parity: flax forward vs an independent torch-functional
transcription of the same math (adaptive adjacency, gated dilated temporal
convs, order-2 diffusion GCN, skip/residual, end convs) using the flax
module's own weights."""

import pytest
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from hop_tpu.models.gwnet import GraphWaveNet


def _torch_gwnet_forward(params, x_np, num_nodes, blocks=2, layers=2,
                         kernel=2):
    """x_np: (B, T, N, C) feature-last; computes in torch NCHW-like layout
    (B, C, N, T) to independently validate the flax layout handling."""
    t = lambda a: torch.from_numpy(np.asarray(a))

    e1, e2 = t(params["nodevec1"]), t(params["nodevec2"])
    adp = torch.softmax(torch.relu(e1 @ e2), dim=1)

    x = torch.from_numpy(x_np).permute(0, 3, 2, 1)  # (B, C, N, T)

    def conv1x1(x, p):
        w = t(p["kernel"])  # flax Dense kernel (in, out)
        return torch.einsum("bcnt,co->bont", x, w) + t(p["bias"])[None, :, None, None]

    def temporal(x, p, dil):
        # flax kernel (k, 1, in, out) -> torch conv2d weight (out, in, 1, k)
        w = t(p["kernel"]).permute(3, 2, 1, 0)
        return F.conv2d(x, w, t(p["bias"]), dilation=(1, dil))

    x = conv1x1(x, params["start_conv"])
    skip = None
    dilations = []
    for _ in range(blocks):
        d = 1
        for _ in range(layers):
            dilations.append(d)
            d *= 2
    for i, dil in enumerate(dilations):
        residual = x
        filt = torch.tanh(temporal(residual, params[f"filter_{i}"], dil))
        gate = torch.sigmoid(temporal(residual, params[f"gate_{i}"], dil))
        x = filt * gate
        s = conv1x1(x, params[f"skip_{i}"])
        skip = s if skip is None else s + skip[:, :, :, -s.shape[3]:]
        # order-2 diffusion GCN over the adaptive support
        outs = [x]
        xk = x
        for _ in range(2):
            xk = torch.einsum("bcvt,vw->bcwt", xk, adp)
            outs.append(xk)
        h = torch.cat(outs, dim=1)
        x = conv1x1(h, params[f"gcn_{i}"]["Dense_0"])
        x = x + residual[:, :, :, -x.shape[3]:]
        # batch norm (train-mode batch statistics over B, N, T)
        bnp = params[f"bn_{i}"]
        mean = x.mean(dim=(0, 2, 3), keepdim=True)
        var = x.var(dim=(0, 2, 3), unbiased=False, keepdim=True)
        x = (x - mean) / torch.sqrt(var + 1e-5)
        x = x * t(bnp["scale"])[None, :, None, None] + \
            t(bnp["bias"])[None, :, None, None]
    out = torch.relu(skip)
    out = torch.relu(conv1x1(out, params["end_conv_1"]))
    out = conv1x1(out, params["end_conv_2"])
    return out.permute(0, 3, 2, 1).numpy()  # back to (B, T, N, C)


@pytest.mark.slow
def test_gwnet_matches_torch_transcription(rng):
    B, T, N, C = 2, 16, 9, 12
    m = GraphWaveNet(num_nodes=N, in_dim=C, out_dim=C,
                     residual_channels=8, dilation_channels=8,
                     skip_channels=16, end_channels=16, blocks=2, layers=2)
    x = rng.normal(size=(B, T, N, C)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got, _ = m.apply(variables, jnp.asarray(x), train=True,
                     mutable=["batch_stats"])
    want = _torch_gwnet_forward(variables["params"], x, N)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
