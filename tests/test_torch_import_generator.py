"""PoseGenerator checkpoint importer: per-component parity vs torch."""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from hop_tpu.eval.torch_import_generator import (
    convert_wav_encoder, convert_text_encoder_tcn, convert_gru)
from hop_tpu.models.common import WavEncoder
from hop_tpu.models.tcn import TextEncoderTCN
from hop_tpu.ops.gru import GRU


def test_wav_encoder_import(rng):
    torch.manual_seed(0)
    tm = tnn.ModuleDict({"feat_extractor": tnn.Sequential(
        tnn.Conv1d(1, 16, 15, stride=5, padding=1600), tnn.BatchNorm1d(16),
        tnn.LeakyReLU(0.3, True),
        tnn.Conv1d(16, 32, 15, stride=6), tnn.BatchNorm1d(32),
        tnn.LeakyReLU(0.3, True),
        tnn.Conv1d(32, 64, 15, stride=6), tnn.BatchNorm1d(64),
        tnn.LeakyReLU(0.3, True),
        tnn.Conv1d(64, 32, 15, stride=6))}).eval()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)

    wav = rng.normal(size=(2, 36267)).astype(np.float32)
    with torch.no_grad():
        want = tm["feat_extractor"](torch.from_numpy(wav)[:, None]
                                    ).transpose(1, 2).numpy()

    params, stats = convert_wav_encoder(
        {k: v for k, v in tm.state_dict().items()}, "")
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": params, "batch_stats": stats})
    got = WavEncoder().apply(variables, jnp.asarray(wav), False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_text_encoder_import(rng):
    torch.manual_seed(1)
    n_words, embed, hidden, levels = 30, 20, 24, 2

    class TB(tnn.Module):
        def __init__(self, cin, cout, dil):
            super().__init__()
            pad = dil
            self.conv1 = tnn.utils.weight_norm(
                tnn.Conv1d(cin, cout, 2, padding=pad, dilation=dil))
            self.conv2 = tnn.utils.weight_norm(
                tnn.Conv1d(cout, cout, 2, padding=pad, dilation=dil))
            self.downsample = tnn.Conv1d(cin, cout, 1) if cin != cout else None

        def forward(self, x):
            pad = self.conv1.padding[0]
            y = torch.relu(self.conv1(x)[:, :, :-pad])
            y = torch.relu(self.conv2(y)[:, :, :-pad])
            res = x if self.downsample is None else self.downsample(x)
            return torch.relu(y + res)

    class TTE(tnn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = tnn.Embedding(n_words, embed)
            self.tcn = tnn.Module()
            self.tcn.network = tnn.Sequential(
                TB(embed, hidden, 1), TB(hidden, hidden, 2))
            self.decoder = tnn.Linear(hidden, 32)

        def forward(self, ids):
            e = self.embedding(ids)
            y = self.tcn.network(e.transpose(1, 2)).transpose(1, 2)
            return self.decoder(y)

    tm = TTE().eval()
    ids = rng.integers(0, n_words, size=(2, 34))
    with torch.no_grad():
        want = tm(torch.from_numpy(ids)).numpy()

    flax_params = convert_text_encoder_tcn(
        {k: v for k, v in tm.state_dict().items()}, "", n_levels=levels)
    m = TextEncoderTCN(n_words=n_words, embed_size=embed,
                       num_channels=(hidden,) * levels)
    got = m.apply({"params": jax.tree_util.tree_map(jnp.asarray, flax_params)},
                  jnp.asarray(ids), False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_gru_import(rng):
    torch.manual_seed(2)
    tg = tnn.GRU(10, 12, num_layers=3, batch_first=True, bidirectional=True)
    x = rng.normal(size=(2, 7, 10)).astype(np.float32)
    with torch.no_grad():
        want, _ = tg(torch.from_numpy(x))
    params = convert_gru({k: v for k, v in tg.state_dict().items()}, "",
                         n_layers=3, bidirectional=True)
    m = GRU(hidden_size=12, num_layers=3, bidirectional=True)
    got, _ = m.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                               atol=1e-5)
