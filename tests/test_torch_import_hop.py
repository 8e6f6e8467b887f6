"""HOP checkpoint importer: gwnet conversion vs a live torch forward."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from hop_tpu.eval.torch_import_hop import convert_gwnet
from hop_tpu.models.gwnet import GraphWaveNet


class _TorchGwnet(tnn.Module):
    """Reference-shaped gwnet (adaptive-adjacency path) in torch modules."""

    def __init__(self, num_nodes, in_dim, out_dim, res, dil, skip, end,
                 blocks=2, layers=2):
        super().__init__()
        self.blocks, self.layers = blocks, layers
        self.start_conv = tnn.Conv2d(in_dim, res, (1, 1))
        self.filter_convs = tnn.ModuleList()
        self.gate_convs = tnn.ModuleList()
        self.skip_convs = tnn.ModuleList()
        self.bn = tnn.ModuleList()
        self.gconv = tnn.ModuleList()
        self.dilations = []
        for _ in range(blocks):
            d = 1
            for _ in range(layers):
                self.filter_convs.append(tnn.Conv2d(res, dil, (1, 2),
                                                    dilation=d))
                self.gate_convs.append(tnn.Conv2d(res, dil, (1, 2),
                                                  dilation=d))
                self.skip_convs.append(tnn.Conv2d(dil, skip, (1, 1)))
                self.bn.append(tnn.BatchNorm2d(res))
                g = tnn.Module()
                g.mlp = tnn.Module()
                g.mlp.mlp = tnn.Conv2d(3 * dil, res, (1, 1))
                self.gconv.append(g)
                self.dilations.append(d)
                d *= 2
        self.nodevec1 = tnn.Parameter(torch.randn(num_nodes, 10))
        self.nodevec2 = tnn.Parameter(torch.randn(10, num_nodes))
        self.end_conv_1 = tnn.Conv2d(skip, end, (1, 1))
        self.end_conv_2 = tnn.Conv2d(end, out_dim, (1, 1))

    def forward(self, x):
        # x: (B, C, N, T)
        adp = torch.softmax(torch.relu(self.nodevec1 @ self.nodevec2), dim=1)
        x = self.start_conv(x)
        skip = None
        for i, d in enumerate(self.dilations):
            residual = x
            filt = torch.tanh(self.filter_convs[i](residual))
            gate = torch.sigmoid(self.gate_convs[i](residual))
            x = filt * gate
            s = self.skip_convs[i](x)
            skip = s if skip is None else s + skip[:, :, :, -s.size(3):]
            outs = [x]
            xk = x
            for _ in range(2):
                xk = torch.einsum("bcvt,vw->bcwt", xk, adp)
                outs.append(xk)
            x = self.gconv[i].mlp.mlp(torch.cat(outs, dim=1))
            x = x + residual[:, :, :, -x.size(3):]
            x = self.bn[i](x)
        out = torch.relu(skip)
        out = torch.relu(self.end_conv_1(out))
        return self.end_conv_2(out)


def test_gwnet_checkpoint_import(rng):
    torch.manual_seed(0)
    N, C, res = 9, 12, 8
    tm = _TorchGwnet(N, C, C, res, res, 16, 16).eval()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)

    x = rng.normal(size=(2, 16, N, C)).astype(np.float32)  # (B, T, N, C)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 2, 1))
        want = want.permute(0, 3, 2, 1).numpy()

    params, stats = convert_gwnet(
        {k: v for k, v in tm.state_dict().items()}, prefix="", n_layers=4)
    m = GraphWaveNet(num_nodes=N, in_dim=C, out_dim=C, residual_channels=res,
                     dilation_channels=res, skip_channels=16,
                     end_channels=16, blocks=2, layers=2)
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": params, "batch_stats": stats})
    got = m.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_convert_hop_model_shapes():
    """End-to-end: fabricate a reference-named state dict from a torch HOP
    -shaped module set, convert, and run the flax HOPModel forward."""
    from hop_tpu.config import tiny_test_config
    from hop_tpu.eval.torch_import_hop import convert_hop_model
    from hop_tpu.models.hop import HOPModel
    from transformers import BertConfig, BertModel

    cfg = tiny_test_config("TED")
    torch.manual_seed(1)
    hf = BertModel(BertConfig(
        vocab_size=cfg.llm.vocab_size, hidden_size=cfg.llm.dim,
        num_hidden_layers=cfg.llm.n_layers,
        num_attention_heads=cfg.llm.n_heads,
        intermediate_size=cfg.llm.intermediate_dim,
        max_position_embeddings=cfg.llm.max_position),
        add_pooling_layer=False)

    hop = cfg.hop
    dil = hop.gwnet_dilation
    tgw = _TorchGwnet(9, 173, 173, hop.gwnet_residual, dil,
                      hop.gwnet_skip, hop.gwnet_end,
                      blocks=hop.gwnet_blocks, layers=hop.gwnet_layers)
    d_keys = hop.d_ff * hop.n_heads
    mods = {
        "speaker_embedding": tnn.Sequential(tnn.Embedding(10, 16),
                                            tnn.Linear(16, 16)),
        "speaker_mu": tnn.Linear(16, 16),
        "speaker_logvar": tnn.Linear(16, 16),
        "mapping_layer": tnn.Linear(cfg.llm.vocab_size,
                                    hop.num_prototype_tokens),
        "align_layer": tnn.Linear(2 * cfg.llm.dim, cfg.llm.dim),
        "reprogramming_layer": tnn.ModuleDict({
            "query_projection": tnn.Linear(hop.d_model, d_keys),
            "key_projection": tnn.Linear(cfg.llm.dim, d_keys),
            "value_projection": tnn.Linear(cfg.llm.dim, d_keys),
            "out_projection": tnn.Linear(d_keys, cfg.llm.dim)}),
        "beat": tnn.Sequential(tnn.Linear(3400, 1700), tnn.LeakyReLU(),
                               tnn.Linear(1700, 170)),
        "gwnet": tgw,
        "gru": tnn.GRU(cfg.llm.dim + 27 + 1 + 16 + 180, hop.hidden_size,
                       num_layers=hop.gru_layers, batch_first=True,
                       bidirectional=True),
        "out": tnn.Sequential(tnn.Linear(hop.hidden_size,
                                         hop.hidden_size // 2),
                              tnn.Dropout(0), tnn.LeakyReLU(True),
                              tnn.Linear(hop.hidden_size // 2, 27)),
    }
    sd = {}
    for name, mod in mods.items():
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    for k, v in hf.state_dict().items():
        sd[f"llm_model.{k}"] = v

    variables = convert_hop_model(sd, cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    model = HOPModel(cfg, n_speakers=10)
    B = 2
    out, z, mu, logvar = model.apply(
        variables,
        jnp.zeros((B, cfg.data.expected_audio_length)),
        jnp.zeros((B, 34, cfg.data.mel_bins)),
        jnp.zeros((B, 34), jnp.int32),
        jnp.zeros((B, 16, 27)),
        jnp.zeros((B,), jnp.int32),
        rng=jax.random.PRNGKey(0), train=False)
    assert out.shape == (B, 34, 27)
    assert np.isfinite(np.asarray(out)).all()
