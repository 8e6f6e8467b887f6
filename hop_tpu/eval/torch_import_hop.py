"""Import reference HOP checkpoints ('generator' state dict) into flax.

The reference saves HOP as torch.save({'generator': model.state_dict()})
(run_ted.py:457-460); the trained artifact named in-repo is
expressive_FGD_1.83.bin (test_checkpoint.py:209). This converts that state
dict — including the frozen BERT backbone stored under llm_model.* — into
models/hop.HOPModel variables, enabling direct metric-parity evaluation of
the reference's trained weights on TPU.

Component mappings are tested in tests/test_torch_import_*.py; gwnet's
mapping is validated against a live torch forward in
tests/test_torch_import_hop.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from hop_tpu.config import Config
from hop_tpu.eval.torch_import import _lin, _bn
from hop_tpu.eval.torch_import_generator import convert_gru, convert_wav_encoder
from hop_tpu.models.bert import convert_hf_bert_params


def _dense_from_conv1x1(sd: Dict, name: str) -> dict:
    """torch Conv2d (out, in, 1, 1) -> flax Dense (in, out)."""
    w = np.array(sd[name + ".weight"])[:, :, 0, 0]
    return {"kernel": w.T, "bias": np.array(sd[name + ".bias"])}


def _temporal_conv(sd: Dict, name: str) -> dict:
    """torch Conv2d (out, in, 1, k) -> gwnet _TemporalConv (k, 1, in, out)."""
    w = np.array(sd[name + ".weight"]).transpose(3, 2, 1, 0)
    return {"kernel": w, "bias": np.array(sd[name + ".bias"])}


def convert_gwnet(sd: Dict, prefix: str = "gwnet.", n_layers: int = 8
                  ) -> tuple:
    """gwnet state dict -> (params, batch_stats) for GraphWaveNet."""
    params = {
        "nodevec1": np.array(sd[prefix + "nodevec1"]),
        "nodevec2": np.array(sd[prefix + "nodevec2"]),
        "start_conv": _dense_from_conv1x1(sd, prefix + "start_conv"),
        "end_conv_1": _dense_from_conv1x1(sd, prefix + "end_conv_1"),
        "end_conv_2": _dense_from_conv1x1(sd, prefix + "end_conv_2"),
    }
    stats = {}
    for i in range(n_layers):
        params[f"filter_{i}"] = _temporal_conv(sd, f"{prefix}filter_convs.{i}")
        params[f"gate_{i}"] = _temporal_conv(sd, f"{prefix}gate_convs.{i}")
        params[f"skip_{i}"] = _dense_from_conv1x1(sd, f"{prefix}skip_convs.{i}")
        params[f"gcn_{i}"] = {
            "Dense_0": _dense_from_conv1x1(sd, f"{prefix}gconv.{i}.mlp.mlp")}
        bn_p, bn_s = _bn(sd, f"{prefix}bn.{i}")
        params[f"bn_{i}"] = bn_p
        stats[f"bn_{i}"] = bn_s
    return params, stats


def convert_hop_model(sd: Dict, cfg: Config) -> dict:
    """'generator' state dict -> HOPModel variables."""
    params, stats = {}, {}

    # frozen BERT backbone (HF names under llm_model.)
    llm_sd = {k[len("llm_model."):]: v for k, v in sd.items()
              if k.startswith("llm_model.")}
    params["llm"] = convert_hf_bert_params(llm_sd, cfg.llm)

    params["speaker"] = {
        "Embed_0": {"embedding": np.array(sd["speaker_embedding.0.weight"])},
        "Dense_0": _lin(sd, "speaker_embedding.1"),
        "Dense_1": _lin(sd, "speaker_mu"),
        "Dense_2": _lin(sd, "speaker_logvar"),
    }

    if cfg.hop.use_reprogramming:
        params["mapping_layer"] = {
            "kernel": np.array(sd["mapping_layer.weight"]),
            "bias": np.array(sd["mapping_layer.bias"]),
        }
        params["align_layer"] = _lin(sd, "align_layer")
        params["reprogramming_layer"] = {
            name: _lin(sd, f"reprogramming_layer.{name}")
            for name in ("query_projection", "key_projection",
                         "value_projection", "out_projection")}

    if cfg.hop.use_gwnet:
        params["beat_fc1"] = _lin(sd, "beat.0")
        params["beat_fc2"] = _lin(sd, "beat.2")
        gw_p, gw_s = convert_gwnet(
            sd, "gwnet.",
            n_layers=cfg.hop.gwnet_blocks * cfg.hop.gwnet_layers)
        params["gwnet"] = gw_p
        stats["gwnet"] = gw_s
    else:
        wav_p, wav_s = convert_wav_encoder(sd, "audio_encoder.")
        params["audio_encoder"] = wav_p
        stats["audio_encoder"] = wav_s

    params["gru"] = convert_gru(sd, "gru.", cfg.hop.gru_layers,
                                bidirectional=True)
    # out: Sequential(Linear, Dropout, LeakyReLU, Linear) -> indices 0, 3
    params["out_fc1"] = _lin(sd, "out.0")
    params["out_fc2"] = _lin(sd, "out.3")

    return {"params": params, "batch_stats": stats}
