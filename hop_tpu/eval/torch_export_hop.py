"""Export a trained hop_tpu HOP generator back to the reference's format.

The inverse of eval/torch_import_hop.py: flax HOPModel variables become the
torch `{'generator': state_dict}` payload the reference saves
(run_ted.py:457-460) and its test_checkpoint.py:312-315 consumes — so a
reference user can evaluate a TPU-trained model inside their own pipeline.

Scope: every TRAINED module. The frozen LLM backbone (llm_model.*) is
deliberately omitted — the reference constructs it from HF from_pretrained
before load_state_dict, so its values are already in place; likewise the
reference's two dead blocks (the never-called WavEncoder when use_gwnet,
HOP.py:93 vs :209-231, and gwnet.residual_convs under gcn_bool=True) keep
their fresh-init values. Load with strict=False.

Round-trip pinned in tests/test_reference_live_parity.py: converting the
live reference model's own state_dict to flax and exporting it back
reproduces every exported tensor bit-exactly, and the live model
strict=False-loads the export with zero unexpected keys.

  python -m hop_tpu.eval.torch_export_hop --checkpoint-dir ./checkpoints \
      --out hop_generator.bin [--expressive]
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

from hop_tpu.config import Config


def _lin(sd, torch_name, p):
    sd[torch_name + ".weight"] = np.asarray(p["kernel"]).T
    sd[torch_name + ".bias"] = np.asarray(p["bias"])


def _conv1x1(sd, torch_name, p):
    sd[torch_name + ".weight"] = np.asarray(p["kernel"]).T[:, :, None, None]
    sd[torch_name + ".bias"] = np.asarray(p["bias"])


def _temporal_conv(sd, torch_name, p):
    # flax (k, 1, in, out) -> torch (out, in, 1, k); the axis reversal is
    # its own inverse
    sd[torch_name + ".weight"] = np.asarray(p["kernel"]).transpose(3, 2, 1, 0)
    sd[torch_name + ".bias"] = np.asarray(p["bias"])


def _bn(sd, torch_name, p, s):
    sd[torch_name + ".weight"] = np.asarray(p["scale"])
    sd[torch_name + ".bias"] = np.asarray(p["bias"])
    sd[torch_name + ".running_mean"] = np.asarray(s["mean"])
    sd[torch_name + ".running_var"] = np.asarray(s["var"])
    sd[torch_name + ".num_batches_tracked"] = np.asarray(0, np.int64)


def _conv1d(sd, torch_name, p):
    sd[torch_name + ".weight"] = np.asarray(p["kernel"]).transpose(2, 1, 0)
    sd[torch_name + ".bias"] = np.asarray(p["bias"])


def export_hop_state_dict(variables, cfg: Config) -> "OrderedDict[str, np.ndarray]":
    """HOPModel variables -> reference-named state dict (numpy values)."""
    from flax.core import meta as flax_meta
    variables = flax_meta.unbox(variables)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: "OrderedDict[str, np.ndarray]" = OrderedDict()

    sp = params["speaker"]
    sd["speaker_embedding.0.weight"] = np.asarray(sp["Embed_0"]["embedding"])
    _lin(sd, "speaker_embedding.1", sp["Dense_0"])
    _lin(sd, "speaker_mu", sp["Dense_1"])
    _lin(sd, "speaker_logvar", sp["Dense_2"])

    if cfg.hop.use_reprogramming:
        # PrototypeMapper keeps the torch layout (torch_import_hop.py:79-82)
        sd["mapping_layer.weight"] = np.asarray(
            params["mapping_layer"]["kernel"])
        sd["mapping_layer.bias"] = np.asarray(params["mapping_layer"]["bias"])
        _lin(sd, "align_layer", params["align_layer"])
        for name in ("query_projection", "key_projection",
                     "value_projection", "out_projection"):
            _lin(sd, f"reprogramming_layer.{name}",
                 params["reprogramming_layer"][name])

    if cfg.hop.use_gwnet:
        _lin(sd, "beat.0", params["beat_fc1"])
        _lin(sd, "beat.2", params["beat_fc2"])
        gw_p, gw_s = params["gwnet"], stats.get("gwnet", {})
        sd["gwnet.nodevec1"] = np.asarray(gw_p["nodevec1"])
        sd["gwnet.nodevec2"] = np.asarray(gw_p["nodevec2"])
        _conv1x1(sd, "gwnet.start_conv", gw_p["start_conv"])
        _conv1x1(sd, "gwnet.end_conv_1", gw_p["end_conv_1"])
        _conv1x1(sd, "gwnet.end_conv_2", gw_p["end_conv_2"])
        n_layers = cfg.hop.gwnet_blocks * cfg.hop.gwnet_layers
        for i in range(n_layers):
            _temporal_conv(sd, f"gwnet.filter_convs.{i}", gw_p[f"filter_{i}"])
            _temporal_conv(sd, f"gwnet.gate_convs.{i}", gw_p[f"gate_{i}"])
            _conv1x1(sd, f"gwnet.skip_convs.{i}", gw_p[f"skip_{i}"])
            _conv1x1(sd, f"gwnet.gconv.{i}.mlp.mlp",
                     gw_p[f"gcn_{i}"]["Dense_0"])
            _bn(sd, f"gwnet.bn.{i}", gw_p[f"bn_{i}"], gw_s[f"bn_{i}"])
    else:
        wav_p = params["audio_encoder"]
        wav_s = stats.get("audio_encoder", {})
        for j, ci in enumerate((0, 3, 6, 9)):
            _conv1d(sd, f"audio_encoder.feat_extractor.{ci}",
                    wav_p[f"Conv_{j}"])
        for j, bi in enumerate((1, 4, 7)):
            _bn(sd, f"audio_encoder.feat_extractor.{bi}",
                wav_p[f"BatchNorm_{j}"]["BatchNorm_0"],
                wav_s[f"BatchNorm_{j}"]["BatchNorm_0"])

    for name, arr in params["gru"].items():
        # w_ih_l0[_reverse] -> gru.weight_ih_l0[_reverse] (same layout,
        # torch_import_generator.convert_gru stores torch layout 1:1)
        torch_name = name.replace("w_", "weight_", 1).replace("b_", "bias_", 1)
        sd[f"gru.{torch_name}"] = np.asarray(arr)

    _lin(sd, "out.0", params["out_fc1"])
    _lin(sd, "out.3", params["out_fc2"])
    return sd


def main(argv=None):
    import argparse
    import torch

    p = argparse.ArgumentParser(
        "export a HOP checkpoint to the reference's torch format")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--out", required=True,
                   help="output .bin (torch.save({'generator': ...}))")
    p.add_argument("--expressive", action="store_true")
    args = p.parse_args(argv)

    from hop_tpu.config import ted_config, expressive_config
    from hop_tpu.cli.export_model import restore_hop
    cfg = expressive_config() if args.expressive else ted_config()
    cfg, _, variables, _ = restore_hop(cfg, args.checkpoint_dir)

    sd = export_hop_state_dict(variables, cfg)
    torch.save({"generator": OrderedDict(
        (k, torch.tensor(v)) for k, v in sd.items())}, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors; frozen llm_model.* and the "
          "reference's dead blocks omitted — load_state_dict(strict=False))")


if __name__ == "__main__":
    main()
