"""Import reference trimodal PoseGenerator checkpoints into flax.

Counterpart of reference load_checkpoint.py:19-45: HA2G-format checkpoints
carry `gen_dict` (a multimodal_context_net.PoseGenerator state dict) plus
`args`/`lang_model`/`speaker_model`/`pose_dim`; this converts gen_dict into
the flax PoseGenerator variable tree (models/multimodal_context.py).

Layout rules as in torch_import.py, plus:
  torch weight-norm conv: weight_v (out, in, k) -> v (k, in, out);
                          weight_g (out, 1, 1)  -> g (out,)
  torch GRU tensors keep their names (w_ih_l0, ...) — our GRU uses the
  torch parameter layout natively.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from hop_tpu.eval.torch_import import _lin, _conv, _bn


def _wn_conv(sd: Dict, name: str) -> dict:
    return {
        "v": np.array(sd[name + ".weight_v"]).transpose(2, 1, 0),
        "g": np.array(sd[name + ".weight_g"]).reshape(-1),
        "b": np.array(sd[name + ".bias"]),
    }


def convert_text_encoder_tcn(sd: Dict, prefix: str, n_levels: int = 4
                             ) -> dict:
    """TextEncoderTCN (multimodal_context_net.py:33-63) -> flax tree."""
    tcn = {}
    for i in range(n_levels):
        base = f"{prefix}tcn.network.{i}"
        block = {
            "WeightNormConv1d_0": _wn_conv(sd, f"{base}.conv1"),
            "WeightNormConv1d_1": _wn_conv(sd, f"{base}.conv2"),
        }
        if f"{base}.downsample.weight" in sd:
            block["Conv_0"] = _conv(sd, f"{base}.downsample")
        tcn[f"TemporalBlock_{i}"] = block
    return {
        "embedding": np.array(sd[f"{prefix}embedding.weight"]),
        "TemporalConvNet_0": tcn,
        "Dense_0": _lin(sd, f"{prefix}decoder"),
    }


def convert_wav_encoder(sd: Dict, prefix: str) -> tuple:
    """WavEncoder (multimodal_context_net.py:10-30) -> (params, stats)."""
    params, stats = {}, {}
    conv_idx = [0, 3, 6, 9]
    bn_idx = [1, 4, 7]
    for j, ci in enumerate(conv_idx):
        params[f"Conv_{j}"] = _conv(sd, f"{prefix}feat_extractor.{ci}")
    for j, bi in enumerate(bn_idx):
        p, s = _bn(sd, f"{prefix}feat_extractor.{bi}")
        params[f"BatchNorm_{j}"] = {"BatchNorm_0": p}
        stats[f"BatchNorm_{j}"] = {"BatchNorm_0": s}
    return params, stats


def convert_gru(sd: Dict, prefix: str, n_layers: int, bidirectional: bool
                ) -> dict:
    out = {}
    for layer in range(n_layers):
        for sfx in ([""] if not bidirectional else ["", "_reverse"]):
            for t in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                torch_name = f"{prefix}{t}_l{layer}{sfx}"
                flax_name = (t.replace("weight_", "w_").replace("bias_", "b_")
                             + f"_l{layer}{sfx}")
                out[flax_name] = np.array(sd[torch_name])
    return out


def convert_hierarchical_generator(sd: Dict, n_layers: int = 4,
                                   tcn_levels: int = 4) -> dict:
    """HA2G stage generator (hierarchy_net.Hierarchical_PoseGenerator,
    :55-149) -> flax HierarchicalPoseGenerator variables. Consumed per
    stage by the reference's 6-generator loader
    (train_utils_expressive.py:191-226, keys gen_dict_1..6)."""
    params = {
        "TextEncoderTCN_0": convert_text_encoder_tcn(sd, "text_encoder.",
                                                     tcn_levels),
        "SpeakerLatent_0": {
            "Embed_0": {"embedding":
                        np.array(sd["speaker_embedding.0.weight"])},
            "Dense_0": _lin(sd, "speaker_embedding.1"),
            "Dense_1": _lin(sd, "speaker_mu"),
            "Dense_2": _lin(sd, "speaker_logvar"),
        },
        "GRU_0": convert_gru(sd, "gru.", n_layers, bidirectional=True),
        "Dense_0": _lin(sd, "out.0"),
        "Dense_1": _lin(sd, "out.2"),
    }
    return {"params": params, "batch_stats": {}}


def convert_pose_generator(sd: Dict, n_layers: int = 4) -> dict:
    """gen_dict -> flax PoseGenerator variables (speaker-conditioned,
    input_context='both')."""
    params, stats = {}, {}

    wav_p, wav_s = convert_wav_encoder(sd, "audio_encoder.")
    params["WavEncoder_0"] = wav_p
    stats["WavEncoder_0"] = wav_s

    params["TextEncoderTCN_0"] = convert_text_encoder_tcn(sd, "text_encoder.")

    params["SpeakerLatent_0"] = {
        "Embed_0": {"embedding": np.array(sd["speaker_embedding.0.weight"])},
        "Dense_0": _lin(sd, "speaker_embedding.1"),
        "Dense_1": _lin(sd, "speaker_mu"),
        "Dense_2": _lin(sd, "speaker_logvar"),
    }

    params["GRU_0"] = convert_gru(sd, "gru.", n_layers, bidirectional=True)
    params["Dense_0"] = _lin(sd, "out.0")
    params["Dense_1"] = _lin(sd, "out.2")

    return {"params": params, "batch_stats": stats}


def convert_conv_discriminator(sd: Dict, prefix: str = "") -> dict:
    """ConvDiscriminator (multimodal_context_net.py:219-268) -> flax
    variables: pre_conv Sequential indices 0/3/6 are Conv1d, 1/4 are BN;
    then 4-layer BiGRU(64) and the two output linears."""
    params, stats = {}, {}
    for j, ci in enumerate((0, 3, 6)):
        params[f"Conv_{j}"] = _conv(sd, f"{prefix}pre_conv.{ci}")
    for j, bi in enumerate((1, 4)):
        p, s = _bn(sd, f"{prefix}pre_conv.{bi}")
        params[f"BatchNorm_{j}"] = {"BatchNorm_0": p}
        stats[f"BatchNorm_{j}"] = {"BatchNorm_0": s}
    params["GRU_0"] = convert_gru(sd, f"{prefix}gru.", 4, bidirectional=True)
    params["Dense_0"] = _lin(sd, f"{prefix}out")
    params["Dense_1"] = _lin(sd, f"{prefix}out2")
    return {"params": params, "batch_stats": stats}


def _conv2d(sd: Dict, name: str) -> dict:
    """torch Conv2d (out, in, kh, kw) -> flax Conv (kh, kw, in, out)."""
    out = {"kernel": np.array(sd[name + ".weight"]).transpose(2, 3, 1, 0)}
    if name + ".bias" in sd:
        out["bias"] = np.array(sd[name + ".bias"])
    return out


def _bn_wrap(sd: Dict, name: str):
    """torch BN -> our common.BatchNorm wrapper ({'BatchNorm_0': ...})."""
    p, s = _bn(sd, name)
    return {"BatchNorm_0": p}, {"BatchNorm_0": s}


def convert_se_block(sd: Dict, prefix: str, downsample: bool):
    """ResNetBlocks.SEBasicBlock (:7-37) -> models/resnet_se.SEBasicBlock."""
    params, stats = {}, {}
    params["Conv_0"] = _conv2d(sd, prefix + "conv1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn_wrap(sd, prefix + "bn1")
    params["Conv_1"] = _conv2d(sd, prefix + "conv2")
    params["BatchNorm_1"], stats["BatchNorm_1"] = _bn_wrap(sd, prefix + "bn2")
    params["SELayer_0"] = {"Dense_0": _lin(sd, prefix + "se.fc.0"),
                           "Dense_1": _lin(sd, prefix + "se.fc.2")}
    if downsample:
        params["Conv_2"] = _conv2d(sd, prefix + "downsample.0")
        params["BatchNorm_2"], stats["BatchNorm_2"] = _bn_wrap(
            sd, prefix + "downsample.1")
    return params, stats


def convert_resnet_se(sd: Dict, prefix: str = "",
                      layers=(3, 4, 6, 3)) -> dict:
    """ResNetSE34V2.ResNetSE (:13-219) -> models/resnet_se.ResNetSE
    variables. prefix e.g. 'audio_encoder.feat_extractor.' inside a
    hierarchy checkpoint (hierarchy_net.py:10-17)."""
    params, stats = {}, {}
    params["conv1"] = _conv2d(sd, prefix + "conv1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn_wrap(sd, prefix + "bn1")
    for k, n_blocks in enumerate(layers, start=1):
        for i in range(n_blocks):
            # layer1 keeps width at stride 1 -> no downsample anywhere;
            # layers 2-4 downsample in their first block (ResNetSE34V2
            # _make_layer, :98-111)
            ds = (k > 1 and i == 0)
            p, s = convert_se_block(sd, f"{prefix}layer{k}.{i}.", ds)
            params[f"layer{k}_{i}"] = p
            stats[f"layer{k}_{i}"] = s
    for j, lvl in enumerate(("low", "mid", "high"), start=1):
        params[f"conv_{lvl}"] = _conv2d(sd, f"{prefix}conv_{lvl}")
        params[f"BatchNorm_{j}"], stats[f"BatchNorm_{j}"] = _bn_wrap(
            sd, f"{prefix}bn_{lvl}")
        params[f"fc_{lvl}"] = _lin(sd, f"{prefix}fc_{lvl}")
    if prefix + "speaker_embedding.0.weight" in sd:
        params["speaker_embed"] = {
            "embedding": np.array(sd[prefix + "speaker_embedding.0.weight"])}
        params["speaker_proj"] = _lin(sd, prefix + "speaker_embedding.1")
        params["fc1"] = _lin(sd, prefix + "fc1")
        params["fc2"] = _lin(sd, prefix + "fc2")
    return {"params": params, "batch_stats": stats}


def convert_seq2seq(sd: Dict, n_layers: int = 4) -> dict:
    """seq2seq_net.Seq2SeqNet (:217-254) -> models/seq2seq.Seq2SeqNet
    variables. The decoder's pre_linear BatchNorm1d running stats are
    dropped: our compiled decoder scan normalises by per-step batch
    statistics (train-time equivalent; see models/seq2seq.py)."""
    enc = {
        "embedding": np.array(sd["encoder.embedding.weight"]),
        "GRU_0": convert_gru(sd, "encoder.gru.", n_layers,
                             bidirectional=True),
    }
    dec = {
        "Attn_0": {"Dense_0": _lin(sd, "decoder.decoder.attn.attn"),
                   "v": np.array(sd["decoder.decoder.attn.v"])},
        "Dense_0": _lin(sd, "decoder.decoder.pre_linear.0"),
        "bn_scale": np.array(sd["decoder.decoder.pre_linear.1.weight"]),
        "bn_bias": np.array(sd["decoder.decoder.pre_linear.1.bias"]),
        "Dense_1": _lin(sd, "decoder.decoder.out"),
    }
    for k in range(n_layers):
        dec[f"cell_{k}"] = {
            "w_ih": np.array(sd[f"decoder.decoder.gru.weight_ih_l{k}"]),
            "w_hh": np.array(sd[f"decoder.decoder.gru.weight_hh_l{k}"]),
            "b_ih": np.array(sd[f"decoder.decoder.gru.bias_ih_l{k}"]),
            "b_hh": np.array(sd[f"decoder.decoder.gru.bias_hh_l{k}"]),
        }
    return {"params": {"EncoderRNN_0": enc, "_DecoderStep_0": dec}}


def _cnr(sd: Dict, base: str):
    """speech2gesture ConvNormRelu Sequential (conv, BN, LeakyReLU) ->
    our ConvNormRelu module tree; 1d/2d told apart by kernel rank."""
    w = np.asarray(sd[base + ".0.weight"])
    conv = _conv2d(sd, base + ".0") if w.ndim == 4 else _conv(sd, base + ".0")
    p, s = _bn(sd, base + ".1")
    return ({"Conv_0": conv, "BatchNorm_0": {"BatchNorm_0": p}},
            {"BatchNorm_0": {"BatchNorm_0": s}})


def convert_s2g_generator(sd: Dict) -> dict:
    """speech2gesture.Generator (:200-231) -> models/speech2gesture
    .Generator variables (AudioEncoder U-Net incl. skip-path ups)."""
    enc_p, enc_s = {}, {}
    torch_bases = ([f"audio_encoder.first_net.{i}" for i in range(8)]
                   + ["audio_encoder.down1.0", "audio_encoder.down1.1"]
                   + [f"audio_encoder.down{i}" for i in range(2, 7)])
    for j, base in enumerate(torch_bases):
        enc_p[f"ConvNormRelu_{j}"], enc_s[f"ConvNormRelu_{j}"] = _cnr(sd, base)
    for j in range(5):
        p, s = _cnr(sd, f"audio_encoder.up{j + 1}.conv")
        enc_p[f"UnetUp_{j}"] = {"ConvNormRelu_0": p}
        enc_s[f"UnetUp_{j}"] = {"ConvNormRelu_0": s}

    params = {"AudioEncoder_0": enc_p,
              "Dense_0": _lin(sd, "pre_pose_encoder.0"),
              "Dense_1": _lin(sd, "pre_pose_encoder.3"),
              "Conv_0": _conv(sd, "final_out")}
    stats = {"AudioEncoder_0": enc_s}
    bp, bs = _bn(sd, "pre_pose_encoder.1")
    params["BatchNorm_0"] = {"BatchNorm_0": bp}
    stats["BatchNorm_0"] = {"BatchNorm_0": bs}
    for j in range(4):
        params[f"ConvNormRelu_{j}"], stats[f"ConvNormRelu_{j}"] = _cnr(
            sd, f"decoder.{j}")
    return {"params": params, "batch_stats": stats}


def convert_s2g_discriminator(sd: Dict) -> dict:
    """speech2gesture.Discriminator (:234-250) -> flax variables."""
    params = {"Conv_0": _conv(sd, "net.0"), "Conv_1": _conv(sd, "net.4")}
    stats = {}
    for j, base in enumerate(("net.2", "net.3")):
        params[f"ConvNormRelu_{j}"], stats[f"ConvNormRelu_{j}"] = _cnr(
            sd, base)
    return {"params": params, "batch_stats": stats}
