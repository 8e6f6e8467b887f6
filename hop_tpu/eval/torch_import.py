"""Import reference PyTorch checkpoints into the flax FGD feature nets.

The reference's FGD scores depend on frozen pretrained feature extractors
(EmbeddingSpaceEvaluator.py:393-414): TED loads EmbeddingNet(mode='pose')
from gesture_autoencoder_checkpoint_best.bin (ckpt['gen_dict']), expressive
loads MotionAE from its checkpoint (ckpt['motion_ae']). For metric parity
with the reference those exact weights must be used; this module converts
their torch state_dicts into our flax variable trees.

Tensor layout rules (validated by tests/test_torch_import.py):
  Linear   weight (out, in)      -> kernel (in, out)          [transpose]
  Conv1d   weight (out, in, k)   -> kernel (k, in, out)       [(2,1,0)]
  ConvT1d  weight (in, out, k)   -> kernel (k, in, out), k-flipped
  BatchNorm weight/bias          -> scale/bias
  BatchNorm running_mean/var     -> batch_stats mean/var
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _lin(sd, name):
    return {"kernel": np.array(sd[name + ".weight"]).T,
            "bias": np.array(sd[name + ".bias"])}


def _conv(sd, name):
    return {"kernel": np.array(sd[name + ".weight"]).transpose(2, 1, 0),
            "bias": np.array(sd[name + ".bias"])}


def _convT(sd, name):
    w = np.array(sd[name + ".weight"]).transpose(2, 0, 1)[::-1].copy()
    return {"kernel": w, "bias": np.array(sd[name + ".bias"])}


def _bn(sd, name):
    return ({"scale": np.array(sd[name + ".weight"]),
             "bias": np.array(sd[name + ".bias"])},
            {"mean": np.array(sd[name + ".running_mean"]),
             "var": np.array(sd[name + ".running_var"])})


def _nest_bn(params_tree, stats_tree, key, sd, torch_name):
    p, s = _bn(sd, torch_name)
    params_tree[key] = {"BatchNorm_0": p}
    stats_tree[key] = {"BatchNorm_0": s}


def convert_embedding_net_pose(sd: Dict) -> dict:
    """ckpt['gen_dict'] of the TED gesture autoencoder -> flax variables."""
    sd = {k: v for k, v in sd.items()}
    pe_p, pe_s = {}, {}
    for i in range(3):
        block_p = {"Conv_0": _conv(sd, f"pose_encoder.net.{i}.0")}
        bnp, bns = _bn(sd, f"pose_encoder.net.{i}.1")
        block_p["BatchNorm_0"] = {"BatchNorm_0": bnp}
        pe_p[f"ConvNormRelu_{i}"] = block_p
        pe_s[f"ConvNormRelu_{i}"] = {"BatchNorm_0": {"BatchNorm_0": bns}}
    pe_p["Conv_0"] = _conv(sd, "pose_encoder.net.3")
    pe_p["Dense_0"] = _lin(sd, "pose_encoder.out_net.0")
    bnp, bns = _bn(sd, "pose_encoder.out_net.1")
    pe_p["BatchNorm_0"] = {"BatchNorm_0": bnp}
    pe_s["BatchNorm_0"] = {"BatchNorm_0": bns}
    pe_p["Dense_1"] = _lin(sd, "pose_encoder.out_net.3")
    bnp, bns = _bn(sd, "pose_encoder.out_net.4")
    pe_p["BatchNorm_1"] = {"BatchNorm_0": bnp}
    pe_s["BatchNorm_1"] = {"BatchNorm_0": bns}
    pe_p["Dense_2"] = _lin(sd, "pose_encoder.out_net.6")
    pe_p["Dense_3"] = _lin(sd, "pose_encoder.fc_mu")
    pe_p["Dense_4"] = _lin(sd, "pose_encoder.fc_logvar")

    de_p, de_s = {}, {}
    de_p["Dense_0"] = _lin(sd, "decoder.pre_net.0")
    bnp, bns = _bn(sd, "decoder.pre_net.1")
    de_p["BatchNorm_0"] = {"BatchNorm_0": bnp}
    de_s["BatchNorm_0"] = {"BatchNorm_0": bns}
    de_p["Dense_1"] = _lin(sd, "decoder.pre_net.3")
    de_p["ConvTranspose_0"] = _convT(sd, "decoder.net.0")
    bnp, bns = _bn(sd, "decoder.net.1")
    de_p["BatchNorm_1"] = {"BatchNorm_0": bnp}
    de_s["BatchNorm_1"] = {"BatchNorm_0": bns}
    de_p["ConvTranspose_1"] = _convT(sd, "decoder.net.3")
    bnp, bns = _bn(sd, "decoder.net.4")
    de_p["BatchNorm_2"] = {"BatchNorm_0": bnp}
    de_s["BatchNorm_2"] = {"BatchNorm_0": bns}
    de_p["Conv_0"] = _conv(sd, "decoder.net.6")
    de_p["Conv_1"] = _conv(sd, "decoder.net.7")

    return {"params": {"pose_encoder": pe_p, "decoder": de_p},
            "batch_stats": {"pose_encoder": pe_s, "decoder": de_s}}


def convert_motion_ae(sd: Dict) -> dict:
    """ckpt['motion_ae'] (TED-Expressive FGD net) -> flax variables."""
    en_p, en_s = {}, {}
    for i in range(3):
        block_p = {"Conv_0": _conv(sd, f"encoder.net.{i}.0")}
        bnp, bns = _bn(sd, f"encoder.net.{i}.1")
        block_p["BatchNorm_0"] = {"BatchNorm_0": bnp}
        en_p[f"ConvNormRelu_{i}"] = block_p
        en_s[f"ConvNormRelu_{i}"] = {"BatchNorm_0": {"BatchNorm_0": bns}}
    en_p["Conv_0"] = _conv(sd, "encoder.net.3")
    en_p["Dense_0"] = _lin(sd, "encoder.out_net.0")
    bnp, bns = _bn(sd, "encoder.out_net.1")
    en_p["BatchNorm_0"] = {"BatchNorm_0": bnp}
    en_s["BatchNorm_0"] = {"BatchNorm_0": bns}
    en_p["Dense_1"] = _lin(sd, "encoder.out_net.3")
    bnp, bns = _bn(sd, "encoder.out_net.4")
    en_p["BatchNorm_1"] = {"BatchNorm_0": bnp}
    en_s["BatchNorm_1"] = {"BatchNorm_0": bns}
    en_p["Dense_2"] = _lin(sd, "encoder.out_net.6")

    de_p, de_s = {}, {}
    de_p["Dense_0"] = _lin(sd, "decoder.pre_net.0")
    bnp, bns = _bn(sd, "decoder.pre_net.1")
    de_p["BatchNorm_0"] = {"BatchNorm_0": bnp}
    de_s["BatchNorm_0"] = {"BatchNorm_0": bns}
    de_p["Dense_1"] = _lin(sd, "decoder.pre_net.3")
    de_p["ConvTranspose_0"] = _convT(sd, "decoder.net.0")
    bnp, bns = _bn(sd, "decoder.net.1")
    de_p["BatchNorm_1"] = {"BatchNorm_0": bnp}
    de_s["BatchNorm_1"] = {"BatchNorm_0": bns}
    de_p["ConvTranspose_1"] = _convT(sd, "decoder.net.3")
    bnp, bns = _bn(sd, "decoder.net.4")
    de_p["BatchNorm_2"] = {"BatchNorm_0": bnp}
    de_s["BatchNorm_2"] = {"BatchNorm_0": bns}
    de_p["Conv_0"] = _conv(sd, "decoder.net.6")
    de_p["Conv_1"] = _conv(sd, "decoder.net.7")

    return {"params": {"encoder": en_p, "decoder": de_p},
            "batch_stats": {"encoder": en_s, "decoder": de_s}}


def load_torch_checkpoint(path: str) -> Dict:
    """torch.load a reference .bin on CPU and return raw state dicts."""
    import torch
    return torch.load(path, map_location="cpu")
