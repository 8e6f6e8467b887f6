"""Torch-checkpoint import: converted FGD feature nets match torch outputs.

Builds torch networks with the reference checkpoints' exact module/state
-dict structure, converts the state dict with eval/torch_import.py, and
checks the flax nets reproduce the torch eval-mode forward bit-for-bit
(within float tolerance). This validates that real reference checkpoints
(gesture_autoencoder_checkpoint_best.bin etc.) will give parity FGD.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from hop_tpu.eval.torch_import import (convert_embedding_net_pose,
                                       convert_motion_ae)
from hop_tpu.models.embedding_net import EmbeddingNet
from hop_tpu.models.motion_ae import MotionAE


def _torch_pose_encoder(pose_dim, latent):
    return tnn.ModuleDict({
        "net": tnn.Sequential(
            tnn.Sequential(tnn.Conv1d(pose_dim, 32, 3), tnn.BatchNorm1d(32),
                           tnn.LeakyReLU(0.2, True)),
            tnn.Sequential(tnn.Conv1d(32, 64, 3), tnn.BatchNorm1d(64),
                           tnn.LeakyReLU(0.2, True)),
            tnn.Sequential(tnn.Conv1d(64, 64, 4, stride=2),
                           tnn.BatchNorm1d(64), tnn.LeakyReLU(0.2, True)),
            tnn.Conv1d(64, 32, 3)),
        "out_net": tnn.Sequential(
            tnn.Linear(384, 256), tnn.BatchNorm1d(256), tnn.LeakyReLU(True),
            tnn.Linear(256, 128), tnn.BatchNorm1d(128), tnn.LeakyReLU(True),
            tnn.Linear(128, latent)),
        "fc_mu": tnn.Linear(latent, latent),
        "fc_logvar": tnn.Linear(latent, latent),
    })


def _torch_decoder(pose_dim, feat):
    return tnn.ModuleDict({
        "pre_net": tnn.Sequential(
            tnn.Linear(feat, 64), tnn.BatchNorm1d(64), tnn.LeakyReLU(True),
            tnn.Linear(64, 136)),
        "net": tnn.Sequential(
            tnn.ConvTranspose1d(4, 32, 3), tnn.BatchNorm1d(32),
            tnn.LeakyReLU(0.2, True),
            tnn.ConvTranspose1d(32, 32, 3), tnn.BatchNorm1d(32),
            tnn.LeakyReLU(0.2, True),
            tnn.Conv1d(32, 32, 3), tnn.Conv1d(32, pose_dim, 3)),
    })


def _torch_forward_encoder(mod, poses, variational=False):
    x = poses.transpose(1, 2)
    x = mod["net"](x)
    x = x.flatten(1)
    x = mod["out_net"](x)
    mu = mod["fc_mu"](x)
    return mu  # eval path: z = mu


def _torch_forward_decoder(mod, feat):
    x = mod["pre_net"](feat)
    x = x.view(feat.shape[0], 4, -1)
    x = mod["net"](x)
    return x.transpose(1, 2)


@pytest.mark.slow
def test_embedding_net_pose_import_matches(rng):
    torch.manual_seed(0)
    pose_dim = 27
    tnet = tnn.ModuleDict({
        "pose_encoder": _torch_pose_encoder(pose_dim, 32),
        "decoder": _torch_decoder(pose_dim, 32),
    }).eval()
    # fill running stats with non-trivial values
    for m in tnet.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    poses = rng.normal(size=(3, 34, pose_dim)).astype(np.float32)
    with torch.no_grad():
        tp = torch.from_numpy(poses)
        feat = _torch_forward_encoder(tnet["pose_encoder"], tp)
        recon = _torch_forward_decoder(tnet["decoder"], feat)

    variables = convert_embedding_net_pose(
        {k: v for k, v in tnet.state_dict().items()})
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    net = EmbeddingNet(pose_dim=pose_dim, n_frames=34, n_words=10,
                       mode="pose")
    outs = net.apply(variables, None, None, jnp.asarray(poses[:, :4]),
                     jnp.asarray(poses), input_mode="pose", train=False)
    j_feat, j_recon = outs[3], outs[6]
    np.testing.assert_allclose(np.asarray(j_feat), feat.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_recon), recon.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_motion_ae_import_matches(rng):
    torch.manual_seed(1)
    pose_dim, latent = 126, 16
    tnet = tnn.ModuleDict({
        "encoder": tnn.ModuleDict({
            "net": _torch_pose_encoder(pose_dim, latent)["net"],
            "out_net": tnn.Sequential(
                tnn.Linear(384, 256), tnn.BatchNorm1d(256),
                tnn.LeakyReLU(True), tnn.Linear(256, 128),
                tnn.BatchNorm1d(128), tnn.LeakyReLU(True),
                tnn.Linear(128, latent)),
        }),
        "decoder": _torch_decoder(pose_dim, latent),
    }).eval()
    for m in tnet.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    poses = rng.normal(size=(2, 34, pose_dim)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(poses).transpose(1, 2)
        x = tnet["encoder"]["net"](x).flatten(1)
        z = tnet["encoder"]["out_net"](x)
        recon = _torch_forward_decoder(tnet["decoder"], z)

    variables = convert_motion_ae(
        {k: v for k, v in tnet.state_dict().items()})
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    net = MotionAE(pose_dim=pose_dim, latent_dim=latent)
    j_recon, j_z = net.apply(variables, jnp.asarray(poses), False)
    np.testing.assert_allclose(np.asarray(j_z), z.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_recon), recon.numpy(),
                               rtol=1e-4, atol=1e-4)
