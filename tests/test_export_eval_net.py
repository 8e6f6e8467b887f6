"""gesture_autoencoder checkpoint -> --eval-net npz -> FGD evaluator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hop_tpu.config import tiny_test_config
from hop_tpu.eval.export_eval_net import export
from hop_tpu.models.embedding_net import EmbeddingNet
from hop_tpu.train.embed import make_embed_train_step
from hop_tpu.utils.checkpoint import CheckpointManager


@pytest.mark.slow
def test_export_roundtrip_into_evaluator(tmp_path):
    cfg = tiny_test_config("TED")
    net = EmbeddingNet(pose_dim=cfg.data.pose_dim,
                       n_frames=cfg.data.n_poses, n_words=50, mode="pose")
    poses = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (4, cfg.data.n_poses, cfg.data.pose_dim)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), None, None,
                         poses[:, :4], poses, input_mode="pose")
    step, init_state = make_embed_train_step(cfg, net, mode="pose")
    state = init_state(variables)

    ck = CheckpointManager(str(tmp_path / "ck"))
    ck.metadata = {"model": "gesture_autoencoder"}
    ck.save(0, state, metadata={})

    out = str(tmp_path / "evalnet.npz")
    export(str(tmp_path / "ck"), out)

    # the CLI loader consumes it and the feature fn runs
    from hop_tpu.cli.common import make_fgd_evaluator
    ev = make_fgd_evaluator(cfg, 50, out)
    assert ev.trained
    ev.push_samples(poses, poses + 0.01)
    fgd, feat = ev.get_scores()
    assert np.isfinite(fgd) and np.isfinite(feat)

    # the archive holds flat params/... entries
    data = np.load(out)
    assert any(k.startswith("params/") for k in data.files)


@pytest.mark.slow
def test_export_expressive_motion_ae(tmp_path):
    """gesture_autoencoder on the expressive config trains a MotionAE
    (EmbeddingSpaceEvaluator.py:411-414) and exports as --eval-net."""
    import dataclasses
    from hop_tpu.models.motion_ae import MotionAE
    from hop_tpu.train.embed import make_motion_ae_train_step
    cfg = tiny_test_config("expressive")
    net = MotionAE(pose_dim=cfg.data.pose_dim,
                   latent_dim=cfg.baseline.motion_ae_latent_dim)
    poses = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (4, cfg.data.n_poses, cfg.data.pose_dim)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), poses, True)
    step, init_state = make_motion_ae_train_step(cfg, net)
    state = init_state(variables)
    state, m = step(state, {"target_vec": poses}, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    ck = CheckpointManager(str(tmp_path / "ck"))
    ck.metadata = {"model": "gesture_autoencoder"}
    ck.save(0, state, metadata={})
    out = str(tmp_path / "evalnet.npz")
    export(str(tmp_path / "ck"), out)

    from hop_tpu.cli.common import make_fgd_evaluator
    ev = make_fgd_evaluator(cfg, 50, out)
    ev.push_samples(poses, poses + 0.01)
    fgd, _ = ev.get_scores()
    assert np.isfinite(fgd)


def test_export_rejects_wrong_model(tmp_path):
    ck = CheckpointManager(str(tmp_path / "ck"))
    ck.metadata = {"model": "AD_LLM"}
    ck.save(0, {"anything": jnp.zeros(3)}, metadata={})
    with pytest.raises(SystemExit, match="gesture_autoencoder"):
        export(str(tmp_path / "ck"), str(tmp_path / "o.npz"))
