"""Eval stack: FGD evaluator, beat consistency, MAE, full eval loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hop_tpu import geometry as G
from hop_tpu.config import tiny_test_config
from hop_tpu.data import synthetic
from hop_tpu.eval import beat as B
from hop_tpu.eval import metrics as MET
from hop_tpu.eval.evaluate import evaluate_testset
from hop_tpu.eval.fgd import (EmbeddingSpaceEvaluator, make_ted_feature_fn,
                              make_expressive_feature_fn)
from hop_tpu.models.embedding_net import EmbeddingNet
from hop_tpu.models.motion_ae import MotionAE


def _ted_evaluator(rng):
    net = EmbeddingNet(pose_dim=27, n_frames=34, n_words=10, mode="pose")
    poses = jnp.asarray(rng.normal(size=(2, 34, 27)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), None, None, poses[:, :4],
                         poses, input_mode="pose")
    return EmbeddingSpaceEvaluator(make_ted_feature_fn(net, variables))


@pytest.mark.slow
def test_fgd_evaluator_ted(rng):
    ev = _ted_evaluator(rng)
    for seed in range(3):
        r = np.random.default_rng(seed)
        real = jnp.asarray(r.normal(size=(8, 34, 27)).astype(np.float32))
        gen = jnp.asarray(r.normal(loc=0.3, size=(8, 34, 27)).astype(np.float32))
        ev.push_samples(gen, real)
    fd, feat_dist = ev.get_scores()
    assert np.isfinite(fd) and fd >= -1e-3
    assert np.isfinite(feat_dist) and feat_dist > 0
    div = ev.get_diversity_scores()
    assert np.isfinite(div) and div > 0
    assert ev.n_samples == 24

    # identical distributions => FGD ~ 0
    ev.reset()
    same = jnp.asarray(rng.normal(size=(64, 34, 27)).astype(np.float32))
    ev.push_samples(same, same)
    fd_same, _ = ev.get_scores()
    assert abs(fd_same) < 1e-2


def test_diversity_matches_reference_transcription(rng):
    """Pin the batch-block diversity definition against an independent
    torch transcription of EmbeddingSpaceEvaluator.get_diversity_scores
    (reference :498-508) on the same fixed permutation."""
    ev = _ted_evaluator(rng)
    feats = [rng.normal(size=(8, 32)).astype(np.float32) for _ in range(5)]
    ev._gen_feats = [jnp.asarray(f) for f in feats]

    seed_rng = np.random.default_rng(7)
    ours = ev.get_diversity_scores(rng=np.random.default_rng(7))

    perm = seed_rng.permutation(len(feats))[:500]  # same draw as above
    import torch
    feat_list = [torch.from_numpy(f) for f in feats]
    feat1 = np.vstack([f.numpy() for f in feat_list[:500]])
    feat2 = np.vstack([feat_list[x].numpy() for x in perm])
    expected = np.mean(np.sum(np.absolute(feat1 - feat2), axis=-1))
    assert ours == pytest.approx(float(expected), rel=1e-6)


def test_fgd_evaluator_expressive(rng):
    net = MotionAE(pose_dim=126, latent_dim=32)
    poses = jnp.asarray(rng.normal(size=(2, 34, 126)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), poses)
    ev = EmbeddingSpaceEvaluator(make_expressive_feature_fn(net, variables))
    ev.push_samples(poses + 0.1, poses)
    fd, _ = ev.get_scores()
    assert np.isfinite(fd)


def test_motion_beat_mask_finds_minima():
    # construct a signal with a clean local min at t=5
    sig = np.ones((1, 34), np.float32)
    sig[0, 5] = 0.5
    mask = np.asarray(B.motion_beat_mask(jnp.asarray(sig)))
    assert mask[0, 5]
    assert mask.sum() == 1
    # frames 0,1 and 33 can never be beats
    assert not mask[0, 0] and not mask[0, 1] and not mask[0, 33]


def test_motion_beat_threshold():
    sig = np.ones((1, 34), np.float32)
    sig[0, 10] = 1.0 - 0.01  # below thres drop (0.03) -> not a beat
    mask = np.asarray(B.motion_beat_mask(jnp.asarray(sig)))
    assert not mask.any()


@pytest.mark.slow
def test_beat_consistency_runs(rng):
    cfg = tiny_test_config("TED")
    batch = synthetic.make_batch(cfg, 3, seed=1)
    out = jnp.asarray(batch["target_vec"])
    s, w = B.beat_consistency(out, jnp.asarray(batch["in_audio"]),
                              G.TED_SKELETON)
    assert float(w) >= 0
    if float(w) > 0:
        assert 0.0 <= float(s) / float(w) <= 1.0


def test_joint_mae_zero_for_identical(rng):
    v = jnp.asarray(rng.normal(size=(2, 34, 27)).astype(np.float32))
    assert float(MET.joint_mae(v, v, G.TED_SKELETON)) == 0.0


@pytest.mark.slow
def test_evaluate_testset_end_to_end(rng):
    cfg = tiny_test_config("TED")
    ev = _ted_evaluator(rng)
    batches = []
    for seed in range(2):
        nb = synthetic.make_batch(cfg, 4, seed=seed)
        batches.append({k: jnp.asarray(v) for k, v in nb.items()
                        if k in ("in_audio", "target_vec")})

    def generate_fn(batch, vids, rng):
        return batch["target_vec"] * 0.9  # fake generator

    res = evaluate_testset(batches, generate_fn, ev, epoch=40, cfg=cfg,
                           n_speakers=5, rng=jax.random.PRNGKey(0))
    assert np.isfinite(res.loss) and res.loss > 0
    assert np.isfinite(res.mae)
    assert np.isfinite(res.frechet_dist)
    assert "FGD" in str(res)
