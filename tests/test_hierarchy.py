"""Hierarchy stack: ResNetSE geometry, cascade routing, full train step."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hop_tpu.config import tiny_test_config
from hop_tpu.data import synthetic
from hop_tpu.models import hierarchy as H
from hop_tpu.models.resnet_se import ResNetSE, pixel_shuffle
from hop_tpu.train.hierarchy import (make_hierarchy_train_steps,
                                     softmax_contrastive, physical_loss)


def test_pixel_shuffle_matches_torch(rng):
    import torch
    x = rng.normal(size=(2, 8, 3, 5)).astype(np.float32)  # torch NCHW
    want = torch.nn.PixelShuffle(2)(torch.from_numpy(x)).numpy()
    got = pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-6)


@pytest.mark.slow
def test_resnet_se_shapes(rng):
    spec = rng.normal(size=(2, 128, 70)).astype(np.float32)
    vids = rng.integers(0, 5, size=(2,))
    m = ResNetSE(n_speakers=5, pose_level=3, n_out=32, layers=(1, 1, 1, 1))
    var = m.init(jax.random.PRNGKey(0), jnp.asarray(spec), jnp.asarray(vids))
    weight, f_low, f_mid, f_high, blends = m.apply(
        var, jnp.asarray(spec), jnp.asarray(vids))
    assert f_low.shape == (2, 34, 32)
    assert f_mid.shape == (2, 34, 32)
    assert f_high.shape == (2, 34, 32)
    assert weight.shape == (2, 3, 3)
    assert len(blends) == 3 and blends[0].shape == (2, 34, 32)
    np.testing.assert_allclose(np.asarray(weight.sum(axis=1)), 1.0,
                               atol=1e-5)


@pytest.mark.parametrize("dataset", ["TED", "TED_expressive"])
def test_stage_bone_tables(dataset):
    bones = H.stage_bones(dataset)
    # subsets nest, final stage covers every bone
    for a, b in zip(bones[:-1], bones[1:]):
        assert set(a) <= set(b)
    n = 9 if dataset == "TED" else 42
    assert bones[-1] == tuple(range(n))


@pytest.mark.slow
def test_route_pre_seq_matches_reference_slices(rng):
    """Stage-2 TED routing must equal the hand-written reference slices
    (train_hierarchy.py:105-110)."""
    target = rng.normal(size=(2, 34, 27)).astype(np.float32)
    t2 = np.asarray(H.slice_target(jnp.asarray(target), H.TED_STAGE_BONES[1]))
    out1 = rng.normal(size=(2, 34, 15)).astype(np.float32)  # stage-1 output
    pre = np.asarray(H.route_pre_seq(jnp.asarray(t2), jnp.asarray(out1),
                                     H.TED_STAGE_BONES[1],
                                     H.TED_STAGE_BONES[0], 4))
    # reference: pre2[:, 4:, :12] = out1[:, 4:, :12];
    #            pre2[:, 4:, 15:18] = out1[:, 4:, 12:15]
    np.testing.assert_allclose(pre[:, 4:, :12], out1[:, 4:, :12])
    np.testing.assert_allclose(pre[:, 4:, 15:18], out1[:, 4:, 12:15])
    # untouched stage-2-only bone (global 4 -> pos 4) stays zero after seeds
    assert np.all(pre[:, 4:, 12:15] == 0)
    # seed frames + indicator
    np.testing.assert_allclose(pre[:, :4, :-1], t2[:, :4])
    assert np.all(pre[:, :4, -1] == 1)


@pytest.mark.slow
def test_softmax_contrastive_prefers_aligned(rng):
    f = rng.normal(size=(16, 8)).astype(np.float32)
    aligned = float(softmax_contrastive(jnp.asarray(f), jnp.asarray(f)))
    shuffled = float(softmax_contrastive(
        jnp.asarray(f), jnp.asarray(np.roll(f, 1, axis=0))))
    assert aligned < shuffled


@pytest.mark.slow
def test_physical_loss_expressive_runs(rng):
    from hop_tpu import geometry as G
    from hop_tpu.train import hierarchy_expressive_stats as hx
    out = rng.normal(size=(2, 34, 126)).astype(np.float32) * 0.1
    val = float(physical_loss(jnp.asarray(out), G.EXPRESSIVE_MEAN_DIR_VEC,
                              G.EXPRESSIVE_ANGLE_PAIRS, hx.AVG_ANGLE,
                              hx.VAR_ANGLE, add_palms=True))
    assert np.isfinite(val) and val > 0


@pytest.mark.slow
def test_hierarchy_train_step_ted():
    cfg = tiny_test_config("TED")
    cfg = cfg.replace(loss=dataclasses.replace(
        cfg.loss, contrastive_pos_weight=0.1, contrastive_neg_weight=0.05,
        physical_weight=0.01))
    b = synthetic.make_batch(cfg, 3, seed=0)
    b["text_padded"] = b["text_padded"] % 50
    b = synthetic.add_device_features(b, cfg)
    batch = {k: jnp.asarray(v) for k, v in b.items()
             if k in ("target_vec", "text_padded", "vid_indices",
                      "spectrogram")}
    batch["spectrogram"] = batch["spectrogram"].astype(jnp.float32)

    bones = H.stage_bones("TED")
    stages = [H.HierarchicalPoseGenerator(
        pose_dim=len(bn) * 3, n_words=50, n_speakers=10, hidden_size=24,
        n_layers=2) for bn in bones]
    disc = H.HierarchicalConvDiscriminator()
    audio_enc = ResNetSE(n_speakers=10, pose_level=3, n_out=32,
                         layers=(1, 1, 1, 1))
    text_enc = H.HierarchicalTextEncoder(n_words=50, hidden_size=16,
                                         n_layers=2)

    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    gen_params, gen_stats = {}, {}
    av = audio_enc.init(rngs, batch["spectrogram"], batch["vid_indices"],
                        True)
    gen_params["audio"], gen_stats["audio"] = av["params"], av["batch_stats"]
    tv = text_enc.init(rngs, batch["text_padded"], True)
    gen_params["text"] = tv["params"]
    gen_stats["text"] = tv.get("batch_stats", {})
    blends_dummy = [jnp.zeros((3, 34, 32))] * 3
    for k, (stage, bn) in enumerate(zip(stages, bones)):
        tgt_k = H.slice_target(batch["target_vec"], bn)
        pre = H.route_pre_seq(tgt_k, None, bn, None, 4)
        sv = stage.init(rngs, pre, batch["text_padded"], blends_dummy[k],
                        batch["vid_indices"], rng=jax.random.PRNGKey(5),
                        train=True)
        gen_params[f"g{k+1}"] = sv["params"]
        gen_stats[f"g{k+1}"] = sv.get("batch_stats", {})
    dv = disc.init(rngs, batch["target_vec"], train=True)

    warmup, gan, init_state = make_hierarchy_train_steps(
        cfg, stages, disc, audio_enc, text_enc)
    state = init_state({"params": gen_params, "batch_stats": gen_stats},
                       dv)
    state, m = warmup(state, batch, jax.random.PRNGKey(9))
    for k in ("loss", "KLD", "DIV_REG", "c_pos", "c_neg", "phy"):
        assert np.isfinite(float(m[k])), k
    state, m = gan(state, batch, jax.random.PRNGKey(10))
    assert np.isfinite(float(m["dis"]))
    assert np.isfinite(float(m["gen"]))
