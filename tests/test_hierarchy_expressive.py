"""Expressive (6-stage) hierarchy: routing parity + full train step."""

import pytest
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from hop_tpu.config import tiny_test_config
from hop_tpu.data import synthetic
from hop_tpu.models import hierarchy as H
from hop_tpu.models.resnet_se import ResNetSE
from hop_tpu.train.hierarchy import make_hierarchy_train_steps


def test_expressive_routing_matches_reference_slices(rng):
    """Stage 4 -> 5 routing (the reference's most intricate block,
    train_hierarchy_expressive.py:184-199) must match the hand-written
    slice pairs."""
    bones4, bones5 = H.EXPRESSIVE_STAGE_BONES[3], H.EXPRESSIVE_STAGE_BONES[4]
    target = rng.normal(size=(2, 34, 126)).astype(np.float32)
    t5 = np.asarray(H.slice_target(jnp.asarray(target), bones5))
    out4 = rng.normal(size=(2, 34, len(bones4) * 3)).astype(np.float32)
    pre = np.asarray(H.route_pre_seq(jnp.asarray(t5), jnp.asarray(out4),
                                     bones5, bones4, 4,
                                     tail_bones=H.routing_tail("expressive")))
    # reference slice pairs (dst in stage-5 coords, src in stage-4 coords)
    pairs = [(slice(0, 18), slice(0, 18)),
             (slice(21, 24), slice(18, 21)),
             (slice(27, 30), slice(21, 24)),
             (slice(33, 36), slice(24, 27)),
             (slice(39, 42), slice(27, 30)),
             (slice(45, 54), slice(30, 39)),
             (slice(57, 60), slice(39, 42)),
             (slice(63, 66), slice(42, 45)),
             (slice(69, 72), slice(45, 48)),
             (slice(75, 78), slice(48, 51)),
             # face bones 37-41: the reference writes pre_seq_5[:, 4:, -15:]
             # (train_hierarchy_expressive.py:197-198) — on the 97-channel
             # seed (96 dirs + indicator) that is columns 82..96, one late
             # relative to the bone-aligned 81..95
             (slice(82, 97), slice(51, 66))]
    for dst, src in pairs:
        np.testing.assert_allclose(pre[:, 4:, dst], out4[:, 4:, src],
                                   err_msg=str((dst, src)))
    # stage-5-only bones (e.g. global bone 6 at position 6) stay zero,
    # as does the first face-bone x channel the shifted write skips
    assert np.all(pre[:, 4:, 18:21] == 0)
    assert np.all(pre[:, 4:, 81] == 0)


@pytest.mark.slow
def test_expressive_hierarchy_train_step():
    cfg = tiny_test_config("TED_expressive")
    cfg = cfg.replace(loss=dataclasses.replace(
        cfg.loss, contrastive_pos_weight=0.1, physical_weight=0.01))
    b = synthetic.make_batch(cfg, 2, seed=0)
    b["text_padded"] = b["text_padded"] % 50
    b = synthetic.add_device_features(b, cfg)
    batch = {k: jnp.asarray(v) for k, v in b.items()
             if k in ("target_vec", "text_padded", "vid_indices",
                      "spectrogram")}

    bones = H.stage_bones("TED_expressive")
    assert len(bones) == 6
    stages = [H.HierarchicalPoseGenerator(
        pose_dim=len(bn) * 3, n_words=50, n_speakers=10, hidden_size=16,
        n_layers=2) for bn in bones]
    disc = H.HierarchicalConvDiscriminator()
    audio_enc = ResNetSE(n_speakers=10, pose_level=6, n_out=32,
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
    for k, (stage, bn) in enumerate(zip(stages, bones)):
        tk = H.slice_target(batch["target_vec"], bn)
        pre = H.route_pre_seq(tk, None, bn, None, 4)
        sv = stage.init(rngs, pre, batch["text_padded"],
                        jnp.zeros((2, 34, 32)), batch["vid_indices"],
                        rng=jax.random.PRNGKey(5), train=True)
        gen_params[f"g{k+1}"] = sv["params"]
        gen_stats[f"g{k+1}"] = sv.get("batch_stats", {})
    dv = disc.init(rngs, batch["target_vec"], train=True)

    warmup, gan, init_state = make_hierarchy_train_steps(
        cfg, stages, disc, audio_enc, text_enc)
    state = init_state({"params": gen_params, "batch_stats": gen_stats}, dv)
    state, m = warmup(state, batch, jax.random.PRNGKey(9))
    for k in ("loss", "KLD", "DIV_REG", "c_pos", "phy"):
        assert np.isfinite(float(m[k])), k


@pytest.mark.slow
def test_hierarchical_gru_discriminator(rng):
    m = H.HierarchicalDiscriminator(input_size=27, hidden_size=16, n_layers=2)
    poses = jnp.asarray(rng.normal(size=(2, 34, 27)).astype(np.float32))
    var = m.init(jax.random.PRNGKey(0), poses)
    y = m.apply(var, poses)
    assert y.shape == (2, 1)
    assert np.all((np.asarray(y) > 0) & (np.asarray(y) < 1))
