"""Baseline train steps: trimodal GAN, seq2seq, speech2gesture, embed nets."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from hop_tpu.config import tiny_test_config
from hop_tpu.data import synthetic
from hop_tpu.models.embedding_net import EmbeddingNet
from hop_tpu.models.motion_ae import MotionAE
from hop_tpu.models.multimodal_context import PoseGenerator, ConvDiscriminator
from hop_tpu.models.seq2seq import Seq2SeqNet
from hop_tpu.models import speech2gesture as s2g
from hop_tpu.train.gan import make_gan_train_steps, build_pre_seq
from hop_tpu.train.seq2seq import make_seq2seq_train_step
from hop_tpu.train.speech2gesture import make_s2g_train_step
from hop_tpu.train.embed import make_embed_train_step, make_motion_ae_train_step


def _batch(cfg, n=4, seed=0, vocab=50):
    b = synthetic.make_batch(cfg, n, seed=seed)
    b["text_padded"] = b["text_padded"] % vocab
    b["word_seq"] = b["word_seq"] % vocab
    b = synthetic.add_device_features(b, cfg)
    mask = (np.arange(b["word_seq"].shape[1])[None]
            < b["text_lengths"][:, None]).astype(np.float32)
    b["text_mask"] = mask
    return {k: jnp.asarray(v) for k, v in b.items()
            if not isinstance(v, dict)}


def test_build_pre_seq():
    target = jnp.ones((2, 34, 27))
    pre = build_pre_seq(target, 4)
    assert pre.shape == (2, 34, 28)
    assert float(pre[0, 3, -1]) == 1.0 and float(pre[0, 4, -1]) == 0.0
    assert float(pre[0, 5, 0]) == 0.0 and float(pre[0, 2, 0]) == 1.0


@pytest.mark.slow
def test_trimodal_gan_step():
    cfg = tiny_test_config("TED")
    b = _batch(cfg)
    gen = PoseGenerator(pose_dim=27, n_words=50, n_speakers=10,
                        hidden_size=32, n_layers=2)
    dis = ConvDiscriminator()
    pre = build_pre_seq(b["target_vec"], cfg.data.n_pre_poses)
    gen_vars = gen.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        pre, b["text_padded"], b["in_audio"],
                        b["vid_indices"], rng=jax.random.PRNGKey(2),
                        train=True)
    dis_vars = dis.init({"params": jax.random.PRNGKey(3),
                         "dropout": jax.random.PRNGKey(4)},
                        b["target_vec"], train=True)
    warmup, gan, init_state = make_gan_train_steps(cfg, gen, dis)
    state = init_state(gen_vars, dis_vars)
    state, m = warmup(state, b, jax.random.PRNGKey(5))
    assert np.isfinite(float(m["loss"]))
    state, m = gan(state, b, jax.random.PRNGKey(6))
    for k in ("loss", "KLD", "DIV_REG", "gen", "dis"):
        assert np.isfinite(float(m[k])), k


@pytest.mark.slow
def test_seq2seq_step():
    cfg = tiny_test_config("TED")
    b = _batch(cfg)
    model = Seq2SeqNet(pose_dim=27, n_frames=34, n_pre_poses=4, n_words=50,
                       embed_size=16, hidden_size=24, n_layers=2)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           b["word_seq"], b["text_mask"], b["target_vec"],
                           train=True)
    step, init_state = make_seq2seq_train_step(cfg, model)
    state = init_state(variables)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    for i in range(2):
        state, m = step(state, b, jax.random.PRNGKey(10 + i))
    assert np.isfinite(float(m["loss"]))
    assert not np.allclose(p0, np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]))


@pytest.mark.slow
def test_speech2gesture_step():
    cfg = tiny_test_config("TED")
    b = _batch(cfg)
    gen = s2g.Generator(n_poses=34, pose_dim=27, n_pre_poses=4)
    dis = s2g.Discriminator(pose_dim=27)
    spec = jnp.asarray(b["spectrogram"])
    gen_vars = gen.init(jax.random.PRNGKey(0), spec,
                        b["target_vec"][:, :4], train=True)
    dis_vars = dis.init(jax.random.PRNGKey(1), b["target_vec"], train=True)
    step, init_state = make_s2g_train_step(cfg, gen, dis)
    state = init_state(gen_vars, dis_vars)
    state, m = step(state, b, jax.random.PRNGKey(2))
    for k in ("loss", "gen", "dis"):
        assert np.isfinite(float(m[k])), k


@pytest.mark.slow
def test_embed_step_and_motion_ae_step():
    cfg = tiny_test_config("TED")
    b = _batch(cfg)
    net = EmbeddingNet(pose_dim=27, n_frames=34, n_words=50, mode="pose")
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)},
                         None, None, b["target_vec"][:, :4], b["target_vec"],
                         input_mode="pose", train=True)
    step, init_state = make_embed_train_step(cfg, net)
    state = init_state(variables)
    state, m = step(state, b, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))

    cfg_e = tiny_test_config("TED_expressive")
    be = _batch(cfg_e)
    ae = MotionAE(pose_dim=126, latent_dim=32)
    ae_vars = ae.init(jax.random.PRNGKey(0), be["target_vec"], True)
    step2, init2 = make_motion_ae_train_step(cfg_e, ae)
    st = init2(ae_vars)
    st, m2 = step2(st, be, jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))
