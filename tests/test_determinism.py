"""Reproducibility: identical seeds give identical training trajectories."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from hop_tpu.config import tiny_test_config
from hop_tpu.data import synthetic
from hop_tpu.models.multimodal_context import PoseGenerator, ConvDiscriminator
from hop_tpu.train.gan import make_gan_train_steps, build_pre_seq


def _run(seed):
    cfg = tiny_test_config("TED")
    nb = synthetic.make_batch(cfg, 4, seed=0)
    nb["text_padded"] = nb["text_padded"] % 50
    b = {k: jnp.asarray(v) for k, v in nb.items()
         if k in ("target_vec", "text_padded", "in_audio", "vid_indices")}
    gen = PoseGenerator(pose_dim=27, n_words=50, n_speakers=10,
                        hidden_size=16, n_layers=2)
    disc = ConvDiscriminator()
    pre = build_pre_seq(b["target_vec"], cfg.data.n_pre_poses)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    gen_vars = gen.init(rngs, pre, b["text_padded"], b["in_audio"],
                        b["vid_indices"], rng=jax.random.PRNGKey(2),
                        train=True)
    dis_vars = disc.init(rngs, b["target_vec"], train=True)
    warmup, gan, init_state = make_gan_train_steps(cfg, gen, disc)
    state = init_state(gen_vars, dis_vars)
    losses = []
    for i in range(3):
        state, m = warmup(state, b, jax.random.PRNGKey(seed + i))
        losses.append(float(m["loss"]))
    return losses


@pytest.mark.slow
def test_same_seed_same_trajectory():
    a = _run(100)
    b = _run(100)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_different_seed_different_noise():
    a = _run(100)
    b = _run(999)
    # reparameterisation/dropout noise differ -> losses differ
    assert not np.allclose(a, b)
