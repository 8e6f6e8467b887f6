"""HOP train step: runs, updates generator, keeps the LLM frozen."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from hop_tpu.config import tiny_test_config
from hop_tpu.data import synthetic
from hop_tpu.models.hop import HOPModel
from hop_tpu.models.multimodal_context import ConvDiscriminator
from hop_tpu.train.llm import make_hop_train_steps


def _setup(dataset="TED", batch=4):
    cfg = tiny_test_config(dataset)
    batch_np = synthetic.make_batch(cfg, batch, seed=0)
    batch_np["text_padded"] = batch_np["text_padded"] % cfg.llm.vocab_size
    batch_np = synthetic.add_device_features(batch_np, cfg)
    b = {k: jnp.asarray(v) for k, v in batch_np.items()
         if k in ("in_audio", "log_mel", "text_padded", "target_vec",
                  "vid_indices")}

    model = HOPModel(cfg, n_speakers=10)
    disc = ConvDiscriminator()
    gen_vars = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(3)},
        b["in_audio"], b["log_mel"], b["text_padded"],
        b["target_vec"][:, :16], b["vid_indices"],
        rng=jax.random.PRNGKey(1), train=True)
    dis_vars = disc.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(4)},
        b["target_vec"], train=True)
    warmup, gan, init_state = make_hop_train_steps(cfg, model, disc)
    state = init_state(gen_vars, dis_vars)
    return cfg, b, state, warmup, gan


@pytest.mark.slow
def test_warmup_step_updates_generator_not_llm():
    cfg, b, state, warmup, gan = _setup()
    llm_before = jax.tree_util.tree_map(np.asarray, state.gen_params["llm"])
    out_before = np.asarray(state.gen_params["out_fc2"]["kernel"])

    state2, metrics = warmup(state, b, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["KLD"]))
    # trainable head moved
    assert not np.allclose(
        out_before, np.asarray(state2.gen_params["out_fc2"]["kernel"]))
    # frozen LLM identical
    llm_after = jax.tree_util.tree_map(np.asarray, state2.gen_params["llm"])
    for (p1, a), (p2, bb) in zip(
            jax.tree_util.tree_leaves_with_path(llm_before),
            jax.tree_util.tree_leaves_with_path(llm_after)):
        np.testing.assert_array_equal(a, bb)


@pytest.mark.slow
def test_gan_step_updates_both():
    cfg, b, state, warmup, gan = _setup()
    dis_before = np.asarray(
        jax.tree_util.tree_leaves(state.dis_params)[0])
    state2, metrics = gan(state, b, jax.random.PRNGKey(8))
    for k in ("loss", "KLD", "DIV_REG", "gen", "dis"):
        assert np.isfinite(float(metrics[k])), k
    assert not np.allclose(
        dis_before, np.asarray(jax.tree_util.tree_leaves(state2.dis_params)[0]))
    assert int(state2.step) == 1


@pytest.mark.slow
def test_two_steps_loss_finite():
    cfg, b, state, warmup, gan = _setup()
    for i in range(2):
        state, m = warmup(state, b, jax.random.PRNGKey(10 + i))
    assert np.isfinite(float(m["loss"]))
