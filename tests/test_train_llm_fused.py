"""Fused HOP train step (shared trunk + joint G/D backward)."""

import pytest
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from hop_tpu.config import tiny_test_config
from hop_tpu.data import synthetic
from hop_tpu.models.hop import HOPModel
from hop_tpu.models.multimodal_context import ConvDiscriminator
from hop_tpu.train.llm import make_hop_train_steps


def _setup(batch=4):
    cfg = tiny_test_config("TED")
    cfg = cfg.replace(hop=dataclasses.replace(cfg.hop, fused_step=True))
    nb = synthetic.make_batch(cfg, batch, seed=0)
    nb["text_padded"] = nb["text_padded"] % cfg.llm.vocab_size
    nb = synthetic.add_device_features(nb, cfg)
    b = {k: jnp.asarray(v) for k, v in nb.items()
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
    return cfg, b, model, disc, gen_vars, dis_vars


@pytest.mark.slow
def test_two_speaker_forward_matches_single():
    """The fused trunk+head must equal two independent forwards when given
    identical speaker latents (deterministic mode)."""
    cfg, b, model, disc, gen_vars, dis_vars = _setup()
    out_a, out_b, (z, mu, logvar), z_rand = model.apply(
        gen_vars, b["in_audio"], b["log_mel"], b["text_padded"],
        b["target_vec"][:, :16], b["vid_indices"], b["vid_indices"],
        rng=jax.random.PRNGKey(5), train=False,
        method="two_speaker_forward")
    assert out_a.shape == out_b.shape == (4, 34, 27)
    # same vids but different reparameterisation noise -> close but not equal
    assert np.isfinite(np.asarray(out_a)).all()

    # single forward with the same latent z must match head(trunk, z)
    trunk = model.apply(gen_vars, b["in_audio"], b["log_mel"],
                        b["text_padded"], b["target_vec"][:, :16],
                        train=False, method="trunk")
    single = model.apply(gen_vars, trunk, z, method="head")
    np.testing.assert_allclose(np.asarray(single), np.asarray(out_a),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_steps_run_and_update():
    cfg, b, model, disc, gen_vars, dis_vars = _setup()
    warmup, gan, init_state = make_hop_train_steps(cfg, model, disc)
    state = init_state(gen_vars, dis_vars)
    head_before = np.asarray(state.gen_params["out_fc2"]["kernel"])
    dis_before = np.asarray(
        jax.tree_util.tree_leaves(state.dis_params)[0])

    state, m = warmup(state, b, jax.random.PRNGKey(7))
    for k in ("loss", "KLD", "DIV_REG"):
        assert np.isfinite(float(m[k])), k
    assert not np.allclose(head_before,
                           np.asarray(state.gen_params["out_fc2"]["kernel"]))

    state, m = gan(state, b, jax.random.PRNGKey(8))
    for k in ("loss", "gen", "dis"):
        assert np.isfinite(float(m[k])), k
    assert not np.allclose(
        dis_before, np.asarray(jax.tree_util.tree_leaves(state.dis_params)[0]))
