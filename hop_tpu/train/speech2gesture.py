"""Speech2Gesture LS-GAN train step
(reference train_eval/train_speech2gesture.py:5-37).

D: MSE(1, D(target motion)) + MSE(0, D(fake motion)); G: 600*L1 + 5*MSE(1,
D(fake motion)).

Quirk reproduced deliberately: the reference DIFFS TWICE — the train step
passes first differences ("motion", train_speech2gesture.py:12-14) into a
discriminator whose forward diffs its input again (speech2gesture.py:247),
so D actually scores second-order differences over 32 frames. We pass the
precomputed motion into the discriminator exactly like the reference
(pinned against their live code in tests/test_reference_live_parity.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from hop_tpu.config import Config
from hop_tpu.train.state import GANTrainState, adam


def make_s2g_train_step(cfg: Config, generator, discriminator):
    tx = {}

    def init_state(gen_vars, dis_vars):
        tx["gen"] = adam(cfg.train.learning_rate, cfg.train.betas)
        tx["dis"] = adam(cfg.train.learning_rate * cfg.train.dis_lr_scale,
                         cfg.train.betas)
        return GANTrainState.create(gen_vars, dis_vars, tx["gen"], tx["dis"])

    def gen_apply(params, stats, batch):
        pre = batch["target_vec"][:, :cfg.data.n_pre_poses]
        out, upd = generator.apply(
            {"params": params, "batch_stats": stats},
            batch["spectrogram"], pre, True, mutable=["batch_stats"])
        return out, upd["batch_stats"]

    def dis_apply(params, stats, poses):
        score, upd = discriminator.apply(
            {"params": params, "batch_stats": stats}, poses, True,
            mutable=["batch_stats"])
        return score, upd["batch_stats"]

    def motion(poses):
        # first differences; the discriminator diffs AGAIN internally
        # (the reference's double-diff, see module docstring)
        return poses[:, 1:] - poses[:, :-1]

    def dis_loss(dis_params, dis_stats, fake, target):
        dr, dis_stats = dis_apply(dis_params, dis_stats, motion(target))
        df, dis_stats = dis_apply(dis_params, dis_stats, motion(fake))
        err = jnp.mean((1.0 - dr) ** 2) + jnp.mean(df ** 2)
        return err, dis_stats

    def gen_loss(gen_params, gen_stats, dis_params, dis_stats, batch):
        out, gen_stats = gen_apply(gen_params, gen_stats, batch)
        l1 = jnp.mean(jnp.abs(out - batch["target_vec"]))
        score, dis_stats = dis_apply(dis_params, dis_stats, motion(out))
        gen_err = jnp.mean((1.0 - score) ** 2)
        loss = (cfg.loss.regression_weight * l1
                + cfg.loss.gan_weight * gen_err)
        return loss, (gen_stats, dis_stats,
                      {"loss": cfg.loss.regression_weight * l1,
                       "gen": cfg.loss.gan_weight * gen_err})

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: GANTrainState, batch, rng):
        del rng  # no stochastic layers in this baseline
        fake, gen_stats = gen_apply(state.gen_params, state.gen_stats, batch)
        fake = jax.lax.stop_gradient(fake)
        (dis_err, dis_stats), dgrads = jax.value_and_grad(
            dis_loss, has_aux=True)(state.dis_params, state.dis_stats, fake,
                                    batch["target_vec"])
        dupd, dopt = tx["dis"].update(dgrads, state.dis_opt_state,
                                      state.dis_params)
        state = state.replace(
            gen_stats=gen_stats,
            dis_params=optax.apply_updates(state.dis_params, dupd),
            dis_stats=dis_stats, dis_opt_state=dopt)

        (loss, (gen_stats, dis_stats, metrics)), ggrads = jax.value_and_grad(
            gen_loss, has_aux=True)(state.gen_params, state.gen_stats,
                                    state.dis_params, state.dis_stats, batch)
        gupd, gopt = tx["gen"].update(ggrads, state.gen_opt_state,
                                      state.gen_params)
        metrics["dis"] = dis_err
        return state.replace(
            step=state.step + 1,
            gen_params=optax.apply_updates(state.gen_params, gupd),
            gen_stats=gen_stats, gen_opt_state=gopt,
            dis_stats=dis_stats), metrics

    return train_step, init_state
