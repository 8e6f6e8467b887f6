"""Trimodal-context GAN train step (reference train_eval/train_gan.py:13-103).

Same adversarial schema as train/llm.py but for the PoseGenerator: the seed
input is built from the first n_pre_poses target frames plus an indicator
bit (train_gan.py:20-22), use_noisy_target is False, and the GAN gate is
`epoch > loss_warmup`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from hop_tpu.config import Config
from hop_tpu.models.common import huber, kld_loss
from hop_tpu.train.state import GANTrainState, adam


def build_pre_seq(target: jnp.ndarray, n_pre_poses: int) -> jnp.ndarray:
    """(B, T, D) -> (B, T, D+1): seed frames + constraint indicator bit."""
    B, T, D = target.shape
    pre = jnp.zeros((B, T, D + 1), target.dtype)
    pre = pre.at[:, :n_pre_poses, :D].set(target[:, :n_pre_poses])
    pre = pre.at[:, :n_pre_poses, D].set(1.0)
    return pre


def make_gan_train_steps(cfg: Config, generator, discriminator):
    loss_cfg = cfg.loss
    tx = {}

    def init_state(gen_vars, dis_vars) -> GANTrainState:
        tx["gen"] = adam(cfg.train.learning_rate, cfg.train.betas)
        tx["dis"] = adam(cfg.train.learning_rate * cfg.train.dis_lr_scale,
                         cfg.train.betas)
        return GANTrainState.create(gen_vars, dis_vars, tx["gen"], tx["dis"])

    def gen_apply(params, stats, pre_seq, batch, rng, vids):
        rng_z, rng_drop = jax.random.split(rng)
        (out, z, mu, logvar), upd = generator.apply(
            {"params": params, "batch_stats": stats},
            pre_seq, batch["text_padded"], batch["in_audio"], vids,
            rng=rng_z, train=True, rngs={"dropout": rng_drop},
            mutable=["batch_stats"])
        return (out, z, mu, logvar), upd["batch_stats"]

    def dis_apply(params, stats, poses, text, rng):
        score, upd = discriminator.apply(
            {"params": params, "batch_stats": stats}, poses, text, True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        return score, upd["batch_stats"]

    def gen_loss(gen_params, gen_stats, dis_params, dis_stats, batch, rng,
                 use_gan: bool):
        rng_fwd, rng_perm, rng_rand, rng_dis = jax.random.split(rng, 4)
        target = batch["target_vec"]
        vids = batch["vid_indices"]
        pre_seq = build_pre_seq(target, cfg.data.n_pre_poses)

        (out, z, mu, logvar), gen_stats = gen_apply(
            gen_params, gen_stats, pre_seq, batch, rng_fwd, vids)
        h = huber(out, target, loss_cfg.huber_beta)

        rand_vids = jax.random.permutation(rng_perm, vids)
        (out_rand, z_rand, _, _), gen_stats = gen_apply(
            gen_params, gen_stats, pre_seq, batch, rng_rand, rand_vids)
        beta = loss_cfg.div_beta
        d = jnp.abs(out - jax.lax.stop_gradient(out_rand)) / beta
        pose_l1 = (jnp.where(d < 1.0, 0.5 * d * d, d - 0.5) * beta
                   ).sum(axis=(1, 2))
        z_l1 = jnp.mean(jnp.abs(jax.lax.stop_gradient(z)
                                - jax.lax.stop_gradient(z_rand)), axis=-1)
        div_reg = jnp.clip(-(pose_l1 / (z_l1 + 1e-5)),
                           loss_cfg.div_clamp, None).mean()
        kld = kld_loss(mu, logvar)

        loss = (h * loss_cfg.regression_weight
                + kld * loss_cfg.kld_weight
                + div_reg * loss_cfg.reg_weight)
        metrics = {"loss": h * loss_cfg.regression_weight,
                   "KLD": kld * loss_cfg.kld_weight,
                   "DIV_REG": div_reg * loss_cfg.reg_weight}
        new_dis_stats = dis_stats
        if use_gan:
            score, new_dis_stats = dis_apply(dis_params, dis_stats, out,
                                             batch["text_padded"], rng_dis)
            gen_error = -jnp.mean(jnp.log(score + 1e-8))
            loss = loss + gen_error * loss_cfg.gan_weight
            metrics["gen"] = gen_error * loss_cfg.gan_weight
        return loss, (gen_stats, new_dis_stats, metrics)

    def dis_loss(dis_params, dis_stats, fake, target, text, rng):
        rng_d1, rng_d2 = jax.random.split(rng)
        dis_real, dis_stats = dis_apply(dis_params, dis_stats, target, text,
                                        rng_d1)
        dis_fake, dis_stats = dis_apply(dis_params, dis_stats, fake, text,
                                        rng_d2)
        err = -jnp.mean(jnp.log(dis_real + 1e-8)
                        + jnp.log(1.0 - dis_fake + 1e-8))
        return err, dis_stats

    def _gen_update(state, batch, rng, use_gan):
        (loss, (gstats, dstats, metrics)), grads = jax.value_and_grad(
            gen_loss, has_aux=True)(
            state.gen_params, state.gen_stats, state.dis_params,
            state.dis_stats, batch, rng, use_gan)
        updates, opt_state = tx["gen"].update(grads, state.gen_opt_state,
                                              state.gen_params)
        return state.replace(
            step=state.step + 1,
            gen_params=optax.apply_updates(state.gen_params, updates),
            gen_stats=gstats, gen_opt_state=opt_state,
            dis_stats=dstats), metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def warmup_step(state, batch, rng):
        return _gen_update(state, batch, rng, use_gan=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def gan_step(state, batch, rng):
        rng_fwd, rng_d, rng_g = jax.random.split(rng, 3)
        pre_seq = build_pre_seq(batch["target_vec"], cfg.data.n_pre_poses)
        (fake, *_), gen_stats = gen_apply(
            state.gen_params, state.gen_stats, pre_seq, batch, rng_fwd,
            batch["vid_indices"])
        fake = jax.lax.stop_gradient(fake)
        (dis_err, dis_stats), dgrads = jax.value_and_grad(
            dis_loss, has_aux=True)(
            state.dis_params, state.dis_stats, fake, batch["target_vec"],
            batch["text_padded"], rng_d)
        dupd, dopt = tx["dis"].update(dgrads, state.dis_opt_state,
                                      state.dis_params)
        state = state.replace(
            gen_stats=gen_stats,
            dis_params=optax.apply_updates(state.dis_params, dupd),
            dis_stats=dis_stats, dis_opt_state=dopt)
        state, metrics = _gen_update(state, batch, rng_g, use_gan=True)
        metrics["dis"] = dis_err
        return state, metrics

    return warmup_step, gan_step, init_state
