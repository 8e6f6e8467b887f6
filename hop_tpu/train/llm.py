"""HOP train step (the reference's train_llm loop, train_eval/train_llm.py).

Two jit-compiled variants sharing one loss core:

  * warmup_step — epochs <= warmup (reference gate `epoch > 10`,
    train_llm.py:15,81): generator-only update, no discriminator.
  * gan_step — adds the ns-GAN discriminator update before the generator
    update and the adversarial term to the generator loss.

Faithful structure per step in the GAN phase (train_llm.py:15-86):
three full generator forwards (D-phase sample, G-phase sample, random-video
sample for the diversity regulariser) and three discriminator forwards.
BatchNorm statistics chain through the forwards in the reference's order.
All randomness (speaker reparameterisation, target/output noise, random
video permutation, dropout) is threaded from one per-step PRNG key.

Each returned step is an EpochStep exposing ``for_epoch(epoch)``: epoch 0
compiles with the frozen backbone's dropout disabled, matching the
reference's actual module-mode dynamics (HF from_pretrained leaves the
BertModel in eval mode; the first evaluate_testset's model.train(True)
flips it — Evaluate.py:145,290, run_ted.py:379 comment, :447).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from hop_tpu.config import Config
from hop_tpu.models.common import huber, kld_loss
from hop_tpu.train.state import GANTrainState, adam, adam_with_frozen


def _gen_apply(model, params, stats, batch, rng, vids, train=True,
               llm_train=None):
    rng_z, rng_drop = jax.random.split(rng)
    variables = {"params": params, "batch_stats": stats}
    n_seed = model.cfg.data.n_seed_frames
    (out, z, mu, logvar), updates = model.apply(
        variables,
        batch["in_audio"], batch["log_mel"], batch["text_padded"],
        batch["target_vec"][:, :n_seed], vids,
        rng=rng_z, train=train, llm_train=llm_train,
        rngs={"dropout": rng_drop},
        mutable=["batch_stats"])
    return (out, z, mu, logvar), updates["batch_stats"]


class EpochStep:
    """A train step whose compiled variant depends on the epoch.

    Reference mode dynamics (see HOPModel.trunk docstring): the frozen
    backbone arrives in eval mode from HF from_pretrained and is only
    flipped to train mode by the first evaluate_testset's
    model.train(True) (Evaluate.py:290, called every epoch,
    run_ted.py:447) — so epoch 0 trains with backbone dropout OFF,
    epochs >= 1 with it ON. Calling the step directly (no for_epoch)
    uses the steady-state variant."""

    def __init__(self, steady, epoch0):
        self._steady, self._epoch0 = steady, epoch0

    def __call__(self, state, batch, rng):
        return self._steady(state, batch, rng)

    def for_epoch(self, epoch: int):
        return self._epoch0 if epoch == 0 else self._steady


def _div_diagnostics(div_raw, pose_l1, z_l1, out, mu, logvar, loss_cfg):
    """Observability scalars for the diversity regulariser (all
    stop_gradient-ed, loss-neutral). Added to root-cause the expressive
    fused seed-2023 high-diversity regime (VERDICT r4 weak #1): the raw
    (pre-clamp) ratio, the fraction of samples saturating the clamp
    (where the regulariser's gradient vanishes), its numerator/denominator,
    and the magnitudes of the generator output and the speaker posterior."""
    sg = jax.lax.stop_gradient
    return {
        "div_raw": sg(div_raw).mean(),
        "div_clamp_frac": (sg(div_raw) <= loss_cfg.div_clamp).mean(),
        "div_pose_l1": sg(pose_l1).mean(),
        "div_z_l1": sg(z_l1).mean(),
        "out_abs": jnp.abs(sg(out)).mean(),
        "mu_abs": jnp.abs(sg(mu)).mean(),
        "logvar_mean": sg(logvar).mean(),
    }


def _dis_apply(model, params, stats, poses, text, rng, train=True):
    variables = {"params": params, "batch_stats": stats}
    score, updates = model.apply(
        variables, poses, text, train,
        rngs={"dropout": rng},
        mutable=["batch_stats"])
    return score, updates["batch_stats"]


def make_hop_train_steps(cfg: Config, model, discriminator):
    """Returns (warmup_step, gan_step, init_state_fn)."""
    loss_cfg = cfg.loss
    gen_tx_holder = {}

    def init_state(gen_vars, dis_vars) -> GANTrainState:
        gen_tx = adam_with_frozen(cfg.train.learning_rate, gen_vars["params"],
                                  cfg.train.betas)
        dis_tx = adam(cfg.train.learning_rate * cfg.train.dis_lr_scale,
                      cfg.train.betas)
        gen_tx_holder["gen"] = gen_tx
        gen_tx_holder["dis"] = dis_tx
        return GANTrainState.create(gen_vars, dis_vars, gen_tx, dis_tx)

    def gen_loss(gen_params, gen_stats, dis_params, dis_stats, batch, rng,
                 use_gan: bool, llm_train: bool = True):
        rng_fwd, rng_perm, rng_rand, rng_dis = jax.random.split(rng, 4)
        target = batch["target_vec"]
        vids = batch["vid_indices"]

        (out, z, mu, logvar), gen_stats = _gen_apply(
            model, gen_params, gen_stats, batch, rng_fwd, vids,
            llm_train=llm_train)

        h = huber(out, target, loss_cfg.huber_beta)

        # diversity regulariser: divergent outputs for shuffled speakers
        # (train_llm.py:50-69)
        rand_vids = jax.random.permutation(rng_perm, vids)
        (out_rand, z_rand, _, _), gen_stats = _gen_apply(
            model, gen_params, gen_stats, batch, rng_rand, rand_vids,
            llm_train=llm_train)
        beta = loss_cfg.div_beta
        d = jnp.abs(out - jax.lax.stop_gradient(out_rand)) / beta
        pose_l1 = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5) * beta
        pose_l1 = pose_l1.sum(axis=(1, 2))
        z_l1 = jnp.mean(jnp.abs(jax.lax.stop_gradient(z)
                                - jax.lax.stop_gradient(z_rand)), axis=-1)
        div_raw = -(pose_l1 / (z_l1 + 1e-5))
        div_reg = jnp.clip(div_raw, loss_cfg.div_clamp, None).mean()

        kld = kld_loss(mu, logvar)

        loss = (h * loss_cfg.regression_weight
                + div_reg * loss_cfg.reg_weight
                + kld * loss_cfg.kld_weight)
        metrics = {"loss": h * loss_cfg.regression_weight,
                   "KLD": kld * loss_cfg.kld_weight,
                   "DIV_REG": div_reg * loss_cfg.reg_weight,
                   **_div_diagnostics(div_raw, pose_l1, z_l1, out, mu,
                                      logvar, loss_cfg)}

        new_dis_stats = dis_stats
        if use_gan:
            dis_out, new_dis_stats = _dis_apply(
                discriminator, dis_params, dis_stats, out,
                batch["text_padded"], rng_dis)
            gen_error = -jnp.mean(jnp.log(dis_out + 1e-8))
            loss = loss + gen_error * loss_cfg.gan_weight
            metrics["gen"] = gen_error * loss_cfg.gan_weight

        return loss, (gen_stats, new_dis_stats, metrics)

    def dis_loss(dis_params, dis_stats, fake, target, text, rng):
        rng_nt, rng_nf, rng_d1, rng_d2 = jax.random.split(rng, 4)
        # use_noisy_target=True (train_llm.py:13,22-26)
        noisy_target = target + 0.1 * jax.random.normal(rng_nt, target.shape)
        noisy_fake = fake + 0.1 * jax.random.normal(rng_nf, fake.shape)
        dis_real, dis_stats = _dis_apply(discriminator, dis_params, dis_stats,
                                         noisy_target, text, rng_d1)
        dis_fake, dis_stats = _dis_apply(discriminator, dis_params, dis_stats,
                                         noisy_fake, text, rng_d2)
        err = -jnp.mean(jnp.log(dis_real + 1e-8)
                        + jnp.log(1.0 - dis_fake + 1e-8))
        return err, dis_stats

    def _gen_update(state: GANTrainState, batch, rng, use_gan: bool,
                    llm_train: bool = True):
        grad_fn = jax.value_and_grad(gen_loss, has_aux=True)
        (loss, (gen_stats, dis_stats, metrics)), grads = grad_fn(
            state.gen_params, state.gen_stats, state.dis_params,
            state.dis_stats, batch, rng, use_gan, llm_train)
        updates, opt_state = gen_tx_holder["gen"].update(
            grads, state.gen_opt_state, state.gen_params)
        return state.replace(
            step=state.step + 1,
            gen_params=optax.apply_updates(state.gen_params, updates),
            gen_stats=gen_stats,
            gen_opt_state=opt_state,
            dis_stats=dis_stats,
        ), metrics

    # ---- fused fast path (cfg.hop.fused_step) -----------------------------
    def _two_speaker_apply(gen_params, gen_stats, batch, rng,
                           llm_train: bool = True):
        rng_z, rng_drop = jax.random.split(rng)
        rng_perm, rng_z = jax.random.split(rng_z)
        vids = batch["vid_indices"]
        rand_vids = jax.random.permutation(rng_perm, vids)
        (out, out_rand, (z, mu, logvar), z_rand), upd = model.apply(
            {"params": gen_params, "batch_stats": gen_stats},
            batch["in_audio"], batch["log_mel"], batch["text_padded"],
            batch["target_vec"][:, :cfg.data.n_seed_frames], vids, rand_vids,
            rng=rng_z, train=True, llm_train=llm_train,
            rngs={"dropout": rng_drop},
            mutable=["batch_stats"],
            method="two_speaker_forward")
        return (out, out_rand, z, mu, logvar, z_rand), upd["batch_stats"]

    def fused_loss(gen_params, dis_params, gen_stats, dis_stats, batch, rng,
                   use_gan: bool, llm_train: bool = True):
        rng_fwd, rng_d1, rng_d = jax.random.split(rng, 3)
        target = batch["target_vec"]
        (out, out_rand, z, mu, logvar, z_rand), gen_stats = \
            _two_speaker_apply(gen_params, gen_stats, batch, rng_fwd,
                               llm_train)

        h = huber(out, target, loss_cfg.huber_beta)
        beta = loss_cfg.div_beta
        d = jnp.abs(out - jax.lax.stop_gradient(out_rand)) / beta
        pose_l1 = (jnp.where(d < 1.0, 0.5 * d * d, d - 0.5) * beta
                   ).sum(axis=(1, 2))
        z_l1 = jnp.mean(jnp.abs(jax.lax.stop_gradient(z)
                                - jax.lax.stop_gradient(z_rand)), axis=-1)
        div_raw = -(pose_l1 / (z_l1 + 1e-5))
        div_reg = jnp.clip(div_raw, loss_cfg.div_clamp, None).mean()
        kld = kld_loss(mu, logvar)
        loss = (h * loss_cfg.regression_weight
                + div_reg * loss_cfg.reg_weight
                + kld * loss_cfg.kld_weight)
        metrics = {"loss": h * loss_cfg.regression_weight,
                   "KLD": kld * loss_cfg.kld_weight,
                   "DIV_REG": div_reg * loss_cfg.reg_weight,
                   **_div_diagnostics(div_raw, pose_l1, z_l1, out, mu,
                                      logvar, loss_cfg)}

        if use_gan:
            # G term against the (frozen) current discriminator
            frozen_dis = jax.lax.stop_gradient(dis_params)
            dis_out, dis_stats = _dis_apply(
                discriminator, frozen_dis, dis_stats, out,
                batch["text_padded"], rng_d1)
            gen_error = -jnp.mean(jnp.log(dis_out + 1e-8))
            loss = loss + gen_error * loss_cfg.gan_weight
            metrics["gen"] = gen_error * loss_cfg.gan_weight

            # D term on the detached sample (noisy targets, train_llm.py:22)
            dis_err, dis_stats = dis_loss(
                dis_params, dis_stats, jax.lax.stop_gradient(out), target,
                batch["text_padded"], rng_d)
            loss = loss + dis_err
            metrics["dis"] = dis_err

        return loss, (gen_stats, dis_stats, metrics)

    def _fused_update(state, batch, rng, use_gan, llm_train=True):
        grad_fn = jax.value_and_grad(fused_loss, argnums=(0, 1),
                                     has_aux=True)
        (loss, (gen_stats, dis_stats, metrics)), (ggrads, dgrads) = grad_fn(
            state.gen_params, state.dis_params, state.gen_stats,
            state.dis_stats, batch, rng, use_gan, llm_train)
        gupd, gopt = gen_tx_holder["gen"].update(
            ggrads, state.gen_opt_state, state.gen_params)
        state = state.replace(
            step=state.step + 1,
            gen_params=optax.apply_updates(state.gen_params, gupd),
            gen_stats=gen_stats, gen_opt_state=gopt, dis_stats=dis_stats)
        if use_gan:
            dupd, dopt = gen_tx_holder["dis"].update(
                dgrads, state.dis_opt_state, state.dis_params)
            state = state.replace(
                dis_params=optax.apply_updates(state.dis_params, dupd),
                dis_opt_state=dopt)
        return state, metrics

    def _jit_fused(use_gan, llm_train):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, rng):
            return _fused_update(state, batch, rng, use_gan=use_gan,
                                 llm_train=llm_train)
        return step

    if cfg.hop.fused_step:
        return (EpochStep(_jit_fused(False, True), _jit_fused(False, False)),
                EpochStep(_jit_fused(True, True), _jit_fused(True, False)),
                init_state)

    def _jit_warmup(llm_train):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, rng):
            return _gen_update(state, batch, rng, use_gan=False,
                               llm_train=llm_train)
        return step

    def _jit_gan(llm_train):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def gan_step(state: GANTrainState, batch, rng):
            rng_d_fwd, rng_d, rng_g = jax.random.split(rng, 3)

            # --- D phase: extra generator forward, detached
            # (train_llm.py:15-36)
            (fake, *_), gen_stats = _gen_apply(
                model, state.gen_params, state.gen_stats, batch, rng_d_fwd,
                batch["vid_indices"], llm_train=llm_train)
            fake = jax.lax.stop_gradient(fake)
            grad_fn = jax.value_and_grad(dis_loss, has_aux=True)
            (dis_err, dis_stats), dgrads = grad_fn(
                state.dis_params, state.dis_stats, fake, batch["target_vec"],
                batch["text_padded"], rng_d)
            dupdates, dis_opt_state = gen_tx_holder["dis"].update(
                dgrads, state.dis_opt_state, state.dis_params)
            state = state.replace(
                gen_stats=gen_stats,
                dis_params=optax.apply_updates(state.dis_params, dupdates),
                dis_stats=dis_stats,
                dis_opt_state=dis_opt_state)

            # --- G phase against the freshly updated discriminator
            state, metrics = _gen_update(state, batch, rng_g, use_gan=True,
                                         llm_train=llm_train)
            metrics["dis"] = dis_err
            return state, metrics
        return gan_step

    return (EpochStep(_jit_warmup(True), _jit_warmup(False)),
            EpochStep(_jit_gan(True), _jit_gan(False)),
            init_state)
