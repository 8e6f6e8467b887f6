"""Hierarchical (HA2G) cascade train step.

Counterpart of reference train_eval/train_hierarchy.py:71-293 (TED,
3 stages) and train_eval/train_hierarchy_expressive.py:124-484 (expressive,
6 stages): the shared ResNetSE audio encoder produces per-level blended
features, each stage generates its bone subset seeded by the previous
stage's overlapping bones (slice routing derived in models/hierarchy.py),
losses are Huber summed over stages + ns-GAN + KLD + diversity +
softmax-contrastive text/audio alignment + the physical angle prior.

The reference steps one Adam per module group simultaneously
(train_hierarchy.py:270-274); Adam state is per-parameter, so a single Adam
over the combined generator-side tree is mathematically identical.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import functools

import jax
import jax.numpy as jnp
import optax

from hop_tpu.config import Config
from hop_tpu.models import hierarchy as H
from hop_tpu.models.common import huber, kld_loss
from hop_tpu.train.state import GANTrainState, adam

from hop_tpu.train import hierarchy_expressive_stats as hx


def softmax_contrastive(feat1: jnp.ndarray, feat2: jnp.ndarray) -> jnp.ndarray:
    """CE over inverse pairwise-L2 similarities (train_hierarchy.py:23-68)."""
    f1 = feat1 / jnp.maximum(jnp.linalg.norm(feat1, axis=1, keepdims=True),
                             1e-12)
    f2 = feat2 / jnp.maximum(jnp.linalg.norm(feat2, axis=1, keepdims=True),
                             1e-12)
    d = jnp.linalg.norm(f1[:, None, :] - f2[None, :, :], axis=-1)
    logits = jnp.clip(1.0 / (d + 1e-8), 1e-8, None)
    labels = jnp.arange(f1.shape[0])
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels).mean()


def physical_loss(out_dir_vec: jnp.ndarray, mean_dir_vec: np.ndarray,
                  angle_pairs, avg_angle, var_angle,
                  add_palms: bool = False) -> jnp.ndarray:
    """Angle prior: mean((angle - avg)^2 / 2var) summed over pairs
    (train_hierarchy.py:242-262; expressive variant appends palm
    cross-product pseudo-bones, train_hierarchy_expressive.py:429-433)."""
    vec = out_dir_vec + jnp.asarray(mean_dir_vec)[None, None, :]
    if add_palms:
        left = jnp.cross(vec[:, :, 11 * 3:12 * 3], vec[:, :, 17 * 3:18 * 3])
        right = jnp.cross(vec[:, :, 28 * 3:29 * 3], vec[:, :, 34 * 3:35 * 3])
        vec = jnp.concatenate([vec, left, right], axis=-1)
    v = vec.reshape(vec.shape[0] * vec.shape[1], -1, 3)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    pairs = np.asarray(angle_pairs)
    inner = jnp.clip(jnp.sum(v[:, pairs[:, 0]] * v[:, pairs[:, 1]], axis=-1),
                     -1 + 1e-7, 1 - 1e-7)
    angle = jnp.arccos(inner) / math.pi  # (BT, P)
    avg = jnp.asarray(avg_angle)
    var = jnp.asarray(var_angle)
    return jnp.sum(jnp.mean((angle - avg[None]) ** 2 / (2 * var[None]),
                            axis=0))


def make_hierarchy_train_steps(cfg: Config, stages, discriminator,
                               audio_encoder, text_encoder):
    """stages: list of HierarchicalPoseGenerator modules (coarse -> fine)."""
    loss_cfg = cfg.loss
    dataset = cfg.data.dataset
    bones = H.stage_bones(dataset)
    n_stages = len(bones)
    assert len(stages) == n_stages
    skel = cfg.data.skeleton
    if dataset == "TED":
        avg_angle, var_angle = H.TED_AVG_ANGLE, H.TED_VAR_ANGLE
        angle_pairs = skel.angle_pairs
    else:
        avg_angle, var_angle = hx.AVG_ANGLE, hx.VAR_ANGLE
        angle_pairs = skel.angle_pairs
    tx = {}

    def init_state(gen_vars, dis_vars):
        tx["gen"] = adam(cfg.train.learning_rate, cfg.train.betas)
        tx["dis"] = adam(cfg.train.learning_rate * cfg.train.dis_lr_scale,
                         cfg.train.betas)
        return GANTrainState.create(gen_vars, dis_vars, tx["gen"], tx["dis"])

    def encode(params, stats, batch, rng, vids):
        """Audio + text features. gen_params is a dict of sub-trees."""
        (weight, f_low, f_mid, f_high, blends), upd_a = audio_encoder.apply(
            {"params": params["audio"], "batch_stats": stats["audio"]},
            batch["spectrogram"], vids, True, mutable=["batch_stats"])
        text_feat, upd_t = text_encoder.apply(
            {"params": params["text"], "batch_stats": stats.get("text", {})},
            batch["text_padded"], True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        new_stats = dict(stats)
        new_stats["audio"] = upd_a["batch_stats"]
        new_stats["text"] = upd_t.get("batch_stats", {})
        return (f_low, f_mid, f_high, blends, text_feat), new_stats

    def cascade(params, stats, batch, blends, rng, vids):
        """Run all stages, routing outputs; returns per-stage outputs."""
        target = batch["target_vec"]
        outs = []
        prev_out = None
        prev_bones = None
        z_pack = None
        new_stats = dict(stats)
        for k in range(n_stages):
            tk = H.slice_target(target, bones[k])
            pre = H.route_pre_seq(tk, prev_out, bones[k], prev_bones,
                                  cfg.data.n_pre_poses,
                                  tail_bones=H.routing_tail(dataset))
            rng, rk, rd = jax.random.split(rng, 3)
            key = f"g{k + 1}"
            (out, z, mu, logvar), upd = stages[k].apply(
                {"params": params[key], "batch_stats": stats.get(key, {})},
                pre, batch["text_padded"], blends[k], vids,
                rng=rk, train=True, rngs={"dropout": rd},
                mutable=["batch_stats"])
            new_stats[key] = upd.get("batch_stats", {})
            outs.append(out)
            prev_out, prev_bones = out, bones[k]
            z_pack = (z, mu, logvar)
        return outs, z_pack, new_stats

    def dis_apply(params, stats, poses, text, rng):
        score, upd = discriminator.apply(
            {"params": params, "batch_stats": stats}, poses, text, True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        return score, upd["batch_stats"]

    def gen_loss(gen_params, gen_stats, dis_params, dis_stats, batch, rng,
                 use_gan: bool):
        rng_e, rng_c, rng_perm, rng_r, rng_d = jax.random.split(rng, 5)
        vids = batch["vid_indices"]
        target = batch["target_vec"]

        (f_low, f_mid, f_high, blends, text_feat), gen_stats = encode(
            gen_params, gen_stats, batch, rng_e, vids)
        outs, (z, mu, logvar), gen_stats = cascade(
            gen_params, gen_stats, batch, blends, rng_c, vids)
        out_final = outs[-1]

        h = sum(huber(o, H.slice_target(target, bones[k]),
                      loss_cfg.huber_beta) for k, o in enumerate(outs))

        # diversity regulariser via a full random-speaker cascade
        rand_vids = jax.random.permutation(rng_perm, vids)
        outs_rand, (z_rand, _, _), gen_stats = cascade(
            gen_params, gen_stats, batch, blends, rng_r, rand_vids)
        beta = loss_cfg.div_beta
        d = jnp.abs(out_final - jax.lax.stop_gradient(outs_rand[-1])) / beta
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
            score, new_dis_stats = dis_apply(dis_params, dis_stats, out_final,
                                             batch["text_padded"], rng_d)
            gen_error = -jnp.mean(jnp.log(score + 1e-8))
            loss = loss + gen_error * loss_cfg.gan_weight
            metrics["gen"] = gen_error * loss_cfg.gan_weight

        if loss_cfg.contrastive_pos_weight > 0.0:
            c_pos = softmax_contrastive(
                text_feat.reshape(-1, text_feat.shape[-1]),
                f_high.reshape(-1, f_high.shape[-1]))
            loss = loss + loss_cfg.contrastive_pos_weight * c_pos
            metrics["c_pos"] = loss_cfg.contrastive_pos_weight * c_pos
        if loss_cfg.contrastive_neg_weight > 0.0:
            c_neg = -softmax_contrastive(
                text_feat.reshape(-1, text_feat.shape[-1]),
                f_low.reshape(-1, f_low.shape[-1]))
            loss = loss + loss_cfg.contrastive_neg_weight * c_neg
            metrics["c_neg"] = loss_cfg.contrastive_neg_weight * c_neg
        if loss_cfg.physical_weight > 0.0:
            phy = physical_loss(out_final, skel.mean_dir_vec, angle_pairs,
                                avg_angle, var_angle,
                                add_palms=dataset != "TED")
            loss = loss + loss_cfg.physical_weight * phy
            metrics["phy"] = loss_cfg.physical_weight * phy

        return loss, (gen_stats, new_dis_stats, metrics)

    def dis_loss(dis_params, dis_stats, fake, target, text, rng):
        r1, r2 = jax.random.split(rng)
        dr, dis_stats = dis_apply(dis_params, dis_stats, target, text, r1)
        df, dis_stats = dis_apply(dis_params, dis_stats, fake, text, r2)
        err = -jnp.mean(jnp.log(dr + 1e-8) + jnp.log(1.0 - df + 1e-8))
        return err, dis_stats

    def _gen_update(state, batch, rng, use_gan):
        (loss, (gstats, dstats, metrics)), grads = jax.value_and_grad(
            gen_loss, has_aux=True)(
            state.gen_params, state.gen_stats, state.dis_params,
            state.dis_stats, batch, rng, use_gan)
        upd, opt = tx["gen"].update(grads, state.gen_opt_state,
                                    state.gen_params)
        return state.replace(
            step=state.step + 1,
            gen_params=optax.apply_updates(state.gen_params, upd),
            gen_stats=gstats, gen_opt_state=opt, dis_stats=dstats), metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def warmup_step(state, batch, rng):
        return _gen_update(state, batch, rng, use_gan=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def gan_step(state, batch, rng):
        rng_e, rng_c, rng_d, rng_g = jax.random.split(rng, 4)
        (f_low, f_mid, f_high, blends, _), gen_stats = encode(
            state.gen_params, state.gen_stats, batch, rng_e,
            batch["vid_indices"])
        outs, _, gen_stats = cascade(state.gen_params, gen_stats, batch,
                                     blends, rng_c, batch["vid_indices"])
        fake = jax.lax.stop_gradient(outs[-1])
        (dis_err, dstats), dgrads = jax.value_and_grad(
            dis_loss, has_aux=True)(
            state.dis_params, state.dis_stats, fake, batch["target_vec"],
            batch["text_padded"], rng_d)
        dupd, dopt = tx["dis"].update(dgrads, state.dis_opt_state,
                                      state.dis_params)
        state = state.replace(
            gen_stats=gen_stats,
            dis_params=optax.apply_updates(state.dis_params, dupd),
            dis_stats=dstats, dis_opt_state=dopt)
        state, metrics = _gen_update(state, batch, rng_g, use_gan=True)
        metrics["dis"] = dis_err
        return state, metrics

    return warmup_step, gan_step, init_state
