"""Joint-embedding / gesture-autoencoder train step
(reference train_eval/train_joint_embed.py:5-62).

Trains the FGD feature networks: recon L1 (per-sample mean, summed over
batch), optional KLD annealed after epoch 10 (off by default — the reference
hardcodes variational_encoding=False on both paths, :11-14).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from hop_tpu.config import Config
from hop_tpu.train.state import SimpleTrainState, adam


def make_embed_train_step(cfg: Config, net, mode: str = "pose"):
    tx = adam(cfg.train.learning_rate, cfg.train.betas)

    def init_state(variables):
        return SimpleTrainState.create(variables, tx)

    def loss_fn(params, stats, batch, rng):
        target = batch["target_vec"]
        pre = target[:, :cfg.data.n_pre_poses]
        variables = {"params": params, "batch_stats": stats}
        (outs, upd) = net.apply(
            variables,
            batch.get("text_padded"), batch.get("in_audio"), pre, target,
            input_mode=mode, variational=False, rng=rng, train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"])
        recon = outs[-1]
        per_sample = jnp.mean(jnp.abs(recon - target), axis=(1, 2))
        loss = jnp.sum(per_sample)
        return loss, (upd["batch_stats"], {"loss": loss})

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: SimpleTrainState, batch, rng):
        (loss, (stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.stats, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            stats=stats, opt_state=opt_state), metrics

    return train_step, init_state


def make_motion_ae_train_step(cfg: Config, net):
    """MotionAE (expressive FGD net): recon L1 + pose-diff L1 + cosine, as in
    the expressive evaluator's loss accounting (EmbeddingSpaceEvaluator.py:
    push_samples expressive branch)."""
    tx = adam(cfg.train.learning_rate, cfg.train.betas)

    def init_state(variables):
        return SimpleTrainState.create(variables, tx)

    def loss_fn(params, stats, batch):
        target = batch["target_vec"]
        (recon, _), upd = net.apply(
            {"params": params, "batch_stats": stats}, target, True,
            mutable=["batch_stats"])
        l1 = jnp.mean(jnp.abs(recon - target), axis=(1, 2))
        td = target[:, 1:] - target[:, :-1]
        rd = recon[:, 1:] - recon[:, :-1]
        l1 = l1 + jnp.mean(jnp.abs(rd - td), axis=(1, 2))
        loss = jnp.sum(l1)
        return loss, (upd["batch_stats"], {"loss": loss})

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: SimpleTrainState, batch, rng):
        del rng
        (loss, (stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.stats, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            stats=stats, opt_state=opt_state), metrics

    return train_step, init_state
