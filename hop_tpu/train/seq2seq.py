"""Seq2seq baseline train step (reference train_eval/train_seq2seq.py:6-51).

custom_loss = 600*MSE + kld_weight * continuity(sum |Δframe| / n_elements)
- reg_weight * motion-variance norm, with grad clipping at 5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from hop_tpu.config import Config
from hop_tpu.train.state import SimpleTrainState


def custom_loss(output: jnp.ndarray, target: jnp.ndarray,
                cfg: Config) -> jnp.ndarray:
    n_element = output.size
    mse = jnp.mean((output - target) ** 2) * cfg.loss.regression_weight
    cont = jnp.sum(jnp.abs(output[:, 1:] - output[:, :-1])) / n_element
    cont = cont * cfg.loss.kld_weight
    norm = jnp.linalg.norm(output, ord=2, axis=1)  # over time (torch dim=1)
    var = -jnp.sum(norm) / n_element * cfg.loss.reg_weight
    return mse + cont + var


def make_seq2seq_train_step(cfg: Config, model):
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip_seq2seq),
        optax.adam(cfg.train.learning_rate, b1=cfg.train.betas[0],
                   b2=cfg.train.betas[1]))

    def init_state(variables) -> SimpleTrainState:
        return SimpleTrainState.create(variables, tx)

    def loss_fn(params, stats, batch, rng):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        out = model.apply(variables, batch["word_seq"], batch["text_mask"],
                          batch["target_vec"], train=True,
                          rngs={"dropout": rng})
        return custom_loss(out, batch["target_vec"], cfg), {}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: SimpleTrainState, batch, rng):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.stats, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state), {"loss": loss}

    return train_step, init_state
