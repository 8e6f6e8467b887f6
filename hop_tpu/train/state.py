"""Train-state containers and optimizer factories.

The reference uses torch Adam with betas (0.5, 0.999), generator lr and a
discriminator at lr*0.1 (reference run_ted.py:338-346), plus a OneCycleLR
scheduler that is prepared but never stepped (run_ted.py:352-356, no
scheduler.step() in the loop) — so the effective schedule is constant; we
default to constant and expose a schedule hook.

The frozen LLM backbone (HOP.py:90-91) is excluded from updates with an
optax.multi_transform mask rather than stop_gradient: gradients must still
flow *through* the frozen layers into the reprogramming/align layers that
feed them.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct
from flax.core import FrozenDict


def adam(lr: float, betas=(0.5, 0.999)) -> optax.GradientTransformation:
    return optax.adam(learning_rate=lr, b1=betas[0], b2=betas[1])


def make_schedule(base_lr: float, lradj: str = "constant",
                  steps_per_epoch: int = 1, epochs: int = 75,
                  pct_start: float = 0.2):
    """LR schedules mirroring the reference's scheduler options: OneCycleLR
    (run_ted.py:352-356) and CosineAnnealing (:349-350). The reference never
    calls scheduler.step(), so 'constant' is the parity default."""
    total = steps_per_epoch * epochs
    if lradj == "onecycle":
        return optax.linear_onecycle_schedule(
            transition_steps=total, peak_value=base_lr,
            pct_start=pct_start, pct_final=1.0, div_factor=25.0,
            final_div_factor=1e4)
    if lradj == "COS":
        return optax.cosine_decay_schedule(base_lr, decay_steps=total,
                                           alpha=1e-8 / base_lr)
    return base_lr


def frozen_llm_mask(params: Any, frozen_key: str = "llm") -> Any:
    """Label pytree: 'frozen' for the LLM subtree, 'train' elsewhere."""
    def label(path, _):
        return "frozen" if any(
            getattr(k, "key", None) == frozen_key for k in path) else "train"
    return jax.tree_util.tree_map_with_path(label, params)


def adam_with_frozen(lr: float, params: Any,
                     betas=(0.5, 0.999)) -> optax.GradientTransformation:
    return optax.multi_transform(
        {"train": adam(lr, betas), "frozen": optax.set_to_zero()},
        frozen_llm_mask(params))


class GANTrainState(struct.PyTreeNode):
    """Generator + discriminator parameters, stats and optimizer states."""

    step: jax.Array
    gen_params: Any
    gen_stats: Any           # batch_stats collections (may be empty dict)
    gen_opt_state: Any
    dis_params: Any
    dis_stats: Any
    dis_opt_state: Any

    @classmethod
    def create(cls, gen_vars: FrozenDict, dis_vars: FrozenDict,
               gen_tx: optax.GradientTransformation,
               dis_tx: optax.GradientTransformation) -> "GANTrainState":
        import jax.numpy as jnp
        gen_params = gen_vars["params"]
        dis_params = dis_vars["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            gen_stats=gen_vars.get("batch_stats", {}),
            gen_opt_state=gen_tx.init(gen_params),
            dis_params=dis_params,
            dis_stats=dis_vars.get("batch_stats", {}),
            dis_opt_state=dis_tx.init(dis_params),
        )


class SimpleTrainState(struct.PyTreeNode):
    """Single-network state (seq2seq, autoencoders)."""

    step: jax.Array
    params: Any
    stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: FrozenDict,
               tx: optax.GradientTransformation) -> "SimpleTrainState":
        import jax.numpy as jnp
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params))
