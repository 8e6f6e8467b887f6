"""Epoch loop orchestration: GAN gating, meters, metrics stream, best-FGD."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from hop_tpu.config import tiny_test_config
from hop_tpu.eval.evaluate import EvalResult
from hop_tpu.train.loops import run_training


def test_run_training_gating_and_checkpointing(tmp_path):
    cfg = tiny_test_config("TED")  # warmup_epochs=10
    import dataclasses
    cfg = cfg.replace(loss=dataclasses.replace(cfg.loss, warmup_epochs=1))
    calls = {"warmup": 0, "gan": 0}

    def warmup(state, batch, rng):
        calls["warmup"] += 1
        return state + 1, {"loss": jnp.asarray(1.0)}

    def gan(state, batch, rng):
        calls["gan"] += 1
        return state + 1, {"loss": jnp.asarray(0.5), "dis": jnp.asarray(0.1)}

    fgds = iter([5.0, 3.0, 4.0])
    saved = []

    class FakeCkpt:
        metadata = None

        def save(self, step, state, metadata=None):
            saved.append((step, metadata["fgd"]))

        def record_best(self, name, value, step):
            return True

    def eval_fn(state, epoch):
        return EvalResult(loss=1.0, mae=0.1, frechet_dist=next(fgds),
                          feat_dist=0.2, bc=0.0, diversity=1.0,
                          elapsed_sec=0.0)

    def batches(epoch):
        for _ in range(3):
            yield {"x": jnp.zeros((4, 2))}

    metrics_path = tmp_path / "m.jsonl"
    state, best = run_training(
        cfg, batches, warmup, gan, jnp.asarray(0),
        rng=jax.random.PRNGKey(0), eval_fn=eval_fn,
        checkpoint_manager=FakeCkpt(), metric_path=str(metrics_path),
        log_every=2, epochs=3)

    # epochs 0,1 warmup (epoch > 1 gate), epoch 2 gan; 3 batches each
    assert calls == {"warmup": 6, "gan": 3}
    assert int(state) == 9
    assert best == 3.0
    assert len(saved) == 3
    lines = [json.loads(l) for l in metrics_path.read_text().splitlines()]
    names = {l["name"] for l in lines}
    assert {"val_frechet_dist/val", "BC/val",
            "diversity_score/val"} <= names
