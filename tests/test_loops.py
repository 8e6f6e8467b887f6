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


def _guard_harness(fgds, divs, fused):
    """Drive run_training with scripted eval results; return
    (best_fgd, best_records, refused_epochs_from_metrics, tmpdir_metrics)."""
    import dataclasses
    cfg = tiny_test_config("TED")
    cfg = cfg.replace(loss=dataclasses.replace(cfg.loss, warmup_epochs=100),
                      hop=dataclasses.replace(cfg.hop, fused_step=fused))
    results = iter(list(zip(fgds, divs)))
    bests = []

    class FakeCkpt:
        metadata = None

        def save(self, step, state, metadata=None):
            pass

        def record_best(self, name, value, step):
            bests.append((step, value))
            return True

    def eval_fn(state, epoch):
        fgd, div = next(results)
        return EvalResult(loss=1.0, mae=0.1, frechet_dist=fgd,
                          feat_dist=0.2, bc=0.0, diversity=div,
                          elapsed_sec=0.0)

    def warmup(state, batch, rng):
        return state, {"loss": jnp.asarray(1.0)}

    def batches(epoch):
        yield {"x": jnp.zeros((2, 2))}

    _, best = run_training(cfg, batches, warmup, None, jnp.asarray(0),
                           rng=jax.random.PRNGKey(0), eval_fn=eval_fn,
                           checkpoint_manager=FakeCkpt(),
                           epochs=len(fgds))
    return best, bests


def test_best_guard_refuses_degenerate_minimum():
    """Fused default: an FGD 'improvement' whose diversity is an order of
    magnitude above the run median is refused as best (the expressive
    seed-2023 shape: FGD 407 at diversity 294 vs ~0.15 median)."""
    fgds = [100.0, 90.0, 80.0, 70.0, 0.5, 60.0]
    divs = [0.2, 0.15, 0.18, 0.21, 294.0, 0.2]
    best, bests = _guard_harness(fgds, divs, fused=True)
    assert best == 60.0            # the degenerate 0.5 never became best
    assert (4, 0.5) not in bests   # and was never recorded as best
    assert bests[-1] == (5, 60.0)


def test_best_guard_needs_history_and_positive_median():
    """The guard stays silent before BEST_GUARD_MIN_HISTORY epochs and
    when the median diversity is 0 (untrained feature nets)."""
    # spike at epoch 2: history too short -> accepted (reference behavior)
    best, bests = _guard_harness([100.0, 90.0, 0.5], [0.2, 0.2, 294.0],
                                 fused=True)
    assert best == 0.5 and (2, 0.5) in bests
    # zero-median history -> accepted
    best, _ = _guard_harness([100.0] * 5 + [0.5], [0.0] * 5 + [294.0],
                             fused=True)
    assert best == 0.5


def test_best_guard_off_under_parity_step():
    """--parity-step keeps the reference's bare save-on-best criterion
    (run_ted.py:454-462): the degenerate minimum IS recorded."""
    fgds = [100.0, 90.0, 80.0, 70.0, 0.5, 60.0]
    divs = [0.2, 0.15, 0.18, 0.21, 294.0, 0.2]
    best, bests = _guard_harness(fgds, divs, fused=False)
    assert best == 0.5 and (4, 0.5) in bests
