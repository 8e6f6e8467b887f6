"""Epoch-level training orchestration.

Counterpart of the epoch loop in reference run_ted.py:374-466 /
run_expressive.py: per-batch dispatch into the model's train step (with the
GAN warm-up gate handled here, in Python, so both phases stay statically
compiled), AverageMeter logging every 100 iterations with s/iter + ETA,
per-epoch evaluate_testset, JSONL metric stream (replacing TensorBoard),
and checkpoint save-on-best-FGD plus latest-for-resume.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from pathlib import Path
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from hop_tpu.config import Config
from hop_tpu.eval.evaluate import EvalResult, evaluate_testset
from hop_tpu.utils.meters import AverageMeter

METER_NAMES = ("loss", "var_loss", "gen", "dis", "KLD", "DIV_REG",
               "c_pos", "c_neg", "phy")

# Degenerate-minimum guard for best-checkpoint selection (round 5):
# an FGD improvement whose eval diversity is this many times the median
# of the run's prior epochs is refused as "best" (still saved on the
# periodic schedule). Motivated by the expressive fused seed-2023 run
# (benchmarks/FUSED_MULTISEED_EXPRESSIVE.json): its min-FGD epoch
# (FGD 407) sat at diversity 294 vs a 16.8 run median — the reference's
# bare save-on-best criterion (run_ted.py:454-462) would have shipped a
# degenerate model. Active for the fused default; --parity-step keeps
# the reference's exact criterion.
BEST_GUARD_DIV_RATIO = 10.0
BEST_GUARD_MIN_HISTORY = 4


def prefetch_iter(it: Iterable, depth: int):
    """Run ``it`` on a background thread, keeping up to ``depth`` items
    ready — so host batch assembly + the explicit device_put overlap with
    the device executing the previous step instead of serialising with it
    (the reference gets the same overlap from DataLoader num_workers,
    run_ted.py:229). Order is preserved, so training trajectories are
    bit-identical to the synchronous loop (tests/test_prefetch.py).
    Exceptions raised by the producer re-raise at the consumer."""
    import queue
    import threading

    if depth <= 0:
        yield from it
        return
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def worker():
        try:
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:   # re-raised by the consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=worker, daemon=True,
                         name="hop-batch-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


class MetricWriter:
    """JSONL scalar stream (the TensorBoard replacement); optionally
    mirrors live into a TensorBoard event dir (utils/metrics_export)."""

    def __init__(self, path: Optional[str], tensorboard_dir: Optional[str] = None):
        self._f = open(path, "a") if path else None
        self._tb = None
        if tensorboard_dir:
            from hop_tpu.utils.metrics_export import TensorBoardMirror
            self._tb = TensorBoardMirror(tensorboard_dir)

    def scalar(self, name: str, value: float, step: int):
        if self._f:
            self._f.write(json.dumps(
                {"name": name, "value": float(value), "step": step}) + "\n")
            self._f.flush()
        if self._tb:
            self._tb.scalar(name, value, step)

    def close(self):
        if self._f:
            self._f.close()
        if self._tb:
            self._tb.close()


def run_training(cfg: Config,
                 train_batches_fn: Callable[[int], Iterable[dict]],
                 warmup_step, gan_step, state,
                 rng: jax.Array,
                 eval_fn: Optional[Callable[[object, int], EvalResult]] = None,
                 checkpoint_manager=None,
                 metric_path: Optional[str] = None,
                 tensorboard_dir: Optional[str] = None,
                 log_every: int = 100,
                 epochs: Optional[int] = None,
                 start_epoch: int = 0,
                 best_fgd: float = float("inf"),
                 checkpoint_every: int = 1,
                 profile_dir: Optional[str] = None,
                 transfer_guard: str = "off",
                 prefetch: int = 0):
    """Runs the full schedule; returns (state, best_fgd).

    transfer_guard: "off" | "log" | "disallow" — wraps the hot loop
    (batch assembly + step dispatch) in
    jax.transfer_guard_host_to_device so any *implicit* host→device
    transfer inside it logs or raises; the only sanctioned transfer is
    cli/common.device_batch's explicit jax.device_put (SURVEY §2.7).
    Eval and checkpointing run outside the guard.

    prefetch: assemble + device_put up to N batches ahead on a background
    thread (prefetch_iter). The guard is thread-local, so it constrains
    the consumer loop; the producer performs only device_batch's
    sanctioned explicit transfers.

    Exact resume: the per-step RNG is derived as
    ``fold_in(fold_in(rng, epoch), i)`` and the batch order is seeded per
    epoch by the caller, so the training trajectory is a pure function of
    (seed, epoch, iteration). Restarting from a checkpoint at epoch k with
    ``start_epoch=k+1`` replays epochs k+1.. bit-identically to an
    uninterrupted run (pinned by tests/test_determinism.py).
    """
    epochs = epochs or cfg.train.epochs
    meters = {n: AverageMeter(n) for n in METER_NAMES}
    writer = MetricWriter(metric_path, tensorboard_dir)
    # best-checkpoint degeneracy guard: fused-step runs only (the parity
    # step mirrors the reference's bare criterion, run_ted.py:454-462)
    guard_best = bool(getattr(cfg.hop, "fused_step", False))
    div_history: list = []
    iter_count = 0
    time_now = time.time()
    # --profile-dir: capture a jax.profiler device trace of steps 2-5 of
    # the first epoch (step 1 pays the compile); view in Perfetto /
    # TensorBoard or summarise with benchmarks/profile_step.py
    # --analyze-only
    profiling = False

    for epoch in range(start_epoch, epochs):
        epoch_start = time.time()
        use_gan = (gan_step is not None
                   and epoch > cfg.loss.warmup_epochs
                   and cfg.loss.gan_weight > 0.0)
        step_fn = gan_step if use_gan else warmup_step
        if hasattr(step_fn, "for_epoch"):
            # reference LLM-dropout dynamics: the frozen backbone is in
            # eval mode during epoch 0 only (train/llm.py EpochStep)
            step_fn = step_fn.for_epoch(epoch)
        epoch_rng = jax.random.fold_in(rng, epoch)

        # Metric scalars are accumulated as device arrays and only
        # materialised at the logging boundary: a per-step float() would
        # force a device->host sync every iteration, defeating JAX's async
        # dispatch (the host could not assemble batch i+1 while the device
        # runs step i). One fetch per `log_every` steps keeps the pipeline
        # full; the meter averages are identical.
        guard = (jax.transfer_guard_host_to_device(transfer_guard)
                 if transfer_guard != "off" else contextlib.nullcontext())

        pending: list = []

        def _drain():
            if not pending:
                return
            fetched = jax.device_get([m for m, _ in pending])
            for vals, (_, bsz) in zip(fetched, pending):
                for name, meter in meters.items():
                    if name in vals:
                        meter.update(float(vals[name]), bsz)
            pending.clear()

        with guard:
            for i, batch in enumerate(
                    prefetch_iter(train_batches_fn(epoch), prefetch)):
                iter_count += 1
                if profile_dir and epoch == start_epoch and i == 1:
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                # explicit put of the step index: fold_in(key, python_int)
                # would transfer the scalar implicitly and trip the guard
                rng_step = jax.random.fold_in(
                    epoch_rng, jax.device_put(np.uint32(i)))
                state, metrics = step_fn(state, batch, rng_step)
                bsz = next(iter(batch.values())).shape[0]
                pending.append((metrics, bsz))
                if profiling and i >= 4:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profile trace written to {profile_dir}")

                if (i + 1) % log_every == 0:
                    _drain()
                    summary = f"\titers: {i + 1}, epoch: {epoch + 1} "
                    for meter in meters.values():
                        if meter.count > 0:
                            summary += f"{meter.name}: {meter.avg:.3f}, "
                            meter.reset()
                    speed = (time.time() - time_now) / iter_count
                    print(summary)
                    print(f"\tspeed: {speed:.4f}s/iter")
                    time_now = time.time()
                    iter_count = 0

        _drain()
        if profiling:   # epoch had < 5 iterations
            jax.profiler.stop_trace()
            profiling = False
            print(f"profile trace written to {profile_dir}")
        print(f"Epoch: {epoch + 1} cost time: "
              f"{time.time() - epoch_start:.1f}s")

        if eval_fn is not None:
            result = eval_fn(state, epoch)
            print(str(result))
            writer.scalar("diversity_score/val", result.diversity, epoch)
            writer.scalar("val_frechet_dist/val", result.frechet_dist, epoch)
            writer.scalar("BC/val", result.bc, epoch)
            writer.scalar("loss/val", result.loss, epoch)

            improved = result.frechet_dist < best_fgd
            degenerate = False
            if improved and guard_best and \
                    len(div_history) >= BEST_GUARD_MIN_HISTORY:
                med = float(np.median(div_history))
                if med > 0 and result.diversity > BEST_GUARD_DIV_RATIO * med:
                    degenerate = True
                    improved = False
                    print(f"  !!! best-FGD candidate REFUSED: diversity "
                          f"{result.diversity:.2f} is "
                          f"{result.diversity / med:.1f}x the run median "
                          f"{med:.3f} — a degenerate high-diversity "
                          f"minimum, not a converged gesture mode "
                          f"(BASELINE.md round-5 mechanism study); "
                          f"checkpoint still saved on the periodic "
                          f"schedule, best-FGD unchanged")
                    writer.scalar("best_guard_refused/val",
                                  result.frechet_dist, epoch)
            div_history.append(result.diversity)
            if checkpoint_manager is not None and (
                    improved or degenerate
                    or (epoch + 1) % checkpoint_every == 0
                    or epoch == epochs - 1):
                from hop_tpu.utils.checkpoint import strip_frozen
                to_save, _ = strip_frozen(state)
                checkpoint_manager.save(epoch, to_save, metadata={
                    "fgd": result.frechet_dist, "bc": result.bc,
                    "epoch": epoch,
                    "best_fgd": (best_fgd if degenerate else
                                 min(best_fgd, result.frechet_dist))})
                if improved:
                    checkpoint_manager.record_best(
                        "frechet", result.frechet_dist, epoch)
                    print("Saved the checkpoint (best FGD "
                          f"{result.frechet_dist:.3f})")
            if improved:
                best_fgd = result.frechet_dist
            print(f"  *** BEST VALIDATION FGD: {best_fgd:.3f}")

    writer.close()
    return state, best_fgd
