"""Validation epoch: L1 / joint MAE / FGD / BC / diversity.

Counterpart of reference Evaluate.py:50-291 (evaluate_testset): forward the
generator with RANDOM speaker ids (Evaluate.py:167-169), L1 against targets,
FGD features pushed per batch, joint MAE after FK, and beat consistency only
when epoch > bc_start_epoch (the reference's `epoch > 35` gate). All metric
math stays on device; only final scalars are pulled.

Distributed eval (SURVEY §5.8, replacing Evaluate.py:260-283's
single-device loop): when an ambient jax.sharding.Mesh is active (the
trainer runs eval inside its `with mesh:` block), each eval batch is
sharded over the batch mesh axes ('dcn','data'), so the generator forward,
the metric reductions, the on-device beat-consistency pass and the FGD
feature extraction all run data-parallel. Per-device feature blocks are
never pulled to the host: each tiny (B, 32) block is all-gathered
device-to-device right after extraction and the mean/cov/Fréchet math is
one jitted program (see eval/fgd.py). A ragged tail batch
(drop_last=False) that does not divide the mesh stays replicated — a
one-off recompile, not a correctness fork; tests/test_parallel.py pins
sharded eval scores == single-device scores.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hop_tpu.config import Config
from hop_tpu.eval import beat as beat_mod
from hop_tpu.eval import metrics as metrics_mod
from hop_tpu.eval.fgd import EmbeddingSpaceEvaluator


@dataclass
class EvalResult:
    loss: float
    mae: float
    frechet_dist: float
    feat_dist: float
    bc: float
    diversity: float
    elapsed_sec: float
    eval_net_trained: bool = True

    def __str__(self):
        s = ("[VAL] loss: {:.5f}, joint mae: {:.5f}, FGD: {:.5f}, "
             "feat_D: {:.5f}, BC: {:.4f} / {:.1f}s, Diversity: {:.3f}"
             .format(self.loss, self.mae, self.frechet_dist,
                     self.feat_dist, self.bc, self.elapsed_sec,
                     self.diversity))
        if not self.eval_net_trained:
            s += "  [FGD/diversity from an UNTRAINED feature net]"
        return s


def evaluate_testset(batches: Iterable[dict],
                     generate_fn: Callable,
                     evaluator: Optional[EmbeddingSpaceEvaluator],
                     epoch: int,
                     cfg: Config,
                     n_speakers: int,
                     rng: jax.Array) -> EvalResult:
    """generate_fn(batch, vid_indices, rng) -> (B, T, pose_dim) dir-vecs."""
    skel = cfg.data.skeleton
    start = time.time()
    if evaluator is not None:
        evaluator.reset()

    losses, maes = [], []
    bc_nums, bc_dens = [], []
    compute_bc = epoch > cfg.loss.bc_start_epoch

    # mesh-aware: shard eval batches over ('dcn','data') when running
    # inside the trainer's mesh context (SURVEY §5.8)
    from hop_tpu.parallel import ambient_mesh, shard_batch
    mesh = ambient_mesh()
    n_shards = 1
    if mesh is not None:
        n_shards = int(np.prod([mesh.shape[a] for a in ("dcn", "data")
                                if a in mesh.axis_names]))

    for batch in batches:
        rng, rng_vid, rng_gen = jax.random.split(rng, 3)
        B = batch["target_vec"].shape[0]
        if n_shards > 1 and B % n_shards == 0:
            batch = shard_batch(batch, mesh)
        vids = jax.random.randint(rng_vid, (B,), 0, n_speakers)
        outputs = generate_fn(batch, vids, rng_gen)
        target = batch["target_vec"]

        losses.append(metrics_mod.l1_loss(outputs, target))
        maes.append(metrics_mod.joint_mae(outputs, target, skel,
                                          cfg.data.n_pre_poses))
        if evaluator is not None:
            evaluator.push_samples(outputs, target)
        if compute_bc:
            # accumulated as device scalars — a per-batch float() here would
            # sync the dispatch pipeline every batch; one fetch at the end
            s, w = beat_mod.beat_consistency(outputs, batch["in_audio"], skel,
                                             cfg.data.pose_resampling_fps)
            bc_nums.append(s)
            bc_dens.append(w)

    if evaluator is not None:
        fd, feat_dist = evaluator.get_scores()
        diversity = evaluator.get_diversity_scores()
    else:
        fd = feat_dist = diversity = float("nan")

    bc_num = sum(float(x) for x in jax.device_get(bc_nums)) if bc_nums else 0.0
    bc_den = sum(float(x) for x in jax.device_get(bc_dens)) if bc_dens else 0.0
    return EvalResult(
        loss=float(np.mean([float(x) for x in losses])),
        mae=float(np.mean([float(x) for x in maes])),
        frechet_dist=fd,
        feat_dist=feat_dist,
        bc=bc_num / bc_den if bc_den > 0 else 0.0,
        diversity=diversity,
        elapsed_sec=time.time() - start,
        eval_net_trained=(evaluator is None
                          or getattr(evaluator, "trained", True)))
