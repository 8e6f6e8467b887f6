"""Instrumented repro of the expressive fused-step high-diversity regime.

VERDICT r4 weak #1: in benchmarks/FUSED_MULTISEED_EXPRESSIVE.json the
fused seed-2023 run spends its ENTIRE 20-epoch trajectory in a
high-diversity regime (median eval diversity 18.9 vs ~0.15 for the other
five runs) and its min-FGD epoch (407 at diversity 294) would be saved
as "best" by the reference's save-on-best-FGD criterion
(run_ted.py:454-462). This harness replays the exact trajectory
(same fixture, seeds, batch order and per-step rng as
benchmarks/compare_fused_step.py) with the per-step loss-term
diagnostics added to train/llm.py (div_raw pre-clamp ratio, clamp
fraction, pose_l1 numerator, z_l1 denominator, |out|, |mu|, mean
logvar), recording per-epoch means so the mechanism is observable.

Usage:
  python benchmarks/diagnose_fused_divergence.py --data /tmp/ab_expr/records/train \
      --eval-net /tmp/ab_expr/evalnet.npz --dataset expressive \
      --seed 2023 --epochs 20 [--parity] --out benchmarks/DIVERGE_S2023.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--data", required=True)
    p.add_argument("--eval-net", default=None)
    p.add_argument("--dataset", default="expressive",
                   choices=("TED", "expressive"))
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--parity", action="store_true",
                   help="run the reference-parity 3-forward step instead")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    import numpy as np
    from types import SimpleNamespace
    from hop_tpu.config import expressive_config, ted_config
    from hop_tpu.cli import common as C
    from hop_tpu.cli.train_main import build_model_and_steps

    cfg = ted_config() if args.dataset == "TED" else expressive_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, batch_size=args.batch_size, epochs=args.epochs))
    # GAN phase from epoch 2, matching compare_fused_step.py
    cfg = cfg.replace(loss=dataclasses.replace(cfg.loss, warmup_epochs=1))
    cfg = cfg.replace(hop=dataclasses.replace(
        cfg.hop, fused_step=not args.parity))

    a = SimpleNamespace(data=args.data, epochs=args.epochs,
                        batch_size=args.batch_size, eval_net=args.eval_net,
                        seed=args.seed, model="AD_LLM", resume=False,
                        val_data=None, synthetic_videos=2,
                        wordembed_path=None, llm_model=None, llm_layers=None,
                        data_parallel=1, model_parallel=1)
    train_ds, val_ds, lang = C.load_datasets(cfg, a)
    n_speakers = max(train_ds.speaker_model.n_words, 1)
    bs = min(cfg.train.batch_size, len(train_ds))
    sample = C.device_batch(train_ds.make_batch(np.arange(bs)), cfg)
    state, warmup, gan, generate = build_model_and_steps(
        cfg, a, lang, n_speakers, sample)
    evaluator = C.make_fgd_evaluator(cfg, lang.n_words, args.eval_net)
    eval_fn = C.make_eval_fn(cfg, val_ds, evaluator, generate, n_speakers)

    rng = jax.random.PRNGKey(args.seed)
    trajectory = []
    for epoch in range(args.epochs):
        use_gan = epoch > cfg.loss.warmup_epochs
        step = (gan if use_gan else warmup).for_epoch(epoch)
        epoch_rng = jax.random.fold_in(rng, epoch)
        sums: dict = {}
        n = 0
        for i, hb in enumerate(
                train_ds.batches(bs, shuffle=True, seed=args.seed + epoch)):
            batch = C.device_batch(hb, cfg)
            rng_step = jax.random.fold_in(
                epoch_rng, jax.device_put(np.uint32(i)))
            state, metrics = step(state, batch, rng_step)
            fetched = jax.device_get(metrics)
            for k, v in fetched.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        r = eval_fn(state, epoch)
        row = {"epoch": epoch, "fgd": r.frechet_dist, "eval_loss": r.loss,
               "diversity": r.diversity,
               **{k: v / max(n, 1) for k, v in sums.items()}}
        trajectory.append(row)
        print(json.dumps(row))

    payload = {"metric": "fused_divergence_diagnostics",
               "dataset": args.dataset, "seed": args.seed,
               "fused": not args.parity, "epochs": args.epochs,
               "batch_size": args.batch_size, "trajectory": trajectory}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
