"""Training-quality comparison: fused HOP step vs the parity 3-forward step.

The fused step (train/llm.py, cfg.hop.fused_step=True) computes the
generator's two speaker-conditioned forwards in one batched apply and
updates G and D jointly from a single backward, instead of the
reference's sequential D-then-G phases with three separate forwards
(train_eval/train_llm.py:15-86). It measures within noise on raw
step time; the open question (VERDICT weak #8) is whether its changed
GAN semantics alter training *quality*. This harness trains both
variants from the same init/seed/data and reports the FGD/loss
trajectory of each plus measured steps/s.

Usage:
  python benchmarks/compare_fused_step.py --data PATH --epochs 6 \
      [--eval-net evalnet.npz] [--batch-size 32] [--seeds 3]

--seeds N runs both variants from N different seeds (multi-seed evidence
for the fused-vs-parity quality question instead of a single trajectory).
--dataset expressive runs the same study at the expressive configuration
(pose_dim 126, 42 graph nodes, reference run_expressive.py:81-100 loss
weights) so the fused default is justified on both datasets.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import dataclasses
import json
import time


def run_variant(cfg, args, fused: bool):
    import jax
    from types import SimpleNamespace
    from hop_tpu.cli import common as C
    from hop_tpu.cli.train_main import build_model_and_steps
    from hop_tpu.train.loops import run_training
    import numpy as np

    hop = dataclasses.replace(cfg.hop, fused_step=fused)
    vcfg = cfg.replace(hop=hop)

    a = SimpleNamespace(**vars(args), model="AD_LLM", resume=False,
                        val_data=None, synthetic_videos=2,
                        wordembed_path=None, llm_model=None, llm_layers=None,
                        data_parallel=1, model_parallel=1)
    train_ds, val_ds, lang = C.load_datasets(vcfg, a)
    n_speakers = max(train_ds.speaker_model.n_words, 1)
    bs = min(vcfg.train.batch_size, len(train_ds))
    sample = C.device_batch(train_ds.make_batch(np.arange(bs)), vcfg)
    state, warmup, gan, generate = build_model_and_steps(
        vcfg, a, lang, n_speakers, sample)
    evaluator = C.make_fgd_evaluator(vcfg, lang.n_words, args.eval_net)
    eval_fn = C.make_eval_fn(vcfg, val_ds, evaluator, generate, n_speakers)

    trajectory = []

    def eval_and_record(st, epoch):
        r = eval_fn(st, epoch)
        trajectory.append({"epoch": epoch, "fgd": r.frechet_dist,
                           "loss": r.loss, "diversity": r.diversity})
        return r

    def batches(epoch):
        for hb in train_ds.batches(bs, shuffle=True, seed=args.seed + epoch):
            yield C.device_batch(hb, vcfg)

    t0 = time.perf_counter()
    run_training(vcfg, batches, warmup, gan, state,
                 rng=jax.random.PRNGKey(args.seed), eval_fn=eval_and_record,
                 epochs=args.epochs, log_every=10 ** 9)
    elapsed = time.perf_counter() - t0
    n_steps = args.epochs * (len(train_ds) // bs)
    return {"fused": fused, "trajectory": trajectory,
            "steps_per_sec": round(n_steps / elapsed, 3)}


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--data", default="synthetic")
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--eval-net", default=None)
    p.add_argument("--seed", type=int, default=2021)
    p.add_argument("--seeds", type=int, default=1,
                   help="number of seeds per variant (seed, seed+1, ...)")
    p.add_argument("--dataset", default="TED", choices=("TED", "expressive"),
                   help="expressive = run_expressive.py's config (pose_dim "
                        "126, 42 graph nodes, loss weights 2100/5/0.8/0.5)")
    p.add_argument("--out", default=None,
                   help="also write the JSON payload to this path")
    args = p.parse_args(argv)

    from hop_tpu.config import expressive_config, ted_config
    cfg = ted_config() if args.dataset == "TED" else expressive_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, batch_size=args.batch_size, epochs=args.epochs))
    # exercise the GAN phase from epoch 2 so the comparison covers it
    cfg = cfg.replace(loss=dataclasses.replace(cfg.loss, warmup_epochs=1))

    results = []
    for s in range(args.seeds):
        for fused in (False, True):
            a = argparse.Namespace(**vars(args))
            a.seed = args.seed + s
            r = run_variant(cfg, a, fused=fused)
            r["seed"] = a.seed
            results.append(r)
            print(f"seed {a.seed} fused={fused}: "
                  f"min FGD {min(t['fgd'] for t in r['trajectory']):.1f} "
                  f"final {r['trajectory'][-1]['fgd']:.1f}")
    payload = {"metric": f"hop_fused_vs_parity_{args.dataset}",
               "runs": results}
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
