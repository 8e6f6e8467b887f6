"""Generation throughput: one 34-frame HOP window forward per batch size.

Methodology note: ``jax.block_until_ready`` does not synchronise through
the axon relay (dispatch returns early), so each timed iteration fetches
a scalar reduction of the output and the measured per-iteration
round-trip of a no-op is subtracted. The reference has no comparable
number (test_checkpoint.py synthesises per-clip with per-window librosa
on the host).

Usage: python benchmarks/bench_generation.py [--batch-sizes 1 16 256]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--batch-sizes", type=int, nargs="+",
                   default=[1, 16, 256])
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--dataset", default="TED", choices=("TED", "expressive"),
                   help="expressive = run_expressive.py's config (pose_dim "
                        "126, 42 graph nodes; VERDICT r4 item 7)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from hop_tpu.config import expressive_config, ted_config
    from hop_tpu.data import synthetic
    from hop_tpu.models.hop import HOPModel

    cfg = ted_config() if args.dataset == "TED" else expressive_config()
    model = HOPModel(cfg, n_speakers=10)
    results = []

    @jax.jit
    def nop(s):
        return s + 1.0

    def rtt():
        s = jnp.float32(0.0)
        float(nop(s))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = nop(s)
            float(s)
        return (time.perf_counter() - t0) / args.iters

    for bs in args.batch_sizes:
        batch = synthetic.make_batch(cfg, bs, seed=0)
        batch["text_padded"] = batch["text_padded"] % cfg.llm.vocab_size
        batch = synthetic.add_device_features(batch, cfg)
        b = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("in_audio", "log_mel", "text_padded", "target_vec",
                      "vid_indices")}
        variables = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            b["in_audio"], b["log_mel"], b["text_padded"],
            b["target_vec"][:, :cfg.data.n_seed_frames],
            b["vid_indices"], rng=jax.random.PRNGKey(2), train=False))()

        @jax.jit
        def fwd(v, s):
            out, *_ = model.apply(
                v, b["in_audio"] + 0.0 * s, b["log_mel"], b["text_padded"],
                b["target_vec"][:, :cfg.data.n_seed_frames],
                b["vid_indices"], rng=jax.random.PRNGKey(3), train=False)
            return jnp.sum(out), s + 1.0

        s = jnp.float32(0.0)
        r, s = fwd(variables, s)
        float(r)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r, s = fwd(variables, s)
            float(r)
        per = (time.perf_counter() - t0) / args.iters - rtt()
        frames_per_sec = bs * cfg.data.n_poses / per
        results.append({"batch": bs, "ms_per_window": round(per * 1e3, 2),
                        "frames_per_sec": round(frames_per_sec)})
        print(json.dumps(results[-1]))

    print(json.dumps({"metric": "hop_generation_throughput",
                      "dataset": args.dataset,
                      "platform": jax.devices()[0].platform,
                      "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
