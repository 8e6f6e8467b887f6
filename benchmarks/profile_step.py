"""Device-trace profile of the HOP GAN train step, grouped by HLO category.

Runs N steps (default fused variant, bs 256) under jax.profiler.trace and
summarises the captured Perfetto trace: per-category device ms/step and the
top individual ops. This is the tool behind the round-2/3 optimisation
decisions (GRU relayouts, the reprogramming flash kernel); keep using it
before writing any new kernel — the hot-spot ranking shifts after each one.

  python benchmarks/profile_step.py [--variant fused|parity]
      [--batch-size 256] [--steps 3] [--top 25] [--trace-dir /tmp/hop_trace]

Works on CPU too (JAX_PLATFORMS=cpu) for smoke-testing the tooling; the
numbers only mean something on the TPU.
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_and_trace(args):
    import jax
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from hop_tpu.config import ted_config
    from hop_tpu.data import synthetic
    from hop_tpu.models.hop import HOPModel
    from hop_tpu.models.multimodal_context import ConvDiscriminator
    from hop_tpu.train.llm import make_hop_train_steps

    cfg = ted_config()
    cfg = cfg.replace(hop=dataclasses.replace(
        cfg.hop, fused_step=(args.variant == "fused")))
    batch = synthetic.make_batch(cfg, args.batch_size, seed=0)
    batch["text_padded"] = batch["text_padded"] % cfg.llm.vocab_size
    batch = synthetic.add_device_features(batch, cfg)
    b = {k: jnp.asarray(v) for k, v in batch.items()
         if k in ("in_audio", "log_mel", "text_padded", "target_vec",
                  "vid_indices")}

    model = HOPModel(cfg, n_speakers=10)
    disc = ConvDiscriminator()
    gen_vars = jax.jit(lambda r: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(3)},
        b["in_audio"], b["log_mel"], b["text_padded"],
        b["target_vec"][:, :16], b["vid_indices"],
        rng=r, train=True))(jax.random.PRNGKey(1))
    dis_vars = jax.jit(lambda: disc.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(4)},
        b["target_vec"], train=True))()

    _, gan_step, init_state = make_hop_train_steps(cfg, model, disc)
    state = init_state(gen_vars, dis_vars)
    # warm up (compile) outside the trace
    state, metrics = gan_step(state, b, jax.random.PRNGKey(100))
    jax.block_until_ready(metrics["loss"])

    jax.profiler.start_trace(args.trace_dir)
    for i in range(args.steps):
        state, metrics = gan_step(state, b, jax.random.PRNGKey(200 + i))
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()


def analyze(trace_dir: str, steps: int, top: int):
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True), key=os.path.getmtime)
    if not files:
        raise SystemExit(f"no .trace.json.gz under {trace_dir}")
    path = files[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    events = data["traceEvents"]

    # device-op events live on "XLA Ops" threads; everything else
    # (steps/host/launch threads) is bookkeeping
    tname = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname[(e["pid"], e["tid"])] = e["args"]["name"]
    def _collect(match):
        by_cat = collections.Counter()
        by_name = collections.Counter()
        total = 0.0
        for e in events:
            if e.get("ph") != "X" or not match(e):
                continue
            a = e.get("args", {})
            # TPU device ops carry hlo_category; CPU (XLAEigen) events
            # only hlo_op — group those by op-name prefix
            cat = a.get("hlo_category") or e["name"].split(".")[0][:30]
            dur = e.get("dur", 0.0)
            by_cat[cat] += dur
            by_name[(cat, e["name"][:70])] += dur
            total += dur
        return by_cat, by_name, total

    # TPU traces put device ops on "XLA Ops" threads; CPU traces put them
    # on an XLAEigen thread with hlo_op args — fall back to that
    by_cat, by_name, total = _collect(
        lambda e: "XLA Ops" in tname.get((e.get("pid"), e.get("tid")), ""))
    if total == 0.0:
        by_cat, by_name, total = _collect(
            lambda e: "hlo_op" in e.get("args", {})
            or "hlo_category" in e.get("args", {}))

    print(f"trace: {path}")
    print(f"total device ms/step: {total / steps / 1e3:.2f}  "
          f"({steps} steps)")
    print("\n=== by hlo_category (ms/step) ===")
    for cat, dur in by_cat.most_common():
        print(f"  {dur / steps / 1e3:8.3f}  {cat}")
    print(f"\n=== top {top} ops (ms/step) ===")
    for (cat, name), dur in by_name.most_common(top):
        print(f"  {dur / steps / 1e3:8.3f}  [{cat}] {name}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="fused", choices=("fused", "parity"))
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--trace-dir", default="/tmp/hop_trace_profile")
    p.add_argument("--analyze-only", action="store_true",
                   help="skip running; summarise the newest trace in "
                        "--trace-dir")
    args = p.parse_args()
    if not args.analyze_only:
        run_and_trace(args)
    analyze(args.trace_dir, args.steps, args.top)


if __name__ == "__main__":
    main()
