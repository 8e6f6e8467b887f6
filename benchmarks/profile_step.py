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
        b["target_vec"][:, :cfg.data.n_seed_frames], b["vid_indices"],
        rng=r, train=True))(jax.random.PRNGKey(1))
    dis_vars = jax.jit(lambda: disc.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(4)},
        b["target_vec"], train=True))()

    _, gan_step, init_state = make_hop_train_steps(cfg, model, disc)
    state = init_state(gen_vars, dis_vars)

    if args.cost:
        jitted = getattr(gan_step, "_steady", gan_step)
        from hop_tpu.utils.prng import train_key
        ca = jitted.lower(state, b, train_key(0)).compile(
        ).cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0]
        out = {k: ca.get(k) for k in
               ("flops", "bytes accessed", "transcendentals")
               if ca.get(k) is not None}
        peak_flops = args.peak_tflops * 1e12
        peak_bw = args.peak_gbs * 1e9
        # some backends' cost_analysis omits 'bytes accessed' (CPU smoke
        # path) — report what we have instead of crashing
        if out.get("flops") and out.get("bytes accessed"):
            out["arithmetic_intensity_flops_per_byte"] = round(
                out["flops"] / out["bytes accessed"], 2)
            out["ridge_point_flops_per_byte"] = round(
                peak_flops / peak_bw, 2)
            out["compute_bound_if_intensity_above_ridge"] = (
                out["arithmetic_intensity_flops_per_byte"]
                > out["ridge_point_flops_per_byte"])
        else:
            out["note"] = ("cost_analysis lacked flops/bytes accessed on "
                           "this backend; intensity not derived")
        print(json.dumps({"variant": args.variant,
                          "batch_size": args.batch_size, **out}))
        return

    # warm up (compile) outside the trace
    # rbg root key = the default training configuration (utils/prng.py)
    from hop_tpu.utils.prng import train_key
    state, metrics = gan_step(state, b, train_key(100))
    jax.block_until_ready(metrics["loss"])

    jax.profiler.start_trace(args.trace_dir)
    for i in range(args.steps):
        state, metrics = gan_step(state, b, train_key(200 + i))
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()

    # Post-optimization HLO with op_name metadata: maps every fused op in
    # the trace back to its flax module scope (analyze --by-scope input).
    # EpochStep wraps the steady jit fn; .lower().compile() re-lowers but
    # hits the persistent compile cache.
    try:
        jitted = getattr(gan_step, "_steady", gan_step)
        from hop_tpu.utils.prng import train_key
        txt = jitted.lower(state, b, train_key(0)).compile().as_text()
        with open(os.path.join(args.trace_dir, "gan_step_hlo.txt"), "w") as f:
            f.write(txt)
    except Exception as exc:  # diagnostic aid only — never fail the run
        print(f"(hlo dump skipped: {exc})", file=sys.stderr)


# Model-block attribution: ordered (block, regex) over the op metadata
# path XLA records for every device op (jax propagates the flax module
# scope into op_metadata.op_name, which the profiler exposes per event).
# First match wins; order puts the most specific scopes first.
_BLOCK_PATTERNS = [
    # scope vocabulary measured from the fused gan_step's post-opt HLO:
    # jit(step)/jvp(HOPModel.two_speaker_forward)/HOPModel.trunk/llm/...
    ("bert", r"/llm[/.]|embed_ln|embed_dropout"),
    ("reprogramming", r"reprogramming|mapping_layer|align_layer"),
    ("gwnet", r"gwnet"),
    ("beat_features", r"_beat_features|wav_enc|WavEncoder"),
    ("gru_head", r"HOPModel\.head|GRU_|BiGRU|pallas_gru"),
    ("discriminator", r"(?i)discriminator"),
    ("speaker_cvae", r"speaker|z_net|cvae"),
    ("loss_opt_elementwise",
     r"jit\(step\)/(transpose\()?(add|mul|sub|div|reduce|sqrt|integer_pow"
     r"|sign|max|min|abs|square|neg|log|exp|pow|sum|mean|where|select)"),
]


def _scope_of(e, hlo_map):
    """Best-effort op-metadata path for a trace event (field name varies
    by backend/profiler version: tf_op on TPU, sometimes long_name);
    falls back to the post-opt-HLO op_name map dumped by run_and_trace."""
    a = e.get("args", {})
    for k in ("tf_op", "long_name", "name", "hlo_op"):
        v = a.get(k)
        if isinstance(v, str) and "/" in v:
            return v
    return hlo_map.get(e["name"], "") or hlo_map.get(
        a.get("hlo_op", ""), "")


def load_hlo_map(trace_dir):
    """op-name -> op_name-metadata scope, from the post-opt HLO dump."""
    import re
    path = os.path.join(trace_dir, "gan_step_hlo.txt")
    if not os.path.exists(path):
        return {}
    pat = re.compile(r"%?([\w.\-]+) = .*?op_name=\"([^\"]+)\"")
    out = {}
    with open(path) as f:
        for line in f:
            if "op_name=" not in line:
                continue
            m = pat.search(line)
            if m:
                out[m.group(1)] = m.group(2)
    return out


def analyze_scopes(events, tname, steps, dump_args=0, hlo_map=None):
    """Group device-op time by model block via op-metadata scopes."""
    import re
    hlo_map = hlo_map or {}
    by_block = collections.Counter()
    unattributed = collections.Counter()
    total = 0.0
    dumped = 0
    # TPU: device ops on "XLA Ops" threads; CPU fallback: any event
    # carrying hlo_op/hlo_category args (same tiering as _collect)
    on_xla_ops = [e for e in events if e.get("ph") == "X" and "XLA Ops"
                  in tname.get((e.get("pid"), e.get("tid")), "")]
    device_events = on_xla_ops or [
        e for e in events if e.get("ph") == "X"
        and ("hlo_op" in e.get("args", {})
             or "hlo_category" in e.get("args", {}))]
    for e in device_events:
        if dumped < dump_args:
            print(f"[args] name={e['name'][:60]!r} args={e.get('args')}")
            dumped += 1
        dur = e.get("dur", 0.0)
        total += dur
        scope = _scope_of(e, hlo_map)
        for block, pat in _BLOCK_PATTERNS:
            if re.search(pat, scope) or re.search(pat, e["name"]):
                by_block[block] += dur
                break
        else:
            by_block["(unattributed)"] += dur
            unattributed[(e["name"][:60], scope[:80])] += dur
    print("\n=== by model block (ms/step) ===")
    for block, dur in by_block.most_common():
        pct = 100.0 * dur / total if total else 0.0
        print(f"  {dur / steps / 1e3:8.3f}  {pct:5.1f}%  {block}")
    if unattributed:
        print("\n=== top unattributed ops ===")
        for (name, scope), dur in unattributed.most_common(10):
            print(f"  {dur / steps / 1e3:8.3f}  {name}  <- {scope}")
    return by_block, total


def analyze(trace_dir: str, steps: int, top: int, by_scope=False,
            dump_args=0):
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
    if by_scope or dump_args:
        analyze_scopes(events, tname, steps, dump_args=dump_args,
                       hlo_map=load_hlo_map(trace_dir))


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
    p.add_argument("--by-scope", action="store_true",
                   help="also group device time by model block (flax "
                        "scope in the op metadata) — the roofline input")
    p.add_argument("--dump-args", type=int, default=0,
                   help="print the raw args of the first N device events "
                        "(calibrates the scope-field detection)")
    p.add_argument("--cost", action="store_true",
                   help="skip tracing; print XLA's cost analysis of the "
                        "compiled step (flops, bytes accessed, arithmetic "
                        "intensity vs the ridge point) as one JSON line")
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="accelerator peak TFLOP/s for the ridge point "
                        "(default: v5e bf16)")
    p.add_argument("--peak-gbs", type=float, default=819.0,
                   help="accelerator HBM GB/s for the ridge point "
                        "(default: v5e)")
    args = p.parse_args()
    if args.cost:
        run_and_trace(args)
        return
    if not args.analyze_only:
        run_and_trace(args)
    analyze(args.trace_dir, args.steps, args.top, by_scope=args.by_scope,
            dump_args=args.dump_args)


if __name__ == "__main__":
    main()
