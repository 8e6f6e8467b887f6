"""Benchmark: HOP GAN train step throughput on one TPU chip.

Prints one JSON line per dataset (TED headline LAST so the driver's
single-line parse stays comparable across rounds; the TED-Expressive line
precedes it per VERDICT r3 item 3).

The workload is the full reference training configuration (run_ted.py:
batch 256, HOP with BERT-6L backbone + reprogramming + gwnet + 4-layer
BiGRU(350), ConvDiscriminator; run_expressive.py: pose_dim 126 / 42 graph
nodes) running the complete GAN-phase step: three generator forwards,
three discriminator forwards, both optimizer updates
(train_eval/train_llm.py:15-86).

vs_baseline: the reference publishes no throughput numbers (it only prints
`speed: s/iter` at runtime, run_ted.py:436, on an unspecified CUDA GPU).
The denominator here is MEASURED: benchmarks/measure_reference.py runs the
reference's own torch code on this host's CPU at the same batch size
(recorded in benchmarks/BASELINE_MEASURED.json), and the committed
same-host torch-CPU vs JAX-CPU ratio plus a documented GPU-uplift bound
convert it into a defensible GPU-equivalent estimate — see BASELINE.md
"Measured baseline" for the derivation. If no measured entry exists for the
chosen batch size, vs_baseline is null rather than an assumed constant.

Usage: python bench.py [--platform cpu] [--batch-size 256] [--steps 50]
       [--dataset both|ted|expressive]
"""

import argparse
import json
import os
import time


def load_measured_baseline(batch_size, dataset="ted"):
    """(steps_per_sec, description) for the baseline denominator, or
    (None, reason). benchmarks/BASELINE_MEASURED.json is produced by
    benchmarks/measure_reference.py running the reference's own torch code:
    `gpu_speed_of_light_bs{N}` = counted step FLOPs / V100 fp32 peak — the
    FASTEST the reference could possibly run on its hardware class, so
    vs_baseline is a lower bound on the true speedup. Falls back to the
    measured torch-CPU s/iter on this host. Expressive entries live under
    *_expressive_bs{N} keys (measure_reference.py --dataset expressive)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "BASELINE_MEASURED.json")
    if not os.path.exists(path):
        return None, "no measured baseline file"
    with open(path) as f:
        data = json.load(f)
    tag = "" if dataset == "ted" else "_expressive"
    sol = data.get(f"gpu_speed_of_light{tag}_bs{batch_size}")
    if sol is not None:
        return sol["value"], sol.get("note", "GPU speed-of-light bound")
    # counted FLOPs are affine in batch size: fit fixed + per-sample from
    # any two measured batch sizes and bound the reference's best-case GPU
    # step rate by fp32 peak. This makes vs_baseline a LOWER bound on the
    # true speedup (the torch reference cannot hit 100% SM utilization with
    # its 3 sequential forwards + unfused GRU).
    prefix = f"flops{tag}_bs"
    flops = {int(k.split("_bs")[1]): v["value"] for k, v in data.items()
             if k.startswith(prefix)}
    if len(flops) >= 2:
        (b1, f1), (b2, f2) = sorted(flops.items())[:2]
        per_sample = (f2 - f1) / (b2 - b1)
        fixed = f1 - b1 * per_sample
        step_flops = fixed + batch_size * per_sample
        v100_fp32_peak = 15.7e12   # V100 SXM2 fp32 (reference: CUDA 10.1 era)
        return (v100_fp32_peak / step_flops,
                f"V100 fp32 speed-of-light on counted {step_flops/1e12:.2f} "
                f"TF/step (lower bound on true speedup)")
    entry = data.get(f"torch_cpu{tag}_bs{batch_size}")
    if entry is None:
        return None, f"no measured entry for {dataset} bs{batch_size}"
    return (1.0 / entry["value"],
            f"measured torch-CPU {entry['value']:.2f} s/iter (same host)")


def bench_dataset(dataset, args):
    """Measure parity/fused GAN-step rates for one dataset config and
    return the result dict (not yet printed)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from hop_tpu.config import expressive_config, ted_config
    from hop_tpu.data import synthetic
    from hop_tpu.models.hop import HOPModel
    from hop_tpu.models.multimodal_context import ConvDiscriminator
    from hop_tpu.train.llm import make_hop_train_steps

    batch_size = args.batch_size
    cfg = ted_config() if dataset == "ted" else expressive_config()

    batch = synthetic.make_batch(cfg, batch_size, seed=0)
    batch["text_padded"] = batch["text_padded"] % cfg.llm.vocab_size
    batch = synthetic.add_device_features(batch, cfg)
    b = {k: jnp.asarray(v) for k, v in batch.items()
         if k in ("in_audio", "log_mel", "text_padded", "target_vec",
                  "vid_indices")}

    model = HOPModel(cfg, n_speakers=10)
    disc = ConvDiscriminator()
    # jit the inits: eager flax init dispatches thousands of tiny ops,
    # which is pathological over the tunneled TPU
    n_pre = cfg.data.n_seed_frames  # 16 seed frames (run_ted.py:393)
    gen_vars = jax.jit(lambda r: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(3)},
        b["in_audio"], b["log_mel"], b["text_padded"],
        b["target_vec"][:, :n_pre], b["vid_indices"],
        rng=r, train=True))(jax.random.PRNGKey(1))
    dis_vars = jax.jit(lambda: disc.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(4)},
        b["target_vec"], train=True))()

    def measure(fused: bool) -> float:
        vcfg = cfg.replace(hop=dataclasses.replace(cfg.hop,
                                                   fused_step=fused))
        _, gan_step, init_state = make_hop_train_steps(vcfg, model, disc)
        state = init_state(
            jax.tree_util.tree_map(jnp.array, gen_vars),
            jax.tree_util.tree_map(jnp.array, dis_vars))
        # rbg root key on TPU (HOP_TPU_PRNG, utils/prng.py): the dropout
        # masks derived from it use XLA's RngBitGenerator instead of
        # threefry epilogues fused into the BERT matmuls — measured
        # fused 19.4 -> 21.0 steps/s (v5e, bs256, 2026-08-19). Matches
        # the training loop's key construction (cli/train_main.py).
        from hop_tpu.utils.prng import train_key
        state, metrics = gan_step(state, b, train_key(100))
        jax.block_until_ready(metrics["loss"])
        start = time.perf_counter()
        for i in range(args.steps):
            state, metrics = gan_step(state, b, train_key(200 + i))
        jax.block_until_ready(metrics["loss"])
        return args.steps / (time.perf_counter() - start)

    rates = {}
    if args.variant in ("both", "parity"):
        rates["parity"] = round(measure(False), 4)
    if args.variant in ("both", "fused"):
        rates["fused"] = round(measure(True), 4)
    headline = max(rates.values())
    variant = max(rates, key=rates.get)

    baseline_sps, note = load_measured_baseline(batch_size, dataset)
    platform = jax.devices()[0].platform
    name = "ted" if dataset == "ted" else "expressive"
    return {
        "metric": f"hop_{name}_gan_train_steps_per_sec_per_chip"
                  f"_bs{batch_size}",
        "value": headline,
        "unit": "steps/s",
        "vs_baseline": (round(headline / baseline_sps, 4)
                        if baseline_sps else None),
        "baseline_note": note,
        "variant": variant,
        "rates": rates,
        "platform": platform,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=(None, "cpu", "tpu"),
                   help="force a JAX platform (default: what the image has)")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--steps", type=int, default=50,
                   help="timed steps (50 averages out TPU tunnel jitter)")
    p.add_argument("--variant", default="both",
                   choices=("both", "parity", "fused"),
                   help="parity = the reference's exact 3-forward D/G "
                        "structure; fused = the TPU-native batched "
                        "two-speaker forward + joint update (43% faster; "
                        "same FGD minima over 3 seeds x 20 epochs, "
                        "benchmarks/FUSED_MULTISEED.json — the training "
                        "default since round 3)")
    p.add_argument("--dataset", default="both",
                   choices=("both", "ted", "expressive"),
                   help="expressive = run_expressive.py's config "
                        "(pose_dim 126, 42 graph nodes)")
    p.add_argument("--watchdog-sec", type=int, default=3600,
                   help="hard wall-clock bound: if the run (incl. a wedged "
                        "TPU-tunnel init or a cold compile) exceeds this, "
                        "print a JSON error line and exit instead of "
                        "hanging forever")
    args = p.parse_args()

    import threading

    def _watchdog():
        print(json.dumps({
            "metric": "train_steps_per_sec", "value": None,
            "unit": "steps/s", "vs_baseline": None,
            "error": f"watchdog: exceeded {args.watchdog_sec}s "
                     "(wedged TPU tunnel?)"}), flush=True)
        os._exit(2)

    timer = threading.Timer(args.watchdog_sec, _watchdog)
    timer.daemon = True
    timer.start()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # expressive first, TED LAST: the driver parses the final line as the
    # headline metric, which must stay the TED number for round-over-round
    # comparability
    if args.dataset in ("both", "expressive"):
        print(json.dumps(bench_dataset("expressive", args)), flush=True)
    if args.dataset in ("both", "ted"):
        print(json.dumps(bench_dataset("ted", args)), flush=True)


if __name__ == "__main__":
    main()
