"""Loop-level bs256 training throughput: the REAL run_ted epoch loop.

VERDICT r3 item 2: bench.py's headline step rate times one device-resident
batch; this measures what a user actually gets from
`run_ted --model AD_LLM --batch-size 256` — host batch assembly, H2D
transfer (with MODEL_BATCH_KEYS trimming), on-device mel, step dispatch and
per-epoch eval — on a pre-generated corpus large enough to fill batch-256
epochs (benchmarks/gen_synth_corpus.py; the reference trains at exactly
this batch size, run_ted.py:100).

Method: run the unmodified CLI as a subprocess for N epochs and parse its
own timing lines (s/iter, epoch cost, [VAL] elapsed), discarding epoch 1
(compile). Then itemize the gap vs bench.py's device-step rate by timing
the phases directly: assembly (host-only make_batch) and transfer+mel
(device_batch synchronised by a scalar fetch, tunnel-RTT-corrected — see
the verify-skill note: block_until_ready does not synchronise through the
axon relay).

Results land in benchmarks/LOOP_LEVEL.json.

Usage: python benchmarks/bench_loop_level.py --data /tmp/corpus100
       [--epochs 4] [--batch-size 256]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_cli(a):
    cli = ("hop_tpu.cli.run_ted" if a.dataset == "TED"
           else "hop_tpu.cli.run_expressive")
    cmd = [sys.executable, "-u", "-m", cli,
           "--model", a.model, "--epochs", str(a.epochs),
           "--batch-size", str(a.batch_size),
           "--data", os.path.join(a.data, "train"),
           "--val-data", os.path.join(a.data, "val"),
           "--log-every", "5",
           # enter the GAN phase at epoch 1 so the steady-state rate is the
           # full GAN step (same program bench.py times), not the cheaper
           # generator-only warmup step (reference gate epoch > 10)
           "--warmup-epochs", "0",
           "--checkpoint-dir", a.checkpoint_dir,
           "--checkpoint-every", "1000"]
    if a.eval_net:
        cmd += ["--eval-net", a.eval_net]
    if a.audio_wire:
        cmd += ["--audio-wire", a.audio_wire]
    if a.prefetch:
        cmd += ["--prefetch", str(a.prefetch)]
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    wall = time.time() - t0
    sys.stderr.write(proc.stderr[-2000:])
    print(proc.stdout)
    if proc.returncode != 0:
        raise SystemExit(f"run_ted failed rc={proc.returncode}")
    return proc.stdout, wall


def parse_cli(stdout):
    s_iter = [float(m) for m in re.findall(r"speed: ([\d.]+)s/iter", stdout)]
    epoch_cost = [float(m) for m in
                  re.findall(r"cost time: ([\d.]+)s", stdout)]
    eval_sec = [float(m) for m in re.findall(r"/ ([\d.]+)s, Diversity",
                                             stdout)]
    m = re.search(r"train samples: (\d+)", stdout)
    n_train = int(m.group(1)) if m else None
    return s_iter, epoch_cost, eval_sec, n_train


def measure_phases(a, steps_per_epoch):
    """Direct phase timings on the same corpus (run AFTER the CLI exits:
    the axon TPU tunnel is single-client)."""
    import types

    import jax.numpy as jnp
    import numpy as np

    from hop_tpu.cli import common as C
    from hop_tpu.config import expressive_config, ted_config

    cfg = ted_config() if a.dataset == "TED" else expressive_config()
    if a.audio_wire:
        import dataclasses
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, audio_wire=a.audio_wire))
    ds, _, _ = C.load_datasets(cfg, types.SimpleNamespace(
        data=os.path.join(a.data, "train"),
        val_data=os.path.join(a.data, "val"),
        wordembed_path=None, synthetic_videos=0, seed=0))

    # tunnel RTT: scalar round-trip of a no-op
    x = jnp.float32(1.0)
    float(x + 1.0)
    t0 = time.perf_counter()
    for _ in range(10):
        float(x + 1.0)
    rtt = (time.perf_counter() - t0) / 10

    # host assembly (numpy + C++ gatherer only)
    idx = np.arange(a.batch_size)
    ds.make_batch(idx)
    t0 = time.perf_counter()
    for _ in range(5):
        hb = ds.make_batch(idx)
    assembly = (time.perf_counter() - t0) / 5

    # H2D transfer + on-device mel, synchronised by a scalar fetch
    keys = C.MODEL_BATCH_KEYS.get(a.model)
    db = C.device_batch(hb, cfg, keys=keys)
    float(jnp.sum(db["log_mel"]))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        db = C.device_batch(hb, cfg, keys=keys)
        float(jnp.sum(db["log_mel"]))
    transfer = (time.perf_counter() - t0) / reps - rtt
    # wire volume: in_audio moves as int16 when audio_wire=int16
    # (cli/common._put_audio), i.e. half its host-f32 nbytes
    def wire_bytes(k, v):
        if k == "in_audio" and cfg.data.audio_wire == "int16":
            return v.nbytes // 2
        return v.nbytes
    vol_mb = sum(wire_bytes(k, v) for k, v in hb.items()
                 if keys is None or k in keys) / 1e6
    return {"tunnel_rtt_s": round(rtt, 4),
            "host_assembly_s": round(assembly, 4),
            "transfer_plus_mel_s": round(transfer, 4),
            "h2d_volume_mb": round(vol_mb, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True,
                   help="corpus dir with train/ and val/ "
                        "(benchmarks/gen_synth_corpus.py)")
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--model", default="AD_LLM")
    p.add_argument("--dataset", default="TED", choices=("TED", "expressive"),
                   help="expressive = run_expressive.py at pose_dim 126 / "
                        "42 graph nodes on an expressive corpus "
                        "(gen_synth_corpus.py --dataset expressive); "
                        "VERDICT r4 item 7")
    p.add_argument("--eval-net", default=None)
    p.add_argument("--audio-wire", default=None, choices=("f32", "int16"),
                   help="pass through to run_ted: int16 halves the "
                        "dominant H2D tensor (DataConfig.audio_wire)")
    p.add_argument("--prefetch", type=int, default=0,
                   help="pass through to run_ted: overlap assembly+"
                        "transfer with the device step")
    p.add_argument("--checkpoint-dir", default="/tmp/ck_loop_bench")
    p.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "LOOP_LEVEL.json"))
    a = p.parse_args()

    stdout, wall = run_cli(a)
    s_iter, epoch_cost, eval_sec, n_train = parse_cli(stdout)
    if n_train is None or not epoch_cost:
        raise SystemExit("could not parse 'train samples:'/'cost time:' "
                         "from the CLI output — tail:\n" + stdout[-2000:])
    steps_per_epoch = n_train // a.batch_size
    if steps_per_epoch == 0:
        raise SystemExit(f"corpus too small: {n_train} train samples < "
                         f"batch size {a.batch_size}")

    # epoch 1 pays the warmup-step compile, epoch 2 the GAN-step compile
    # (--warmup-epochs 0); steady state = epoch 3 onward — refuse to label
    # a compile-tainted epoch as steady state
    if len(epoch_cost) <= 2:
        raise SystemExit("need --epochs >= 3: epochs 1-2 pay the warmup/"
                         "GAN-step compiles and cannot be steady state")
    steady_epochs = epoch_cost[2:]
    phases = measure_phases(a, steps_per_epoch)

    loop_s_iter = (sum(steady_epochs) / len(steady_epochs)
                   / steps_per_epoch)
    result = {
        "metric": f"loop_level_{a.model}_bs{a.batch_size}"
                  + ("" if a.dataset == "TED" else "_expressive"),
        "dataset": a.dataset,
        "train_samples": n_train,
        "steps_per_epoch": steps_per_epoch,
        "epochs": a.epochs,
        "wall_total_s": round(wall, 1),
        "epoch_cost_s": [round(x, 1) for x in epoch_cost],
        "eval_s": [round(x, 1) for x in eval_sec],
        "steady_train_s_per_iter": round(loop_s_iter, 4),
        "steady_train_steps_per_s": round(1.0 / loop_s_iter, 4),
        "cli_printed_s_iter": s_iter,
        "audio_wire": a.audio_wire or "f32",
        "prefetch": a.prefetch,
        "phases": phases,
        "note": "train-loop rate excludes per-epoch eval (reported "
                "separately); epoch 1 (compile) excluded from steady state",
    }
    print(json.dumps(result, indent=1))
    with open(a.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
