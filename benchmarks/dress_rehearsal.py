"""Full 75-epoch reference-schedule dress rehearsal with mid-run kill+resume.

VERDICT r4 item 4: run the reference's complete training schedule shape
(75 epochs, GAN gate epoch > 10, BC gate epoch > 35 — run_ted.py:374-466)
on the pre-generated synthetic corpus, with save-on-best + periodic
checkpoints; SIGKILL the process around epoch ~40; resume with --resume;
and show the metric trajectory is continuous across the boundary. The
equality bar is stronger than continuity: the training loop is a pure
function of (seed, epoch, iteration) (train/loops.py exact-resume design,
tests/test_resume.py), so the killed+resumed run's [VAL] metric stream
must equal an UNINTERRUPTED control run's stream — epoch for epoch,
including the post-resume epochs — which this harness runs and diffs.

Usage:
  python benchmarks/dress_rehearsal.py --data /tmp/corpus100 \
      --eval-net /tmp/evalnet_ted.npz --dataset TED \
      [--epochs 75] [--kill-after-epoch 40] \
      --out benchmarks/DRESS_REHEARSAL_TED.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def cli_cmd(a, ckpt_dir, metrics, resume=False):
    cli = ("hop_tpu.cli.run_ted" if a.dataset == "TED"
           else "hop_tpu.cli.run_expressive")
    cmd = [sys.executable, "-u", "-m", cli,
           "--model", "AD_LLM", "--epochs", str(a.epochs),
           "--batch-size", str(a.batch_size),
           "--data", os.path.join(a.data, "train"),
           "--val-data", os.path.join(a.data, "val"),
           "--checkpoint-dir", ckpt_dir,
           "--checkpoint-every", str(a.checkpoint_every),
           "--metrics", metrics,
           "--seed", str(a.seed),
           "--log-every", "1000"]
    if a.eval_net:
        cmd += ["--eval-net", a.eval_net]
    if a.audio_wire:
        cmd += ["--audio-wire", a.audio_wire]
    if a.prefetch:
        cmd += ["--prefetch", str(a.prefetch)]
    if resume:
        cmd += ["--resume"]
    return cmd


def read_metrics(path):
    """{epoch: {name: value}} from the JSONL stream."""
    out = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            out.setdefault(rec["step"], {})[rec["name"]] = rec["value"]
    return out


def run_until_epoch(cmd, metrics_path, kill_after_epoch, log_path):
    """Start the CLI, SIGKILL it right after `kill_after_epoch` completes
    (its [VAL] scalars appear in the metrics stream)."""
    if os.path.exists(metrics_path):
        os.remove(metrics_path)
    with open(log_path, "w") as log:
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=log, stderr=log)
        killed_at = None
        try:
            while proc.poll() is None:
                time.sleep(2.0)
                epochs_done = read_metrics(metrics_path)
                if any(e >= kill_after_epoch and "loss/val" in v
                       for e, v in epochs_done.items()):
                    killed_at = max(e for e, v in epochs_done.items()
                                    if "loss/val" in v)
                    proc.send_signal(signal.SIGKILL)
                    proc.wait()
                    break
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
    return killed_at


def run_to_completion(cmd, log_path):
    with open(log_path, "w") as log:
        rc = subprocess.call(cmd, cwd=REPO, stdout=log, stderr=log)
    if rc != 0:
        raise SystemExit(f"CLI failed rc={rc}; see {log_path}")


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--data", required=True)
    p.add_argument("--eval-net", default=None)
    p.add_argument("--dataset", default="TED", choices=("TED", "expressive"))
    p.add_argument("--epochs", type=int, default=75)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--kill-after-epoch", type=int, default=40)
    p.add_argument("--checkpoint-every", type=int, default=5)
    p.add_argument("--seed", type=int, default=2021)
    p.add_argument("--audio-wire", default="int16")
    p.add_argument("--prefetch", type=int, default=2)
    p.add_argument("--workdir", default=None)
    p.add_argument("--skip-control", action="store_true",
                   help="only run the kill+resume leg (continuity check "
                        "against the pre-kill stream, no bitwise control)")
    p.add_argument("--out", default=None)
    a = p.parse_args(argv)
    wd = a.workdir or f"/tmp/rehearsal_{a.dataset.lower()}"
    os.makedirs(wd, exist_ok=True)

    m_killed = os.path.join(wd, "killed.jsonl")
    m_control = os.path.join(wd, "control.jsonl")
    ck_killed = os.path.join(wd, "ck_killed")
    ck_control = os.path.join(wd, "ck_control")

    # leg 1: run, SIGKILL right after --kill-after-epoch's eval lands
    print(f"[1/3] schedule to epoch ~{a.kill_after_epoch}, then SIGKILL",
          flush=True)
    killed_at = run_until_epoch(
        cli_cmd(a, ck_killed, m_killed), m_killed, a.kill_after_epoch,
        os.path.join(wd, "killed_leg1.log"))
    print(f"    SIGKILLed after epoch {killed_at}", flush=True)

    # leg 2: resume the same run to completion
    print("[2/3] resume to completion", flush=True)
    run_to_completion(cli_cmd(a, ck_killed, m_killed, resume=True),
                      os.path.join(wd, "killed_leg2.log"))

    killed_stream = read_metrics(m_killed)
    control_stream = {}
    if not a.skip_control:
        # leg 3: uninterrupted control with identical seed/flags
        print("[3/3] uninterrupted control run", flush=True)
        run_to_completion(cli_cmd(a, ck_control, m_control),
                          os.path.join(wd, "control.log"))
        control_stream = read_metrics(m_control)

    epochs = sorted(e for e in killed_stream if "loss/val" in
                    killed_stream[e])
    # the resume restarts from the last *saved* checkpoint, so epochs
    # between the save and the kill appear twice in the JSONL (append
    # mode); read_metrics keeps the LAST occurrence = the replayed value
    missing = [e for e in range(a.epochs) if e not in epochs]
    result = {
        "metric": f"dress_rehearsal_{a.dataset}",
        "epochs": a.epochs, "batch_size": a.batch_size,
        "gates": {"gan_from_epoch": 11, "bc_from_epoch": 36},
        "killed_after_epoch": killed_at,
        "epochs_evaluated": len(epochs), "missing_epochs": missing,
        "trajectory": [
            {"epoch": e,
             "fgd": killed_stream[e].get("val_frechet_dist/val"),
             "bc": killed_stream[e].get("BC/val"),
             "diversity": killed_stream[e].get("diversity_score/val"),
             "loss": killed_stream[e].get("loss/val"),
             "resumed_here": e == killed_at + 1}
            for e in epochs],
    }
    if control_stream:
        diffs = []
        for e in epochs:
            for name in ("loss/val", "val_frechet_dist/val", "BC/val",
                         "diversity_score/val"):
                kv = killed_stream[e].get(name)
                cv = control_stream.get(e, {}).get(name)
                if kv != cv:
                    diffs.append({"epoch": e, "name": name,
                                  "killed": kv, "control": cv})
        result["control_equal_bitwise"] = not diffs
        result["control_diffs"] = diffs[:20]
        print(f"killed+resumed vs uninterrupted: "
              f"{'BITWISE EQUAL' if not diffs else f'{len(diffs)} DIFFS'}",
              flush=True)

    print(json.dumps({k: v for k, v in result.items()
                      if k != "trajectory"}, indent=1))
    out = a.out or os.path.join(
        REPO, "benchmarks", f"DRESS_REHEARSAL_{a.dataset}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
