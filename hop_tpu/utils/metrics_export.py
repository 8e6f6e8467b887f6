"""Metric-stream adapters: JSONL -> TensorBoard / CSV.

The training loop writes scalars as JSONL (train/loops.MetricWriter),
replacing the reference's SummaryWriter (run_ted.py:216-217, 449-451).
This module bridges back to the reference's tooling surface:

- ``export_tensorboard``: convert a finished (or live) JSONL file into a
  TensorBoard event directory, same tag names as the reference
  (``diversity_score/val``, ``val_frechet_dist/val``, ``BC/val``).
- ``export_csv``: one wide CSV (step x metric) for spreadsheets.
- ``TensorBoardMirror``: live writer the loop attaches when
  ``--tensorboard-dir`` is passed (dep-gated on tensorboard; the
  reference's requirements list wandb too but never use it —
  SURVEY.md §5.5).

CLI:  python -m hop_tpu.utils.metrics_export --jsonl m.jsonl \
          --to tensorboard --out runs/exp1
"""

from __future__ import annotations

import argparse
import csv
import json
from collections import defaultdict


def read_jsonl(path: str):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


class TensorBoardMirror:
    """Live add_scalar mirror; no-op (with a warning) if tensorboard is
    unavailable."""

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._w = SummaryWriter(logdir)
        except Exception as e:   # pragma: no cover - env without tb
            print(f"tensorboard unavailable ({e}); scalars go to JSONL only")
            self._w = None

    def scalar(self, name: str, value: float, step: int):
        if self._w is not None:
            self._w.add_scalar(name, value, step)

    def close(self):
        if self._w is not None:
            self._w.close()


def export_tensorboard(jsonl_path: str, logdir: str) -> int:
    mirror = TensorBoardMirror(logdir)
    n = 0
    for row in read_jsonl(jsonl_path):
        mirror.scalar(row["name"], row["value"], row["step"])
        n += 1
    mirror.close()
    return n


def export_csv(jsonl_path: str, out_path: str) -> int:
    by_step: dict[int, dict] = defaultdict(dict)
    names = []
    for row in read_jsonl(jsonl_path):
        by_step[row["step"]][row["name"]] = row["value"]
        if row["name"] not in names:
            names.append(row["name"])
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step"] + names)
        for step in sorted(by_step):
            w.writerow([step] + [by_step[step].get(n, "") for n in names])
    return len(by_step)


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--jsonl", required=True)
    p.add_argument("--to", default="tensorboard",
                   choices=("tensorboard", "csv"))
    p.add_argument("--out", required=True,
                   help="event dir (tensorboard) or .csv path")
    args = p.parse_args(argv)
    if args.to == "tensorboard":
        n = export_tensorboard(args.jsonl, args.out)
    else:
        n = export_csv(args.jsonl, args.out)
    print(f"exported {n} rows -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
