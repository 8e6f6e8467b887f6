"""Export a trained HOP generator for serving.

Writes a serialized StableHLO artifact (jax.export) of the fixed-shape
generation forward — a serving runtime deserializes and executes it with
no model code — plus optionally the checkpoint's weights as a flat .npz
for runtimes without orbax. The reference has no deployment path at all:
its test_checkpoint.py is an in-process demo (test_checkpoint.py:395-471).

  python -m hop_tpu.cli.export_model --checkpoint-dir ./checkpoints \
      --out hop_serving.hlo [--params-out hop_params.npz] \
      [--batch-size 1] [--platforms tpu,cpu] [--expressive]

Round-trip check: `hop_tpu.infer.load_exported(blob)(variables, *inputs)`.
"""

from __future__ import annotations

import argparse
import os

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from hop_tpu.config import ted_config, expressive_config
from hop_tpu.infer import export_forward


def restore_hop(cfg, checkpoint_dir: str):
    """(cfg, model, variables, n_speakers) from a train_main checkpoint
    (shared helper in cli/common — same rebuild as test_checkpoint)."""
    from hop_tpu.cli.common import restore_hop_model
    return restore_hop_model(cfg, checkpoint_dir)


def main(argv=None):
    p = argparse.ArgumentParser("export a HOP generator for serving")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--out", required=True,
                   help="output path for the serialized StableHLO artifact")
    p.add_argument("--params-out", default=None,
                   help="optionally also write the weights as a flat .npz "
                        "(keys are '/'-joined variable paths)")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets (e.g. 'tpu,cpu'); "
                        "default: the current backend")
    p.add_argument("--expressive", action="store_true",
                   help="TED-Expressive config (pose_dim 126)")
    args = p.parse_args(argv)

    cfg = expressive_config() if args.expressive else ted_config()
    cfg, model, variables, n_speakers = restore_hop(cfg, args.checkpoint_dir)

    platforms = (tuple(s.strip() for s in args.platforms.split(","))
                 if args.platforms else None)
    blob = export_forward(model, variables, cfg,
                          batch_size=args.batch_size, platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.2f} MB, "
          f"batch={args.batch_size}, n_speakers={n_speakers}, "
          f"platforms={platforms or 'default'})")

    if args.params_out:
        from flax.core import meta as flax_meta
        variables = flax_meta.unbox(variables)
        flat = {}

        def _walk(prefix, tree):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    _walk(f"{prefix}/{k}" if prefix else k, v)
            else:
                flat[prefix] = np.asarray(tree)

        _walk("", variables)
        np.savez(args.params_out, **flat)
        print(f"wrote {args.params_out} ({len(flat)} arrays)")


if __name__ == "__main__":
    main()
