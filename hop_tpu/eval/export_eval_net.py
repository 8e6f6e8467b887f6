"""Export a trained gesture-autoencoder checkpoint as an ``--eval-net``.

The reference evaluates FGD with a *frozen, pretrained* feature net
(``gesture_autoencoder_checkpoint_best.bin`` for TED-27 /
a MotionAE checkpoint for TED-Expressive-126,
EmbeddingSpaceEvaluator.py:393-414). In this framework the equivalent
net is trained with ``--model gesture_autoencoder`` (TED) or imported
from the reference artifact via eval/torch_import.py; this tool turns
the training checkpoint into the flat ``.npz`` that every CLI's
``--eval-net`` flag consumes, closing the loop:

  run_ted --model gesture_autoencoder ... --checkpoint-dir /ck/ae
  python -m hop_tpu.eval.export_eval_net --checkpoint-dir /ck/ae \
      --out evalnet.npz
  run_ted --model AD_LLM ... --eval-net evalnet.npz

Usage:
  python -m hop_tpu.eval.export_eval_net --checkpoint-dir CK --out OUT.npz
"""

from __future__ import annotations

import argparse


def export(checkpoint_dir: str, out: str, step: int | None = None) -> dict:
    from hop_tpu.utils.checkpoint import CheckpointManager, save_arrays

    ckpt = CheckpointManager(checkpoint_dir)
    if ckpt.latest_step() is None:
        raise SystemExit(f"no checkpoint found in {checkpoint_dir}")
    meta = ckpt.run_metadata()
    model = meta.get("model", "?")
    if model not in ("gesture_autoencoder", "joint_embedding", "?"):
        raise SystemExit(
            f"checkpoint is a {model!r} run — the FGD feature net must "
            "come from --model gesture_autoencoder (reference trains it "
            "with train_eval/train_joint_embed.py)")
    state = ckpt.restore(step)["state"]
    if "params" not in state:
        raise SystemExit(f"unexpected state keys {sorted(state)}")
    variables = {"params": state["params"],
                 "batch_stats": state.get("stats", {})}
    save_arrays(out, variables)
    return variables


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    args = p.parse_args(argv)
    export(args.checkpoint_dir, args.out, args.step)
    print(f"exported eval net -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
