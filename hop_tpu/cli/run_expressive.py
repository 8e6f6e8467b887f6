"""TED Expressive training entry point (reference run_expressive.py):
pose_dim 126, lr 0.005, loss weights 2100/5/0.8/0.5."""

from __future__ import annotations

from hop_tpu.cli.common import base_parser
from hop_tpu.cli.train_main import train_main
from hop_tpu.config import expressive_config


def main(argv=None):
    args = base_parser("HOP-TPU TED Expressive training").parse_args(argv)
    cfg = expressive_config()
    best = train_main(cfg, args)
    print(f"done; best FGD {best:.4f}")


if __name__ == "__main__":
    main()
