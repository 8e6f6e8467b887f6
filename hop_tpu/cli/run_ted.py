"""TED Gesture training entry point (reference run_ted.py).

Usage:
  python -m hop_tpu.cli.run_ted --model AD_LLM --data synthetic --epochs 2
"""

from __future__ import annotations

from hop_tpu.cli.common import base_parser
from hop_tpu.cli.train_main import train_main
from hop_tpu.config import ted_config


def main(argv=None):
    args = base_parser("HOP-TPU TED Gesture training").parse_args(argv)
    cfg = ted_config()
    best = train_main(cfg, args)
    print(f"done; best FGD {best:.4f}")


if __name__ == "__main__":
    main()
