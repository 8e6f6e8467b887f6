"""CLI flag -> config plumbing regressions.

--warmup-epochs overrides the GAN-phase gate the reference hardcodes as
`epoch > 10` (train_llm.py:15); bench_loop_level.py relies on it to put
the steady-state loop in the full GAN step from epoch 1.
"""

from hop_tpu.cli import common as C
from hop_tpu.config import expressive_config, ted_config


def test_warmup_epochs_default_untouched():
    p = C.base_parser("t")
    cfg = C.apply_overrides(ted_config(), p.parse_args([]))
    assert cfg.loss.warmup_epochs == 10  # reference gate epoch > 10


def test_warmup_epochs_override():
    p = C.base_parser("t")
    cfg = C.apply_overrides(ted_config(), p.parse_args(["--warmup-epochs", "0"]))
    assert cfg.loss.warmup_epochs == 0
    cfg = C.apply_overrides(
        expressive_config(), p.parse_args(["--warmup-epochs", "3"]))
    assert cfg.loss.warmup_epochs == 3
