"""End-to-end HF token stream: CLI flag -> WordPiece -> dataset batch.

Round-2 verdict: --use-hf-token-stream silently fed zeros (no tokenizer
existed). Now the flag requires --hf-vocab, builds a real WordPiece
tokenizer, and the dataset batch carries its ids.
"""

import numpy as np
import pytest

from hop_tpu.cli import common as C
from hop_tpu.config import ted_config
from hop_tpu.data.wordpiece import build_vocab_file


def test_flag_without_vocab_raises():
    p = C.base_parser("t")
    args = p.parse_args(["--use-hf-token-stream"])
    with pytest.raises(SystemExit, match="hf-vocab"):
        C.make_tokenizer(args)


def test_flag_with_vocab_builds_tokenizer(tmp_path):
    vp = tmp_path / "vocab.txt"
    build_vocab_file(["[PAD]", "[UNK]", "hello", "##s"], str(vp))
    p = C.base_parser("t")
    args = p.parse_args(["--use-hf-token-stream", "--hf-vocab", str(vp)])
    tok = C.make_tokenizer(args)
    assert tok("hellos hello") == [2, 3, 2]
    # no flag -> no tokenizer, even with a vocab supplied
    args = p.parse_args(["--hf-vocab", str(vp)])
    assert C.make_tokenizer(args) is None


def test_dataset_batch_carries_wordpiece_ids(tmp_path):
    """load_datasets with the flag: text_tokens are tokenizer ids placed on
    word frame slots, and device_batch routes them into text_padded."""
    vp = tmp_path / "vocab.txt"
    # synthetic clips draw words from a fixed word bank (data/synthetic.py);
    # vocab covers every lowercase ascii word via single chars + pieces
    tokens = (["[PAD]", "[UNK]"]
              + [chr(c) for c in range(ord("a"), ord("z") + 1)]
              + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)])
    build_vocab_file(tokens, str(vp))
    p = C.base_parser("t")
    args = p.parse_args(
        ["--use-hf-token-stream", "--hf-vocab", str(vp),
         "--synthetic-videos", "1", "--seed", "3"])
    cfg = C.apply_overrides(ted_config(), args)
    train_ds, _, _ = C.load_datasets(cfg, args)
    batch = train_ds.make_batch(np.arange(min(4, len(train_ds))))
    assert batch["text_tokens"].any(), "token stream is all zeros"
    dev = C.device_batch(batch, cfg, with_mel=False)
    np.testing.assert_array_equal(
        np.asarray(dev["text_padded"]),
        batch["text_tokens"] % cfg.llm.vocab_size)
