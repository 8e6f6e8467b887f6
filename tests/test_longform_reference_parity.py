"""Long-form generation parity vs the reference's EXECUTED loop.

The reference's sliding-window synthesis lives as module-level script in
test_checkpoint.py:369-473 (subdivision math, per-window audio/text
preparation, 16-frame pre_seq feedback, 4-frame linear cross-fade).  This
harness lifts those lines VERBATIM out of /root/reference/test_checkpoint.py
at test time, executes them on CPU with a stubbed model / tokenizer /
librosa, and asserts that `hop_tpu.infer.generate_long_form` drives the
same stub to a bit-identical stitched sequence — per-window model inputs
included.  The oracle is the reference's own executed arithmetic, not a
transcription.

The stub model is a deterministic function of (in_audio, text ids,
pre_seq, vid) so the comparison covers exactly the pipeline under test:
window slicing/padding, tokenizer-id frame scatter (including the
reference's w_i-indexing and token-exhaustion-break quirks,
test_checkpoint.py:439-445), autoregressive seeding, and cross-fade.
"""

import math
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from hop_tpu.config import ted_config
from hop_tpu.infer import generate_long_form

REF = "/root/reference/test_checkpoint.py"


# ---------------------------------------------------------------------------
# shared stubs (both sides call the same deterministic functions)
# ---------------------------------------------------------------------------

def _stub_core(in_audio: np.ndarray, text_ids: np.ndarray,
               pre_seq: np.ndarray, vid: int) -> np.ndarray:
    """Deterministic fake generator (1, 34, 27); float64 internally so both
    callers produce bit-identical float32 outputs from identical inputs."""
    a = float(np.asarray(in_audio, np.float64).sum())
    t = float(np.asarray(text_ids, np.float64).sum())
    base = np.sin(np.arange(34 * 27, dtype=np.float64).reshape(34, 27) * 0.013)
    out = base * (1.0 + 0.1 * vid) + 1e-4 * a + 1e-3 * t
    out[:16] += 0.37 * np.asarray(pre_seq, np.float64).reshape(-1, 27)[:16]
    return out[None].astype(np.float32)


def _word_tokens(text: str) -> list:
    """Fake WordPiece: drops words shorter than 3 chars (so a window can
    have fewer tokens than words -> exercises the reference's
    `if i == text_token.shape[1]: break`), splits words longer than 6
    chars into two tokens (more tokens than words -> exercises the
    reference's w_i misalignment)."""
    ids = []
    for w in text.split():
        if len(w) < 3:
            continue
        ids.append(5 + sum(map(ord, w)) % 20000)
        if len(w) > 6:
            ids.append(5 + sum(map(ord, w[::-1])) % 20000)
    return ids


class _Vocab:
    def get_word_index(self, w):
        return 4 + sum(map(ord, w)) % 1000


# ---------------------------------------------------------------------------
# reference-side adapters
# ---------------------------------------------------------------------------

class _RefTokenized:
    def __init__(self, ids):
        self.input_ids = torch.as_tensor([ids], dtype=torch.long) \
            if ids else torch.zeros((1, 0), dtype=torch.long)


class _RefTokenizer:
    def __call__(self, text, max_length=2048, **kw):
        return _RefTokenized(_word_tokens(text)[:max_length])


class _RefModel:
    """model(in_audio, log_melspec, text_token_padded, pre_seq, vid) ->
    4-tuple, first element (1, 34, 27) (test_checkpoint.py:459)."""
    z_obj = types.SimpleNamespace(n_words=7)

    def __init__(self, record):
        self.record = record

    def __call__(self, in_audio, log_melspec, text_token_padded, pre_seq,
                 vid):
        args = (in_audio.detach().numpy().copy(),
                text_token_padded.detach().numpy().astype(np.int64).copy(),
                pre_seq.detach().numpy().copy(), int(vid.item()))
        self.record.append(args)
        return torch.from_numpy(_stub_core(*args)), None, None, None


def _fake_librosa():
    """The stub model ignores the mel input, so the reference's librosa
    calls only need plausible shapes."""
    feature = types.SimpleNamespace(
        melspectrogram=lambda y, sr, n_fft, hop_length, power:
            np.zeros((128, 34), np.float32))
    return types.SimpleNamespace(
        feature=feature, power_to_db=lambda s, ref: np.asarray(s))


def _extract_reference_block():
    """Reference test_checkpoint.py's synthesis loop, lines between
    `out_list = []` (369) and `out_dir_vec = np.vstack(out_list)` (473)
    inclusive, dedented one level and retargeted from cuda to cpu."""
    with open(REF) as f:
        lines = f.read().splitlines()
    start = next(i for i, ln in enumerate(lines)
                 if ln.strip() == "out_list = []")
    end = next(i for i, ln in enumerate(lines)
               if ln.strip() == "out_dir_vec = np.vstack(out_list)")
    block = [ln[4:] if ln.startswith("    ") else ln
             for ln in lines[start:end + 1]]
    src = "\n".join(block).replace('"cuda:0"', '"cpu"')
    return src, start + 1


def _run_reference(clip_audio, clip_words, seed_dir_vec, vid_index):
    src, lineno = _extract_reference_block()
    record = []
    ns = {
        "np": np, "math": math, "torch": torch,
        "time": __import__("time"),
        "librosa": _fake_librosa(),
        "random": types.SimpleNamespace(randrange=lambda n: vid_index),
        "device": "cpu",
        "model": _RefModel(record),
        "tokenizer": _RefTokenizer(),
        "lang_model": _Vocab(),
        "get_words_in_time_range": _ref_get_words_in_time_range(),
        "clip_audio": clip_audio,
        "clip_words": [list(w) for w in clip_words],
        "target_dir_vec": torch.from_numpy(seed_dir_vec.copy()),
        "print": lambda *a, **k: None,
    }
    code = compile("\n" * lineno + src, REF, "exec")
    exec(code, ns)
    return ns["out_dir_vec"], record, ns


def _ref_get_words_in_time_range():
    """The reference's own helper, executed from its source
    (convert.py:23-38 — the module-level copy of the function
    test_checkpoint.py star-imports)."""
    with open("/root/reference/convert.py") as f:
        lines = f.read().splitlines()
    start = next(i for i, ln in enumerate(lines)
                 if ln.startswith("def get_words_in_time_range"))
    end = next(i for i in range(start + 1, len(lines))
               if lines[i].strip() == "return words")
    ns = {}
    exec("\n".join(lines[start:end + 1]), ns)
    return ns["get_words_in_time_range"]


# ---------------------------------------------------------------------------
# the parity test
# ---------------------------------------------------------------------------

def _make_clip(seconds=9.3, seed=7):
    rng = np.random.default_rng(seed)
    sr = 16000
    audio = (0.02 * rng.standard_normal(int(seconds * sr))).astype(np.float32)
    # word stream mixing short (<3 chars -> zero tokens), normal, and long
    # (>6 chars -> two tokens) words so every tokenizer quirk branch runs;
    # at least one >=3-char word per window keeps the reference loop
    # in-bounds (its text_token[0, w_i] never sees an empty stream).
    words, t = [], 0.15
    lexicon = ["extraordinary", "ok", "hands", "a", "gesture", "of",
               "magnificent", "talk", "it", "waves"]
    i = 0
    while t < seconds - 0.4:
        dur = 0.2 + 0.15 * ((i * 7) % 3)
        words.append([lexicon[i % len(lexicon)], round(t, 3),
                      round(t + dur, 3)])
        t += dur + 0.1
        i += 1
    seed_vec = rng.standard_normal((20, 27)).astype(np.float32)
    return audio, words, seed_vec


def test_long_form_matches_reference_executed_loop():
    cfg = ted_config()
    import dataclasses
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, use_hf_token_stream=True))
    audio, words, seed_vec = _make_clip()
    vid_index = 3

    ref_out, ref_calls, ns = _run_reference(audio, words, seed_vec,
                                            vid_index)

    ours_calls = []

    def forward(in_audio, log_mel, text, pre_seq, vid, rng_step):
        args = (np.asarray(in_audio).copy(),
                np.asarray(text).astype(np.int64).copy(),
                np.asarray(pre_seq).copy(), int(np.asarray(vid)[0]))
        ours_calls.append(args)
        return jnp.asarray(_stub_core(*args))

    out = generate_long_form(cfg, forward, audio, words, seed_vec,
                             _Vocab(), vid_index,
                             tokenizer=lambda text: _word_tokens(text))

    # multiple windows actually ran, with both tokenizer quirk branches
    assert ns["num_subdivision"] >= 4
    assert len(ref_calls) == ns["num_subdivision"] == len(ours_calls)
    token_counts = [int((t != 0).sum()) for _, t, _, _ in ref_calls]
    assert max(token_counts) > 0

    # per-window model inputs are bit-identical (audio slice+pad, token
    # scatter, autoregressive pre_seq feedback)
    for k, (ra, rt, rp, rv) in enumerate(ref_calls):
        oa, ot, op, ov = ours_calls[k]
        assert np.array_equal(ra, oa), f"window {k}: audio differs"
        assert np.array_equal(rt[0], ot[0]), f"window {k}: text differs"
        assert np.array_equal(rp, op), f"window {k}: pre_seq differs"
        assert rv == ov

    # and the stitched output (cross-fade included) is bit-identical
    assert ref_out.shape == out.shape
    assert np.array_equal(ref_out, out)


def test_long_form_matches_reference_short_clip():
    """clip shorter than one unit -> the reference's num_subdivision=1
    branch (test_checkpoint.py:379-380)."""
    cfg = ted_config()
    import dataclasses
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, use_hf_token_stream=True))
    audio, words, seed_vec = _make_clip(seconds=1.7, seed=11)
    ref_out, ref_calls, ns = _run_reference(audio, words, seed_vec, 2)
    assert ns["num_subdivision"] == 1

    def forward(in_audio, log_mel, text, pre_seq, vid, rng_step):
        return jnp.asarray(_stub_core(
            np.asarray(in_audio), np.asarray(text),
            np.asarray(pre_seq), int(np.asarray(vid)[0])))

    out = generate_long_form(cfg, forward, audio, words, seed_vec,
                             _Vocab(), 2,
                             tokenizer=lambda text: _word_tokens(text))
    assert np.array_equal(ref_out, out)
