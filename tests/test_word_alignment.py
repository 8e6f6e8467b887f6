"""Golden word-to-frame alignment tests.

Pins the reference's extend_word_seq semantics (lmdb_data_loader.py:129-200):
the alignment uses the CLIPPED sample end time (sample_end_time =
start + duration * n_poses / n_frames_ext, :206) passed via end_time (:234),
so frame_duration = clipped_duration / n_poses (:136). Expected indices below
are hand-computed from that formula; the test fails if the extended-window
end time is used instead (indices shift by ~n_frames_ext/n_poses).
"""

import dataclasses
import math

import numpy as np

from hop_tpu.config import ted_config
from hop_tpu.data.dataset import SpeechMotionDataset
from hop_tpu.data.records import RecordWriter, schema_for
from hop_tpu.data.vocab import Vocab

START, END = 10.0, 12.8  # 42 extended frames @ 15 fps = 2.8 s
WORDS = [
    ("alpha", 10.05, 10.2),
    ("beta", 10.51, 10.9),
    ("gamma", 11.31, 11.6),
    ("delta", 12.21, 12.4),   # frame 33 clipped / frame 26 if bug present
    ("omega", 12.50, 12.7),   # past sample_end_time: must NOT appear
]


def _reference_trace(lang, remove_word_timing):
    """Independent transcription of extend_word_seq (:129-200) with
    end_time = sample_end_time (:206,234)."""
    n_frames = 34
    sample_end_time = START + (END - START) * 34 / 42
    frame_duration = (sample_end_time - START) / n_frames
    word_idx = np.zeros(n_frames, np.int64)
    if remove_word_timing:
        n_words = sum(
            1 for w in WORDS
            if max(0, int(np.floor((w[1] - START) / frame_duration)))
            < n_frames)
        space = int(n_frames / (n_words + 1))
        for i in range(n_words):
            word_idx[(i + 1) * space] = lang.get_word_index(WORDS[i][0])
    else:
        for w in WORDS:
            idx = max(0, int(np.floor((w[1] - START) / frame_duration)))
            if idx < n_frames:
                word_idx[idx] = lang.get_word_index(w[0])
    return word_idx


def _make_dataset(tmp_path, remove_word_timing, tokenizer=None):
    cfg = ted_config()
    data_cfg = dataclasses.replace(cfg.data,
                                   remove_word_timing=remove_word_timing)
    schema = schema_for(34, 15, 10, 9, cfg.data.mel_bins)
    path = str(tmp_path / "aln")
    rng = np.random.default_rng(0)
    with RecordWriter(path, schema) as w:
        w.append(rng.normal(size=(42, 10, 3)).astype(np.float32),
                 rng.normal(size=(42, 9, 3)).astype(np.float32),
                 rng.normal(size=(schema.audio_len,)).astype(np.float32),
                 rng.normal(size=(128, schema.spec_len)).astype(np.float32),
                 {"vid": "v0", "words": WORDS, "start_time": START,
                  "end_time": END, "start_frame_no": 0, "end_frame_no": 42})
    ds = SpeechMotionDataset(path, data_cfg, tokenizer=tokenizer,
                             use_native_reader=False)
    lang = Vocab("words")
    lang.add_vocab([w[0] for w in WORDS])
    ds.set_lang_model(lang)
    return ds, lang


def test_alignment_timed_branch_golden(tmp_path):
    ds, lang = _make_dataset(tmp_path, remove_word_timing=False)
    batch = ds.make_batch(np.array([0]))
    expected = _reference_trace(lang, remove_word_timing=False)
    np.testing.assert_array_equal(batch["text_padded"][0], expected)
    # hand-computed slots: frame_dur == 1/15 s exactly under clipped timing
    placed = {i: v for i, v in enumerate(expected) if v}
    assert set(placed) == {0, 7, 19, 33}
    assert placed[33] == lang.get_word_index("delta")
    assert lang.get_word_index("omega") not in batch["text_padded"][0]


def test_alignment_evenly_spaced_branch_golden(tmp_path):
    ds, lang = _make_dataset(tmp_path, remove_word_timing=True)
    batch = ds.make_batch(np.array([0]))
    expected = _reference_trace(lang, remove_word_timing=True)
    np.testing.assert_array_equal(batch["text_padded"][0], expected)
    # 4 in-window words (omega's clipped index 37 >= 34), space = 34//5 = 6
    placed = np.nonzero(expected)[0]
    np.testing.assert_array_equal(placed, [6, 12, 18, 24])


def test_alignment_hf_token_stream(tmp_path):
    # fake tokenizer: one id per word, offset 100
    def tok(text):
        return [100 + i for i, _ in enumerate(text.split())]
    ds, lang = _make_dataset(tmp_path, remove_word_timing=False,
                             tokenizer=tok)
    batch = ds.make_batch(np.array([0]))
    t = batch["text_tokens"][0]
    # tokens ride the same frame slots, ids indexed by placement order
    # (lmdb_data_loader.py:190-195)
    assert t[0] == 100 and t[7] == 101 and t[19] == 102 and t[33] == 103
    assert (np.nonzero(t)[0] == [0, 7, 19, 33]).all()


def test_word_seq_stops_at_sample_end_time(tmp_path):
    ds, lang = _make_dataset(tmp_path, remove_word_timing=False)
    batch = ds.make_batch(np.array([0]))
    ws = batch["word_seq"][0][: batch["text_lengths"][0]]
    # SOS + alpha..delta + EOS; omega (12.5 > 12.2667) excluded (:223-230)
    assert list(ws) == [lang.SOS_token] + [
        lang.get_word_index(w) for w in
        ("alpha", "beta", "gamma", "delta")] + [lang.EOS_token]
