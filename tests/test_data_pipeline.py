"""Offline preprocessing -> record store -> dataset batches."""

import numpy as np
import pytest

from hop_tpu import geometry as G
from hop_tpu.config import ted_config
from hop_tpu.data import synthetic
from hop_tpu.data.dataset import SpeechMotionDataset
from hop_tpu.data.preprocessor import (DataPreprocessor, MotionFilter,
                                       get_words_in_time_range,
                                       calculate_data_mean)
from hop_tpu.data.records import RecordReader, RecordWriter, schema_for
from hop_tpu.data.vocab import Vocab, build_vocab


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    cfg = ted_config()
    path = str(tmp_path_factory.mktemp("records") / "train")
    videos = synthetic.make_source_clips(cfg, n_videos=2, clip_seconds=12.0)
    pre = DataPreprocessor(cfg.data, path)
    n = pre.run(videos)
    return cfg, path, n


def test_preprocessor_produces_samples(store):
    cfg, path, n = store
    assert n > 0
    schema = schema_for(34, 15, 10, 9)
    reader = RecordReader(path, schema, use_native=False)
    assert len(reader) == n
    rec, aux = reader[0]
    assert rec["pose_seq"].shape == (42, 10, 3)   # extended window
    assert rec["vec_seq"].shape == (42, 9, 3)
    assert rec["audio"].shape == (44800,)
    assert aux["vid"].startswith("vid")
    assert len(aux["words"]) >= 2
    # dir-vecs are mean-centred unit vectors
    v = rec["vec_seq"] + G.TED_MEAN_DIR_VEC.reshape(-1, 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-4)


def test_record_roundtrip(tmp_path, rng):
    schema = schema_for(34, 15, 10, 9)
    path = str(tmp_path / "rt")
    samples = []
    with RecordWriter(path, schema) as w:
        for i in range(5):
            s = {name: rng.normal(size=shape).astype(dt)
                 for name, shape, dt in schema.fields()}
            w.append(s["pose_seq"], s["vec_seq"], s["audio"],
                     s["spectrogram"], {"vid": f"v{i}", "words": [],
                                        "start_time": 0.0, "end_time": 1.0,
                                        "start_frame_no": 0,
                                        "end_frame_no": 42})
            samples.append(s)
    r = RecordReader(path, schema, use_native=False)
    assert len(r) == 5
    for i in (0, 3, 4):
        rec, aux = r[i]
        for name in rec:
            np.testing.assert_array_equal(rec[name], samples[i][name])
        assert aux["vid"] == f"v{i}"
    batch = r.gather(np.array([1, 4, 2]))
    np.testing.assert_array_equal(batch["audio"][0], samples[1]["audio"])
    np.testing.assert_array_equal(batch["vec_seq"][2], samples[2]["vec_seq"])


def test_motion_filter_rules():
    skel = G.TED_SKELETON
    f = MotionFilter(G.TED_MEAN_POSE, skel)
    frames = np.tile(G.TED_MEAN_POSE.reshape(1, 10, 3), (42, 1, 1))
    assert f(frames) == "pose"  # too close to mean
    lively = frames + np.random.default_rng(0).normal(0, 0.2, frames.shape)
    verdict = f(lively)
    assert verdict in ("PASS", "spine angle")  # random spine may tilt
    static = frames + 0.5  # far from mean but zero variance
    static[:, 1] = static[:, 0] + np.array([0, -1, 0.0])  # upright spine
    assert f(static) == "motion"


def test_words_in_time_range():
    words = [("a", 0.0, 1.0), ("b", 1.5, 2.0), ("c", 3.0, 4.0)]
    out = get_words_in_time_range(words, 0.5, 3.0)
    assert [w[0] for w in out] == ["a", "b"]


def test_vocab_and_build():
    v = Vocab("words")
    v.add_vocab(["hello", "world", "hello"])
    assert v.get_word_index("hello") == 4
    assert v.get_word_index("missing") == Vocab.UNK_token
    assert v.word2count["hello"] == 2
    v2 = build_vocab("w", [[("x", 0, 1), ("y", 1, 2)]], None, None, 8)
    assert v2.word_embedding_weights.shape == (v2.n_words, 8)


def test_dataset_batches(store):
    cfg, path, n = store
    ds = SpeechMotionDataset(path, cfg.data)
    lang = build_vocab("words", [
        [w for aux in ds._aux_cache for w in aux["words"]]], None, None, 300)
    ds.set_lang_model(lang)
    bs = min(4, len(ds))
    batch = next(ds.batches(bs, shuffle=True, seed=0))
    assert batch["target_vec"].shape == (bs, 34, 27)
    assert batch["in_audio"].shape == (bs, 36267)
    assert batch["spectrogram"].shape[0] == bs
    assert batch["spectrogram"].shape[1] == 128
    assert batch["text_padded"].shape == (bs, 34)
    # aligned word ids are sparse and within vocab
    assert (batch["text_padded"] > 0).any()
    assert batch["text_padded"].max() < lang.n_words
    assert batch["vid_indices"].max() < ds.speaker_model.n_words


def test_calculate_data_mean(rng):
    skel = G.TED_SKELETON
    poses = [rng.normal(size=(10, 10, 3))]
    vecs = [rng.normal(size=(10, 9, 3))]
    mv, mp, bl = calculate_data_mean(vecs, poses, skel)
    assert mv.shape == (9, 3) and mp.shape == (10, 3) and bl.shape == (9,)
    np.testing.assert_allclose(mv, vecs[0].mean(axis=0), atol=1e-9)


def test_truncate_videos_frac_process_then_check(tmp_path):
    """Pin the reference's 50%-quirk loop shape (data_preprocessor.py:55-57):
    each video is processed FIRST, then `if n_data > n_videos * 0.5: break`
    — so the video that crosses the limit is still processed. With 10
    videos at frac 0.5 that is videos 1..6 (after video 5, 5 > 5 is false;
    video 6 is processed, then 6 > 5 breaks)."""
    import dataclasses
    cfg = ted_config()
    videos = synthetic.make_source_clips(cfg, n_videos=10, clip_seconds=6.0)
    data_cfg = dataclasses.replace(cfg.data, truncate_videos_frac=0.5)

    per_video = []
    for i, v in enumerate(videos):
        pre = DataPreprocessor(cfg.data, str(tmp_path / f"one{i}"),
                               disable_filtering=True)
        per_video.append(pre.run([v]))

    pre = DataPreprocessor(data_cfg, str(tmp_path / "trunc"),
                           disable_filtering=True)
    n = pre.run(videos)
    assert n == sum(per_video[:6])
    assert n < sum(per_video)


def test_truncation_loop_matches_reference_for_all_counts(tmp_path,
                                                          monkeypatch):
    """Exhaustive pin of run()'s truncation control flow against the
    reference's loop (data_preprocessor.py:55-57: process the video,
    `n_data += 1`, `if n_data > self.n_videos * 0.5: break`) for every
    video count 1..20 — the crossing video IS processed in both, odd and
    even counts alike. The clip bodies are shimmed out so only the loop
    shape is under test."""
    import dataclasses
    cfg = ted_config()

    processed = []
    monkeypatch.setattr(DataPreprocessor, "_sample_from_clip",
                        lambda self, clip: processed.append(clip))
    for n_videos in range(1, 21):
        videos = [(f"v{i}", [f"clip{i}"]) for i in range(n_videos)]

        # the reference's loop, literally (data_preprocessor.py:45-57)
        ref_order = []
        n_data = 0
        for vid, clips in videos:
            for clip in clips:
                ref_order.append(clip)
            n_data += 1
            if n_data > n_videos * 0.5:
                break

        processed.clear()
        data_cfg = dataclasses.replace(cfg.data, truncate_videos_frac=0.5)
        pre = DataPreprocessor(data_cfg, str(tmp_path / f"t{n_videos}"),
                               disable_filtering=True)
        pre.run(videos)
        assert processed == ref_order, n_videos


def test_text_normalizers_match_live_reference():
    """normalize_string / remove_tags_marks vs the reference's own
    data_loader/data_utils.py:18-31 (librosa stubbed; never called)."""
    import importlib.machinery
    import sys
    import types

    added = []
    for m in ("librosa", "soundfile", "lmdb", "fasttext"):
        if m not in sys.modules:
            mod = types.ModuleType(m)
            mod.__spec__ = importlib.machinery.ModuleSpec(m, loader=None)
            sys.modules[m] = mod
            added.append(m)
    sys.path.insert(0, "/root/reference")
    try:
        from data_loader import data_utils as ref_du
        from hop_tpu.data import text as ours

        cases = [
            "Hello, World!  It's 3 o'clock?",
            "  <laugh> don't -- STOP; <applause> ok...  ",
            "a\tb\nc  d,e.f!g?h:i;j",
            "café 123 naïve — em-dash 'quoted' \"double\"",
            "",
            "UPPER lower MiXeD,,,!!??..",
        ]
        for s in cases:
            assert ours.normalize_string(s) == ref_du.normalize_string(s), s
            assert ours.remove_tags_marks(s) == ref_du.remove_tags_marks(s), s
    finally:
        sys.path.remove("/root/reference")
        for m in added:
            sys.modules.pop(m, None)
        for name in [k for k in list(sys.modules)
                     if k.split(".")[0] == "data_loader"]:
            sys.modules.pop(name, None)
