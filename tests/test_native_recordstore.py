"""C++ batch gatherer vs the numpy fallback."""

import numpy as np
import pytest

from hop_tpu.data.records import RecordReader, RecordWriter, schema_for


@pytest.fixture(scope="module")
def store(tmp_path_factory, ):
    rng = np.random.default_rng(1)
    schema = schema_for(34, 15, 10, 9)
    path = str(tmp_path_factory.mktemp("native") / "recs")
    with RecordWriter(path, schema) as w:
        for i in range(12):
            fields = {name: rng.normal(size=shape).astype(dt)
                      for name, shape, dt in schema.fields()}
            w.append(fields["pose_seq"], fields["vec_seq"], fields["audio"],
                     fields["spectrogram"],
                     {"vid": f"v{i % 3}", "words": [], "start_time": 0.0,
                      "end_time": 1.0, "start_frame_no": 0,
                      "end_frame_no": 42})
    return path, schema


def test_native_builds_and_matches_numpy(store):
    path, schema = store
    native = RecordReader(path, schema, use_native=True)
    assert native._native is not None, "C++ gatherer failed to build/load"
    python = RecordReader(path, schema, use_native=False)
    idx = np.array([7, 0, 11, 3, 3])
    got = native.gather(idx)
    want = python.gather(idx)
    for name in want:
        np.testing.assert_array_equal(got[name], want[name])


def test_native_large_batch(store):
    path, schema = store
    native = RecordReader(path, schema, use_native=True)
    idx = np.random.default_rng(0).integers(0, 12, size=256)
    got = native.gather(idx)
    assert got["audio"].shape == (256, schema.audio_len)
