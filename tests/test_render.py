"""Video renderer smoke (host-side; PillowWriter fallback when no ffmpeg)."""

import os

import numpy as np
import pytest

from hop_tpu import geometry as G


def test_create_video_and_save(tmp_path, rng):
    pytest.importorskip("matplotlib")
    from hop_tpu.utils.render import create_video_and_save

    out = rng.normal(size=(6, 27)).astype(np.float32) * 0.1
    tgt = rng.normal(size=(6, 27)).astype(np.float32) * 0.1
    audio = rng.normal(size=8000).astype(np.float32) * 0.05
    path = create_video_and_save(
        str(tmp_path), 0, "smoke", tgt, out, G.TED_MEAN_DIR_VEC,
        title="smoke\nline2", audio=audio)
    assert os.path.exists(path)
    assert os.path.getsize(path) > 1000
    # without ffmpeg the audio lands in a side-car wav
    assert path.endswith(".mp4") or os.path.exists(
        str(tmp_path / "smoke_0.wav"))
