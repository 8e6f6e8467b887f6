"""Onset detection: structural checks + envelope parity vs direct numpy."""

import numpy as np

from hop_tpu.ops import onset as O
from hop_tpu.ops import mel as M


def _np_onset_strength(y, sr=16000, hop=512, n_fft=2048, n_mels=128):
    """Independent numpy transcription of librosa 0.8.1 onset_strength."""
    pad = n_fft // 2
    yp = np.pad(y, (pad, pad), mode="reflect")
    window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    n_frames = 1 + (len(yp) - n_fft) // hop
    spec = np.empty((n_frames, 1 + n_fft // 2))
    for t in range(n_frames):
        fr = yp[t * hop: t * hop + n_fft] * window
        spec[t] = np.abs(np.fft.rfft(fr)) ** 2
    fb = M.mel_filterbank(sr, n_fft, n_mels, fmax=O.ONSET_FMAX)
    s = spec @ fb.T
    s_db = 10 * np.log10(np.maximum(1e-10, s))
    s_db = np.maximum(s_db, s_db.max() - 80.0)
    flux = np.maximum(0.0, s_db[1:] - s_db[:-1]).mean(axis=1)
    pad_w = 1 + n_fft // (2 * hop)
    env = np.concatenate([np.zeros(pad_w), flux])[:n_frames]
    return env


def test_onset_strength_matches_numpy(rng):
    y = (rng.normal(size=16000) * np.sin(np.arange(16000) * 0.1)).astype(np.float32)
    got = np.asarray(O.onset_strength(y))
    want = _np_onset_strength(y.astype(np.float64))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_onset_detect_fires_on_clicks(rng):
    sr, hop = 16000, 512
    y = rng.normal(size=36267).astype(np.float32) * 0.0005
    for pos in (8000, 20000, 30000):
        t = np.arange(2000)
        y[pos:pos + 2000] += (np.sin(0.3 * t) * np.exp(-t / 300)).astype(np.float32)
    mask = np.asarray(O.onset_detect_mask(y))
    assert mask.shape == (1 + 36267 // hop,)
    frames = np.nonzero(mask)[0]
    assert len(frames) >= 2
    times = frames * hop / sr
    # each click should have an onset within ~3 frames
    for pos in (8000, 20000):
        assert np.min(np.abs(times - pos / sr)) < 0.15


def test_moving_average_edges(rng):
    x = rng.normal(size=20).astype(np.float32)
    got = np.asarray(O._moving_average(x, pre=3, post=4))
    for n in range(20):
        want = x[max(0, n - 3): min(20, n + 4)].mean()
        np.testing.assert_allclose(got[n], want, rtol=1e-5)


def test_batched_onset(rng):
    y = rng.normal(size=(3, 8192)).astype(np.float32)
    mask = np.asarray(O.onset_detect_mask(y))
    assert mask.shape == (3, 1 + 8192 // 512)
