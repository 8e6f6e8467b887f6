"""Mel frontend: STFT framing/window/DFT vs direct numpy, librosa semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from hop_tpu.ops import mel as M


def _np_stft_power(y, n_fft, hop):
    """Direct numpy STFT |.|^2 with librosa conventions (centered, reflect,
    periodic hann)."""
    pad = n_fft // 2
    y = np.pad(y, (pad, pad), mode="reflect")
    window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    n_frames = 1 + (len(y) - n_fft) // hop
    out = np.empty((n_frames, 1 + n_fft // 2))
    for t in range(n_frames):
        frame = y[t * hop: t * hop + n_fft] * window
        out[t] = np.abs(np.fft.rfft(frame)) ** 2
    return out


def test_power_spectrogram_matches_fft(rng):
    y = rng.normal(size=4096).astype(np.float32)
    got = np.asarray(M.power_spectrogram(y, n_fft=1024, hop=512))
    want = _np_stft_power(y.astype(np.float64), 1024, 512)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_frame_counts():
    y = np.zeros(36267, np.float32)
    out = M.log_mel_spectrogram(y, n_fft=1024, hop=1096)
    assert out.shape == (34, 128)
    spec = M.extract_melspectrogram(y)
    assert spec.shape[0] == 128  # mels x time layout


def test_mel_filterbank_properties():
    fb = M.mel_filterbank(16000, 1024, 128)
    assert fb.shape == (128, 513)
    assert np.all(fb >= 0)
    # every filter has support, peaks increase in frequency
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)
    assert fb.sum() > 0
    # slaney normalization: filters integrate to ~2/(band width); areas shrink
    # as bins coarsen only weakly — just check no filter is empty
    assert np.all(fb.max(axis=1) > 0)


def test_power_to_db_per_sample_ref(rng):
    s = np.abs(rng.normal(size=(3, 10, 8))).astype(np.float32)
    s[1] *= 100.0  # different per-sample max
    out = np.asarray(M.power_to_db(jnp.asarray(s), ref_axes=(-2, -1)))
    for b in range(3):
        ref = s[b].max()
        want = 10 * np.log10(np.maximum(1e-10, s[b])) - 10 * np.log10(ref)
        want = np.maximum(want, want.max() - 80.0)
        np.testing.assert_allclose(out[b], want, rtol=1e-4, atol=1e-4)


def test_log_mel_batched_equals_single(rng):
    y = rng.normal(size=(2, 8192)).astype(np.float32)
    batched = np.asarray(M.log_mel_spectrogram(y))
    singles = np.stack([np.asarray(M.log_mel_spectrogram(y[i]))
                        for i in range(2)])
    np.testing.assert_allclose(batched, singles, atol=1e-4)
