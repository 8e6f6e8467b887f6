"""Independent oracle for the onset detector (ops/onset.py).

ops/onset.py pins librosa 0.8.1's onset_detect parameter resolution by
transcription, and — unlike the mel/dir-vec constants — can never
self-activate from data artifacts (nothing in the LMDBs embeds onsets),
so the BC metric (reference Evaluate.py:207,250) rested on one
hand-derivation. This file is the second, structurally different
implementation: a host-numpy transcription of librosa 0.8.1's
onset_strength + onset_detect/peak_pick chain that shares NO code with
hop_tpu.ops — its own slaney mel filterbank (per-filter triangle loop),
a frame-loop np.fft.rfft spectrogram, scipy.ndimage max/uniform filters
called exactly as librosa calls them (origin math included), librosa's
explicit moving-average edge-correction loops, and the greedy
wait-suppression walk. The property tests pin ops/onset.py against it on
randomized audio over an (sr, hop) grid — including non-degenerate rates
where the max filter is real and wait > 0 — so the documented
"sr=16000/hop=512 reduces to a 7-tap moving-average threshold"
derivation is itself machine-checked (test_degenerate_case_reduction).
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

from hop_tpu.ops import onset as O

# ---------------------------------------------------------------------------
# Independent transcription of librosa 0.8.1 (no hop_tpu.ops code reuse)
# ---------------------------------------------------------------------------


def _hz_to_mel(f):
    """Slaney scale, scalar-friendly (librosa core.convert, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3)
    log_region = f >= 1000.0
    return np.where(
        log_region,
        1000.0 / (200.0 / 3)
        + np.log(np.maximum(f, 1e-12) / 1000.0) / (np.log(6.4) / 27.0),
        mel)


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    hz = m * (200.0 / 3)
    min_log_mel = 1000.0 / (200.0 / 3)
    return np.where(m >= min_log_mel,
                    1000.0 * np.exp((np.log(6.4) / 27.0) * (m - min_log_mel)),
                    hz)


def oracle_mel_fb(sr, n_fft, n_mels=128, fmin=0.0, fmax=11025.0):
    """Per-filter triangle construction (vs ops/mel.py's ramps matrix)."""
    bin_freqs = np.arange(1 + n_fft // 2) * sr / n_fft
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax),
                                     n_mels + 2))
    fb = np.zeros((n_mels, len(bin_freqs)))
    for m in range(n_mels):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        rising = (bin_freqs - lo) / (ctr - lo)
        falling = (hi - bin_freqs) / (hi - ctr)
        tri = np.maximum(0.0, np.minimum(rising, falling))
        fb[m] = tri * (2.0 / (hi - lo))  # slaney area norm
    return fb


def oracle_onset_strength(y, sr, hop, n_fft=2048, n_mels=128):
    """librosa 0.8.1 onset_strength: melspectrogram(power=2,
    fmax=11025.0 hardcoded default) -> power_to_db(ref=1) -> positive
    first difference (lag=1) -> mean over mels -> center padding."""
    y = np.asarray(y, dtype=np.float64)
    pad = n_fft // 2
    yp = np.pad(y, (pad, pad), mode="reflect")
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n_frames = 1 + (len(yp) - n_fft) // hop
    spec = np.empty((n_frames, 1 + n_fft // 2))
    for t in range(n_frames):
        spec[t] = np.abs(np.fft.rfft(yp[t * hop:t * hop + n_fft]
                                     * window)) ** 2
    s = spec @ oracle_mel_fb(sr, n_fft, n_mels).T  # (frames, mels)
    s_db = 10.0 * np.log10(np.maximum(1e-10, s))
    s_db = np.maximum(s_db, s_db.max() - 80.0)
    flux = np.maximum(0.0, s_db[1:] - s_db[:-1]).mean(axis=1)
    pad_w = 1 + n_fft // (2 * hop)
    return np.concatenate([np.zeros(pad_w), flux])[:n_frames]


def oracle_peak_pick(x, pre_max, post_max, pre_avg, post_avg, delta, wait):
    """Verbatim transcription of librosa 0.8.1 util.peak_pick (incl. the
    scipy origin math, both edge-correction loops, and the wait walk)."""
    x = np.asarray(x, dtype=np.float64)
    pre_max = int(np.ceil(pre_max))
    post_max = int(np.ceil(post_max))
    pre_avg = int(np.ceil(pre_avg))
    post_avg = int(np.ceil(post_avg))
    wait = int(np.ceil(wait))

    max_length = pre_max + post_max
    max_origin = int(np.ceil(0.5 * (pre_max - post_max)))
    mov_max = ndi.maximum_filter1d(x, max_length, mode="constant",
                                   origin=max_origin)
    avg_length = pre_avg + post_avg
    avg_origin = int(np.ceil(0.5 * (pre_avg - post_avg)))
    mov_avg = ndi.uniform_filter1d(x, avg_length, mode="nearest",
                                   origin=avg_origin)
    n = 0
    while n - pre_avg < 0 and n < x.shape[0]:
        start = max(n - pre_avg, 0)
        mov_avg[n] = np.mean(x[start:n + post_avg])
        n += 1
    n = max(x.shape[0] - post_avg, 0)
    while n < x.shape[0]:
        start = max(n - pre_avg, 0)
        mov_avg[n] = np.mean(x[start:n + post_avg])
        n += 1

    detections = x * (x == mov_max)
    detections = detections * (detections >= (mov_avg + delta))
    peaks, last_onset = [], -np.inf
    for i in np.nonzero(detections)[0]:
        if i > last_onset + wait:
            peaks.append(int(i))
            last_onset = i
    return np.array(peaks, dtype=int)


def oracle_params(sr, hop):
    """onset_detect's kwargs.setdefault lines (float floor division)."""
    return dict(pre_max=0.03 * sr // hop, post_max=0.00 * sr // hop + 1,
                pre_avg=0.10 * sr // hop, post_avg=0.10 * sr // hop + 1,
                wait=0.03 * sr // hop, delta=0.07)


def oracle_onset_detect(y, sr, hop=512):
    """librosa 0.8.1 onset_detect(y, sr, units='frames'), normalize=True."""
    env = oracle_onset_strength(y, sr, hop)
    env = env - env.min()
    if env.max() > 0:
        env = env / env.max()
    return oracle_peak_pick(env, **oracle_params(sr, hop)), env


# ---------------------------------------------------------------------------
# Test audio: noise floor + decaying click train (real onsets, real margins)
# ---------------------------------------------------------------------------

GRID = [(16000, 512), (22050, 512), (16000, 256), (44100, 512)]


def _click_audio(rng, sr, seconds=2.0, n_clicks=5):
    n = int(sr * seconds)
    y = rng.normal(size=n) * 0.002
    positions = rng.choice(np.arange(sr // 4, n - sr // 4), size=n_clicks,
                           replace=False)
    for pos in positions:
        t = np.arange(min(1500, n - pos))
        y[pos:pos + len(t)] += np.sin(0.25 * t) * np.exp(-t / 250.0)
    return y.astype(np.float32)


@pytest.mark.parametrize("sr,hop", GRID)
def test_envelope_matches_oracle(rng, sr, hop):
    y = _click_audio(rng, sr)
    got = np.asarray(O.onset_strength(y, sr=sr, hop=hop))
    want = oracle_onset_strength(y, sr, hop)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_onset_filterbank_uses_11025_not_nyquist():
    """The envelope's mel filterbank is librosa's fmax=11025 default; at
    sr=16000 that differs materially from the sr/2 bank (the top
    triangles have no support below Nyquist and read all-zero)."""
    from hop_tpu.ops import mel as mel_ops
    ours = mel_ops.mel_filterbank(16000, 2048, 128, fmax=O.ONSET_FMAX)
    want = oracle_mel_fb(16000, 2048, 128, fmax=11025.0)
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-7)
    nyquist = mel_ops.mel_filterbank(16000, 2048, 128)
    assert not np.allclose(ours, nyquist, atol=1e-4)
    assert (np.abs(want[-6:]).sum(axis=1) == 0).all()  # dead top filters


@pytest.mark.parametrize("sr,hop", GRID)
def test_peak_pick_mask_matches_oracle_on_shared_envelope(rng, sr, hop):
    """Filter shapes, edge semantics, and wait suppression in isolation:
    both peak pickers consume the SAME normalised envelope (so no
    float32-vs-float64 spectrogram noise), over random and adversarial
    piecewise-constant envelopes where ties and plateaus stress the
    local-max and wait logic."""
    envs = [rng.random(70), rng.random(70) ** 3,
            np.repeat(rng.random(14), 5),  # plateaus -> max-filter ties
            np.zeros(70)]
    spike = np.zeros(70)
    spike[[10, 11, 13, 14, 40]] = [0.5, 0.9, 0.9, 0.6, 1.0]  # close peaks
    envs.append(spike)
    for env in envs:
        env = env - env.min()
        if env.max() > 0:
            env = env / env.max()
        want = oracle_peak_pick(env, **oracle_params(sr, hop))
        got = np.nonzero(np.asarray(
            O.peak_pick_mask(env.astype(np.float64), sr=sr, hop=hop)))[0]
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("sr,hop", GRID)
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_end_to_end_onset_detect_matches_oracle(sr, hop, seed):
    """Full chain: ops/onset.onset_detect_mask vs the oracle, exact frame
    indices, tolerating disagreement only where the float32 envelope sits
    within 1e-3 of the oracle's decision threshold."""
    rng = np.random.default_rng(seed)
    y = _click_audio(rng, sr)
    want, env = oracle_onset_detect(y, sr, hop)
    got = np.nonzero(np.asarray(O.onset_detect_mask(y, sr=sr, hop=hop)))[0]
    if not np.array_equal(got, want):
        p = oracle_params(sr, hop)
        mov_avg = np.array([
            env[max(0, n - int(p["pre_avg"])):n + int(p["post_avg"])].mean()
            for n in range(len(env))])
        margin = np.abs(env - (mov_avg + p["delta"]))
        disputed = np.setxor1d(got, want)
        assert (margin[disputed] < 1e-3).all(), (
            f"sr={sr} hop={hop}: ops {got} vs oracle {want}, "
            f"margins {margin[disputed]}")
    assert len(want) >= 1  # the click train must actually produce onsets


def test_degenerate_case_reduction(rng):
    """Machine-check the documented claim: at sr=16000/hop=512 the
    resolved parameters (pre_max=0, post_max=1, wait=0) make peak_pick
    exactly 'env >= 7-tap truncated moving average + delta'."""
    p = oracle_params(16000, 512)
    assert (int(p["pre_max"]), int(p["post_max"]), int(p["wait"])) == (0, 1, 0)
    assert (int(p["pre_avg"]), int(p["post_avg"])) == (3, 4)
    for _ in range(5):
        env = rng.random(70)
        env = (env - env.min()) / env.max()
        want = oracle_peak_pick(env, **p)
        seven_tap = np.array([env[max(0, n - 3):n + 4].mean()
                              for n in range(len(env))])
        reduced = np.nonzero(env >= seven_tap + p["delta"])[0]
        np.testing.assert_array_equal(reduced, want)


def test_wait_suppression_is_live_at_other_rates():
    """At 44100/512 wait=2: a run of adjacent super-threshold peaks must
    collapse greedily (keep i, drop i+1, i+2, keep i+3)."""
    env = np.zeros(60)
    env[[20, 21, 22, 23]] = [1.0, 0.98, 0.99, 0.97]
    env[50] = 0.9
    want = oracle_peak_pick(env, **oracle_params(44100, 512))
    got = np.nonzero(np.asarray(O.peak_pick_mask(env, sr=44100, hop=512)))[0]
    np.testing.assert_array_equal(got, want)
    assert 20 in want and 21 not in want and 22 not in want
