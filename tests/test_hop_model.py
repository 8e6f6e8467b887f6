"""HOP model: shapes, beat-window scramble semantics, gwnet time geometry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hop_tpu.config import tiny_test_config
from hop_tpu.models.gwnet import GraphWaveNet
from hop_tpu.models.hop import HOPModel


def _make_inputs(rng, cfg, B=2):
    d = cfg.data
    return dict(
        in_audio=jnp.asarray(rng.normal(size=(B, d.expected_audio_length))
                             .astype(np.float32)),
        x_enc=jnp.asarray(rng.normal(size=(B, d.n_poses, d.mel_bins))
                          .astype(np.float32)),
        text=jnp.asarray(rng.integers(0, cfg.llm.vocab_size,
                                      size=(B, d.n_poses))),
        pre_seq=jnp.asarray(rng.normal(size=(B, 16, d.pose_dim))
                            .astype(np.float32)),
        vid_indices=jnp.asarray(rng.integers(0, 7, size=(B,))),
    )


@pytest.mark.parametrize("dataset", ["TED", "TED_expressive"])
@pytest.mark.slow
def test_hop_forward_shapes(rng, dataset):
    cfg = tiny_test_config(dataset)
    model = HOPModel(cfg, n_speakers=7)
    inputs = _make_inputs(rng, cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           **inputs, rng=jax.random.PRNGKey(1))
    out, z, mu, logvar = model.apply(
        variables, **inputs, rng=jax.random.PRNGKey(2))
    assert out.shape == (2, cfg.data.n_poses, cfg.data.pose_dim)
    assert z.shape == (2, cfg.hop.z_size)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_gwnet_time_shrink(rng):
    m = GraphWaveNet(num_nodes=9, in_dim=173, out_dim=173,
                     residual_channels=8, dilation_channels=8,
                     skip_channels=16, end_channels=16)
    x = jnp.asarray(rng.normal(size=(1, 16, 9, 173)).astype(np.float32))
    var = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(var, x)
    # dilations 1,2 repeated 4x shrink T: 16 -> 4 (receptive field 13)
    assert y.shape == (1, 4, 9, 173)


@pytest.mark.slow
def test_beat_gather_matches_torch_view(rng):
    """The (t*N+n) % 16 gather must equal torch's repeat+view scramble."""
    cfg = tiny_test_config("TED")
    model = HOPModel(cfg, n_speakers=3)
    inputs = _make_inputs(rng, cfg, B=1)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           **inputs, rng=jax.random.PRNGKey(1))

    audio = np.asarray(inputs["in_audio"])
    feats = model.apply(variables, audio, 9, 34,
                        method=lambda m, a, nj, np_: m._beat_features(a, nj, np_))
    feats = np.asarray(feats)  # (1, 16, 9, 170)

    # torch semantics replicated in numpy: unfold -> repeat over joints ->
    # view(B, 16, N, F) raw reinterpretation
    win, stride, N = cfg.hop.beat_window, cfg.hop.beat_stride, 9
    n_win = (audio.shape[1] - win) // stride + 1
    assert n_win == 16
    windows = np.stack([audio[0, i * stride: i * stride + win]
                        for i in range(n_win)])  # (16, 3400)
    p = variables["params"]
    h = np.maximum(windows @ np.asarray(p["beat_fc1"]["kernel"])
                   + np.asarray(p["beat_fc1"]["bias"]), 0) + \
        0.2 * np.minimum(windows @ np.asarray(p["beat_fc1"]["kernel"])
                         + np.asarray(p["beat_fc1"]["bias"]), 0)
    per_window = h @ np.asarray(p["beat_fc2"]["kernel"]) + \
        np.asarray(p["beat_fc2"]["bias"])  # (16, F)
    repeated = np.broadcast_to(per_window[None], (N, n_win, per_window.shape[1]))
    scrambled = repeated.reshape(n_win, N, per_window.shape[1])  # raw view
    np.testing.assert_allclose(feats[0], scrambled, rtol=1e-4, atol=1e-4)
