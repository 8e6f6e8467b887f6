"""Shape/behaviour tests for shared blocks, TCN, trimodal GAN, seq2seq."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hop_tpu.models.common import WavEncoder, huber, kld_loss
from hop_tpu.models.tcn import WeightNormConv1d, TemporalConvNet, TextEncoderTCN
from hop_tpu.models.multimodal_context import (PoseGenerator, Discriminator,
                                               ConvDiscriminator)
from hop_tpu.models.seq2seq import Seq2SeqNet


def test_wav_encoder_shape(rng):
    x = rng.normal(size=(2, 36267)).astype(np.float32)
    m = WavEncoder()
    var = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(var, jnp.asarray(x))
    assert y.shape == (2, 34, 32)


def test_weight_norm_conv_matches_torch(rng):
    torch.manual_seed(0)
    in_ch, out_ch, k, d, T = 5, 7, 2, 2, 12
    tconv = torch.nn.utils.weight_norm(
        torch.nn.Conv1d(in_ch, out_ch, k, padding=(k - 1) * d, dilation=d))
    x = rng.normal(size=(3, T, in_ch)).astype(np.float32)
    with torch.no_grad():
        # torch pads both sides; the causal output is the left-aligned slice
        ty = tconv(torch.from_numpy(x).transpose(1, 2))
        ty = ty[:, :, :T].transpose(1, 2).numpy()

    m = WeightNormConv1d(out_ch, k, dilation=d, causal_left_pad=(k - 1) * d)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    # torch weight_v (out, in, k) -> flax v (k, in, out)
    params = {
        "v": jnp.asarray(tconv.weight_v.detach().numpy().transpose(2, 1, 0)),
        "g": jnp.asarray(tconv.weight_g.detach().numpy().ravel()),
        "b": jnp.asarray(tconv.bias.detach().numpy()),
    }
    jy = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-4, atol=1e-5)


def test_tcn_causal(rng):
    x = rng.normal(size=(1, 16, 8)).astype(np.float32)
    m = TemporalConvNet(num_channels=(16, 16), dropout=0.0)
    var = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y0 = m.apply(var, jnp.asarray(x))
    x2 = x.copy()
    x2[:, 10:] += 100.0  # perturb the future
    y1 = m.apply(var, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y0)[:, :10], np.asarray(y1)[:, :10],
                               atol=1e-5)
    assert y0.shape == (1, 16, 16)


def test_text_encoder_shape(rng):
    tokens = rng.integers(0, 50, size=(2, 34))
    m = TextEncoderTCN(n_words=50, embed_size=16, num_channels=(16, 16))
    var = m.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
    y = m.apply(var, jnp.asarray(tokens))
    assert y.shape == (2, 34, 32)


@pytest.mark.slow
def test_pose_generator_shapes(rng):
    B, T, D = 2, 34, 27
    pre_seq = rng.normal(size=(B, T, D + 1)).astype(np.float32)
    text = rng.integers(0, 40, size=(B, T))
    audio = rng.normal(size=(B, 36267)).astype(np.float32)
    vids = rng.integers(0, 5, size=(B,))
    m = PoseGenerator(pose_dim=D, n_words=40, n_speakers=5,
                      hidden_size=32, n_layers=2)
    var = m.init({"params": jax.random.PRNGKey(0)},
                 jnp.asarray(pre_seq), jnp.asarray(text), jnp.asarray(audio),
                 jnp.asarray(vids), rng=jax.random.PRNGKey(1))
    out, z, mu, logvar = m.apply(var, jnp.asarray(pre_seq), jnp.asarray(text),
                                 jnp.asarray(audio), jnp.asarray(vids),
                                 rng=jax.random.PRNGKey(2))
    assert out.shape == (B, T, D)
    assert z.shape == (B, 16) and mu.shape == (B, 16)
    assert float(kld_loss(mu, logvar)) == pytest.approx(
        float(-0.5 * jnp.mean(1 + logvar - mu ** 2 - jnp.exp(logvar))))


def test_conv_discriminator(rng):
    poses = rng.normal(size=(3, 34, 27)).astype(np.float32)
    m = ConvDiscriminator()
    var = m.init(jax.random.PRNGKey(0), jnp.asarray(poses))
    y = m.apply(var, jnp.asarray(poses))
    assert y.shape == (3, 1)
    assert np.all((np.asarray(y) > 0) & (np.asarray(y) < 1))


@pytest.mark.slow
def test_text_discriminator(rng):
    poses = rng.normal(size=(2, 34, 27)).astype(np.float32)
    m = Discriminator(input_size=27, hidden_size=24, n_layers=2)
    var = m.init(jax.random.PRNGKey(0), jnp.asarray(poses))
    y = m.apply(var, jnp.asarray(poses))
    assert y.shape == (2, 1)


@pytest.mark.slow
def test_seq2seq_shapes_and_teacher_forcing(rng):
    B, T, D = 2, 34, 27
    text = rng.integers(1, 30, size=(B, 12))
    mask = np.ones((B, 12), np.float32)
    mask[1, 8:] = 0
    poses = rng.normal(size=(B, T, D)).astype(np.float32)
    m = Seq2SeqNet(pose_dim=D, n_frames=T, n_pre_poses=4, n_words=30,
                   embed_size=16, hidden_size=24, n_layers=2)
    var = m.init(jax.random.PRNGKey(0), jnp.asarray(text), jnp.asarray(mask),
                 jnp.asarray(poses))
    out = m.apply(var, jnp.asarray(text), jnp.asarray(mask), jnp.asarray(poses))
    assert out.shape == (B, T, D)
    # frame 0 is copied from the seed pose
    np.testing.assert_allclose(np.asarray(out)[:, 0], poses[:, 0], atol=1e-6)


def test_huber_matches_torch(rng):
    a = rng.normal(size=(4, 6)).astype(np.float32)
    b = rng.normal(size=(4, 6)).astype(np.float32)
    want = torch.nn.functional.smooth_l1_loss(
        torch.from_numpy(a) / 0.1, torch.from_numpy(b) / 0.1).item() * 0.1
    got = float(huber(jnp.asarray(a), jnp.asarray(b), beta=0.1))
    assert got == pytest.approx(want, rel=1e-5)
