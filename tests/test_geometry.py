"""Geometry: FK round-trips and parity with a direct per-bone reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from hop_tpu import geometry as G


def _naive_dir_vec_to_pose(vec, skeleton):
    """Per-bone loop, directly transcribing the FK definition."""
    vec = np.asarray(vec).reshape(vec.shape[:-1] + (-1, 3)) \
        if vec.shape[-1] != 3 else np.asarray(vec)
    out = np.zeros(vec.shape[:-2] + (skeleton.n_joints, 3))
    for b, (p, c, l) in enumerate(skeleton.pairs):
        out[..., c, :] = out[..., p, :] + l * vec[..., b, :]
    return out


@pytest.mark.parametrize("skel", [G.TED_SKELETON, G.EXPRESSIVE_SKELETON])
def test_skeleton_shapes(skel):
    assert skel.fk_matrix.shape == (skel.n_bones, skel.n_joints)
    assert skel.pose_dim == skel.n_bones * 3
    # root column of the path matrix is all-zero (root pinned at origin)
    assert np.all(skel.fk_matrix[:, 0] == 0)


@pytest.mark.parametrize("skel", [G.TED_SKELETON, G.EXPRESSIVE_SKELETON])
@pytest.mark.parametrize("batch_shape", [(), (5,), (2, 7)])
def test_fk_matches_naive(rng, skel, batch_shape):
    vec = rng.normal(size=batch_shape + (skel.n_bones, 3)).astype(np.float32)
    got = np.asarray(G.convert_dir_vec_to_pose(vec, skel))
    want = _naive_dir_vec_to_pose(vec, skel)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("skel", [G.TED_SKELETON, G.EXPRESSIVE_SKELETON])
def test_fk_accepts_flat_input(rng, skel):
    vec = rng.normal(size=(3, 4, skel.pose_dim)).astype(np.float32)
    got = np.asarray(G.convert_dir_vec_to_pose(vec, skel))
    want = _naive_dir_vec_to_pose(vec.reshape(3, 4, skel.n_bones, 3), skel)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("skel", [G.TED_SKELETON, G.EXPRESSIVE_SKELETON])
def test_pose_to_dirvec_roundtrip(rng, skel):
    vec = rng.normal(size=(6, skel.n_bones, 3))
    vec /= np.linalg.norm(vec, axis=-1, keepdims=True)
    pose = G.convert_dir_vec_to_pose(vec.astype(np.float32), skel)
    back = np.asarray(G.convert_pose_seq_to_dir_vec(pose, skel))
    np.testing.assert_allclose(back, vec, atol=1e-4)


def test_pose_to_dirvec_zero_bone_is_zero():
    pose = np.zeros((2, G.TED_SKELETON.n_joints, 3), np.float32)
    vec = np.asarray(G.convert_pose_seq_to_dir_vec(pose, G.TED_SKELETON))
    assert np.all(vec == 0)


def test_mean_dir_vec_constants():
    assert G.TED_MEAN_DIR_VEC.shape == (27,)
    assert G.EXPRESSIVE_MEAN_DIR_VEC.shape == (126,)
    assert len(G.TED_ANGLE_PAIRS) == len(G.TED_CHANGE_ANGLE) == 4
    assert len(G.EXPRESSIVE_ANGLE_PAIRS) == len(G.EXPRESSIVE_CHANGE_ANGLE) == 41


def test_resample_pose_seq_matches_scipy(rng):
    from scipy.interpolate import interp1d
    poses = rng.normal(size=(50, 9, 3))
    duration, fps = 3.3, 15
    n = len(poses)
    f = interp1d(np.arange(n), poses, axis=0, kind="linear",
                 fill_value="extrapolate")
    x_new = np.arange(0, n, n / (duration * fps))
    want = f(x_new)
    got = G.resample_pose_seq(poses, duration, fps)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_make_audio_fixed_length():
    a = np.arange(10, dtype=np.float32)
    out = G.make_audio_fixed_length(a, 14)
    assert out.shape == (14,)
    np.testing.assert_array_equal(out[:10], a)
    out2 = G.make_audio_fixed_length(a, 6)
    np.testing.assert_array_equal(out2, a[:6])


def test_spectrogram_length():
    assert G.calc_spectrogram_length_from_motion_length(34, 15) == 70
