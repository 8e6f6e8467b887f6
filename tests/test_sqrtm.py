"""FGD linear algebra vs scipy."""

import numpy as np
from scipy import linalg

from hop_tpu.ops.sqrtm import sqrtm_psd, trace_sqrtm_product, frechet_distance


def _rand_cov(rng, n):
    a = rng.normal(size=(n, n))
    return a @ a.T / n + 0.1 * np.eye(n)


def test_sqrtm_psd(rng):
    c = _rand_cov(rng, 32)
    s = np.asarray(sqrtm_psd(c))
    np.testing.assert_allclose(s @ s, c, atol=1e-5)


def test_trace_sqrtm_product_matches_scipy(rng):
    c1, c2 = _rand_cov(rng, 32), _rand_cov(rng, 32)
    want = np.trace(linalg.sqrtm(c1 @ c2).real)
    got = float(trace_sqrtm_product(c1, c2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_frechet_distance_matches_reference_formula(rng):
    n = 16
    mu1, mu2 = rng.normal(size=n), rng.normal(size=n)
    c1, c2 = _rand_cov(rng, n), _rand_cov(rng, n)
    covmean = linalg.sqrtm(c1 @ c2).real
    want = (np.sum((mu1 - mu2) ** 2) + np.trace(c1) + np.trace(c2)
            - 2 * np.trace(covmean))
    got = float(frechet_distance(mu1, c1, mu2, c2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_frechet_distance_identical_is_zero(rng):
    mu = rng.normal(size=8)
    c = _rand_cov(rng, 8)
    assert abs(float(frechet_distance(mu, c, mu, c))) < 1e-4
