"""Batched small-matrix algebra vs NumPy oracles."""

import numpy as np
import jax.numpy as jnp

from phdslam_tpu.ops import linalg as L


def test_det2_inv2(rng):
    m = rng.normal(size=(5, 2, 2))
    m = m @ np.swapaxes(m, -1, -2) + np.eye(2)  # PD
    assert np.allclose(L.det2(jnp.asarray(m)), np.linalg.det(m), rtol=1e-5)
    assert np.allclose(L.inv2(jnp.asarray(m)), np.linalg.inv(m), rtol=1e-4)


def test_wrap_angle_reference_semantics():
    # reference rule (device_math.cuh:242-251): fmod then fold
    vals = np.array([0.0, 3.0, -3.0, 4.0, -4.0, 7.0, -7.0, 2 * np.pi,
                     -2 * np.pi, 10.5, 100.0])
    got = np.asarray(L.wrap_angle(jnp.asarray(vals)))
    expect = np.arctan2(np.sin(vals), np.cos(vals))
    assert np.allclose(got, expect, atol=1e-6)
    assert np.all(np.abs(got) <= np.pi + 1e-6)


def test_mahalanobis_vs_oracle(rng):
    a_mean = rng.normal(size=(4, 2))
    b_mean = rng.normal(size=(4, 2))
    a_cov = np.tile(np.eye(2) * 0.5, (4, 1, 1))
    b_cov = np.tile(np.eye(2) * 1.5, (4, 1, 1))
    got = np.asarray(L.mahalanobis_gaussian(
        jnp.asarray(a_mean), jnp.asarray(a_cov),
        jnp.asarray(b_mean), jnp.asarray(b_cov)))
    sigma = 0.5 * (a_cov + b_cov)
    diff = a_mean - b_mean
    expect = np.einsum("ni,nij,nj->n", diff, np.linalg.inv(sigma), diff)
    assert np.allclose(got, expect, rtol=1e-5)


def test_safe_log():
    out = np.asarray(L.safe_log(jnp.asarray([1.0, 0.0, -5.0, np.e])))
    assert out[0] == 0.0
    assert out[1] < -1e37 and out[2] < -1e37
    assert abs(out[3] - 1.0) < 1e-4  # float32


def test_gaussian_logpdf(rng):
    from scipy.stats import multivariate_normal
    mean = np.zeros(2)
    cov = np.array([[2.0, 0.3], [0.3, 0.5]])
    x = rng.normal(size=(6, 2))
    got = np.asarray(L.gaussian_logpdf(
        jnp.asarray(x), jnp.asarray(mean), jnp.asarray(cov)))
    expect = multivariate_normal(mean, cov).logpdf(x)
    assert np.allclose(got, expect, rtol=1e-3, atol=1e-3)  # float32


def test_logistic():
    assert abs(float(L.logistic(jnp.asarray(0.0), 0, 1, 10, 0)) - 0.5) < 1e-6
    assert float(L.logistic(jnp.asarray(10.0), 0, 1, 10, 0)) > 0.999
