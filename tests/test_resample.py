"""Resampling statistics and nEff semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from phdslam_tpu.ops.resample import neff, stratified_resample_indices


def test_uniform_weights_identity_like():
    n = 64
    lw = jnp.full((n,), -np.log(n))
    idx = np.asarray(stratified_resample_indices(jax.random.PRNGKey(0),
                                                 lw, n))
    # stratified with uniform weights: each particle sampled ~once
    counts = np.bincount(idx, minlength=n)
    assert counts.max() <= 2
    assert (counts >= 0).all()
    assert len(np.unique(idx)) >= n - 1


def test_concentrated_weights():
    n = 32
    w = np.full(n, 1e-8)
    w[5] = 1.0
    w /= w.sum()
    lw = jnp.asarray(np.log(w))
    idx = np.asarray(stratified_resample_indices(jax.random.PRNGKey(1),
                                                 lw, n))
    assert (idx == 5).mean() > 0.9


def test_proportionality(rng):
    n = 8
    w = rng.uniform(0.1, 1.0, n)
    w /= w.sum()
    lw = jnp.asarray(np.log(w).astype(np.float32))
    counts = np.zeros(n)
    for s in range(40):
        idx = np.asarray(stratified_resample_indices(
            jax.random.PRNGKey(s), lw, n))
        counts += np.bincount(idx, minlength=n)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, w, atol=0.03)


def test_overrun_backfills_max_weight():
    # weights that sum to < 1 numerically: searchsorted past the end must
    # return the max-weight particle (src/main.cpp:470-494 semantics)
    lw = jnp.asarray(np.log(np.array([0.2, 0.3, 0.1], np.float32)))  # sum .6
    idx = np.asarray(stratified_resample_indices(jax.random.PRNGKey(2),
                                                 lw, 10))
    assert (idx >= 0).all() and (idx < 3).all()
    assert (idx[-3:] == 1).all()  # positions past 0.6 -> argmax weight (1)


def test_neff():
    n = 16
    lw = jnp.full((n,), -np.log(n))
    assert abs(float(neff(lw)) - 1.0) < 1e-5
    w = np.full(n, 1e-12)
    w[0] = 1.0
    lw2 = jnp.asarray(np.log(w / w.sum()))
    assert float(neff(lw2)) - 1.0 / n < 1e-5
