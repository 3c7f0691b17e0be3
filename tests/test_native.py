"""Native C++ runtime components vs Python oracles."""

import numpy as np
import pytest

from phdslam_tpu import native


def test_native_builds():
    assert native.available(), "native lib failed to build/load"


def test_hungarian_vs_scipy(rng):
    from scipy.optimize import linear_sum_assignment
    for _ in range(10):
        m = rng.integers(1, 8)
        n = rng.integers(m, 10)
        cost = rng.uniform(0, 10, (m, n))
        assign, total = native.hungarian(cost)
        r, c = linear_sum_assignment(cost)
        assert abs(total - cost[r, c].sum()) < 1e-9
        # valid one-to-one assignment
        assert len(set(assign.tolist())) == m


def test_gm_reduce_matches_numpy_oracle(rng):
    from phdslam_tpu.ops.gm import reduce_mixture_np
    n = 15
    w = rng.uniform(0.05, 1.0, n)
    mean = rng.normal(0, 6, (n, 2))
    cov = np.tile(np.eye(2) * 0.4, (n, 1, 1))
    nw, nm, nc = native.gm_reduce(w, mean, cov, 5.0)
    pw, pm, pc = reduce_mixture_np(w, mean, cov, 5.0)
    assert len(nw) == len(pw)
    np.testing.assert_allclose(np.sort(nw), np.sort(pw), rtol=1e-9)
    assert abs(nw.sum() - w.sum()) < 1e-9
    order_n = np.argsort(-nw)
    order_p = np.argsort(-pw)
    np.testing.assert_allclose(nm[order_n], pm[order_p], atol=1e-9)
    np.testing.assert_allclose(nc[order_n], pc[order_p], atol=1e-9)


def test_gm_reduce_4d(rng):
    n = 10
    w = rng.uniform(0.1, 1.0, n)
    mean = rng.normal(0, 8, (n, 4))
    a = rng.normal(size=(n, 4, 4)) * 0.2
    cov = a @ a.transpose(0, 2, 1) + np.eye(4)
    nw, nm, nc = native.gm_reduce(w, mean, cov, 4.0)
    assert abs(nw.sum() - w.sum()) < 1e-9
    assert nm.shape[1] == 4
