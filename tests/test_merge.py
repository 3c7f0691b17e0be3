"""Greedy merge vs the CPU oracle and analytic moment-matching cases."""

import numpy as np
import jax.numpy as jnp

from phdslam_tpu.config import SlamConfig
from phdslam_tpu.ops.gm import (
    greedy_merge, prune_weights, reduce_mixture_np, top_k_components)
from phdslam_tpu import reference_cpu as R


def test_moment_match_two_components():
    # two equal gaussians 1 apart, minSeparation large -> one merged
    w = jnp.asarray([0.5, 0.5, 0.0, 0.0])
    mean = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0, 0], [0, 0]])
    cov = jnp.tile(jnp.eye(2) * 0.1, (4, 1, 1))
    ow, om, oc = greedy_merge(w, mean, cov, 100.0, 4)
    assert abs(float(ow[0]) - 1.0) < 1e-6
    np.testing.assert_allclose(np.asarray(om[0]), [0.5, 0.0], atol=1e-6)
    # merged cov = avg cov + spread: 0.1 + 0.25 in x
    np.testing.assert_allclose(np.asarray(oc[0]),
                               [[0.35, 0.0], [0.0, 0.1]], atol=1e-6)
    assert float(ow[1]) == 0.0


def test_separated_components_stay():
    w = jnp.asarray([0.5, 0.4])
    mean = jnp.asarray([[0.0, 0.0], [10.0, 0.0]])
    cov = jnp.tile(jnp.eye(2) * 0.1, (2, 1, 1))
    ow, om, oc = greedy_merge(w, mean, cov, 5.0, 2)
    assert abs(float(ow[0]) - 0.5) < 1e-6
    assert abs(float(ow[1]) - 0.4) < 1e-6


def test_merge_matches_cpu_oracle(rng):
    cfg = SlamConfig(minSeparation=5.0, distanceMetric=0)
    n = 12
    w = rng.uniform(0.1, 1.0, n).astype(np.float32)
    mean = rng.normal(0, 4, (n, 2)).astype(np.float32)
    cov = np.tile(np.eye(2, dtype=np.float32) * 0.3, (n, 1, 1))
    ow, om, oc = greedy_merge(jnp.asarray(w), jnp.asarray(mean),
                              jnp.asarray(cov), 5.0, n)
    cw, cm, cc = R._greedy_merge(w.astype(np.float64),
                                 mean.astype(np.float64),
                                 cov.astype(np.float64), cfg)
    ow = np.asarray(ow)
    valid = ow > 0
    assert valid.sum() == len(cw)
    np.testing.assert_allclose(np.sort(ow[valid]), np.sort(cw), rtol=1e-4)
    # total mass preserved
    assert abs(ow.sum() - w.sum()) < 1e-4


def test_greedy_merge_max_out_cap():
    # 6 well-separated components, cap at 3 -> keep 3 highest-weight picks
    w = jnp.asarray([0.6, 0.5, 0.4, 0.3, 0.2, 0.1])
    mean = jnp.asarray([[i * 50.0, 0.0] for i in range(6)])
    cov = jnp.tile(jnp.eye(2), (6, 1, 1))
    ow, om, oc = greedy_merge(w, mean, cov, 5.0, 3)
    np.testing.assert_allclose(np.asarray(ow), [0.6, 0.5, 0.4], atol=1e-7)


def test_prune_and_topk():
    w = jnp.asarray([[0.5, 1e-7, 0.2, 0.0]])
    pruned = prune_weights(w, 1e-5)
    assert float(pruned[0, 1]) == 0.0
    mean = jnp.arange(8, dtype=jnp.float32).reshape(1, 4, 2)
    cov = jnp.tile(jnp.eye(2), (1, 4, 1, 1))
    tw, tm, tc = top_k_components(pruned, mean, cov, 2)
    np.testing.assert_allclose(np.asarray(tw[0]), [0.5, 0.2])
    np.testing.assert_allclose(np.asarray(tm[0, 0]), [0.0, 1.0])


def test_reduce_mixture_np_weight_conservation(rng):
    n = 20
    w = rng.uniform(0.01, 1.0, n)
    mean = rng.normal(0, 10, (n, 2))
    cov = np.tile(np.eye(2) * 0.5, (n, 1, 1))
    ow, om, oc = reduce_mixture_np(w, mean, cov, 5.0)
    assert abs(ow.sum() - w.sum()) < 1e-9
    assert len(ow) <= n
