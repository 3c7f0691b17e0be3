"""Pallas kernel parity tests (run on TPU; skipped on CPU backends where
Mosaic compilation is unavailable)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas TPU kernel needs a TPU backend")


@requires_tpu
def test_fused_sum_exp_matches_xla(tiny_cfg, rng):
    from phdslam_tpu.filter.state import Gaussian2DMixture
    from phdslam_tpu.filter.update import kalman_preupdate
    from phdslam_tpu.kernels.preupdate_pallas import (
        fused_sum_exp, sum_exp_reference)
    from phdslam_tpu.ops.linalg import safe_log

    cfg = tiny_cfg.replace(n_particles=128, maxFeatures=128,
                           maxMeasurements=8)
    P, F, M = 128, 128, 8
    w = (rng.uniform(size=(P, F)) < 0.4) * rng.uniform(0.1, 1.0, (P, F))
    mean = rng.uniform(-8, 8, (P, F, 2))
    cov = np.tile(np.eye(2, dtype=np.float32) * 0.2, (P, F, 1, 1))
    gm = Gaussian2DMixture.from_arrays(
        jnp.asarray(w, jnp.float32), jnp.asarray(mean, jnp.float32),
        jnp.asarray(cov))
    pose = jnp.zeros((P, 6))
    z_rb = jnp.asarray(rng.uniform(0.5, 9.0, (M, 2)), jnp.float32) \
        .at[:, 1].set(jnp.asarray(rng.uniform(-1.0, 1.0, M), jnp.float32))
    z_valid = jnp.ones((M,), bool)

    pre = kalman_preupdate(pose, gm, cfg)
    ref = np.asarray(sum_exp_reference(z_rb, z_valid, pre, gm, cfg))
    lpw = safe_log(pre.pd) + safe_log(gm.w)
    got = np.asarray(fused_sum_exp(
        z_rb, pre.r, pre.bearing, lpw, pre.si00, pre.si01, pre.si11,
        pre.log_det_s))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)
