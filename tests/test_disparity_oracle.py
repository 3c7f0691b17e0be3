"""Disparity-pipeline CPU oracle (reference_cpu_disparity): transform
cross-checks against the jit camera model and an end-to-end tracking smoke
on the shipped scenario — the independent anchor for filter/disparity.py
(VERDICT r2 missing-item 1, disparity leg)."""

import numpy as np
import jax.numpy as jnp
import pytest

from phdslam_tpu import reference_cpu_disparity as RD
from phdslam_tpu.models.camera import (
    camera_cv_predict,
    disparity_to_world,
    world_to_disparity,
)


@pytest.fixture()
def disp_cfg():
    from phdslam_tpu.config import load_config

    return load_config("cfg/disparity_synth.cfg")


def test_transforms_match_jax_model(disp_cfg):
    """world->disparity->world round trip and cross-implementation match
    (both rebuild src/phdfilter.cu:3974-4046)."""
    cfg = disp_cfg
    rng = np.random.default_rng(0)
    pose = np.array([0.3, -0.2, 0.1, 0.05, -0.04, 0.08,
                     0, 0, 0, 0, 0, 0])
    pts = np.stack([rng.uniform(-2, 2, 40), rng.uniform(-1.5, 1.5, 40),
                    rng.uniform(3, 9, 40)], axis=1)
    uvd = RD.world_to_disparity_np(pts, pose, cfg)
    u, v, d, _ = world_to_disparity(
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
        jnp.asarray(pts[:, 2]), jnp.asarray(pose), cfg)
    np.testing.assert_allclose(uvd[:, 0], np.asarray(u), rtol=1e-5)
    np.testing.assert_allclose(uvd[:, 1], np.asarray(v), rtol=1e-5)
    np.testing.assert_allclose(uvd[:, 2], np.asarray(d), rtol=1e-5)
    back = RD.disparity_to_world_np(uvd, pose, cfg)
    np.testing.assert_allclose(back, pts, rtol=1e-8, atol=1e-8)


def test_camera_predict_matches_jax_model(disp_cfg):
    """Zero-noise CV prediction must agree with camera_cv_predict."""
    cfg = disp_cfg
    pose = np.array([0.1, 0.2, -0.1, 0.02, 0.03, -0.04,
                     0.004, -0.002, 0.006, 0.0005, -0.0003, 0.0006])

    class _FixedRng:
        def standard_normal(self, *a):
            return np.zeros(6)

    got = RD.camera_predict_np(pose, cfg, 1.0, _FixedRng())
    want = np.asarray(camera_cv_predict(
        jnp.asarray(pose)[None], jnp.zeros((1, 6)), cfg,
        jnp.float32(1.0)))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_oracle_tracks_shipped_scenario(disp_cfg):
    """Short e2e run on the shipped dataset: the oracle must stay finite,
    keep its camera estimate near the truth, and accumulate map mass."""
    from phdslam_tpu.io.loaders import load_measurements

    cfg = disp_cfg.replace(n_particles=8)
    sets = load_measurements("data/disparity_synth/measurements.txt")
    truth = np.loadtxt("data/disparity_synth/traj.txt", comments="%")
    T = 25
    # (u, v) pairs ride the (ranges, bearings) container columns
    meas = [np.stack([s.ranges, s.bearings], axis=1) for s in sets[:T]]
    poses = RD.run(cfg, meas, seed=1)
    assert np.isfinite(poses).all()
    err = np.linalg.norm(poses[:, :3] - truth[:T, :3], axis=1)
    assert err.mean() < 0.5, err
