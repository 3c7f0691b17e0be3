"""End-to-end filtering on a self-generated scenario at the tiny config:
the jit step must track the vehicle and map landmarks, no NaNs, and the
scan runner must agree with the python-loop runner statistically."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phdslam_tpu.filter.state import Measurements, SlamState
from phdslam_tpu.filter.step import slam_step
from phdslam_tpu.filter import estimate
from phdslam_tpu.io.loaders import MeasurementSet, pad_measurement_sets
from phdslam_tpu.simdata import make_scenario, generate_run



pytestmark = pytest.mark.slow  # heavy e2e/interpret tests; unit core excludes via -m 'not slow'

@pytest.fixture(scope="module")
def scenario():
    rng = np.random.default_rng(11)
    sc = make_scenario(rng, n_landmarks=12, n_steps=40, clutter_rate=2.0)
    controls, meas = generate_run(np.random.default_rng(12), sc,
                                  control_noise=(0.05, 0.005))
    return sc, controls, meas


def test_tracking_and_mapping(tiny_cfg, scenario):
    sc, controls, meas = scenario
    # higher birth weight so landmarks establish within the short run
    cfg = tiny_cfg.replace(stdEncoder=0.05, stdAlpha=0.005, birthWeight=0.02)
    T = 40
    sets = [MeasurementSet(z[:, 0], z[:, 1],
                           np.zeros(len(z), np.int32)) for z in meas[:T]]
    rb, labels, valid = pad_measurement_sets(sets, cfg.maxMeasurements)
    state = SlamState.create(cfg)
    key = jax.random.PRNGKey(3)
    errs = []
    for t in range(T):
        z = Measurements(rb=jnp.asarray(rb[t]), label=jnp.asarray(labels[t]),
                         valid=jnp.asarray(valid[t]))
        u = (jnp.float32(controls[t - 1, 0] if t > 0 else 0),
             jnp.float32(controls[t - 1, 1] if t > 0 else 0))
        key, sk = jax.random.split(key)
        state, aux = slam_step(state, sk, u, z, jnp.float32(cfg.dt),
                               jnp.asarray(t > 0), cfg)
        errs.append(np.linalg.norm(
            np.asarray(aux.expected_pose[:2]) - sc.traj[t, :2]))
    errs = np.asarray(errs)
    assert np.isfinite(errs).all()
    assert errs.mean() < 2.0, errs
    # map sanity: the MAP particle's mixture has mass and finite moments
    gm = estimate.map_map_static(state)
    w = np.asarray(gm.w)
    assert np.isfinite(w).all() and np.isfinite(np.asarray(gm.mean)).all()
    assert w.sum() > 0.5


def test_no_measurement_steps(tiny_cfg, scenario):
    """Odometry-only steps must not change map mass or weights."""
    sc, controls, meas = scenario
    cfg = tiny_cfg
    state = SlamState.create(cfg)
    key = jax.random.PRNGKey(4)
    m = cfg.maxMeasurements
    empty = Measurements(rb=jnp.zeros((m, 2)),
                         label=jnp.zeros((m,), jnp.int32),
                         valid=jnp.zeros((m,), bool))
    # first put something in the map
    z0 = Measurements(rb=jnp.zeros((m, 2)).at[0].set(jnp.asarray([3.0, 0.1])),
                      label=jnp.zeros((m,), jnp.int32),
                      valid=jnp.zeros((m,), bool).at[0].set(True))
    state, _ = slam_step(state, key, (jnp.float32(0), jnp.float32(0)), z0,
                         jnp.float32(1.0), jnp.asarray(False), cfg)
    mass0 = float(jnp.sum(state.map_static.w))
    lw0 = np.asarray(state.log_weights)
    state2, aux = slam_step(state, key, (jnp.float32(1), jnp.float32(0)),
                            empty, jnp.float32(1.0), jnp.asarray(True), cfg)
    assert abs(float(jnp.sum(state2.map_static.w)) - mass0) < 1e-6
    np.testing.assert_allclose(np.asarray(state2.log_weights), lw0)
    assert not bool(aux.resampled)


def test_expected_pose_weighted_mean(tiny_cfg):
    state = SlamState.create(tiny_cfg)
    # two groups of particles at different poses with known weights
    n = tiny_cfg.n_particles
    pose = np.zeros((n, 6), np.float32)
    pose[: n // 2, 0] = 2.0
    pose[n // 2:, 0] = 4.0
    lw = np.full(n, -np.log(n), np.float32)
    state = state.replace(pose=jnp.asarray(pose),
                          log_weights=jnp.asarray(lw))
    ep = np.asarray(estimate.expected_pose(state))
    assert abs(ep[0] - 3.0) < 1e-5
