"""Island-model (locality-preserving) distributed resampling tests.

Runs on the 8-virtual-device CPU mesh from conftest. Verifies the
butterfly-exchange machinery: island weights stay normalized, the exchange
equalizes them exactly, and the distributed filter tracks a synthetic
trajectory end-to-end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest



pytestmark = pytest.mark.slow  # heavy e2e/interpret tests; unit core excludes via -m 'not slow'

@pytest.fixture(scope="module")
def mesh8():
    from phdslam_tpu.parallel.island import make_island_mesh
    if len(jax.local_devices(backend="cpu")) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_island_mesh(8)


def _cfg(tiny_cfg):
    return tiny_cfg.replace(n_particles=64, maxFeatures=32,
                            maxMeasurements=8, nPredictParticles=1)


def _measure(t):
    rng = np.random.default_rng(t)
    m = np.zeros((8, 2), np.float32)
    m[:5, 0] = rng.uniform(1.0, 8.0, 5)
    m[:5, 1] = rng.uniform(-1.0, 1.0, 5)
    valid = np.arange(8) < 5
    return m, valid


def test_island_step_runs_and_normalizes(tiny_cfg, mesh8):
    from phdslam_tpu.filter.state import Measurements
    from phdslam_tpu.parallel.island import island_slam_step

    cfg = _cfg(tiny_cfg)
    step, init = island_slam_step(mesh8, cfg)
    state, ilw = init()
    key = jax.random.PRNGKey(0)
    for t in range(4):
        m, valid = _measure(t)
        z = Measurements(rb=jnp.asarray(m),
                         label=jnp.zeros((8,), jnp.int32),
                         valid=jnp.asarray(valid))
        key, sk = jax.random.split(key)
        state, ilw, aux = step(state, ilw, sk,
                               jnp.zeros((2,), jnp.float32), z,
                               jnp.float32(1.0), jnp.asarray(t > 0))
    ilw_np = np.asarray(ilw)
    assert ilw_np.shape == (8,)
    # normalized: logsumexp == 0
    np.testing.assert_allclose(np.log(np.exp(ilw_np).sum()), 0.0, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(aux.expected_pose)))
    assert 0.0 < float(aux.island_neff) <= 1.0 + 1e-6
    assert np.all(np.isfinite(np.asarray(state.pose)))


def test_butterfly_equalizes_island_weights(tiny_cfg, mesh8):
    """With the exchange forced every step, island weights must come out
    exactly uniform (the butterfly pair-averages to the global mean)."""
    from phdslam_tpu.filter.state import Measurements
    from phdslam_tpu.parallel.island import island_slam_step

    cfg = _cfg(tiny_cfg)
    step, init = island_slam_step(mesh8, cfg, island_resample_thresh=1.1)
    state, ilw = init()
    m, valid = _measure(0)
    z = Measurements(rb=jnp.asarray(m), label=jnp.zeros((8,), jnp.int32),
                     valid=jnp.asarray(valid))
    for t in range(2):
        state, ilw, aux = step(state, ilw, jax.random.PRNGKey(t),
                               jnp.zeros((2,), jnp.float32), z,
                               jnp.float32(1.0), jnp.asarray(t > 0))
    assert bool(aux.exchanged)
    np.testing.assert_allclose(np.asarray(ilw), -np.log(8.0), atol=1e-5)


def test_island_filter_tracks(tiny_cfg, mesh8):
    """End-to-end: the island filter on a tiny synthetic CV run stays near
    the true (stationary) pose, like the single-device filter."""
    from phdslam_tpu.filter.state import Measurements
    from phdslam_tpu.parallel.island import island_slam_step

    # CV motion with near-zero process noise: the true vehicle is pinned at
    # the origin, so this isolates the distributed update/resample machinery
    # from prediction diffusion (only 8 particles per island here)
    cfg = _cfg(tiny_cfg).replace(motionType=0, ax=0.0005, ay=0.0005,
                                 ayaw=0.0002)
    # stationary vehicle at the origin, 6 fixed landmarks
    lm = np.array([[4.0, 1.0], [3.0, -2.0], [6.0, 2.5], [2.0, 3.0],
                   [5.0, -3.0], [7.0, 0.5]], np.float32)
    rng = np.random.default_rng(0)

    step, init = island_slam_step(mesh8, cfg)
    state, ilw = init()
    key = jax.random.PRNGKey(1)
    for t in range(12):
        r = np.linalg.norm(lm, axis=1) + rng.normal(0, cfg.stdRange, 6)
        b = np.arctan2(lm[:, 1], lm[:, 0]) \
            + rng.normal(0, cfg.stdBearing, 6)
        m = np.zeros((8, 2), np.float32)
        m[:6, 0], m[:6, 1] = r, b
        z = Measurements(rb=jnp.asarray(m),
                         label=jnp.zeros((8,), jnp.int32),
                         valid=jnp.asarray(np.arange(8) < 6))
        key, sk = jax.random.split(key)
        state, ilw, aux = step(state, ilw, sk,
                               jnp.zeros((2,), jnp.float32), z,
                               jnp.float32(1.0), jnp.asarray(t > 0))
    pose = np.asarray(aux.expected_pose)
    assert np.linalg.norm(pose[:2]) < 1.5, pose


def test_island_scan_matches_loop(tiny_cfg, mesh8):
    """The scan runner must produce the same trajectory as stepping the
    island filter in a Python loop with the same keys."""
    from phdslam_tpu.filter.state import Measurements
    from phdslam_tpu.parallel.island import island_run_scan, island_slam_step

    cfg = _cfg(tiny_cfg)
    T = 5
    ms, vs = zip(*[_measure(t) for t in range(T)])
    zs = Measurements(rb=jnp.asarray(np.stack(ms)),
                      label=jnp.zeros((T, 8), jnp.int32),
                      valid=jnp.asarray(np.stack(vs)))
    controls = jnp.zeros((T, 2), jnp.float32)
    dts = jnp.ones((T,), jnp.float32)
    key = jax.random.PRNGKey(7)

    run, init = island_run_scan(mesh8, cfg)
    state, ilw = init()
    stf, ilwf, auxs = run(state, ilw, key, controls, zs, dts)
    assert np.asarray(auxs.expected_pose).shape == (T, 6)
    assert np.all(np.isfinite(np.asarray(auxs.expected_pose)))

    step, init2 = island_slam_step(mesh8, cfg)
    st, lw = init2()
    keys = jax.random.split(key, T)
    for t in range(T):
        st, lw, aux = step(st, lw, keys[t],
                           controls[t], jax.tree.map(lambda x: x[t], zs),
                           dts[t], jnp.asarray(t > 0))
    np.testing.assert_allclose(np.asarray(aux.expected_pose),
                               np.asarray(auxs.expected_pose[-1]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lw), np.asarray(ilwf),
                               rtol=1e-4, atol=1e-5)
