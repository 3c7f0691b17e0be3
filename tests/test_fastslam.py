"""FastSLAM (filter_type = 2) + JCBB: the working realization of the
reference's vestigial src/fastslam.cu / src/munkres.cu subsystem.

Covers: the rectangular auction against scipy's exact assignment, EKF
update parity against a hand-rolled numpy oracle, the landmark evidence
counter lifecycle, births from unmatched measurements, particle weighting,
JCBB beating individual nearest-neighbour association under pose
uncertainty, and (slow) end-to-end tracking on a synthetic scenario."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phdslam_tpu.config import FASTSLAM_TYPE
from phdslam_tpu.filter.fastslam import _NEG, _auction_rows, fastslam_update
from phdslam_tpu.filter.state import Gaussian2DMixture, Measurements, \
    SlamState
from phdslam_tpu.filter.step import slam_step
from phdslam_tpu.ops import jcbb as J


def _fs_cfg(tiny_cfg, **kw):
    return tiny_cfg.replace(filterType=FASTSLAM_TYPE, **kw)


# ---------------------------------------------------------------------------
# auction assignment
# ---------------------------------------------------------------------------

def test_auction_matches_scipy_optimum(rng):
    from scipy.optimize import linear_sum_assignment
    m, f = 12, 30
    for trial in range(5):
        ben = rng.normal(size=(m, f)) * 3.0
        # gate out a random ~60% of pairs like the chi2 gate would
        ben = np.where(rng.random((m, f)) < 0.6, _NEG, ben)
        dummy = np.full((m, m), _NEG)
        np.fill_diagonal(dummy, rng.normal(size=m) - 2.0)
        full = np.concatenate([ben, dummy], axis=1)
        col = np.asarray(_auction_rows(jnp.asarray(full, jnp.float32)))
        got = full[np.arange(m), col].sum()
        rows, cols = linear_sum_assignment(-full)
        opt = full[rows, cols].sum()
        assert got <= opt + 1e-6
        span = np.ptp(full[full > _NEG / 2])
        assert opt - got <= 2e-3 * span * m + 1e-6, (trial, opt, got)
        # feasibility: every row assigned a distinct column
        assert len(set(col.tolist())) == m


def test_auction_all_invalid_rows_take_private_columns():
    m, f = 4, 6
    full = np.full((m, f + m), _NEG, np.float32)
    # only private no-match columns are live
    for i in range(m):
        full[i, f + i] = -3.0
    col = np.asarray(_auction_rows(jnp.asarray(full)))
    np.testing.assert_array_equal(col, f + np.arange(m))


# ---------------------------------------------------------------------------
# EKF update parity vs numpy oracle
# ---------------------------------------------------------------------------

def _numpy_ekf(pose, mean, cov, z, cfg):
    dx, dy = mean[0] - pose[0], mean[1] - pose[1]
    r2 = dx * dx + dy * dy
    r = np.sqrt(r2)
    zhat = np.array([r, np.arctan2(dy, dx) - pose[2]])
    jac = np.array([[dx / r, dy / r], [-dy / r2, dx / r2]])
    rm = np.diag([cfg.stdRange ** 2, cfg.stdBearing ** 2])
    s = jac @ cov @ jac.T + rm
    k = cov @ jac.T @ np.linalg.inv(s)
    innov = z - zhat
    innov[1] = (innov[1] + np.pi) % (2 * np.pi) - np.pi
    mean_new = mean + k @ innov
    ikj = np.eye(2) - k @ jac
    cov_new = ikj @ cov @ ikj.T + k @ rm @ k.T
    return mean_new, cov_new, innov, s


def test_ekf_update_matches_numpy(tiny_cfg):
    cfg = _fs_cfg(tiny_cfg)
    F, M = cfg.maxFeatures, cfg.maxMeasurements
    pose = np.zeros((1, 6), np.float32)
    mean = np.array([6.0, 1.5])
    cov = np.array([[0.4, 0.1], [0.1, 0.3]])
    gm = Gaussian2DMixture.empty((1,), F)
    gm = gm.replace(w=gm.w.at[0, 0].set(3.0),
                    mx=gm.mx.at[0, 0].set(mean[0]),
                    my=gm.my.at[0, 0].set(mean[1]),
                    c00=gm.c00.at[0, 0].set(cov[0, 0]),
                    c01=gm.c01.at[0, 0].set(cov[0, 1]),
                    c11=gm.c11.at[0, 0].set(cov[1, 1]))
    z = np.array([6.3, np.arctan2(1.5, 6.0) + 0.02], np.float32)
    z_rb = np.zeros((M, 2), np.float32)
    z_rb[0] = z
    z_valid = np.zeros((M,), bool)
    z_valid[0] = True
    gm_out, dw = fastslam_update(jnp.asarray(pose), gm, jnp.asarray(z_rb),
                                 jnp.asarray(z_valid), cfg)
    mean_ref, cov_ref, innov, s = _numpy_ekf(pose[0], mean, cov,
                                             z.astype(np.float64), cfg)
    # the updated landmark is the top-weighted slot (counter 3 + 1)
    assert float(gm_out.w[0, 0]) == pytest.approx(4.0)
    np.testing.assert_allclose(
        [float(gm_out.mx[0, 0]), float(gm_out.my[0, 0])], mean_ref,
        rtol=2e-4)
    np.testing.assert_allclose(
        [float(gm_out.c00[0, 0]), float(gm_out.c01[0, 0]),
         float(gm_out.c11[0, 0])],
        [cov_ref[0, 0], cov_ref[0, 1], cov_ref[1, 1]], rtol=2e-3,
        atol=1e-6)
    # particle weight: log(1-pd) over the one in-FOV landmark cancels the
    # matched benefit's -log(1-pd); remainder is log pd + log N(innov; S)
    ln_n = (-np.log(2 * np.pi) - 0.5 * np.log(np.linalg.det(s))
            - 0.5 * innov @ np.linalg.solve(s, innov))
    assert float(dw[0]) == pytest.approx(np.log(cfg.pd) + ln_n, rel=1e-3)


# ---------------------------------------------------------------------------
# counter lifecycle + births
# ---------------------------------------------------------------------------

def test_counter_decrement_and_death(tiny_cfg):
    cfg = _fs_cfg(tiny_cfg)
    F, M = cfg.maxFeatures, cfg.maxMeasurements
    pose = jnp.zeros((1, 6))
    gm = Gaussian2DMixture.empty((1,), F)
    # two in-FOV landmarks: counters 1 and 3; no measurements arrive
    gm = gm.replace(w=gm.w.at[0, :2].set(jnp.asarray([1.0, 3.0])),
                    mx=gm.mx.at[0, :2].set(jnp.asarray([5.0, 7.0])),
                    my=gm.my.at[0, :2].set(0.0),
                    c00=gm.c00.at[0, :2].set(0.2),
                    c11=gm.c11.at[0, :2].set(0.2))
    z_rb = jnp.zeros((M, 2))
    z_valid = jnp.zeros((M,), bool)
    gm_out, dw = fastslam_update(pose, gm, z_rb, z_valid, cfg)
    w = np.sort(np.asarray(gm_out.w[0]))[::-1]
    # counter-3 landmark decays to 2; counter-1 landmark dies
    assert w[0] == pytest.approx(2.0)
    assert (w[1:] == 0.0).all()
    # out-of-FOV landmark is untouched
    gm2 = gm.replace(mx=gm.mx.at[0, :2].set(1e4))
    gm2_out, _ = fastslam_update(pose, gm2, z_rb, z_valid, cfg)
    w2 = np.sort(np.asarray(gm2_out.w[0]))[::-1]
    np.testing.assert_allclose(w2[:2], [3.0, 1.0])


def test_birth_from_unmatched_measurement(tiny_cfg):
    cfg = _fs_cfg(tiny_cfg)
    F, M = cfg.maxFeatures, cfg.maxMeasurements
    pose = jnp.zeros((1, 6))
    gm = Gaussian2DMixture.empty((1,), F)
    z_rb = jnp.zeros((M, 2)).at[0].set(jnp.asarray([4.0, 0.5]))
    z_valid = jnp.zeros((M,), bool).at[0].set(True)
    gm_out, dw = fastslam_update(pose, gm, z_rb, z_valid, cfg)
    w = np.asarray(gm_out.w[0])
    assert (w > 0).sum() == 1
    i = int(np.argmax(w))
    assert w[i] == pytest.approx(1.0)
    assert float(gm_out.mx[0, i]) == pytest.approx(4.0 * np.cos(0.5),
                                                   rel=1e-5)
    assert float(gm_out.my[0, i]) == pytest.approx(4.0 * np.sin(0.5),
                                                   rel=1e-5)
    # unmatched measurement scores the clutter likelihood; the empty map
    # contributes no missed-detection terms
    assert float(dw[0]) == pytest.approx(np.log(cfg.clutterDensity),
                                         rel=1e-4)


def test_particle_weighting_prefers_consistent_pose(tiny_cfg):
    cfg = _fs_cfg(tiny_cfg)
    F, M = cfg.maxFeatures, cfg.maxMeasurements
    pose = np.zeros((2, 6), np.float32)
    pose[1, 2] = 0.15          # particle 1 has a yaw error
    gm = Gaussian2DMixture.empty((2,), F)
    gm = gm.replace(w=gm.w.at[:, 0].set(3.0),
                    mx=gm.mx.at[:, 0].set(8.0),
                    my=gm.my.at[:, 0].set(0.0),
                    c00=gm.c00.at[:, 0].set(0.1),
                    c11=gm.c11.at[:, 0].set(0.1))
    z_rb = jnp.zeros((M, 2)).at[0].set(jnp.asarray([8.0, 0.0]))
    z_valid = jnp.zeros((M,), bool).at[0].set(True)
    _, dw = fastslam_update(jnp.asarray(pose), gm, z_rb, z_valid, cfg)
    assert float(dw[0]) > float(dw[1])


def test_ml_and_auction_agree_when_unambiguous(tiny_cfg):
    cfg1 = _fs_cfg(tiny_cfg, fastslamAssoc=1)
    cfg0 = _fs_cfg(tiny_cfg, fastslamAssoc=0)
    F, M = cfg1.maxFeatures, cfg1.maxMeasurements
    pose = jnp.zeros((1, 6))
    gm = Gaussian2DMixture.empty((1,), F)
    gm = gm.replace(w=gm.w.at[0, :2].set(2.0),
                    mx=gm.mx.at[0, :2].set(jnp.asarray([5.0, 9.0])),
                    my=gm.my.at[0, :2].set(jnp.asarray([0.0, 3.0])),
                    c00=gm.c00.at[0, :2].set(0.3),
                    c11=gm.c11.at[0, :2].set(0.3))
    z = np.zeros((M, 2), np.float32)
    z[0] = [np.hypot(5.0, 0.0), np.arctan2(0.0, 5.0)]
    z[1] = [np.hypot(9.0, 3.0), np.arctan2(3.0, 9.0)]
    z_valid = jnp.zeros((M,), bool).at[:2].set(True)
    out1, dw1 = fastslam_update(pose, gm, jnp.asarray(z), z_valid, cfg1)
    out0, dw0 = fastslam_update(pose, gm, jnp.asarray(z), z_valid, cfg0)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw0), rtol=1e-5)
    np.testing.assert_allclose(np.sort(np.asarray(out1.w[0])),
                               np.sort(np.asarray(out0.w[0])))


# ---------------------------------------------------------------------------
# JCBB
# ---------------------------------------------------------------------------

def _jcbb_case():
    """Two landmarks 0.12 rad apart at range 10; a 0.1 rad yaw error shifts
    BOTH measured bearings, so the second landmark's measurement falls
    nearer the FIRST landmark's prediction: individual NN association (in
    that measurement order) pairs it wrongly, while the joint hypothesis —
    both innovations explained by one coherent yaw shift — is what JCBB
    finds."""
    landmarks = np.array([[10.0, 0.0],
                          [10.0 * np.cos(0.12), 10.0 * np.sin(0.12)]])
    landmark_covs = np.tile(np.diag([0.01, 0.01]), (2, 1, 1))
    pose_est = np.array([0.0, 0.0, 0.0])
    pose_cov = np.diag([1e-4, 1e-4, 0.06 ** 2])
    yaw_true = 0.1
    # measurements generated at the TRUE pose (bearing shifted by -yaw)
    z = np.array([[10.0, 0.12 - yaw_true],      # landmark 1 first
                  [10.0, 0.0 - yaw_true]])      # landmark 0 second
    return z, landmarks, landmark_covs, pose_est, pose_cov


def test_jcbb_beats_nearest_neighbour():
    z, lm, lc, pose, pc = _jcbb_case()
    nn = J.nn_associate(z, lm, lc, pose, pc, 0.1, 0.01)
    jc = J.jcbb(z, lm, lc, pose, pc, 0.1, 0.01)
    np.testing.assert_array_equal(jc, [1, 0])     # correct joint hypothesis
    assert not np.array_equal(nn, [1, 0])          # NN mispairs
    assert nn[0] == 0                              # ...stealing landmark 0


def test_jcbb_null_for_clutter():
    z, lm, lc, pose, pc = _jcbb_case()
    z = np.vstack([z, [10.0, 1.5]])                # far-off clutter point
    jc = J.jcbb(z, lm, lc, pose, pc, 0.1, 0.01)
    np.testing.assert_array_equal(jc, [1, 0, -1])


def test_jcbb_empty_inputs():
    assert J.jcbb(np.zeros((0, 2)), np.zeros((3, 2)),
                  np.tile(np.eye(2), (3, 1, 1)), np.zeros(3), np.eye(3),
                  1.0, 0.1).shape == (0,)
    np.testing.assert_array_equal(
        J.jcbb(np.ones((2, 2)), np.zeros((0, 2)), np.zeros((0, 2, 2)),
               np.zeros(3), np.eye(3), 1.0, 0.1), [-1, -1])


# ---------------------------------------------------------------------------
# slam_step integration + e2e
# ---------------------------------------------------------------------------

def test_fastslam_slam_step_smoke(tiny_cfg):
    cfg = _fs_cfg(tiny_cfg)
    state = SlamState.create(cfg)
    m = cfg.maxMeasurements
    z = Measurements(
        rb=jnp.zeros((m, 2)).at[0].set(jnp.asarray([3.0, 0.1])),
        label=jnp.zeros((m,), jnp.int32),
        valid=jnp.zeros((m,), bool).at[0].set(True))
    key = jax.random.PRNGKey(0)
    state, aux = slam_step(state, key, (jnp.float32(0), jnp.float32(0)), z,
                           jnp.float32(1.0), jnp.asarray(False), cfg)
    assert np.isfinite(np.asarray(state.log_weights)).all()
    assert float(jnp.sum(state.map_static.w)) > 0
    state2, aux2 = slam_step(state, key, (jnp.float32(1), jnp.float32(0)),
                             z, jnp.float32(1.0), jnp.asarray(True), cfg)
    assert np.isfinite(float(aux2.log_lik))


@pytest.mark.slow
def test_fastslam_e2e_tracking(tiny_cfg):
    from phdslam_tpu.io.loaders import MeasurementSet, pad_measurement_sets
    from phdslam_tpu.simdata import make_scenario, generate_run

    rng = np.random.default_rng(11)
    sc = make_scenario(rng, n_landmarks=12, n_steps=40, clutter_rate=2.0)
    controls, meas = generate_run(np.random.default_rng(12), sc,
                                  control_noise=(0.05, 0.005))
    cfg = _fs_cfg(tiny_cfg, stdEncoder=0.05, stdAlpha=0.005)
    T = 40
    sets = [MeasurementSet(z[:, 0], z[:, 1],
                           np.zeros(len(z), np.int32)) for z in meas[:T]]
    rb, labels, valid = pad_measurement_sets(sets, cfg.maxMeasurements)
    state = SlamState.create(cfg)
    key = jax.random.PRNGKey(3)
    errs = []
    for t in range(T):
        z = Measurements(rb=jnp.asarray(rb[t]),
                         label=jnp.asarray(labels[t]),
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
    # confirmed landmarks (evidence counter >= 3) localize near truth
    idx = int(np.argmax(np.asarray(state.log_weights)))
    gm = jax.tree.map(lambda x: np.asarray(x[idx]), state.map_static)
    conf = gm.w >= 3.0
    assert conf.sum() >= 3
    pts = np.stack([gm.mx[conf], gm.my[conf]], axis=1)
    d = np.linalg.norm(pts[:, None, :] - sc.landmarks[None, :, :], axis=-1)
    assert np.median(d.min(axis=1)) < 1.0


def test_fastslam_rejects_mixed_feature_model():
    """filter_type = 2 only maintains the static map; a mixed feature
    model would be silently ignored, so the config rejects it."""
    import pytest

    from phdslam_tpu.config import SlamConfig

    with pytest.raises(ValueError, match="feature_model"):
        SlamConfig(filterType=2, featureModel=2)
    SlamConfig(filterType=2, featureModel=0)  # valid
