"""Dynamic / MIXED feature-model tests: 4-D Kalman machinery vs numpy
oracles, CV feature prediction, 4-D merge, and an end-to-end moving-target
tracking smoke test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phdslam_tpu.config import load_config
from phdslam_tpu.filter.state import Gaussian4DMixture
from phdslam_tpu.filter import update4 as U4


@pytest.fixture(scope="module")
def mixed_cfg():
    return load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=8, maxFeatures=16, maxMeasurements=8, y0=0.0,
        featureModel=2, birthWeight=1e-2, covVxBirth=1.0, covVyBirth=1.0,
        stdAxMap=0.05, stdAyMap=0.05, ps=0.98, tau=-10.0, beta=10.0)


def test_s4_indexing():
    c = jnp.arange(10.0).reshape(1, 10, 1)
    assert float(U4.s4(c, 0, 0)[0, 0]) == 0
    assert float(U4.s4(c, 2, 0)[0, 0]) == 2  # symmetric access
    assert float(U4.s4(c, 3, 3)[0, 0]) == 9


def test_chol4_solve_matches_numpy(rng):
    a = rng.normal(size=(4, 4))
    cov = a @ a.T + 4 * np.eye(4)
    d = rng.normal(size=4)
    expect = d @ np.linalg.inv(cov) @ d
    ch = [cov[i, j] for i in range(4) for j in range(i, 4)]
    c = jnp.asarray(np.array(ch, np.float32)).reshape(1, 10, 1)
    dv = jnp.asarray(d.astype(np.float32)).reshape(1, 4, 1)
    got = float(U4.chol4_solve_sq(c, dv)[0, 0])
    assert abs(got - expect) < 1e-3 * abs(expect)


def test_cv_predict4_matches_matrix_form(mixed_cfg, rng):
    cfg = mixed_cfg
    a = rng.normal(size=(4, 4)).astype(np.float32)
    cov = a @ a.T + np.eye(4, dtype=np.float32)
    mean = rng.normal(size=4).astype(np.float32)
    gm = Gaussian4DMixture.from_arrays(
        jnp.ones((1, 1)), jnp.asarray(mean).reshape(1, 1, 4),
        jnp.asarray(cov).reshape(1, 1, 4, 4))
    dt = 0.5
    out = U4.cv_predict4(gm, cfg, dt)
    f = np.eye(4, dtype=np.float32)
    f[0, 2] = f[1, 3] = dt
    q = np.zeros((4, 4), np.float32)
    vx, vy = cfg.stdAxMap ** 2, cfg.stdAyMap ** 2
    q[0, 0], q[0, 2], q[2, 0], q[2, 2] = (dt**4 / 4 * vx, dt**3 / 2 * vx,
                                          dt**3 / 2 * vx, dt**2 * vx)
    q[1, 1], q[1, 3], q[3, 1], q[3, 3] = (dt**4 / 4 * vy, dt**3 / 2 * vy,
                                          dt**3 / 2 * vy, dt**2 * vy)
    expect_mean = f @ mean
    expect_cov = f @ cov @ f.T + q
    np.testing.assert_allclose(np.asarray(out.mean)[0, 0], expect_mean,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.cov)[0, 0], expect_cov,
                               rtol=1e-3, atol=1e-3)


def test_kalman_preupdate4_vs_numpy(mixed_cfg, rng):
    """4-D EKF terms vs a dense numpy computation."""
    cfg = mixed_cfg
    pose = np.zeros((1, 6), np.float32)
    mean = np.array([[3.0, 1.0, 0.3, -0.2]], np.float32)
    a = rng.normal(size=(4, 4)).astype(np.float32) * 0.2
    cov = a @ a.T + 0.5 * np.eye(4, dtype=np.float32)
    gm = Gaussian4DMixture.from_arrays(
        jnp.full((1, 1), 0.7), jnp.asarray(mean).reshape(1, 1, 4),
        jnp.asarray(cov).reshape(1, 1, 4, 4))
    pre = U4.kalman_preupdate4(jnp.asarray(pose), gm, cfg)

    dx, dy = mean[0, 0], mean[0, 1]
    r2 = dx * dx + dy * dy
    r = np.sqrt(r2)
    h = np.zeros((2, 4))
    h[0, :2] = [dx / r, dy / r]
    h[1, :2] = [-dy / r2, dx / r2]
    rmat = np.diag([cfg.stdRange ** 2, cfg.stdBearing ** 2])
    s = h @ cov @ h.T + rmat
    k = cov @ h.T @ np.linalg.inv(s)
    ikh = np.eye(4) - k @ h
    p_up = ikh @ cov @ ikh.T + k @ rmat @ k.T

    gain = np.asarray(pre.gain)[0, :, 0].reshape(4, 2)
    np.testing.assert_allclose(gain, k, rtol=1e-3, atol=1e-4)
    got_cov = np.zeros((4, 4))
    cu = np.asarray(pre.cov_update)[0, :, 0]
    kk = 0
    for i in range(4):
        for j in range(i, 4):
            got_cov[i, j] = got_cov[j, i] = cu[kk]
            kk += 1
    np.testing.assert_allclose(got_cov, p_up, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_greedy_merge4_moment_match():
    # two identical-cov 4-D gaussians 1 apart in x, large separation gate
    w = jnp.asarray([[0.5, 0.5]])
    mean = jnp.zeros((1, 4, 2)).at[0, 0, 1].set(1.0)
    diag = [0, 4, 7, 9]
    cov = jnp.stack([jnp.full((1, 2), 0.1) if k in diag
                     else jnp.zeros((1, 2)) for k in range(10)], axis=1)
    ow, om, oc = U4.greedy_merge4(w, mean, cov, 100.0, 2)
    assert abs(float(ow[0, 0]) - 1.0) < 1e-6
    assert abs(float(om[0, 0, 0]) - 0.5) < 1e-6
    # merged xx variance = 0.1 + 0.25
    assert abs(float(oc[0, 0, 0]) - 0.35) < 1e-5
    assert float(ow[0, 1]) == 0.0


@pytest.mark.slow
def test_mixed_e2e_moving_target(mixed_cfg):
    """MIXED model: static landmarks + one moving target; the filter tracks
    the vehicle and the dynamic map picks up the mover with a velocity
    estimate in the right direction."""
    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import slam_step

    cfg = mixed_cfg.replace(stdEncoder=0.05, stdAlpha=0.005,
                            clutterRate=2.0)
    rng = np.random.default_rng(2)
    landmarks = np.array([[5.0, 2.0], [8.0, -3.0], [4.0, -5.0]])
    mover0 = np.array([6.0, 4.0])
    mover_v = np.array([-0.15, -0.25])
    state = SlamState.create(cfg)
    key = jax.random.PRNGKey(7)
    pose = np.zeros(3)
    T = 30
    for t in range(T):
        mover = mover0 + mover_v * t
        pts = np.vstack([landmarks, mover[None]])
        d = pts - pose[:2]
        r = np.linalg.norm(d, axis=1) + rng.normal(0, cfg.stdRange, 4)
        b = np.arctan2(d[:, 1], d[:, 0]) - pose[2] \
            + rng.normal(0, cfg.stdBearing, 4)
        m = cfg.maxMeasurements
        z_rb = np.zeros((m, 2), np.float32)
        z_rb[:4, 0] = r
        z_rb[:4, 1] = b
        z_val = np.zeros(m, bool)
        z_val[:4] = True
        z = Measurements(rb=jnp.asarray(z_rb),
                         label=jnp.zeros(m, jnp.int32),
                         valid=jnp.asarray(z_val))
        key, sk = jax.random.split(key)
        state, aux = slam_step(state, sk, (jnp.float32(0.1), jnp.float32(0)),
                               z, jnp.float32(1.0), jnp.asarray(t > 0), cfg)
    assert np.isfinite(np.asarray(state.log_weights)).all()
    assert np.isfinite(np.asarray(state.map_dynamic.w)).all()
    p = int(np.argmax(np.asarray(state.log_weights)))
    w4 = np.asarray(state.map_dynamic.w[p])
    assert w4.sum() > 0.2, w4        # dynamic map acquired mass
    # strongest dynamic feature sits near the mover's current position
    best = int(np.argmax(w4))
    m4 = np.asarray(state.map_dynamic.mean[p, best])
    mover_final = mover0 + mover_v * (T - 1)
    assert np.linalg.norm(m4[:2] - mover_final) < 3.0, (m4, mover_final)


@pytest.mark.slow
def test_mover_velocity_estimate(mixed_cfg):
    """Controlled acquisition check: stationary vehicle, one CV mover
    crossing the FOV (plus occasional clutter), UNLABELED measurements.
    The dynamic map must lock on within ~8 detections and the tracked
    feature's velocity estimate must align with the true motion — the
    statistic the mixed evidence run scores (scripts/mixed_evidence.py),
    pinned here at unit scale."""
    import jax
    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import run_scan

    cfg = mixed_cfg.replace(
        n_particles=64, maxFeatures=32, maxMeasurements=8,
        birthWeight=1e-2, covVxBirth=1.0, covVyBirth=1.0,
        stdAxMap=0.05, stdAyMap=0.05, ps=0.98, tau=-10.0, beta=10.0,
        clutterRate=1.0, x0=0.0, y0=0.0, yaw0=0.0)
    rng = np.random.default_rng(3)
    T = 40
    mover0 = np.array([6.0, -4.0])
    mv = np.array([0.0, 0.25])
    M = cfg.maxMeasurements
    rb = np.zeros((T, M, 2), np.float32)
    valid = np.zeros((T, M), bool)
    truth = np.zeros((T, 2))
    for t in range(T):
        pos = mover0 + mv * t * cfg.dt
        truth[t] = pos
        r = np.linalg.norm(pos)
        b = np.arctan2(pos[1], pos[0])
        zs = [[r + rng.normal(0, cfg.stdRange),
               b + rng.normal(0, cfg.stdBearing)]]
        if rng.uniform() < 0.5:
            zs.append([rng.uniform(1, cfg.maxRange), rng.uniform(-1.2, 1.2)])
        for i, z in enumerate(zs):
            rb[t, i] = z
            valid[t, i] = True
    state = SlamState.create(cfg)
    zs = Measurements(rb=jnp.asarray(rb),
                      label=jnp.zeros((T, M), jnp.int32),
                      valid=jnp.asarray(valid))
    ctrl = jnp.zeros((T, 2), jnp.float32)
    dts = jnp.full((T,), cfg.dt, jnp.float32)
    _, (_, la) = run_scan(state, jax.random.PRNGKey(0), ctrl, zs, dts,
                          cfg, T, with_log_state=True)
    dyn_w = np.asarray(la.dyn_w)
    dyn_m = np.asarray(la.dyn_mean)
    dists, coss = [], []
    for t in range(8, T):
        w = dyn_w[t]
        m4 = dyn_m[t].T
        sel = w > 0.05
        assert sel.any(), f"no dynamic feature above 0.05 at t={t}"
        dd = np.linalg.norm(m4[sel][:, :2] - truth[t], axis=1)
        j = int(np.argmin(dd))
        v = m4[sel][j, 2:]
        nv = np.linalg.norm(v) * np.linalg.norm(mv)
        dists.append(dd[j])
        if nv > 0:
            coss.append(float(v @ mv / nv))
    assert np.median(dists) < 1.5, np.median(dists)
    assert np.median(coss) > 0.7, np.median(coss)


def test_informed_birth_velocity_unit(mixed_cfg):
    """Two-detection velocity init (cfg.birthVelocityInit): a measurement
    matched to a previous-step measurement gets the BAYESIAN FUSION of the
    zero-mean covVxBirth prior with the two-point velocity observation
    (p - p_prev)/dt; unmatched gets the zero-mean covVxBirth prior."""
    cfg = mixed_cfg.replace(birthVelocityInit=True, birthVelMax=5.0)
    dt = jnp.float32(1.0)
    pose = jnp.zeros((2, 6), jnp.float32)
    # previous measurement world anchors straight from the converter
    zp_rb = jnp.array([[5.0, 0.0], [0.0, 0.0]], jnp.float32)
    zp_valid = jnp.array([True, False])
    zw_prev = U4.prev_measurement_world(pose, zp_rb, zp_valid)
    np.testing.assert_allclose(np.asarray(zw_prev[0, 0]), [5.0, 0.0],
                               atol=1e-6)
    # current: one measurement 0.5 m further out (matched), one far off
    # to the side (no previous neighbor within the match radius)
    z_rb = jnp.array([[5.5, 0.0], [40.0, 1.2]], jnp.float32)
    z_valid = jnp.array([True, True])
    vx, vy, var_v = U4.informed_birth_velocity(
        pose, z_rb, z_valid, zw_prev, zp_valid, dt, cfg)
    # fusion: gain = prior / (prior + 2 sigma_p^2 / dt^2)
    var_p = cfg.stdRange ** 2 + (5.5 * cfg.stdBearing) ** 2
    var_obs = 2.0 * var_p
    gain = cfg.covVxBirth / (cfg.covVxBirth + var_obs)
    np.testing.assert_allclose(np.asarray(vx[:, 0]), gain * 0.5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(vy[:, 0]), 0.0, atol=1e-5)
    # matched variance: the fusion posterior, strictly below the prior
    v0 = float(var_v[0, 0])
    assert v0 == pytest.approx(
        max(gain * var_obs, 0.1 * cfg.covVxBirth), rel=1e-4)
    assert v0 < cfg.covVxBirth
    # unmatched: zero mean, prior variance
    assert float(vx[0, 1]) == 0.0 and float(vy[0, 1]) == 0.0
    assert float(var_v[0, 1]) == pytest.approx(cfg.covVxBirth)
    # birth channels consume the init
    bm, bc = U4.birth4_channels(pose[:, None, :], z_rb[None, :, :], cfg,
                                vel=(vx, vy, var_v))
    np.testing.assert_allclose(np.asarray(bm[2][:, 0]), gain * 0.5,
                               rtol=1e-4)
    assert float(bc[7][0, 0]) == pytest.approx(v0)


def test_birth_velocity_init_e2e(mixed_cfg):
    """End-to-end: birthVelocityInit=True runs through run_scan (z_prev
    threading + shotgun expansion) and yields a finite dynamic map whose
    strongest feature tracks the mover."""
    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import run_scan

    cfg = mixed_cfg.replace(
        n_particles=16, maxFeatures=16, maxMeasurements=4,
        nPredictParticles=2, birthVelocityInit=True,
        clutterRate=1.0, x0=0.0, y0=0.0, yaw0=0.0)
    rng = np.random.default_rng(5)
    T = 20
    mover0 = np.array([6.0, -3.0])
    mv = np.array([0.0, 0.3])
    M = cfg.maxMeasurements
    rb = np.zeros((T, M, 2), np.float32)
    valid = np.zeros((T, M), bool)
    for t in range(T):
        pos = mover0 + mv * t * cfg.dt
        r = np.linalg.norm(pos)
        b = np.arctan2(pos[1], pos[0])
        rb[t, 0] = [r + rng.normal(0, 0.2), b + rng.normal(0, 0.01)]
        valid[t, 0] = True
    state = SlamState.create(cfg)
    zs = Measurements(rb=jnp.asarray(rb),
                      label=jnp.zeros((T, M), jnp.int32),
                      valid=jnp.asarray(valid))
    ctrl = jnp.zeros((T, 2), jnp.float32)
    dts = jnp.full((T,), cfg.dt, jnp.float32)
    final, _ = run_scan(state, jax.random.PRNGKey(1), ctrl, zs, dts, cfg, T)
    w4 = np.asarray(final.map_dynamic.w)
    assert np.isfinite(w4).all()
    p = int(np.argmax(np.asarray(final.log_weights)))
    assert w4[p].sum() > 0.2
    best = int(np.argmax(w4[p]))
    m4 = np.asarray(final.map_dynamic.mean[p, best])
    target = mover0 + mv * (T - 1) * cfg.dt
    assert np.linalg.norm(m4[:2] - target) < 3.0, (m4, target)


def test_generate_mixed_run_labels():
    """return_labels=True must label exactly the mover-origin detections
    (1) and leave static/clutter at 0, with the same rng stream as the
    unlabeled call (the permutation draw is shared), so labeled and
    unlabeled runs see identical measurement sets."""
    from phdslam_tpu.simdata import generate_mixed_run, make_scenario

    rng1 = np.random.default_rng(3)
    rng2 = np.random.default_rng(3)
    sc = make_scenario(np.random.default_rng(0), n_landmarks=6,
                       n_steps=15, clutter_rate=1.0)
    m0 = np.array([[6.0, 0.0]])
    mv = np.array([[0.0, 0.2]])
    c1, meas1, truth1 = generate_mixed_run(rng1, sc, m0, mv,
                                           control_noise=(0.1, 0.01))
    c2, meas2, truth2, labels = generate_mixed_run(
        rng2, sc, m0, mv, control_noise=(0.1, 0.01), return_labels=True)
    np.testing.assert_array_equal(c1, c2)
    n_mover = 0
    for z1, z2, lab in zip(meas1, meas2, labels):
        np.testing.assert_array_equal(z1, z2)
        assert lab.shape == (len(z2),)
        n_mover += int((lab == 1).sum())
        assert set(np.unique(lab)) <= {0, 1}
    assert n_mover > 0  # the mover was detected at least once


def test_keep_oob_dynamic_passthrough(mixed_cfg):
    """The reference deliberately kills out-of-range dynamic features
    ('TODO: hack...', src/phdfilter.cu:3715-3719) — default behavior —
    while cfg.keepOobDynamic passes them through the update untouched
    like the static map's out-of-range features. One dynamic feature
    BEHIND the vehicle (out of FOV), one measurement ahead."""
    from phdslam_tpu.filter.state import Gaussian4DMixture

    P = mixed_cfg.n_particles
    F = 8
    cfg0 = mixed_cfg.replace(maxFeatures=F, usePallas=False)
    pose = jnp.zeros((P, 6), jnp.float32)
    mean = np.zeros((P, F, 4), np.float32)
    mean[:, 0, :2] = [-6.0, 0.0]       # behind the vehicle
    cov = np.broadcast_to(np.eye(4, dtype=np.float32) * 0.2,
                          (P, F, 4, 4))
    w = np.zeros((P, F), np.float32)
    w[:, 0] = 0.9
    gm4 = Gaussian4DMixture.from_arrays(
        jnp.asarray(w), jnp.asarray(mean), jnp.asarray(cov))
    gm2 = __import__(
        "phdslam_tpu.filter.state", fromlist=["Gaussian2DMixture"]
    ).Gaussian2DMixture(
        w=jnp.zeros((P, F)), mx=jnp.zeros((P, F)), my=jnp.zeros((P, F)),
        c00=jnp.ones((P, F)), c01=jnp.zeros((P, F)),
        c11=jnp.ones((P, F)))
    M = cfg0.maxMeasurements
    z_rb = jnp.zeros((M, 2), jnp.float32).at[0, 0].set(5.0)
    z_valid = jnp.arange(M) < 1
    z_label = jnp.zeros((M,), jnp.int32)
    for keep, expect in ((False, 0.0), (True, 0.9)):
        cfg = cfg0.replace(keepOobDynamic=keep)
        _, gm4_out, _ = U4.phd_update_mixed(pose, gm2, gm4, z_rb, z_label,
                                            z_valid, cfg)
        ow = np.asarray(gm4_out.w[0])
        om = np.asarray(gm4_out.mean[0])          # [F, 4]
        near = np.linalg.norm(om[:, :2] - [-6.0, 0.0], axis=1) < 0.5
        got = float((ow * near).sum())
        assert got == pytest.approx(expect, abs=1e-4), (keep, got)


@pytest.mark.slow
def test_shipped_mixed_cfg_confirms_mover():
    """E2E against the SHIPPED mixed defaults (cfg/mixed_synth.cfg, incl.
    birth_weight_dynamic = 0.05): in the confirmation-failure regime that
    symmetric 1e-2 births provably lose (static landmarks competing for
    the mover's measurements + clutter; the unlabeled update splits every
    measurement's mass across both maps, src/phdfilter.cu:2552-2607), a
    crossing mover must CONFIRM in the dynamic map — nearest dynamic
    feature within 2 m at weight >= 0.05 on most settled steps. Shape
    knobs (particles/features/measurements) are the only overrides, so
    this test breaks if the shipped cfg's mixed knobs drift."""
    import jax
    from phdslam_tpu.config import load_config
    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import run_scan

    cfg = load_config("cfg/mixed_synth.cfg").replace(
        n_particles=64, maxFeatures=32, maxMeasurements=32,
        x0=0.0, y0=0.0, yaw0=0.0)
    assert cfg.birthWeightDynamic > cfg.birthWeight  # the shipped fix
    assert cfg.clutterRate == 20.0   # the regime symmetric births lose in
    rng = np.random.default_rng(5)
    T = 40
    # static landmarks flanking the mover's path: every mover detection
    # also feeds plausible static births/updates (the doppelganger)
    landmarks = np.array([[5.0, -2.0], [7.0, 1.0], [4.0, 3.0]])
    mover0 = np.array([6.5, -4.0])
    mv = np.array([0.0, 0.25])
    M = cfg.maxMeasurements
    rb = np.zeros((T, M, 2), np.float32)
    valid = np.zeros((T, M), bool)
    truth = np.zeros((T, 2))
    for t in range(T):
        pos = mover0 + mv * t * cfg.dt
        truth[t] = pos
        pts = [pos] + [lm for lm in landmarks
                       if rng.uniform() < cfg.pd]
        zs = [[np.linalg.norm(p) + rng.normal(0, cfg.stdRange),
               np.arctan2(p[1], p[0]) + rng.normal(0, cfg.stdBearing)]
              for p in pts]
        for _ in range(rng.poisson(cfg.clutterRate)):
            zs.append([rng.uniform(0.5, cfg.maxRange),
                       rng.uniform(-cfg.maxBearing, cfg.maxBearing)])
        for i, z in enumerate(zs[:M]):
            rb[t, i] = z
            valid[t, i] = True
    state = SlamState.create(cfg)
    zs = Measurements(rb=jnp.asarray(rb),
                      label=jnp.zeros((T, M), jnp.int32),
                      valid=jnp.asarray(valid))
    ctrl = jnp.zeros((T, 2), jnp.float32)
    dts = jnp.full((T,), cfg.dt, jnp.float32)
    _, (_, la) = run_scan(state, jax.random.PRNGKey(0), ctrl, zs, dts,
                          cfg, T, with_log_state=True)
    dyn_w = np.asarray(la.dyn_w)
    dyn_m = np.asarray(la.dyn_mean)
    confirmed = []
    for t in range(8, T):
        w = dyn_w[t]
        m4 = dyn_m[t].T
        sel = w >= 0.05                      # the evidence existence rule
        ok = False
        if sel.any():
            dd = np.linalg.norm(m4[sel][:, :2] - truth[t], axis=1)
            ok = bool(dd.min() < 2.0)
        confirmed.append(ok)
    frac = float(np.mean(confirmed))
    # measured: 1.00 under the shipped cfg, 0.88 with symmetric births
    # (birthWeightDynamic=-1) on the same stream
    assert frac >= 0.9, (frac, confirmed)


def test_birth_trail_snowball_merge():
    """Pin the labeled-mode localization mechanism (RESULTS 'Labeled-mode
    anomaly'): a trail of successive mover births — ~0.26 m apart with
    the mixed birth covariance — collapses into ONE merged cluster under
    the averaged-covariance Mahalanobis greedy merge (minSeparation = 5),
    whose mean sits at the weighted trail centroid, i.e. LAGGING the
    mover's head by ~half the trail length. This is why labeled mode
    (one birth per mover per step, no detection subsidy) cannot localize
    a crossing mover regardless of birth weight."""
    from phdslam_tpu.config import load_config
    from phdslam_tpu.filter.state import Gaussian4DMixture
    from phdslam_tpu.filter.update4 import greedy_merge4

    cfg = load_config("cfg/mixed_synth.cfg")
    T = 20
    step = 0.26                      # mover displacement per step [m]
    F = 8
    pos_var = (cfg.birthNoiseFactor * cfg.stdRange) ** 2     # ~2.25 m^2
    birth_cov = np.diag([pos_var, pos_var,
                         cfg.covVxBirth, cfg.covVyBirth]).astype(np.float32)
    # sequential chain, as in the filter: one birth at the mover's head
    # per step, merged into the surviving mixture each step
    w = np.zeros((1, F), np.float32)
    mean = np.zeros((1, F, 4), np.float32)
    cov = np.broadcast_to(np.eye(4, dtype=np.float32),
                          (1, F, 4, 4)).copy()
    gm = Gaussian4DMixture.from_arrays(
        jnp.asarray(w), jnp.asarray(mean), jnp.asarray(cov))
    for t in range(T):
        w = np.asarray(gm.w).copy()
        mean = np.asarray(gm.mean).copy()
        cov = np.asarray(gm.cov).copy()
        slot = int(np.argmin(w[0]))              # a free/weakest slot
        w[0, slot] = 0.05
        mean[0, slot] = [step * t, 0.0, 0.0, 0.0]
        cov[0, slot] = birth_cov
        gm = Gaussian4DMixture.from_arrays(
            jnp.asarray(w), jnp.asarray(mean), jnp.asarray(cov))
        ow, omc, occ = greedy_merge4(
            gm.w, gm.mean_channels, gm.cov_channels, cfg.minSeparation, F)
        gm = Gaussian4DMixture(w=ow, mean_channels=omc, cov_channels=occ)
    ow = np.asarray(gm.w[0])
    n_clusters = int((ow > 0).sum())
    assert n_clusters == 1, n_clusters            # the snowball
    j = int(np.argmax(ow))
    cx = float(np.asarray(gm.mean)[0, j, 0])      # merged x position
    head = step * (T - 1)
    # the merged mean trails the mover's head materially — the labeled
    # dwell runs measure ~5 m on the real scenario
    assert head - cx > 1.5, (cx, head)
