"""CPHD pipeline tests: constants, cardinality prediction, elementary
symmetric functions vs brute-force polynomial expansion, Psi sanity, and an
end-to-end CPHD tracking smoke test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import binom, poisson

from phdslam_tpu.filter import cphd as C
from phdslam_tpu.config import load_config


@pytest.fixture(scope="module")
def cphd_cfg():
    return load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=8, maxFeatures=16, maxMeasurements=8, birthWeight=1e-2,
        y0=0.0, filterType=1, maxCardinality=31, gateBirths=True,
        gateThreshold=4.0)


def test_constants(cphd_cfg):
    consts = C.make_constants(cphd_cfg)
    lf = np.asarray(consts.log_factorial)
    assert abs(lf[5] - np.log(120.0)) < 1e-4
    lb = np.asarray(consts.log_binomial)
    assert abs(lb[5, 2] - np.log(10.0)) < 1e-4
    assert lb[2, 5] < -1e30  # k > n
    cc = np.asarray(consts.log_cn_clutter)
    expect = poisson(cphd_cfg.clutterRate).logpmf(np.arange(10))
    np.testing.assert_allclose(cc[:10], expect, rtol=1e-4, atol=1e-4)


def test_cardinality_predict_is_convolution():
    n = 16
    rng = np.random.default_rng(0)
    p1 = rng.uniform(0.1, 1.0, n)
    p1 /= p1.sum()
    p2 = rng.uniform(0.1, 1.0, n)
    p2 /= p2.sum()
    out = np.asarray(C.cardinality_predict(
        jnp.asarray(np.log(p1, dtype=np.float32))[None],
        jnp.asarray(np.log(p2, dtype=np.float32))[None]))[0]
    conv = np.convolve(p1, p2)[:n]
    np.testing.assert_allclose(np.exp(out), conv, rtol=1e-3, atol=1e-6)


def test_birth_cardinality_binomial(cphd_cfg):
    consts = C.make_constants(cphd_cfg)
    out = np.asarray(C.birth_cardinality(5, 0.3, consts))
    expect = binom(5, 0.3).logpmf(np.arange(6))
    np.testing.assert_allclose(out[:6], expect, rtol=1e-3, atol=1e-3)
    assert np.all(out[6:] < -1e30)


def brute_esf(lams):
    """Coefficients of prod(1 + lam_i x) by polynomial multiplication."""
    coeffs = np.array([1.0])
    for lam in lams:
        coeffs = np.convolve(coeffs, [1.0, lam])
    return coeffs


def test_esf_vs_brute_force(rng):
    lams = rng.uniform(0.1, 3.0, 6)
    ll = np.log(lams).astype(np.float32)
    out = np.exp(np.asarray(C.esf_log(jnp.asarray(ll))))
    np.testing.assert_allclose(out, brute_esf(lams), rtol=1e-3)


def test_esf_padding_invariant(rng):
    lams = rng.uniform(0.1, 3.0, 4)
    ll = np.full(8, -np.inf, np.float32)
    ll[:4] = np.log(lams)
    out = np.exp(np.asarray(C.esf_log(jnp.asarray(ll))))
    expect = np.zeros(9)
    expect[:5] = brute_esf(lams)
    np.testing.assert_allclose(out, expect, rtol=1e-3, atol=1e-6)


def test_esf_deleted(rng):
    lams = rng.uniform(0.1, 3.0, 5)
    ll = jnp.asarray(np.log(lams).astype(np.float32))
    out = np.exp(np.asarray(C.esf_deleted(ll)))        # [5, 5]
    for m in range(5):
        rest = np.delete(lams, m)
        np.testing.assert_allclose(out[m], brute_esf(rest), rtol=1e-3)


def test_add_births_gating(cphd_cfg):
    from phdslam_tpu.filter.state import Gaussian2DMixture
    cfg = cphd_cfg
    consts = C.make_constants(cfg)
    P, F, M = 2, cfg.maxFeatures, cfg.maxMeasurements
    pose = jnp.zeros((P, 6))
    gm = Gaussian2DMixture.empty((P,), F)
    # one existing feature at range 4, bearing 0.2
    gm = gm.replace(
        w=gm.w.at[:, 0].set(1.0),
        mx=gm.mx.at[:, 0].set(4.0 * np.cos(0.2)),
        my=gm.my.at[:, 0].set(4.0 * np.sin(0.2)),
        c00=gm.c00.at[:, 0].set(0.01), c11=gm.c11.at[:, 0].set(0.01))
    z_rb = jnp.zeros((M, 2)).at[0].set(jnp.asarray([4.0, 0.2])) \
        .at[1].set(jnp.asarray([7.0, -0.5]))
    z_valid = jnp.zeros((M,), bool).at[:2].set(True)
    new_map, cn_birth = C.add_births(gm, pose, z_rb, z_valid, cfg, consts)
    # measurement 0 gated away (existing feature), measurement 1 births
    w = np.asarray(new_map.w)
    assert (w[0] > 0).sum() == 2      # original + 1 birth
    assert abs(np.sort(w[0])[-2] - cfg.birthWeight) < 1e-6
    # birth cardinality = binomial with n = 1
    cb = np.asarray(cn_birth[0])
    expect = binom(1, cfg.birthWeight).logpmf([0, 1])
    np.testing.assert_allclose(cb[:2], expect, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_cphd_e2e_tracking(cphd_cfg):
    """CPHD end-to-end: tracks the vehicle and maintains a sane cardinality
    estimate on a low-noise scenario."""
    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import slam_step
    from phdslam_tpu.simdata import make_scenario, generate_run
    from phdslam_tpu.io.loaders import MeasurementSet, pad_measurement_sets

    cfg = cphd_cfg.replace(stdEncoder=0.05, stdAlpha=0.005)
    rng = np.random.default_rng(11)
    sc = make_scenario(rng, n_landmarks=12, n_steps=40, clutter_rate=2.0)
    # particles must start where the scenario trajectory starts
    cfg = cfg.replace(x0=float(sc.traj[0, 0]), y0=float(sc.traj[0, 1]),
                      yaw0=float(sc.traj[0, 2]))
    controls, meas = generate_run(np.random.default_rng(12), sc,
                                  control_noise=(0.05, 0.005))
    sets = [MeasurementSet(z[:, 0], z[:, 1], np.zeros(len(z), np.int32))
            for z in meas[:40]]
    rb, labels, valid = pad_measurement_sets(sets, cfg.maxMeasurements)
    state = SlamState.create(cfg)
    key = jax.random.PRNGKey(3)
    errs = []
    zp = None
    for t in range(40):
        z = Measurements(rb=jnp.asarray(rb[t]), label=jnp.asarray(labels[t]),
                         valid=jnp.asarray(valid[t]))
        u = (jnp.float32(controls[t - 1, 0] if t > 0 else 0),
             jnp.float32(controls[t - 1, 1] if t > 0 else 0))
        key, sk = jax.random.split(key)
        state, aux = slam_step(state, sk, u, z, jnp.float32(cfg.dt),
                               jnp.asarray(t > 0), cfg, z_prev=zp)
        zp = z
        errs.append(np.linalg.norm(
            np.asarray(aux.expected_pose[:2]) - sc.traj[t, :2]))
    errs = np.asarray(errs)
    assert np.isfinite(errs).all()
    assert errs.mean() < 2.0, errs
    # cardinality posterior: finite log-pmf, normalized. (The posterior's
    # absolute level is conservative under Vo's Psi form with high pd — the
    # reference's CPHD was never exercised end-to-end (dormant code), so the
    # oracle here is formula-level only.)
    cn = np.asarray(state.cardinality)
    assert np.isfinite(np.exp(cn)).all()
    total = np.exp(cn[0]).sum()
    assert 0.5 < total < 2.0, total


@pytest.mark.slow
def test_cardinality_update_matches_f64_oracle(cphd_cfg):
    """psi_terms' cardinality posterior must match a direct float64
    implementation of Vo's CPHD update (Psi0 inner products, ESF, clutter
    cardinality) on a clean scenario: 6 unit-weight well-separated
    features (5 in FOV, 1 just outside maxRange — exercising the
    per-feature pd in the inner products), 6 exact detections, Poisson(6)
    prior. This pins the whole log-domain/bounded-ratio refactor against
    the textbook formula and shows the posterior mean lands on the true
    count."""
    import math

    from phdslam_tpu.filter import cphd as C
    from phdslam_tpu.filter.state import Gaussian2DMixture
    from phdslam_tpu.filter.update import (detection_log_weights,
                                           kalman_preupdate)

    cfg = cphd_cfg.replace(n_particles=2, maxFeatures=16, maxMeasurements=8,
                           maxCardinality=31, pd=0.95, clutterRate=2.0)
    consts = C.make_constants(cfg)
    rng = np.random.default_rng(0)
    P, F, M, n_true = 2, 16, 8, 6
    pts = rng.uniform(2, 8, (n_true, 2)).astype(np.float32)
    w = np.zeros((P, F), np.float32)
    w[:, :n_true] = 1.0
    mx = np.zeros((P, F), np.float32)
    my = np.zeros((P, F), np.float32)
    mx[:, :n_true] = pts[:, 0]
    my[:, :n_true] = pts[:, 1]
    gm = Gaussian2DMixture(
        w=jnp.asarray(w), mx=jnp.asarray(mx), my=jnp.asarray(my),
        c00=jnp.full((P, F), 0.1), c01=jnp.zeros((P, F)),
        c11=jnp.full((P, F), 0.1))
    pose = jnp.zeros((P, 6), jnp.float32)
    z = np.zeros((M, 2), np.float32)
    z[:n_true, 0] = np.linalg.norm(pts, axis=1)
    z[:n_true, 1] = np.arctan2(pts[:, 1], pts[:, 0])
    z_valid = jnp.asarray(np.arange(M) < n_true)

    pre = kalman_preupdate(pose, gm, cfg)
    lw = detection_log_weights(pre, gm, jnp.asarray(z),
                               jnp.zeros((M,), jnp.int32), z_valid, cfg)
    in_mask = pre.rclass == 1
    # per-feature pd: 0 outside the FOV (cphdPreUpdateKernel .bak:1183)
    qdw = jnp.log(1 - pre.pd) + jnp.log(jnp.maximum(gm.w, 1e-30))
    ncard = cfg.maxCardinality + 1
    prior = np.array([[n * np.log(6.0) - 6.0 - math.lgamma(n + 1)
                       for n in range(ncard)]] * P)
    prior -= np.log(np.exp(prior).sum(1, keepdims=True))

    sum_l = jax.scipy.special.logsumexp(
        jnp.where(np.asarray(in_mask)[:, None, :], lw, -jnp.inf), axis=-1)
    # psi_terms takes the feature-EXISTS mask (all real features here are
    # in range, so qdw's uniform (1-cfg.pd) is also the per-feature form)
    terms = C.psi_terms(sum_l, qdw, gm.w, gm.w > 0, z_valid,
                        jnp.asarray(prior, jnp.float32), consts, cfg)
    cn = np.asarray(terms.cn_update[0], np.float64)
    pmf = np.exp(cn - cn.max())
    pmf /= pmf.sum()

    # float64 oracle
    lw0 = np.asarray(lw[0], np.float64)
    in0 = np.asarray(in_mask[0])
    # full-map inner products with per-feature pd (out-of-FOV: pd = 0)
    valid0 = w[0] > 0
    pd0 = np.where(in0, cfg.pd, 0.0)
    wsum = w[0][valid0].sum()
    ratio = ((1 - pd0) * w[0])[valid0].sum() / wsum
    lam = (np.exp(lw0[np.asarray(z_valid)][:, in0]).sum(1)
           * cfg.clutterRate / cfg.clutterDensity / wsum)
    sig = np.zeros(len(lam) + 1)
    sig[0] = 1.0
    for v in lam:
        sig[1:] = sig[1:] + v * sig[:-1]
    m = len(lam)
    pk = lambda k: math.exp(k * np.log(cfg.clutterRate) - cfg.clutterRate
                            - math.lgamma(k + 1))
    psi0 = np.zeros(ncard)
    for n in range(ncard):
        psi0[n] = sum(
            math.factorial(m - j) * pk(m - j)
            * math.exp(math.lgamma(n + 1) - math.lgamma(n - j + 1))
            * ratio ** (n - j) * sig[j]
            for j in range(0, min(m, n) + 1))
    post = psi0 * np.exp(prior[0])
    post /= post.sum()

    np.testing.assert_allclose(pmf, post, atol=5e-6)
    mean_card = (pmf * np.arange(ncard)).sum()
    # 5 features detected + 1 out-of-FOV: the undetectable feature carries
    # no detection evidence, so the posterior rides the Poisson(6) prior
    # slightly above the detected count — E[n] ~ 7, not collapsed to |Z|.
    assert 6.0 < mean_card < 7.6, mean_card


@pytest.mark.slow
def test_esf_all_matches_scan_oracle(rng):
    """The D&C tree ESF (esf_all) must match the scan build-up esf_log and
    the per-deleted rebuild esf_deleted exactly (float32), including -inf
    (padded-slot) patterns."""
    for p, m in ((4, 7), (3, 16), (2, 1), (5, 8)):
        ll = jnp.asarray(rng.uniform(-8.0, 4.0, (p, m)).astype(np.float32))
        if m > 2:
            ll = ll.at[:, -2].set(-jnp.inf)
        e_ref = C.esf_log(ll)
        d_ref = C.esf_deleted(ll)
        e_new, d_new = C.esf_all(ll)
        assert e_new.shape == e_ref.shape and d_new.shape == d_ref.shape
        assert bool(jnp.all(jnp.isfinite(e_ref) == jnp.isfinite(e_new)))
        assert bool(jnp.all(jnp.isfinite(d_ref) == jnp.isfinite(d_new)))
        fin_e = jnp.isfinite(e_ref)
        fin_d = jnp.isfinite(d_ref)
        assert float(jnp.max(jnp.abs(jnp.where(
            fin_e, e_ref - e_new, 0.0)))) < 1e-3
        assert float(jnp.max(jnp.abs(jnp.where(
            fin_d, d_ref - d_new, 0.0)))) < 1e-3


@pytest.mark.slow
def test_cphd_conv_predict_e2e():
    """Carried-cardinality CPHD (cnPoissonPredict=False — the reference's
    cardinalityPredictKernel convolution instead of the per-step Poisson
    rebuild): the whole-run scan stays finite and tracks the vehicle."""
    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import run_scan
    from phdslam_tpu.simdata import generate_run, make_scenario

    T = 20
    sc = make_scenario(np.random.default_rng(7), n_landmarks=20, n_steps=T)
    cfg = load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=16, maxFeatures=32, maxMeasurements=16,
        filterType=1, maxCardinality=63, cnPoissonPredict=False,
        x0=float(sc.traj[0, 0]), y0=float(sc.traj[0, 1]),
        yaw0=float(sc.traj[0, 2]))
    rng = np.random.default_rng(1)
    controls, meas = generate_run(rng, sc, control_noise=(0.2, 0.01))
    M = cfg.maxMeasurements
    rb = np.zeros((T, M, 2), np.float32)
    valid = np.zeros((T, M), bool)
    for t in range(T):
        z = meas[t][:M]
        rb[t, :len(z)] = z
        valid[t, :len(z)] = True
    state = SlamState.create(cfg)
    zs = Measurements(rb=jnp.asarray(rb),
                      label=jnp.zeros((T, M), jnp.int32),
                      valid=jnp.asarray(valid))
    ctrl = jnp.asarray(np.concatenate(
        [np.zeros((1, 2), np.float32), controls[:T - 1]]))
    dts = jnp.full((T,), cfg.dt, jnp.float32)
    final, auxs = run_scan(state, jax.random.PRNGKey(0), ctrl, zs, dts,
                           cfg, T)
    assert np.isfinite(np.asarray(final.log_weights)).all()
    assert np.isfinite(np.asarray(final.cardinality)).all()
    err = np.linalg.norm(
        np.asarray(auxs.expected_pose)[-1, :2] - sc.traj[T - 1, :2])
    assert err < 1.5, err


def test_cphd_poisson_prior_reduces_to_phd():
    """With a Poisson predicted cardinality whose mean equals the in-range
    intensity mass, Vo's CPHD reduces EXACTLY to the PHD filter (the
    analytic identity behind the reference's per-step Poisson prior
    rebuild, .bak:2473-2497). A repeatedly-detected feature must therefore
    follow the identical confirmation trajectory through both update paths
    — pinning the whole ESF/Psi machinery against the closed-form PHD
    normalizer, including with clutter-like extra measurements present."""
    from phdslam_tpu.filter import update as U
    from phdslam_tpu.filter.state import Gaussian2DMixture

    cfg = load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=1, maxFeatures=8, maxMeasurements=8,
        filterType=1, maxCardinality=63, gateBirths=False,
        birthWeight=1e-9, usePallas=False)
    consts = C.make_constants(cfg)
    pose = jnp.zeros((1, 6), jnp.float32)
    M = cfg.maxMeasurements
    var_r = (cfg.stdRange * cfg.birthNoiseFactor) ** 2
    var_b = (cfg.stdBearing * cfg.birthNoiseFactor) ** 2

    def fresh_map(w):
        z = jnp.zeros((1, 8), jnp.float32)
        return Gaussian2DMixture(
            w=z.at[0, 0].set(w), mx=z.at[0, 0].set(5.0), my=z,
            c00=z.at[0, 0].set(var_r), c01=z,
            c11=z.at[0, 0].set(25.0 * var_b))

    for n_extra in (0, 4):
        z_rb = jnp.zeros((M, 2), jnp.float32).at[0, 0].set(5.0)
        for i in range(n_extra):
            z_rb = z_rb.at[1 + i, 0].set(6.0 + i).at[1 + i, 1].set(
                0.5 + 0.1 * i)
        z_valid = jnp.arange(M) < (1 + n_extra)
        z_label = jnp.zeros((M,), jnp.int32)
        gm_p = fresh_map(0.015)
        gm_c = fresh_map(0.015)
        ncard = cfg.maxCardinality + 1
        cn = jnp.full((1, ncard), -np.log(ncard), jnp.float32)
        for t in range(6):
            res = U.phd_update_static(pose, gm_p, z_rb, z_label, z_valid,
                                      cfg.replace(filterType=0))
            gm_p = res[0] if isinstance(res, tuple) else res.map
            gm_c, cn, _ = C.cphd_update(pose, gm_c, cn, z_rb, z_label,
                                        z_valid, cfg, consts)
            wp = float(np.asarray(gm_p.w).max())
            wc = float(np.asarray(gm_c.w).max())
            assert abs(wp - wc) < 2e-3 + 0.02 * wp, (t, n_extra, wp, wc)
        assert wp > 0.8, wp  # the feature actually confirmed
