"""Mixed static+dynamic update parity: the fixed-shape jit mixed update
(filter/update4.py::phd_update_mixed) must match the dynamic-shape NumPy
CPU oracle (reference_cpu.update_mixed) numerically — joint normalizers,
particle weight deltas, merged static AND dynamic maps — the independent
anchor VERDICT r2 missing-item 1 asked for."""

import numpy as np
import jax.numpy as jnp
import pytest

from phdslam_tpu.filter.state import Gaussian2DMixture, Gaussian4DMixture
from phdslam_tpu.filter.update4 import phd_update_mixed
from phdslam_tpu import reference_cpu as R


@pytest.fixture()
def mixed_cfg():
    from phdslam_tpu.config import load_config

    return load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=8, maxFeatures=16, maxMeasurements=8,
        birthWeight=1e-3, y0=0.0, featureModel=2,
        covVxBirth=1.0, covVyBirth=1.0)


def _setup(cfg):
    P, F, M = 2, cfg.maxFeatures, cfg.maxMeasurements
    pose = np.array([[0, 0, 0, 0, 0, 0], [0.5, -0.3, 0.1, 0, 0, 0]],
                    np.float32)
    # static features (all in-range of both poses)
    w2 = np.zeros((P, F), np.float32)
    mean2 = np.zeros((P, F, 2), np.float32)
    cov2 = np.tile(np.eye(2, dtype=np.float32) * 0.3, (P, F, 1, 1))
    feats2 = np.array([[3, 1], [5, -2], [2, 4]], np.float32)
    for p in range(P):
        for i, f in enumerate(feats2):
            w2[p, i] = [0.9, 0.5, 1.2][i]
            mean2[p, i] = f + p * 0.1
    # dynamic features: two in-range movers + one far out-of-range (must
    # be killed by the update, src/phdfilter.cu:3713-3719)
    w4 = np.zeros((P, F), np.float32)
    mean4 = np.zeros((P, F, 4), np.float32)
    cov4 = np.tile(np.eye(4, dtype=np.float32) * 0.4, (P, F, 1, 1))
    feats4 = np.array([[4, 2, 0.5, -0.2], [6, -1, -0.3, 0.4],
                       [200, 200, 0, 0]], np.float32)
    for p in range(P):
        for i, f in enumerate(feats4):
            w4[p, i] = [0.8, 0.6, 0.7][i]
            mean4[p, i] = f + p * 0.1
    z = np.array([[3.1, 0.32], [4.5, 0.45], [6.1, -0.17], [2.2, -0.8],
                  [7.0, 1.2]], np.float32)
    z_rb = np.zeros((M, 2), np.float32)
    z_rb[:len(z)] = z
    z_valid = np.zeros(M, bool)
    z_valid[:len(z)] = True
    z_label = np.zeros(M, np.int32)
    z_label[1] = z_label[2] = 1        # movers, for the labeled case
    return (pose, w2, mean2, cov2, w4, mean4, cov4, z, z_rb, z_valid,
            z_label)


def _oracle(cfg, pose, w2, mean2, cov2, w4, mean4, cov4, z, z_label):
    P = pose.shape[0]
    slam = R.CpuSlam.create(cfg.replace(n_particles=P))
    for p in range(P):
        s2 = w2[p] > 0
        slam.particles[p].pose = pose[p].astype(np.float64)
        slam.particles[p].w = w2[p][s2].astype(np.float64)
        slam.particles[p].mean = mean2[p][s2].astype(np.float64)
        slam.particles[p].cov = cov2[p][s2].astype(np.float64)
        s4 = w4[p] > 0
        slam.particles[p].wd = w4[p][s4].astype(np.float64)
        slam.particles[p].mean4 = mean4[p][s4].astype(np.float64)
        slam.particles[p].cov4 = cov4[p][s4].astype(np.float64)
    lw_before = np.array([pp.log_weight for pp in slam.particles])
    R.update_mixed(slam, z, cfg,
                   z_label=z_label[:len(z)] if z_label is not None
                   else None)
    cdw = np.array([pp.log_weight for pp in slam.particles]) - lw_before
    return slam, cdw


@pytest.mark.parametrize("weighting", [0, 1])
@pytest.mark.parametrize("labeled", [False, True])
@pytest.mark.slow
def test_mixed_update_matches_cpu_oracle(mixed_cfg, weighting, labeled):
    cfg = mixed_cfg.replace(particleWeighting=weighting,
                            labeledMeasurements=labeled)
    (pose, w2, mean2, cov2, w4, mean4, cov4, z, z_rb, z_valid,
     z_label) = _setup(cfg)
    P = pose.shape[0]

    gm2 = Gaussian2DMixture.from_arrays(w2, mean2, cov2)
    gm4 = Gaussian4DMixture.from_arrays(w4, mean4, cov4)
    gm2_out, gm4_out, dw = phd_update_mixed(
        jnp.asarray(pose), gm2, gm4, jnp.asarray(z_rb),
        jnp.asarray(z_label), jnp.asarray(z_valid), cfg)
    jw2 = np.asarray(gm2_out.w)
    jm2 = np.asarray(gm2_out.mean)
    jc2 = np.asarray(gm2_out.cov)
    jw4 = np.asarray(gm4_out.w)
    jm4 = np.asarray(gm4_out.mean)
    jc4 = np.asarray(gm4_out.cov)
    jdw = np.asarray(dw)

    slam, cdw = _oracle(cfg, pose, w2, mean2, cov2, w4, mean4, cov4, z,
                        z_label if labeled else None)

    for p in range(P):
        # static map
        cw = slam.particles[p].w
        oj = np.argsort(-jw2[p])[: len(cw)]
        oc = np.argsort(-cw)
        assert (jw2[p] > 0).sum() == len(cw)
        np.testing.assert_allclose(jw2[p][oj], cw[oc], rtol=5e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(jm2[p][oj], slam.particles[p].mean[oc],
                                   rtol=1e-3, atol=5e-3)
        np.testing.assert_allclose(jc2[p][oj], slam.particles[p].cov[oc],
                                   rtol=5e-3, atol=5e-3)
        # dynamic map (the out-of-range mover must be gone)
        cwd = slam.particles[p].wd
        assert (jw4[p] > 0).sum() == len(cwd)
        oj4 = np.argsort(-jw4[p])[: len(cwd)]
        oc4 = np.argsort(-cwd)
        np.testing.assert_allclose(jw4[p][oj4], cwd[oc4], rtol=5e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(jm4[p][oj4],
                                   slam.particles[p].mean4[oc4],
                                   rtol=1e-3, atol=5e-3)
        np.testing.assert_allclose(jc4[p][oj4],
                                   slam.particles[p].cov4[oc4],
                                   rtol=5e-3, atol=6e-3)
        far = np.linalg.norm(slam.particles[p].mean4[:, :2]
                             - pose[p, :2], axis=1)
        assert (far < cfg.maxRange * 1.01).all()

    # particle weight deltas: oracle normalizes; compare differences
    assert abs((jdw[1] - jdw[0]) - (cdw[1] - cdw[0])) < 2e-3


@pytest.mark.slow
def test_mixed_run_smoke(mixed_cfg):
    """End-to-end mixed-mode oracle run (predict + jump-Markov map
    prediction + update + resample) stays finite and tracks."""
    cfg = mixed_cfg.replace(n_particles=4)
    T = 6
    controls = np.zeros((T - 1, 2))
    controls[:, 0] = 1.0
    rng = np.random.default_rng(3)
    meas = []
    for t in range(T):
        base = np.array([[4.0 - 0.3 * t, 0.2], [6.0, -0.4]])
        meas.append(base + rng.normal(0, 0.02, base.shape))
    poses = R.run(cfg, controls, meas, seed=1)
    assert np.isfinite(poses).all()
    # dynamic map exists and carries velocity states
    # (run keeps the final slam internal; re-run manually for state)
    slam = R.CpuSlam.create(cfg)
    for t, z in enumerate(meas):
        if t > 0:
            R.predict(slam, controls[t - 1], cfg, cfg.dt, rng)
        R.update_mixed(slam, np.asarray(z), cfg)
    assert all(p.wd is not None and np.isfinite(p.wd).all()
               for p in slam.particles)
