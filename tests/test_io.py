"""Loader and log-format tests against the shipped reference datasets."""

import numpy as np

from phdslam_tpu.io import loaders, logs


def test_load_ackerman_measurements():
    sets = loaders.load_measurements(
        "/root/reference/matlab/measurements_synth_ackerman.txt")
    assert len(sets) == 331
    assert len(sets[0].ranges) == 28
    assert abs(sets[0].ranges[0] - 9.476848) < 1e-6
    assert abs(sets[0].bearings[0] + 2.299487) < 1e-6
    # some shipped measurements are negative-range (Gaussian noise on
    # near-zero ranges) — the loaders must pass them through untouched
    allr = np.concatenate([s.ranges for s in sets])
    assert (allr < 0).any()


def test_load_cv_measurements():
    sets = loaders.load_measurements(
        "/root/reference/matlab/measurements_synth_cv.txt")
    assert len(sets) == 1000


def test_load_controls():
    c = loaders.load_controls("/root/reference/matlab/controls_synth.txt")
    assert c.shape == (999, 2)
    assert abs(c[0, 0] - 2.77796) < 1e-5
    assert abs(c[0, 1] + 0.186915) < 1e-6


def test_load_controls_comma_separated(tmp_path):
    p = tmp_path / "controls.txt"
    p.write_text("% header\n1.5, 0.2\n-0.3, 0.1\n")
    c = loaders.load_controls(str(p))
    assert c.shape == (2, 2)
    assert c[1, 0] == np.float32(-0.3)


def test_load_timestamps_missing():
    assert loaders.load_timestamps("/nonexistent/times.txt") is None


def test_pad_measurement_sets():
    sets = loaders.load_measurements(
        "/root/reference/matlab/measurements_synth_ackerman.txt")
    rb, labels, valid = loaders.pad_measurement_sets(sets[:10], 64)
    assert rb.shape == (10, 64, 2)
    assert valid[0].sum() == 28
    assert (rb[0, 28:] == 0).all()


def test_state_estimate_log_roundtrip(tmp_path):
    n, f = 4, 3
    pose = np.array([1.5, -2.0, 0.3, 0, 0, 0])
    w = np.array([0.9, 0.0, 0.4])          # zero-weight slot skipped
    mean = np.arange(f * 2).reshape(f, 2).astype(float)
    cov = np.tile(np.eye(2) * 0.5, (f, 1, 1))
    lw = np.full(n, -np.log(n))
    poses = np.tile(pose, (n, 1))
    path = logs.write_state_estimate_log(
        str(tmp_path), 7, pose, w, mean, cov,
        particle_log_weights=lw, particle_poses=poses,
        resample_idx=np.arange(n), max_cardinality=10)
    assert path.endswith("state_estimate00007.log")
    d = logs.read_state_estimate_log(path)
    assert np.allclose(d["pose"], pose)
    assert d["static"].shape == (2, 7)      # 2 nonzero-weight features
    assert np.allclose(d["static"][:, 0], [0.9, 0.4])
    # batch_analyze.py stride-7 contract: w, mx, my, cov4
    assert np.allclose(d["static"][0, 1:3], mean[0])
    assert d["weights"].shape == (n,)
    assert d["poses"].shape == (n, 6)
    assert d["cardinality"].shape == (11,)
    assert (d["cardinality"] == 0).all()


def test_log_shotgun_padding(tmp_path):
    """At t=0 weights/poses lines repeat nPredictParticles times
    (src/main.cpp:902-910)."""
    pose = np.zeros(6)
    lw = np.array([-0.7, -0.7])
    poses = np.zeros((2, 6))
    path = logs.write_state_estimate_log(
        str(tmp_path), 0, pose, np.zeros(0), np.zeros((0, 2)),
        np.zeros((0, 2, 2)), particle_log_weights=lw, particle_poses=poses,
        resample_idx=np.arange(2), max_cardinality=3, repeat=3)
    d = logs.read_state_estimate_log(path)
    assert d["weights"].shape == (6,)
    assert d["poses"].shape == (6, 6)


def test_state_estimate_log_roundtrip_disparity(tmp_path):
    """Disparity logs (12-DOF camera pose, 3-D feature Gaussians) are
    auto-detected by the reader: stride-13 map rows, 12-wide particle
    poses."""
    n, f = 3, 2
    pose = np.arange(12, dtype=float) * 0.1
    w = np.array([0.8, 0.6])
    mean = np.array([[400.0, 300.0, 200.0], [100.0, 150.0, 250.0]])
    cov = np.tile(np.diag([25.0, 25.0, 4900.0]), (f, 1, 1))
    lw = np.full(n, -np.log(n))
    poses = np.tile(pose, (n, 1))
    path = logs.write_state_estimate_log(
        str(tmp_path), 3, pose, w, mean, cov,
        particle_log_weights=lw, particle_poses=poses,
        resample_idx=np.arange(n), max_cardinality=10)
    d = logs.read_state_estimate_log(path)
    assert np.allclose(d["pose"], pose)
    assert d["static"].shape == (f, 13)
    assert np.allclose(d["static"][:, 0], w)
    assert np.allclose(d["static"][0, 1:4], mean[0])
    assert np.allclose(d["static"][0, 4:].reshape(3, 3).T, cov[0])
    assert d["poses"].shape == (n, 12)
