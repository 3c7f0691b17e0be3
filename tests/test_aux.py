"""Auxiliary subsystems: checkpoint/resume, .mat export, batch harness,
plot rendering."""

import pytest

import os

import numpy as np
import jax
import jax.numpy as jnp

from phdslam_tpu.filter.state import Measurements, SlamState
from phdslam_tpu.filter.step import slam_step
from phdslam_tpu import checkpoint as ckpt


def _one_step(state, cfg, seed=0):
    m = cfg.maxMeasurements
    z = Measurements(
        rb=jnp.zeros((m, 2)).at[0].set(jnp.asarray([4.0, 0.2])),
        label=jnp.zeros((m,), jnp.int32),
        valid=jnp.zeros((m,), bool).at[0].set(True))
    key = jax.random.PRNGKey(seed)
    return slam_step(state, key, (jnp.float32(1.0), jnp.float32(0.0)), z,
                     jnp.float32(1.0), jnp.asarray(True), cfg)


@pytest.mark.slow
def test_checkpoint_roundtrip(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    state = SlamState.create(cfg)
    state, _ = _one_step(state, cfg)
    key = jax.random.PRNGKey(42)
    path = ckpt.save_checkpoint(str(tmp_path), 7, state, key)
    assert os.path.exists(path)
    restored, rkey, step = ckpt.restore_checkpoint(path)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(rkey), np.asarray(key))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # exact resume: stepping the restored state gives identical results
    s1, _ = _one_step(state, cfg, seed=1)
    s2, _ = _one_step(restored, cfg, seed=1)
    np.testing.assert_array_equal(np.asarray(s1.pose), np.asarray(s2.pose))


def test_checkpoint_retention_and_latest(tiny_cfg, tmp_path):
    state = SlamState.create(tiny_cfg)
    key = jax.random.PRNGKey(0)
    for t in [1, 2, 3, 4, 5]:
        ckpt.save_checkpoint(str(tmp_path), t, state, key, keep=3)
    files = [f for f in os.listdir(tmp_path) if f.startswith("ckpt_")]
    assert len(files) == 3
    assert ckpt.latest_checkpoint(str(tmp_path)).endswith("ckpt_000005.npz")


@pytest.mark.slow
def test_mat_export_roundtrip(tiny_cfg, tmp_path):
    from scipy.io import loadmat

    from phdslam_tpu.io.matdump import write_particles_mat

    cfg = tiny_cfg
    state = SlamState.create(cfg)
    state, _ = _one_step(state, cfg)
    path = write_particles_mat(str(tmp_path), 3, jax.device_get(state))
    assert path.endswith("particles00003.mat")
    d = loadmat(path, squeeze_me=False)
    p = d["particles"][0, 0]
    assert p["states"].shape == (6, cfg.n_particles)
    assert p["weights"].size == cfg.n_particles
    # maps_static is a 1xN struct array (write_map_mat, src/main.cpp:503-556)
    ms = p["maps_static"]
    assert ms.shape == (1, cfg.n_particles)
    e = ms[0, 0]
    assert e["means"].shape[0] == 2
    assert e["covs"].shape[:2] == (2, 2)
    from phdslam_tpu.io.matdump import read_particles_mat
    back = read_particles_mat(path)
    np.testing.assert_allclose(back["weights"],
                               np.asarray(state.log_weights), rtol=1e-6)


@pytest.mark.slow
def test_batch_harness_and_plots(tiny_cfg, tmp_path):
    from phdslam_tpu.eval.batch import aggregate, analyze_run, run_batch
    from phdslam_tpu.eval.plots import plot_error_curves
    from phdslam_tpu.simdata import make_scenario

    cfg = tiny_cfg.replace(stdEncoder=0.05, stdAlpha=0.005)
    rng = np.random.default_rng(0)
    sc = make_scenario(rng, n_landmarks=8, n_steps=15, clutter_rate=1.0)
    results = run_batch(cfg, sc, n_runs=2, control_noise=(0.05, 0.005),
                        out_dir=str(tmp_path))
    assert len(results) == 2
    for r in results:
        assert np.isfinite(r.pose_err).all()
        # Monte-Carlo OSPA pipeline: map OSPA scored vs cumulative visited
        # landmarks every step (collect_maps_every default 1)
        assert np.isfinite(r.ospa).all(), r.ospa
        assert (r.ospa[:, 0] >= 0).all()
    agg = aggregate(results)
    assert agg["pose_err_mean"].shape == (16,)
    assert "ospa_mean" in agg and np.isfinite(agg["ospa_mean"]).all()
    out = plot_error_curves(agg, str(tmp_path / "errors.png"))
    assert os.path.exists(out)
    assert os.path.exists(tmp_path / "batch_metrics.jsonl")
    import json
    rec = json.loads(open(tmp_path / "batch_metrics.jsonl").readline())
    assert rec["mean_ospa"] is not None and np.isfinite(rec["mean_ospa"])


def test_render_log_frames(tiny_cfg, tmp_path):
    from phdslam_tpu.eval.plots import render_log_dir
    from phdslam_tpu.io import logs

    # write two tiny synthetic logs
    pose = np.array([1.0, 2.0, 0.1, 0, 0, 0])
    w = np.array([0.9, 0.5])
    mean = np.array([[3.0, 1.0], [5.0, -2.0]])
    cov = np.tile(np.eye(2) * 0.05, (2, 1, 1))
    lw = np.full(4, -np.log(4))
    poses = np.tile(pose, (4, 1))
    for t in range(2):
        logs.write_state_estimate_log(
            str(tmp_path), t, pose, w, mean, cov,
            particle_log_weights=lw, particle_poses=poses,
            resample_idx=np.arange(4), max_cardinality=4)
    n = render_log_dir(str(tmp_path), str(tmp_path / "frame.png"), every=1)
    assert n == 2
    assert os.path.exists(tmp_path / "frame_00000.png")
    assert os.path.exists(tmp_path / "frame_00001.png")


def test_html_player_build(tmp_path, tiny_cfg):
    """build_player bundles a log dir into a standalone HTML file with
    parseable embedded frames (the interactive-replay counterpart of
    python/plot_phdslam.py:219-228, headless-compatible)."""
    import json
    import re

    import numpy as np

    from phdslam_tpu.eval.player import build_player
    from phdslam_tpu.io import logs

    for t in range(3):
        logs.write_state_estimate_log(
            str(tmp_path), t, np.arange(6, dtype=float),
            np.array([1.0, 0.5]), np.array([[1.0, 2.0], [3.0, 4.0]]),
            np.tile(np.eye(2) * 0.1, (2, 1, 1)),
            particle_log_weights=np.full(4, -np.log(4)),
            particle_poses=np.zeros((4, 6)),
            resample_idx=np.arange(4),
            max_cardinality=tiny_cfg.maxCardinality)
    out = build_player(str(tmp_path))
    html = open(out).read()
    d = json.loads(re.search(r"const DATA = (\{.*?\});\n", html,
                             re.S).group(1))
    assert len(d["frames"]) == 3
    assert len(d["frames"][0]["map"]) == 2
    assert d["frames"][0]["card"] == 1.5   # intensity mass (PHD log)


def test_matplotlib_logplayer(tmp_path, tiny_cfg):
    """LogPlayer (the plot_phdslam.py GUI counterpart) steps frames and
    handles key events headlessly on Agg."""
    import matplotlib
    matplotlib.use("Agg")

    from phdslam_tpu.eval.player import LogPlayer, _load_records
    from phdslam_tpu.io import logs

    for t in range(3):
        logs.write_state_estimate_log(
            str(tmp_path), t, np.array([float(t), 1.0, 0.1, 0, 0, 0]),
            np.array([1.0, 0.5]), np.array([[1.0, 2.0], [3.0, 4.0]]),
            np.tile(np.eye(2) * 0.1, (2, 1, 1)),
            particle_log_weights=np.full(4, -np.log(4)),
            particle_poses=np.zeros((4, 6)),
            resample_idx=np.arange(4),
            max_cardinality=tiny_cfg.maxCardinality)
    player = LogPlayer(_load_records(str(tmp_path)),
                       true_map=np.array([[1.0, 2.0]]))
    assert player.n_steps == 3
    assert np.allclose(player.card_est, 1.5)      # intensity mass
    player.show_frame(2)
    assert player.frame == 2
    assert np.allclose(player.l_pose.get_xdata(), [2.0])
    # both features above min_weight=0.33 -> two live ellipse artists
    live = [ln for ln in player.l_ellipses if len(ln.get_xdata())]
    assert len(live) == 2
    # keyboard contract: left steps back, space toggles play
    class _Evt:
        def __init__(self, key):
            self.key = key
    player._on_key(_Evt("left"))
    assert player.frame == 1
    player._on_key(_Evt(" "))
    assert player.playing
    player._on_key(_Evt(" "))
    assert not player.playing
    player._on_key(_Evt("escape"))


def test_disparity_projection_helper():
    """_project_disparity_record maps 12-DOF camera records to top-down
    (x, z) rows; 2-D records pass through untouched."""
    from phdslam_tpu.eval.player import _project_disparity_record

    cov = np.arange(9, dtype=float)  # column-major 3x3
    rec = dict(pose=np.arange(12, dtype=float),
               static=np.concatenate([[0.9, 10.0, 20.0, 30.0],
                                      cov])[None, :],
               poses=np.tile(np.arange(12, dtype=float), (4, 1)),
               weights=np.zeros(4), cardinality=np.zeros(0))
    out = _project_disparity_record(rec)
    assert out["pose"].tolist() == [0.0, 2.0, 5.0]       # x, z, yaw-ish
    assert out["poses"].shape == (4, 2)
    # [w, x, z, Cxx, Cxz, Czz, Czz]: cov cols 4+0, 4+6, 4+8
    assert out["static"][0].tolist() == [0.9, 10.0, 30.0, 0.0, 6.0,
                                         8.0, 8.0]
    rec2d = dict(pose=np.zeros(6), static=np.zeros((0, 7)),
                 poses=np.zeros((2, 6)))
    assert _project_disparity_record(rec2d)["pose"].size == 6
