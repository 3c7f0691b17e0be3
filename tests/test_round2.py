"""Round-2 operational-wiring tests: scan-mode log contract, dynamic-map
logging, stale-control reuse, save_prediction, variance export, in-loop
OSPA (--truth), and the cfg.debug NaN-locating path."""

import json
import os

import numpy as np
import pytest

from phdslam_tpu import runner
from phdslam_tpu.io.logs import read_state_estimate_log



pytestmark = pytest.mark.slow  # heavy e2e/interpret tests; unit core excludes via -m 'not slow'

@pytest.fixture()
def tiny_run(tmp_path):
    cfg_path = tmp_path / "t.cfg"
    base = open("cfg/ackerman_synth.cfg").read()
    base = base.replace("n_steps = -1", "n_steps = 6")
    base += "\nn_particles = 8\nmax_features = 16\nmax_measurements = 8\n"
    cfg_path.write_text(base)

    rng = np.random.default_rng(0)
    lines = ["% header: one time step per line"]
    for t in range(6):
        pairs = [f"{rng.uniform(1, 9):.3f} {rng.uniform(-1, 1):.3f}"
                 for _ in range(4)]
        lines.append(" ".join(pairs))
    meas_path = tmp_path / "meas.txt"
    meas_path.write_text("\n".join(lines) + "\n")
    ctrl_path = tmp_path / "ctrl.txt"
    ctrl_path.write_text("\n".join("1.0 0.02" for _ in range(6)) + "\n")
    return cfg_path, meas_path, ctrl_path, tmp_path


def test_scan_mode_matches_loop_log_contract(tiny_run):
    """--mode scan must produce the same log-file set and per-file shape
    contract loop mode does (VERDICT round 1 item 4)."""
    cfg, meas, ctrl, tmp = tiny_run
    out_l, out_s = tmp / "loop", tmp / "scan"
    for mode, out in (("loop", out_l), ("scan", out_s)):
        runner.main([str(cfg), "synth", "--mode", mode, "--out-dir",
                     str(out), "--measurements", str(meas),
                     "--controls", str(ctrl)])
    files_l = sorted(f for f in os.listdir(out_l)
                     if f.startswith(("state_estimate", "loopTime",
                                      "metrics")))
    files_s = sorted(f for f in os.listdir(out_s)
                     if f.startswith(("state_estimate", "loopTime",
                                      "metrics")))
    assert files_l == files_s
    for t in range(6):
        a = read_state_estimate_log(
            str(out_l / f"state_estimate{t:05d}.log"))
        b = read_state_estimate_log(
            str(out_s / f"state_estimate{t:05d}.log"))
        assert a["pose"].shape == b["pose"].shape == (6,)
        assert a["weights"].shape == b["weights"].shape
        assert a["poses"].shape == b["poses"].shape
        assert a["resample_idx"].shape == b["resample_idx"].shape
        assert a["static"].shape[1] == b["static"].shape[1] == 7
        assert np.isfinite(b["pose"]).all()
    # metrics.jsonl parses with the same keys
    rec_l = json.loads(open(out_l / "metrics.jsonl").readline())
    rec_s = json.loads(open(out_s / "metrics.jsonl").readline())
    assert set(rec_l) == set(rec_s)


def test_mixed_run_logs_dynamic_map(tiny_run):
    """A MIXED-model run must write the dynamic map as log line 3 with
    stride-21 features (src/main.cpp:884-900; matlab stride-21 parsing)."""
    cfg, meas, ctrl, tmp = tiny_run
    text = open(cfg).read() + "\nfeature_model = 2\nbirth_weight = 0.05\n"
    cfg2 = tmp / "mixed.cfg"
    cfg2.write_text(text)
    out = tmp / "mixed_out"
    runner.main([str(cfg2), "synth", "--out-dir", str(out),
                 "--measurements", str(meas), "--controls", str(ctrl)])
    got_dynamic = False
    for t in range(6):
        d = read_state_estimate_log(
            str(out / f"state_estimate{t:05d}.log"))
        assert d["dynamic"].shape[1] == 21
        got_dynamic = got_dynamic or d["dynamic"].shape[0] > 0
    assert got_dynamic, "dynamic map never appeared in log line 3"


def test_scan_mode_mixed_logs_dynamic_map(tiny_run):
    cfg, meas, ctrl, tmp = tiny_run
    text = open(cfg).read() + "\nfeature_model = 2\nbirth_weight = 0.05\n"
    cfg2 = tmp / "mixed.cfg"
    cfg2.write_text(text)
    out = tmp / "mixed_scan"
    runner.main([str(cfg2), "synth", "--mode", "scan", "--out-dir",
                 str(out), "--measurements", str(meas),
                 "--controls", str(ctrl)])
    got = any(read_state_estimate_log(
        str(out / f"state_estimate{t:05d}.log"))["dynamic"].shape[0] > 0
        for t in range(6))
    assert got


def test_stale_control_reuse_on_measurement_only_steps():
    """Timestamped measurement-only steps must reuse the previous control
    (src/main.cpp:1193-1203), not substitute zeros."""
    meas_times = [0.5, 1.0, 1.5]
    ctrl_times = [0.4, 1.2, 1.6]
    sched = runner.schedule_inputs(10, None, None, meas_times, ctrl_times)
    # step 0: ctrl 0 consumed (0.4 < 0.5); step 1: measurement-only at 0.5
    # -> reuses control 0; etc.
    meas_only = [s for s in sched if s["z"] is not None and s["c"] is not None
                 and s["dt"] is not None]
    zc = [(s["z"], s["c"]) for s in sched]
    # the measurement at t=0.5 comes after control 0 was consumed: its step
    # must carry c=0 (stale), not None
    step_for_z0 = next(s for s in sched if s["z"] == 0)
    assert step_for_z0["c"] == 0, (zc, sched)


def test_first_measurement_before_any_control_has_no_control():
    meas_times = [0.1, 0.9]
    ctrl_times = [0.5, 1.0]
    sched = runner.schedule_inputs(10, None, None, meas_times, ctrl_times)
    step_for_z0 = next(s for s in sched if s["z"] == 0)
    assert step_for_z0["c"] is None


def test_save_prediction_writes_mat(tiny_run):
    cfg, meas, ctrl, tmp = tiny_run
    text = open(cfg).read() + "\nsave_prediction = 1\n"
    cfg2 = tmp / "sp.cfg"
    cfg2.write_text(text)
    out = tmp / "sp_out"
    runner.main([str(cfg2), "synth", "--out-dir", str(out),
                 "--measurements", str(meas), "--controls", str(ctrl)])
    preds = [f for f in os.listdir(out)
             if f.startswith("particles_predict")]
    assert len(preds) == 6
    from scipy.io import loadmat
    d = loadmat(out / "particles_predict00003.mat")
    assert "states" in d or "particles" in d or len(d) > 3


def test_variance_export_positive(tiny_run):
    """--variance must produce strictly positive MC variance estimates
    after an update (phdVarianceKernel, src/phdfilter.cu:3585-3597)."""
    import jax
    import jax.numpy as jnp
    from phdslam_tpu.config import load_config
    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import slam_step

    cfg = load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=8, maxFeatures=16, maxMeasurements=8, y0=0.0)
    state = SlamState.create(cfg)
    z = Measurements.pad([3.0, 5.0, 7.0], [0.2, -0.3, 0.6],
                         max_measurements=8)
    key = jax.random.PRNGKey(0)
    state, aux = slam_step(state, key, (jnp.float32(1.0), jnp.float32(0.0)),
                           z, jnp.float32(0.1), jnp.asarray(False), cfg,
                           with_variance=True)
    var = np.asarray(state.variances)
    assert var.shape == (8,)
    assert (var > 0).all(), var


def test_variance_cli_flag(tiny_run):
    cfg, meas, ctrl, tmp = tiny_run
    out = tmp / "var_out"
    runner.main([str(cfg), "synth", "--out-dir", str(out),
                 "--measurements", str(meas), "--controls", str(ctrl),
                 "--variance", "--mat-export"])
    from scipy.io import loadmat
    d = loadmat(out / "particles00003.mat")
    # field renamed 'variances' -> 'vars' to match the matio writer's
    # layout (round 4); read_particles_mat keeps a legacy fallback
    var = np.asarray(d["particles"][0, 0]["vars"]).ravel()
    assert (var > 0).all(), var


def test_truth_flag_adds_ospa_column(tiny_run):
    cfg, meas, ctrl, tmp = tiny_run
    truth = tmp / "truth.txt"
    truth.write_text("1.0 2.0\n4.0 -1.0\n6.0 3.0\n")
    for mode in ("loop", "scan"):
        out = tmp / f"ospa_{mode}"
        runner.main([str(cfg), "synth", "--mode", mode, "--out-dir",
                     str(out), "--measurements", str(meas),
                     "--controls", str(ctrl), "--truth", str(truth)])
        recs = [json.loads(l) for l in open(out / "metrics.jsonl")]
        assert all("ospa" in r for r in recs)
        assert all(len(r["ospa"]) == 3 for r in recs)
        assert all(np.isfinite(r["ospa"]).all() for r in recs)


def test_debug_nan_located():
    """cfg.debug routes through jax_debug_nans: a seeded NaN must raise a
    located FloatingPointError instead of silently propagating
    (SURVEY.md section 5.2; reference aborts, src/main.cpp:1307-1311)."""
    import jax
    import jax.numpy as jnp
    from phdslam_tpu.config import load_config
    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import slam_step

    cfg = load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=8, maxFeatures=16, maxMeasurements=8, y0=0.0,
        debug=True)
    state = SlamState.create(cfg)
    state = state.replace(
        log_weights=state.log_weights.at[0].set(jnp.nan))
    z = Measurements.pad([3.0], [0.2], max_measurements=8)
    key = jax.random.PRNGKey(0)
    jax.config.update("jax_debug_nans", True)
    try:
        with pytest.raises(FloatingPointError):
            state, aux = slam_step(
                state, key, (jnp.float32(1.0), jnp.float32(0.0)), z,
                jnp.float32(0.1), jnp.asarray(False), cfg)
            np.asarray(aux.neff)
    finally:
        jax.config.update("jax_debug_nans", False)


def test_island_scan_mode_writes_logs(tiny_run):
    """Island scan mode must produce the same log-file set plain scan mode
    does (round-1 gap: islands scan wrote only loopTime.log)."""
    cfg, meas, ctrl, tmp = tiny_run
    out = tmp / "island_scan"
    truth = tmp / "truth_i.txt"
    truth.write_text("1.0 2.0\n4.0 -1.0\n")
    runner.main([str(cfg), "synth", "--mode", "scan", "--islands", "4",
                 "--out-dir", str(out), "--measurements", str(meas),
                 "--controls", str(ctrl), "--truth", str(truth)])
    files = sorted(os.listdir(out))
    est = [f for f in files if f.startswith("state_estimate")]
    assert len(est) == 6
    assert "metrics.jsonl" in files
    d = read_state_estimate_log(str(out / est[-1]))
    assert d["pose"].shape == (6,) and np.isfinite(d["pose"]).all()
    assert d["weights"].shape == (8,)        # all P particles, global lw
    # global log weights must be normalized (sum exp == 1)
    assert abs(np.exp(d["weights"]).sum() - 1.0) < 1e-3
    recs = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert all("ospa" in r for r in recs)


def test_follow_trajectory_mode(tiny_run):
    """follow_trajectory=1 pins a single particle to traj.txt
    (src/main.cpp:1121-1127, 1239-1243)."""
    cfg, meas, ctrl, tmp = tiny_run
    text = open(cfg).read() + "\nfollow_trajectory = 1\n"
    cfg2 = tmp / "ft.cfg"
    cfg2.write_text(text)
    traj = tmp / "traj.txt"
    rows = [f"{0.5*t} {0.25*t} 0.1 0 0 0" for t in range(6)]
    traj.write_text("% traj\n" + "\n".join(rows) + "\n")
    out = tmp / "ft_out"
    runner.main([str(cfg2), "synth", "--out-dir", str(out),
                 "--measurements", str(meas), "--controls", str(ctrl),
                 "--data-dir", str(tmp)])
    for t in range(6):
        d = read_state_estimate_log(str(out / f"state_estimate{t:05d}.log"))
        assert d["poses"].shape[0] == 1          # forced single particle
        assert abs(d["pose"][0] - 0.5 * t) < 1e-4, (t, d["pose"])
        assert abs(d["pose"][1] - 0.25 * t) < 1e-4


def test_predict_time_flag(tiny_run):
    cfg, meas, ctrl, tmp = tiny_run
    out = tmp / "pt_out"
    runner.main([str(cfg), "synth", "--out-dir", str(out),
                 "--measurements", str(meas), "--controls", str(ctrl),
                 "--predict-time"])
    times = np.loadtxt(out / "predicttime.log")
    assert times.size == 5      # steps 1..5 (no predict at t=0)
    assert (np.atleast_1d(times) >= 0).all()
