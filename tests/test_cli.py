"""Runner CLI surface tests (in-process main(), tiny configs).

The heavier dataset drives live in the verify recipe
(.claude/skills/verify/SKILL.md); these keep the argument wiring, log
contract, and both execution modes covered in CI.
"""

import os

import numpy as np
import pytest


@pytest.fixture()
def tiny_run(tmp_path, tiny_cfg):
    """Write a tiny cfg + measurement file pair."""
    cfg_path = tmp_path / "t.cfg"
    base = open("cfg/ackerman_synth.cfg").read()
    base = base.replace("n_steps = -1", "n_steps = 6")
    base += "\nn_particles = 8\nmax_features = 16\nmax_measurements = 8\n"
    cfg_path.write_text(base)

    rng = np.random.default_rng(0)
    lines = ["% header: one time step per line"]
    for t in range(6):
        pairs = []
        for _ in range(4):
            pairs.append(f"{rng.uniform(1, 9):.3f} "
                         f"{rng.uniform(-1, 1):.3f}")
        lines.append(" ".join(pairs))
    meas_path = tmp_path / "meas.txt"
    meas_path.write_text("\n".join(lines) + "\n")

    ctrl_path = tmp_path / "ctrl.txt"
    ctrl_path.write_text("\n".join("1.0 0.02" for _ in range(6)) + "\n")
    return cfg_path, meas_path, ctrl_path, tmp_path


def _run(argv):
    from phdslam_tpu import runner

    return runner.main(argv)


def test_cli_loop_mode(tiny_run):
    cfg, meas, ctrl, tmp = tiny_run
    out = tmp / "out"
    _run([str(cfg), "synth", "--out-dir", str(out),
          "--measurements", str(meas), "--controls", str(ctrl)])
    logs = sorted(os.listdir(out))
    assert "loopTime.log" in logs and "metrics.jsonl" in logs
    est = [f for f in logs if f.startswith("state_estimate")]
    assert len(est) == 6
    first = open(out / est[0]).read().strip().splitlines()
    assert len(first) >= 6          # 6/7-line reference format
    pose = np.fromstring(first[0], sep=" ")
    assert pose.shape[0] == 6 and np.isfinite(pose).all()


def test_cli_scan_mode(tiny_run):
    cfg, meas, ctrl, tmp = tiny_run
    out = tmp / "outscan"
    res = _run([str(cfg), "synth", "--mode", "scan", "--out-dir", str(out),
                "--measurements", str(meas), "--controls", str(ctrl)])
    assert res is None or True      # main returns None; no crash == pass
    assert os.path.exists(out / "loopTime.log")


@pytest.mark.slow
def test_cli_islands_cphd(tiny_run):
    """CPHD now runs in island mode (z_prev birth threading through the
    shard_map step)."""
    cfg, meas, ctrl, tmp = tiny_run
    text = open(cfg).read().replace("filter_type = 0", "filter_type = 1")
    text += "\nmax_cardinality = 31\n"
    cfg2 = tmp / "cphd.cfg"
    cfg2.write_text(text)
    out = tmp / "cphd_islands"
    _run([str(cfg2), "synth", "--out-dir", str(out),
          "--measurements", str(meas), "--controls", str(ctrl),
          "--islands", "4"])
    import json
    recs = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert len(recs) == 6
    assert all(np.isfinite(r["neff"]) for r in recs)


def test_cli_fastslam(tiny_run):
    """FastSLAM (filter_type = 2) through the full CLI surface: same log
    contract as the PHD path (the runner treats the EKF map's evidence
    counters as the weight channel, so logging/estimate/checkpoint apply
    unchanged)."""
    cfg, meas, ctrl, tmp = tiny_run
    text = open(cfg).read().replace("filter_type = 0", "filter_type = 2")
    cfg2 = tmp / "fs.cfg"
    cfg2.write_text(text)
    out = tmp / "fs_out"
    _run([str(cfg2), "synth", "--out-dir", str(out),
          "--measurements", str(meas), "--controls", str(ctrl)])
    import json
    recs = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert len(recs) == 6
    assert all(np.isfinite(r["neff"]) for r in recs)
    est = sorted(f for f in os.listdir(out)
                 if f.startswith("state_estimate"))
    assert len(est) == 6
    pose = np.fromstring(
        open(out / est[-1]).read().strip().splitlines()[0], sep=" ")
    assert pose.shape[0] == 6 and np.isfinite(pose).all()


def test_cli_player_flag(tiny_run):
    """--player bundles the run's logs into out-dir/player.html."""
    cfg, meas, ctrl, tmp = tiny_run
    out = tmp / "outp"
    _run([str(cfg), "synth", "--out-dir", str(out),
          "--measurements", str(meas), "--controls", str(ctrl),
          "--player"])
    html = open(out / "player.html").read()
    assert "const DATA" in html and '"frames"' in html
