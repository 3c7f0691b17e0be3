"""Batch Monte-Carlo harness + error analysis.

Rebuild of the reference's evaluation pipeline (SURVEY.md section 3.5):
  python/generate_simdata.py -> N noisy re-noisings of one ground truth
  python/batch_run.py        -> one process per run dir
  python/batch_analyze.py    -> per-step pose error + OSPA, aggregated

TPU-first difference: instead of a process per run, Monte-Carlo runs become
one extra vmapped/batched axis — every run shares the compiled step, and
all runs execute in a single `lax.scan` by stacking the run axis into the
particle axis blockwise (runs are independent, so the particle axis simply
carries R*P particles whose weights normalize per run).

For exactness (per-run weight normalization and resampling), the simple and
correct strategy used here runs the scan per run sequentially but with a
single compiled executable — compile once, run R times; the dense per-step
math still saturates the chip.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from phdslam_tpu.config import SlamConfig
from phdslam_tpu.ops.ospa import ospa_np


@dataclass
class RunResult:
    poses: np.ndarray          # [T, 6] expected poses
    pose_err: np.ndarray       # [T]
    ospa: np.ndarray           # [T, 3] (ospa, loc, card) or NaN if no gt map
    neff: np.ndarray           # [T]
    ms_per_step: float


def analyze_run(poses, true_traj, map_estimates=None, true_maps=None,
                p=1.0, c=5.0):
    """Per-step pose error and OSPA (batch_analyze.py:16-35 semantics:
    pose error on (x, y); map thresholded by round(sum w) top weights)."""
    t_len = min(len(poses), true_traj.shape[0])
    pose_err = np.linalg.norm(
        np.asarray(poses)[:t_len, :2] - true_traj[:t_len, :2], axis=1)
    ospa = np.full((t_len, 3), np.nan)
    if map_estimates is not None and true_maps is not None:
        for t in range(t_len):
            w, mean = map_estimates[t]
            gt = true_maps[t]
            if gt is None or len(gt) == 0:
                continue
            sel = np.argsort(-w)[: int(round(w.sum()))]
            ospa[t] = ospa_np(gt, mean[sel], p=p, c=c)
    return pose_err, ospa


def run_batch(cfg: SlamConfig, scenario, n_runs: int,
              control_noise=(0.2, 0.01), seed: int = 0,
              out_dir: Optional[str] = None,
              collect_maps_every: int = 0) -> List[RunResult]:
    """Monte-Carlo batch: `n_runs` independent re-noisings of `scenario`
    (a simdata.Scenario), each filtered end-to-end with the shared compiled
    scan. Returns per-run results; optionally writes metrics JSONL."""
    import jax
    import jax.numpy as jnp

    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import run_scan
    from phdslam_tpu.io.loaders import MeasurementSet, pad_measurement_sets
    from phdslam_tpu.simdata import generate_run

    results = []
    t_len = scenario.traj.shape[0]
    for run in range(n_runs):
        rng = np.random.default_rng(seed + 1000 * run)
        controls, meas = generate_run(rng, scenario, control_noise)
        sets = [MeasurementSet(z[:, 0], z[:, 1],
                               np.zeros(len(z), np.int32)) for z in meas]
        rb, labels, valid = pad_measurement_sets(sets, cfg.maxMeasurements)
        ctrl = np.zeros((t_len, 2), np.float32)
        ctrl[1:] = controls[: t_len - 1]
        zs = Measurements(rb=jnp.asarray(rb[:t_len]),
                          label=jnp.asarray(labels[:t_len]),
                          valid=jnp.asarray(valid[:t_len]))
        t0 = time.time()
        final, auxs = run_scan(
            SlamState.create(cfg), jax.random.PRNGKey(seed + run),
            jnp.asarray(ctrl), zs,
            jnp.full((t_len,), cfg.dt, jnp.float32), cfg, t_len)
        # host fetch is the only reliable sync through the TPU tunnel
        # (block_until_ready is a no-op there -> fictional timings)
        poses = np.asarray(auxs.expected_pose)
        elapsed = time.time() - t0
        pose_err, _ = analyze_run(poses, scenario.traj)
        results.append(RunResult(
            poses=poses, pose_err=pose_err,
            ospa=np.full((t_len, 3), np.nan),
            neff=np.asarray(auxs.neff),
            ms_per_step=elapsed / t_len * 1000))
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "batch_metrics.jsonl"),
                      "a") as f:
                f.write(json.dumps(dict(
                    run=run, mean_pose_err=float(pose_err.mean()),
                    final_pose_err=float(pose_err[-1]),
                    ms_per_step=results[-1].ms_per_step)) + "\n")
    return results


def aggregate(results: List[RunResult]):
    """Mean +- std error envelopes over runs (plot_results.py:21-66)."""
    t_len = min(len(r.pose_err) for r in results)
    pe = np.stack([r.pose_err[:t_len] for r in results])
    return dict(
        pose_err_mean=pe.mean(0), pose_err_std=pe.std(0),
        ms_per_step=[r.ms_per_step for r in results])


def analyze_log_dir(log_dir: str, true_traj, true_map=None, p=1.0, c=5.0):
    """Offline analysis of a directory of state_estimate logs — the direct
    batch_analyze.py equivalent, working on the compatibility log format."""
    import glob

    from phdslam_tpu.io.logs import read_state_estimate_log

    files = sorted(glob.glob(os.path.join(log_dir, "state_estimate*.log")))
    pose_err, ospa, neff = [], [], []
    for t, path in enumerate(files):
        d = read_state_estimate_log(path)
        pose_err.append(np.linalg.norm(d["pose"][:2] - true_traj[:2, t]))
        lw = d["weights"]
        neff.append(1.0 / np.sum(np.exp(lw) ** 2) / len(lw))
        if true_map is not None and d["static"].size:
            w = d["static"][:, 0]
            mean = d["static"][:, 1:3]
            sel = np.argsort(-w)[: int(round(w.sum()))]
            ospa.append(ospa_np(true_map, mean[sel], p=p, c=c))
        else:
            ospa.append((np.nan,) * 3)
    return (np.asarray(pose_err), np.asarray(ospa), np.asarray(neff))
