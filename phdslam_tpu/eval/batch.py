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

Monte-Carlo runs can ride a vmapped leading axis over the whole-run scan
(``vmapped=True``): runs are independent, and vmap preserves per-run
semantics exactly — weight normalization, nEff, and resampling all reduce
over the particle axis only, which stays intact inside the batch. Each
run keeps the same PRNG key it gets on the sequential path
(``PRNGKey(seed + run)``), so the two paths compute the same filter runs;
memory is bounded by chunking the run axis (``vmap_chunk``).

MEASURED (round 3, v5e chip, 50 runs x 331 steps x 256 particles, warm):
the sequential whole-run-scan path wins at the headline shape in EVERY
measurement — vmapped/sequential speedup 0.3-0.7x across repeated runs
(tunnel-state spread) — and is therefore the default. Two structural
reasons: (a) under a batched predicate, ``lax.cond`` lowers to
``select``, so the resampling branch's full-map gather executes on EVERY
step for ALL runs instead of only on nEff-triggered steps; (b) the greedy
merge's data-dependent ``while_loop`` runs to the WORST-CASE trip count
across the whole batch each step, and its per-trip VPU reductions are
bandwidth-bound, so widening the batch scales trip cost ~linearly. The
vmapped axis wins only when per-run work underutilizes the chip (small
particle counts); see results/round3_evidence.json["vmap"] for the
crossover probe. With merge_mode=1 (bounded trip counts, removing reason
(b)) the verdict is unchanged (speedup 0.7-0.85x across repeated runs) —
reason (a) alone still favors the sequential path. The
sequential path is also the parity anchor
(tests/test_round3.py::test_vmapped_batch_matches_sequential).
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
    card_est: Optional[np.ndarray] = None   # [T] estimated total-map
    #   cardinality: sum of the MAP particle's GM weights (the intensity
    #   integral) for BOTH filter types (the reference logs the weight
    #   list + cardinality pmf for offline scoring, main.cpp:937-952)
    card_true: Optional[np.ndarray] = None  # [T] visited-landmark count
    card_en: Optional[np.ndarray] = None    # [T] CPHD only: E[n] of the
    #   MAP particle's posterior pmf — the in-range-submap cardinality
    #   statistic (see cphd.psi_terms), kept for diagnostics


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


def visited_landmarks(scenario) -> List[np.ndarray]:
    """Per-step ground-truth maps: the landmarks that have entered the
    sensor FOV at any step <= t — the semantics of the reference's
    sim.groundTruth[t].loc (SynthSetup2.m builds it cumulatively; OSPA in
    batch_analyze.py:26-33 scores against it)."""
    seen = np.zeros(scenario.landmarks.shape[0], bool)
    out = []
    for pose in scenario.traj:
        d = scenario.landmarks - pose[:2]
        r = np.linalg.norm(d, axis=1)
        b = np.arctan2(d[:, 1], d[:, 0]) - pose[2]
        b = np.arctan2(np.sin(b), np.cos(b))
        seen |= ((r >= scenario.min_range) & (r <= scenario.max_range)
                 & (np.abs(b) <= scenario.max_bearing))
        out.append(scenario.landmarks[seen].copy())
    return out


def _map_ospa_curve(log_auxs, true_maps, every: int, t_len: int,
                    p=1.0, c=5.0) -> np.ndarray:
    """OSPA of the per-step MAP-particle map (thresholded the
    batch_analyze.py:26-28 way) vs the per-step visited-landmark truth."""
    ospa = np.full((t_len, 3), np.nan)
    w_all = np.asarray(log_auxs.map_w)
    mx_all = np.asarray(log_auxs.map_mx)
    my_all = np.asarray(log_auxs.map_my)
    # always score the final step so batch_metrics' final_ospa really is
    # the run's last step, whatever the stride
    steps = sorted(set(range(0, t_len, max(every, 1))) | {t_len - 1})
    for t in steps:
        gt = true_maps[min(t, len(true_maps) - 1)]
        w = w_all[t]
        n_est = int(round(float(w.sum())))
        sel = np.argsort(-w)[: max(n_est, 0)]
        est = np.stack([mx_all[t][sel], my_all[t][sel]], axis=-1)
        ospa[t] = ospa_np(gt, est, p=p, c=c)
    return ospa


def _prepare_run(cfg: SlamConfig, scenario, run: int, seed: int,
                 control_noise, t_len: int):
    """Host-side re-noising for one MC run: (ctrl [T,2], rb [T,M,2],
    labels [T,M], valid [T,M]) numpy arrays. Seeding is the run_batch
    contract: run r uses default_rng(seed + 1000*r)."""
    from phdslam_tpu.io.loaders import MeasurementSet, pad_measurement_sets
    from phdslam_tpu.simdata import generate_run

    rng = np.random.default_rng(seed + 1000 * run)
    controls, meas = generate_run(rng, scenario, control_noise)
    sets = [MeasurementSet(z[:, 0], z[:, 1],
                           np.zeros(len(z), np.int32)) for z in meas]
    rb, labels, valid = pad_measurement_sets(sets, cfg.maxMeasurements)
    ctrl = np.zeros((t_len, 2), np.float32)
    ctrl[1:] = controls[: t_len - 1]
    return ctrl, rb[:t_len], labels[:t_len], valid[:t_len]


def _analyze_one(run: int, poses, auxs_neff, log_auxs, true_maps,
                 collect_maps_every: int, scenario, ms_per_step: float,
                 out_dir: Optional[str]) -> RunResult:
    """Shared per-run post-processing (host): pose error, map OSPA curve,
    optional metrics JSONL line."""
    t_len = scenario.traj.shape[0]
    pose_err, _ = analyze_run(poses, scenario.traj)
    card_est = card_true = card_en = None
    if log_auxs is not None:
        ospa = _map_ospa_curve(log_auxs, true_maps,
                               collect_maps_every, t_len)
        # Total-map cardinality estimate = the MAP particle's intensity
        # mass, for BOTH filter types. The CPHD posterior pmf is the
        # in-range-submap statistic (the reference updates it against
        # in-FOV evidence only, phdfilter.cu.bak:2536-2541 — see
        # cphd.psi_terms); its E[n] tracks the currently-detectable
        # count, not the accumulated map, so it is kept separately.
        card_est = np.asarray(log_auxs.map_w).sum(-1)[:t_len]
        cn = np.asarray(log_auxs.cardinality)            # [T, N+1] or [T, 1]
        if cn.shape[-1] > 1:
            pmf = np.exp(cn - cn.max(-1, keepdims=True))
            pmf /= pmf.sum(-1, keepdims=True)
            card_en = (pmf * np.arange(cn.shape[-1])).sum(-1)[:t_len]
        else:
            card_en = None
        if true_maps is not None:
            card_true = np.asarray(
                [len(true_maps[min(t, len(true_maps) - 1)])
                 for t in range(t_len)], np.float64)
    else:
        ospa = np.full((t_len, 3), np.nan)
    result = RunResult(poses=poses, pose_err=pose_err, ospa=ospa,
                       neff=auxs_neff, ms_per_step=ms_per_step,
                       card_est=card_est, card_true=card_true,
                       card_en=card_en)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        scored = ospa[np.isfinite(ospa[:, 0])]
        with open(os.path.join(out_dir, "batch_metrics.jsonl"), "a") as f:
            f.write(json.dumps(dict(
                run=run, mean_pose_err=float(pose_err.mean()),
                final_pose_err=float(pose_err[-1]),
                mean_ospa=float(scored[:, 0].mean())
                if scored.size else None,
                final_ospa=float(scored[-1, 0])
                if scored.size else None,
                mean_card_err=float(np.abs(card_est - card_true).mean())
                if card_est is not None and card_true is not None else None,
                final_card_err=float(abs(card_est[-1] - card_true[-1]))
                if card_est is not None and card_true is not None else None,
                ms_per_step=ms_per_step)) + "\n")
    return result


def run_batch(cfg: SlamConfig, scenario, n_runs: int,
              control_noise=(0.2, 0.01), seed: int = 0,
              out_dir: Optional[str] = None,
              collect_maps_every: int = 1,
              vmapped: bool = False,
              vmap_chunk: int = 0) -> List[RunResult]:
    """Monte-Carlo batch: `n_runs` independent re-noisings of `scenario`
    (a simdata.Scenario), each filtered end-to-end. Returns per-run
    results; optionally writes metrics JSONL.

    vmapped=True stacks runs on a leading vmap axis over the whole-run
    scan — one dispatch filters a whole chunk of runs (SURVEY §7.2-11).
    Default is the sequential whole-run-scan-per-run path, which is
    MEASURED FASTER at >=256 particles (see the module docstring for the
    numbers and the two structural reasons). vmap_chunk bounds device
    memory (0 = auto: cap the in-flight particle count at 65536, the
    measured single-chip headroom shape). Per-run PRNG keys and noise
    seeds are identical on both paths.

    collect_maps_every=k scores map OSPA (vs the cumulative visited-landmark
    truth) every k steps; 0 disables map scoring (pose error only)."""
    import jax
    import jax.numpy as jnp

    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import run_scan

    t_len = scenario.traj.shape[0]
    # particles must start where the scenario's trajectory starts
    cfg = cfg.replace(x0=float(scenario.traj[0, 0]),
                      y0=float(scenario.traj[0, 1]),
                      yaw0=float(scenario.traj[0, 2]))
    true_maps = visited_landmarks(scenario) if collect_maps_every else None
    with_log = collect_maps_every > 0

    if not vmapped:
        results = []
        for run in range(n_runs):
            ctrl, rb, labels, valid = _prepare_run(
                cfg, scenario, run, seed, control_noise, t_len)
            zs = Measurements(rb=jnp.asarray(rb), label=jnp.asarray(labels),
                              valid=jnp.asarray(valid))
            t0 = time.time()
            out = run_scan(
                SlamState.create(cfg), jax.random.PRNGKey(seed + run),
                jnp.asarray(ctrl), zs,
                jnp.full((t_len,), cfg.dt, jnp.float32), cfg, t_len,
                with_log_state=with_log)
            if with_log:
                final, (auxs, log_auxs) = out
            else:
                final, auxs = out
                log_auxs = None
            # host fetch is the only reliable sync through the TPU tunnel
            # (block_until_ready is a no-op there -> fictional timings)
            poses = np.asarray(auxs.expected_pose)
            elapsed = time.time() - t0
            results.append(_analyze_one(
                run, poses, np.asarray(auxs.neff), log_auxs, true_maps,
                collect_maps_every, scenario, elapsed / t_len * 1000,
                out_dir))
        return results

    # ---- vmapped path: runs stacked on a leading batch axis ----
    if vmap_chunk <= 0:
        vmap_chunk = max(1, 65536 // max(cfg.n_particles, 1))
    # the dynamic measurement count rides an SMEM scalar into the fused
    # kernels, which Pallas cannot batch — static-M loops under vmap
    cfg = cfg.replace(dynamicMeasurementCount=False)
    base_state = SlamState.create(cfg)
    dts = jnp.full((t_len,), cfg.dt, jnp.float32)

    @jax.jit
    def scan_chunk(keys, ctrls, rbs, labels, valids):
        def one(key, ctrl, rb, lab, val):
            zs = Measurements(rb=rb, label=lab, valid=val)
            return run_scan(base_state, key, ctrl, zs, dts, cfg, t_len,
                            with_log_state=with_log)
        return jax.vmap(one)(keys, ctrls, rbs, labels, valids)

    results = []
    for start in range(0, n_runs, vmap_chunk):
        runs = list(range(start, min(start + vmap_chunk, n_runs)))
        prep = [_prepare_run(cfg, scenario, r, seed, control_noise, t_len)
                for r in runs]
        keys = jnp.stack([jax.random.PRNGKey(seed + r) for r in runs])
        ctrls = jnp.asarray(np.stack([p[0] for p in prep]))
        rbs = jnp.asarray(np.stack([p[1] for p in prep]))
        labels = jnp.asarray(np.stack([p[2] for p in prep]))
        valids = jnp.asarray(np.stack([p[3] for p in prep]))
        t0 = time.time()
        out = scan_chunk(keys, ctrls, rbs, labels, valids)
        if with_log:
            _final, (auxs, log_auxs) = out
        else:
            _final, auxs = out
            log_auxs = None
        poses_all = np.asarray(auxs.expected_pose)      # [C, T, 6]
        elapsed = time.time() - t0
        ms = elapsed / (t_len * len(runs)) * 1000
        neff_all = np.asarray(auxs.neff)
        if log_auxs is not None:                        # one bulk fetch
            log_auxs = jax.tree.map(np.asarray, log_auxs)
        for i, run in enumerate(runs):
            la = (jax.tree.map(lambda x, i=i: x[i], log_auxs)
                  if log_auxs is not None else None)
            results.append(_analyze_one(
                run, poses_all[i], neff_all[i], la, true_maps,
                collect_maps_every, scenario, ms, out_dir))
    return results


def aggregate(results: List[RunResult]):
    """Mean +- std error envelopes over runs (plot_results.py:21-66):
    pose error plus the OSPA / localization / cardinality error curves."""
    t_len = min(len(r.pose_err) for r in results)
    pe = np.stack([r.pose_err[:t_len] for r in results])
    out = dict(
        pose_err_mean=pe.mean(0), pose_err_std=pe.std(0),
        ms_per_step=[r.ms_per_step for r in results])
    if all(r.card_est is not None and r.card_true is not None
           for r in results):
        ce = np.stack([np.abs(r.card_est[:t_len] - r.card_true[:t_len])
                       for r in results])                 # [R, T]
        out.update(card_err_mean=ce.mean(0), card_err_std=ce.std(0),
                   card_true=results[0].card_true[:t_len])
    os_ = np.stack([r.ospa[:t_len] for r in results])     # [R, T, 3]
    if np.isfinite(os_).any():
        with np.errstate(invalid="ignore"):
            out.update(
                ospa_mean=np.nanmean(os_[:, :, 0], 0),
                ospa_std=np.nanstd(os_[:, :, 0], 0),
                loc_mean=np.nanmean(os_[:, :, 1], 0),
                loc_std=np.nanstd(os_[:, :, 1], 0),
                card_mean=np.nanmean(os_[:, :, 2], 0),
                card_std=np.nanstd(os_[:, :, 2], 0))
    return out


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
