"""Application driver: the reference's main.cpp re-imagined.

CLI mirrors ``./bin/cuda-PHDSLAM <config.cfg> [synth|disparity] [profile]``
(src/main.cpp:1442-1500):

    python -m phdslam_tpu.runner <config.cfg> [synth] [profile] [options]

Per-step loop (src/main.cpp:1178-1312): timestamp-interleaved input
scheduling when *_times.txt files exist, lockstep otherwise; prediction is
skipped at step 0; measurement update only when the step has measurements;
stratified resampling on the nEff trigger; per-step state_estimate logs +
loopTime.log; a step-100 checkpoint enabling the 'profile' replay mode
(src/main.cpp:1262-1269, 1314-1321).

Two execution modes:
  - ``--mode loop``  (default): python loop over jit steps with host-side
    logging each step — like the reference, observable per step.
  - ``--mode scan``  : whole dataset as one on-device `lax.scan` — the
    benchmark path (logs written from stacked outputs afterwards).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from phdslam_tpu.config import load_config, SlamConfig, CPHD_TYPE
from phdslam_tpu.filter.state import Measurements, SlamState
from phdslam_tpu.filter.step import run_scan, slam_step
from phdslam_tpu.filter import estimate
from phdslam_tpu.io import loaders, logs


def schedule_inputs(n_steps, meas_sets, controls, meas_times, ctrl_times):
    """Produce per-step (measurement_set_index, control_index, dt, do_z)
    following the timestamp interleave of src/main.cpp:1187-1237, or
    lockstep when no timestamps exist (measurement n with control n-1,
    src/main.cpp:1233-1234)."""
    sched = []
    if meas_times is None:
        for n in range(n_steps):
            sched.append(dict(z=n, c=n - 1 if n > 0 else None, dt=None,
                              predict=True))
        return sched
    z_idx, c_idx = 0, 0
    current_time = 0.0
    for n in range(n_steps):
        if z_idx >= len(meas_times) or c_idx >= len(ctrl_times):
            break
        if meas_times[z_idx] < ctrl_times[c_idx]:
            # measurement-only step: the reference keeps the previous
            # current_control and still predicts with it
            # (src/main.cpp:1193-1203) — reuse the last consumed control
            last, current_time = current_time, ctrl_times[c_idx]
            stale_c = c_idx - 1 if c_idx > 0 else None
            sched.append(dict(z=z_idx, c=stale_c, dt=current_time - last,
                              predict=True))
            z_idx += 1
        elif meas_times[z_idx] == ctrl_times[c_idx]:
            last, current_time = current_time, ctrl_times[c_idx]
            sched.append(dict(z=z_idx, c=c_idx, dt=current_time - last,
                              predict=True))
            z_idx += 1
            c_idx += 1
        else:
            last, current_time = current_time, ctrl_times[c_idx]
            sched.append(dict(z=None, c=c_idx, dt=current_time - last,
                              predict=True))
            c_idx += 1
    return sched


def _map_for_log(state, mixture, cfg, eap):
    """MAP (argmax-weight particle) or EAP (weighted concat + greedy reduce)
    estimate of one GM map, as numpy (w, mean, cov) with empty slots dropped
    (recoverSlamState, src/main.cpp:344-379)."""
    if eap:
        return estimate.eap_map_np(
            state.log_weights, mixture.w, mixture.mean, mixture.cov,
            cfg.minSeparation)
    idx = int(np.argmax(np.asarray(state.log_weights)))
    w = np.asarray(mixture.w[idx])
    valid = w > 0
    return (w[valid], np.asarray(mixture.mean[idx])[valid],
            np.asarray(mixture.cov[idx])[valid])


def _cn_estimate_for_log(state):
    """Cardinality distribution for log line 7: the MAP particle's under
    mapEstimate&1 (src/main.cpp:358-361; the reference's mapEstimate&2
    branch zeroes it via cn_estimate.clear(), :372-379 — we keep the MAP
    particle's, the only non-degenerate choice), particle 0 when there is
    only one particle (:385-387)."""
    if state.cardinality is None:
        return None
    lw = np.asarray(state.log_weights)
    idx = int(np.argmax(lw)) if lw.shape[0] > 1 else 0
    return np.asarray(state.cardinality[idx])


def _write_step_log(out_dir, t, state, aux, cfg, eap=False):
    eap = bool(cfg.mapEstimate & 2) or eap
    w, mean, cov = _map_for_log(state, state.map_static, cfg, eap)
    dyn_w = dyn_mean = dyn_cov = None
    if cfg.featureModel != 0 and state.map_dynamic.max_features > 0:
        # dynamic map is log line 3 (src/main.cpp:884-900)
        dyn_w, dyn_mean, dyn_cov = _map_for_log(
            state, state.map_dynamic, cfg, eap)
    repeat = cfg.nPredictParticles if t == 0 else 1
    logs.write_state_estimate_log(
        out_dir, t, np.asarray(aux.expected_pose),
        w, mean, cov,
        dynamic_w=dyn_w, dynamic_mean=dyn_mean, dynamic_cov=dyn_cov,
        particle_log_weights=np.asarray(state.log_weights),
        particle_poses=np.asarray(state.pose),
        resample_idx=np.asarray(state.resample_idx),
        cardinality=_cn_estimate_for_log(state),
        max_cardinality=cfg.maxCardinality,
        is_cphd=cfg.filterType == CPHD_TYPE,
        repeat=repeat)


def run_synth(cfg: SlamConfig, args) -> dict:
    data_dir = args.data_dir or cfg.dataDirectory
    meas_path = args.measurements or os.path.join(data_dir,
                                                  "measurements.txt")
    ctrl_path = args.controls or os.path.join(data_dir, "controls.txt")
    meas_sets = loaders.load_measurements(meas_path,
                                          labeled=cfg.labeledMeasurements)
    controls = loaders.load_controls(ctrl_path)
    meas_times = loaders.load_timestamps(
        os.path.join(data_dir, "measurement_times.txt"))
    ctrl_times = loaders.load_timestamps(
        os.path.join(data_dir, "control_times.txt"))

    traj = None
    if cfg.followTrajectory:
        # follow a preset trajectory with a single particle
        # (src/main.cpp:1121-1127, 1239-1243)
        traj = loaders.load_trajectory(os.path.join(data_dir, "traj.txt"))
        cfg = cfg.replace(n_particles=1)

    n_steps = len(meas_sets)
    if meas_times is not None:
        n_steps = len(meas_times) + len(ctrl_times)
    if cfg.nSteps > 0:
        n_steps = min(n_steps, cfg.nSteps)
    n_steps = min(n_steps, cfg.maxSteps)

    rb, labels, valid = loaders.pad_measurement_sets(
        meas_sets, cfg.maxMeasurements)

    out_dir = args.out_dir
    os.makedirs(out_dir, exist_ok=True)
    state = SlamState.create(cfg)
    key = jax.random.PRNGKey(args.seed)

    sched = schedule_inputs(n_steps, meas_sets, controls, meas_times,
                            ctrl_times)

    if args.mode == "scan":
        t_len = len(sched)
        ctrl_arr = np.zeros((t_len, 2), np.float32)
        dt_arr = np.full((t_len,), cfg.dt, np.float32)
        z_rb = np.zeros((t_len, cfg.maxMeasurements, 2), np.float32)
        z_lab = np.zeros((t_len, cfg.maxMeasurements), np.int32)
        z_val = np.zeros((t_len, cfg.maxMeasurements), bool)
        for i, s in enumerate(sched):
            if s["c"] is not None and s["c"] >= 0:
                ctrl_arr[i] = controls[s["c"]]
            if s["dt"] is not None:
                dt_arr[i] = s["dt"]
            if s["z"] is not None:
                z_rb[i] = rb[s["z"]]
                z_lab[i] = labels[s["z"]]
                z_val[i] = valid[s["z"]]
        zs = Measurements(rb=jnp.asarray(z_rb), label=jnp.asarray(z_lab),
                          valid=jnp.asarray(z_val))
        if getattr(args, "islands", 0) and args.islands > 1:
            from phdslam_tpu.parallel.island import (island_run_scan,
                                                     make_island_mesh)
            imesh = make_island_mesh(args.islands)
            irun, iinit = island_run_scan(imesh, cfg)
            istate, ilw = iinit()
            t0 = time.time()
            final, ilw, auxs = irun(istate, ilw, key,
                                    jnp.asarray(ctrl_arr), zs,
                                    jnp.asarray(dt_arr))
            poses = np.asarray(auxs.expected_pose)   # fetch == sync
            elapsed = time.time() - t0
        else:
            t0 = time.time()
            final, auxs = run_scan(state, key, jnp.asarray(ctrl_arr), zs,
                                   jnp.asarray(dt_arr), cfg, t_len)
            # host fetch is the only reliable sync through the TPU tunnel
            poses = np.asarray(auxs.expected_pose)
            elapsed = time.time() - t0
        for t in range(t_len):
            logs.append_loop_time(out_dir, elapsed / t_len * 1000)
        print(f"scan: {t_len} steps in {elapsed:.3f}s "
              f"({elapsed / t_len * 1000:.2f} ms/step)")
        return dict(state=final, poses=poses, aux=auxs,
                    ms_per_step=elapsed / t_len * 1000)

    # ---- loop mode ----
    use_islands = getattr(args, "islands", 0) and args.islands > 1
    if use_islands:
        if cfg.filterType != 0:
            raise SystemExit("--islands supports the PHD filter only "
                             "(CPHD needs z_prev birth threading)")
        from phdslam_tpu.parallel.island import (island_slam_step,
                                                 make_island_mesh)
        imesh = make_island_mesh(args.islands)
        island_step, island_init = island_slam_step(imesh, cfg)
        state, island_logw = island_init()
        print(f"island mode: {args.islands} islands x "
              f"{cfg.n_particles // args.islands} particles")
    poses_out = []
    z_prev = None
    start_t = 0
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    if args.resume:
        from phdslam_tpu import checkpoint as ckpt
        latest = ckpt.latest_checkpoint(ckpt_dir)
        if latest:
            state, key, start_t = ckpt.restore_checkpoint(latest)
            start_t += 1
            print(f"resumed from {latest} at step {start_t}")
    for t, s in enumerate(sched):
        if t < start_t:
            continue
        t0 = time.time()
        if s["z"] is not None:
            z = Measurements(rb=jnp.asarray(rb[s["z"]]),
                             label=jnp.asarray(labels[s["z"]]),
                             valid=jnp.asarray(valid[s["z"]]))
        else:
            z = Measurements(
                rb=jnp.zeros((cfg.maxMeasurements, 2), jnp.float32),
                label=jnp.zeros((cfg.maxMeasurements,), jnp.int32),
                valid=jnp.zeros((cfg.maxMeasurements,), bool))
        ctrl = (jnp.float32(controls[s["c"], 0]) if s["c"] is not None
                else jnp.float32(0),
                jnp.float32(controls[s["c"], 1]) if s["c"] is not None
                else jnp.float32(0))
        dt = jnp.float32(s["dt"] if s["dt"] is not None else cfg.dt)
        key, sk = jax.random.split(key)
        do_predict = t > 0 and s["predict"]
        if traj is not None and t < len(traj):
            state = state.replace(pose=jnp.broadcast_to(
                jnp.asarray(traj[t]), state.pose.shape))
            do_predict = False

        if t == 100 and args.checkpoint:
            with open(os.path.join(out_dir, "state100.pkl"), "wb") as f:
                pickle.dump(dict(state=jax.device_get(state),
                                 z=jax.device_get(z)), f)

        if args.predict_time and do_predict:
            from phdslam_tpu.filter.predict import predict as _predict
            import jax as _jax
            _pt0 = time.time()
            _pred = _jax.jit(_predict, static_argnames=("cfg",))(
                sk, state, ctrl, cfg, dt)
            _ = np.asarray(_pred.pose)
            logs.append_predict_time(out_dir, (time.time() - _pt0) * 1000)
        if use_islands:
            from phdslam_tpu.filter.step import StepAux
            state, island_logw, iaux = island_step(
                state, island_logw, sk, jnp.stack(ctrl), z, dt,
                jnp.asarray(do_predict))
            aux = StepAux(expected_pose=iaux.expected_pose,
                          neff=iaux.island_neff,
                          resampled=iaux.exchanged,
                          n_measure=z.count, log_lik=iaux.log_lik)
        else:
            state, aux = slam_step(state, sk, ctrl, z, dt,
                                   jnp.asarray(do_predict), cfg,
                                   z_prev=z_prev)
        z_prev = z
        # host fetch is the only reliable sync through the TPU tunnel
        neff_val = float(np.asarray(aux.neff))
        elapsed_ms = (time.time() - t0) * 1000
        logs.append_loop_time(out_dir, elapsed_ms)
        if not args.no_logs:
            _write_step_log(out_dir, t, state, aux, cfg)
        logs.append_metrics_jsonl(out_dir, dict(
            t=t, ms=elapsed_ms, neff=neff_val,
            n_measure=int(aux.n_measure),
            resampled=bool(aux.resampled),
            log_lik=float(aux.log_lik),
            card=float(jnp.sum(state.map_static.w[0] > 0))))
        poses_out.append(np.asarray(aux.expected_pose))
        if args.checkpoint_every and t > 0 and t % args.checkpoint_every == 0:
            from phdslam_tpu import checkpoint as ckpt
            ckpt.save_checkpoint(ckpt_dir, t, state, key)
        if args.mat_export or cfg.saveAllMaps:
            from phdslam_tpu.io.matdump import write_particles_mat
            write_particles_mat(out_dir, t, jax.device_get(state))
        if np.isnan(neff_val):
            print("nan weights detected! exiting...")
            break
        if args.verbose:
            print(f"step {t}/{len(sched)} ms={elapsed_ms:.1f} "
                  f"neff={float(aux.neff):.3f}")
    return dict(state=state, poses=np.asarray(poses_out))


def run_profile(cfg: SlamConfig, args):
    """Replay the step-100 fixture once — the reference's profile mode
    (src/main.cpp:1314-1321)."""
    with open(os.path.join(args.out_dir, "state100.pkl"), "rb") as f:
        d = pickle.load(f)
    state = jax.device_put(d["state"])
    z = jax.device_put(d["z"])
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    state1, aux = slam_step(state, key, (jnp.float32(0), jnp.float32(0)), z,
                            jnp.float32(cfg.dt), jnp.asarray(True), cfg)
    # host fetch is the only reliable sync through the TPU tunnel
    # (block_until_ready is a no-op there -> fictional timings)
    np.asarray(state1.log_weights)
    print(f"profile step: {(time.time() - t0) * 1000:.2f} ms (incl compile)")
    t0 = time.time()
    state2, aux = slam_step(state, key, (jnp.float32(0), jnp.float32(0)), z,
                            jnp.float32(cfg.dt), jnp.asarray(True), cfg)
    np.asarray(state2.log_weights)
    print(f"profile step: {(time.time() - t0) * 1000:.2f} ms (compiled)")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("run_type", nargs="?", default="synth",
                    choices=["synth", "disparity"])
    ap.add_argument("profile", nargs="?", default="",
                    help="pass 'profile' to replay the step-100 fixture")
    ap.add_argument("--mode", default="loop", choices=["loop", "scan"])
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--measurements", default=None)
    ap.add_argument("--controls", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-logs", action="store_true")
    ap.add_argument("--checkpoint", action="store_true", default=True)
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="write a resumable checkpoint every K steps")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in out-dir")
    ap.add_argument("--mat-export", action="store_true",
                    help="write particlesXXXXX.mat each step "
                         "(save_all_maps equivalent)")
    ap.add_argument("--predict-time", action="store_true",
                    help="additionally time the prediction alone each step "
                         "-> predicttime.log (src/phdfilter.cu:1244-1251)")
    ap.add_argument("--islands", type=int, default=0,
                    help="run distributed over N mesh devices with "
                         "island-model (locality-preserving) resampling "
                         "(parallel/island.py); loop mode, PHD filter only")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    from phdslam_tpu.utils import ensure_backend
    ensure_backend()

    cfg = load_config(args.config)
    if args.run_type == "disparity":
        from phdslam_tpu.filter.disparity import run_disparity
        return run_disparity(cfg, args)
    if args.profile == "profile":
        return run_profile(cfg, args)
    return run_synth(cfg, args)


if __name__ == "__main__":
    main()
