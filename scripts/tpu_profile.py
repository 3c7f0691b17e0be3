"""Per-stage TPU timing for every filter path (honest host-fetch sync).

Measures, at both the dense-stress config and a typical config:
  - kalman_preupdate alone
  - phd_update_static (Pallas and forced-XLA)
  - the merge alone (Pallas and XLA) at the update's pool shape
  - full slam_step for static / CPHD / mixed
  - disparity_step
Prints one line per measurement. Run on the real chip:
    PYTHONPATH=. python scripts/tpu_profile.py [--quick]

The FLOP/bandwidth-denominated utilization table (achieved TFLOP/s and
GB/s vs chip peaks) lives in scripts/utilization.py.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")

import json

import jax
import jax.numpy as jnp
import numpy as np

from phdslam_tpu.utils import ensure_backend

ensure_backend()

QUICK = "--quick" in sys.argv
REPS = 3 if QUICK else 5
RECORD = {}   # name -> ms; dumped to results/stage_profile.json


def timeit(name, fn, *args, fetch=None):
    def sync(out):
        # fetch a tiny slice: forces the whole program, avoids paying the
        # tunnel's ~100 ms per 16 MB device->host transfer in the timing
        x = fetch(out) if fetch else jax.tree.leaves(out)[0]
        _ = np.asarray(x.ravel()[:8])

    out = fn(*args)
    sync(out)
    # min of 3 windows: the tunnel's queueing state drifts on a
    # seconds scale (identical code measured +-50% back-to-back);
    # queueing delay is strictly additive, so the fastest window is the
    # least-polluted estimate (timeit's rationale)
    reps = []
    for _w in range(3):
        t0 = time.time()
        for _i in range(REPS):
            out = fn(*args)
        sync(out)
        reps.append((time.time() - t0) / REPS * 1000)
    ms = min(reps)
    print(f"{name:44s} {ms:9.2f} ms", flush=True)
    RECORD[name] = round(ms, 2)
    return ms


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    if jax.default_backend() not in ("tpu", "axon"):
        print("SKIP: needs the TPU backend")
        return

    from phdslam_tpu.config import load_config
    from phdslam_tpu.filter import update as U
    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import slam_step

    sys.path.insert(0, os.path.dirname(__file__))
    from tpu_kernel_check import make_problem

    for tag, (P, F, M) in (("dense", (8192, 512, 64)),
                           ("typical", (256, 128, 32))):
        if QUICK and tag == "dense":
            continue
        cfg = load_config("cfg/ackerman_synth.cfg").replace(
            n_particles=P, maxFeatures=F, maxMeasurements=M,
            clutterRate=40.0, gateBirths=True, gateThreshold=9.0)
        prob = make_problem(jax.random.PRNGKey(1), cfg, P, F, M)
        pose, gm, z_rb, z_label, z_valid = prob
        print(f"--- {tag}: P={P} F={F} M={M} ---")

        pre_j = jax.jit(U.kalman_preupdate, static_argnames=("cfg",))
        timeit(f"{tag}: kalman_preupdate", pre_j, pose, gm, cfg)
        # standalone-jit preupdate materializes all 15 output channels;
        # the scalar-out form is the honest in-step cost (XLA keeps the
        # chain fused into its consumer)
        pre_s = jax.jit(lambda pose, gm, c: sum(
            jnp.sum(x) for x in U.kalman_preupdate(pose, gm, c)
            if x.dtype != jnp.int32), static_argnames=("c",))
        timeit(f"{tag}: kalman_preupdate (scalar out)", pre_s, pose, gm,
               cfg)

        upd_j = jax.jit(U.phd_update_static, static_argnames=("cfg",))
        timeit(f"{tag}: phd_update_static (pallas)", upd_j, *prob, cfg)
        timeit(f"{tag}: phd_update_static (pallas, index sel)", upd_j,
               *prob, cfg.replace(selectByIndex=True))
        cfgx = cfg.replace(usePallas=False)
        timeit(f"{tag}: phd_update_static (xla)", upd_j, *prob, cfgx)

        state = SlamState.create(cfg).replace(pose=pose, map_static=gm)
        z = Measurements(rb=z_rb, label=z_label, valid=z_valid)
        key = jax.random.PRNGKey(0)
        step = lambda c: slam_step(state, key, (jnp.float32(1.0),
                                                jnp.float32(0.01)),
                                   z, jnp.float32(0.5),
                                   jnp.asarray(True), c)
        timeit(f"{tag}: slam_step static (pallas)", step, cfg)
        timeit(f"{tag}: slam_step static (pallas, index sel)", step,
               cfg.replace(selectByIndex=True))
        timeit(f"{tag}: slam_step static (xla)", step, cfgx)
        timeit(f"{tag}: slam_step static (pallas, fast merge)", step,
               cfg.replace(mergeMode=1))
        timeit(f"{tag}: slam_step static (pallas, fast merge, k2)", step,
               cfg.replace(mergeMode=1, selectTopK=2))
        timeit(f"{tag}: slam_step static (pallas, fast merge, index sel)",
               step, cfg.replace(mergeMode=1, selectByIndex=True))

        if tag == "typical" or not QUICK:
            cfgc = cfg.replace(filterType=1, maxCardinality=63,
                               n_particles=min(P, 1024))
            Pc = cfgc.n_particles
            probc = make_problem(jax.random.PRNGKey(2), cfgc, Pc, F, M)
            sc = SlamState.create(cfgc).replace(pose=probc[0],
                                                map_static=probc[1])
            stepc = lambda: slam_step(sc, key, (jnp.float32(1.0),
                                                jnp.float32(0.01)),
                                      z, jnp.float32(0.5),
                                      jnp.asarray(True), cfgc, z_prev=z)
            timeit(f"{tag}: slam_step CPHD (P={Pc})", stepc)

            cfgm = cfg.replace(featureModel=2, maxFeatures=min(F, 256))
            Pm = cfgm.n_particles
            probm = make_problem(jax.random.PRNGKey(3), cfgm, Pm,
                                 cfgm.maxFeatures, M)
            sm = SlamState.create(cfgm).replace(pose=probm[0],
                                                map_static=probm[1])
            stepm = lambda: slam_step(sm, key, (jnp.float32(1.0),
                                                jnp.float32(0.01)),
                                      z, jnp.float32(0.5),
                                      jnp.asarray(True), cfgm)
            timeit(f"{tag}: slam_step mixed (P={Pm})", stepm)

    # disparity
    try:
        from phdslam_tpu.filter.disparity import (DisparityState,
                                                  disparity_step)
        cfgd = load_config("cfg/ackerman_synth.cfg").replace(
            n_particles=128, maxFeatures=64, maxMeasurements=32)
        sd = DisparityState.create(cfgd)
        zd = jnp.zeros((32, 2), jnp.float32) \
            .at[:, 0].set(jnp.linspace(100, 500, 32)) \
            .at[:, 1].set(jnp.linspace(100, 400, 32))
        vd = jnp.ones((32,), bool)
        stepd = lambda: disparity_step(sd, jax.random.PRNGKey(0), zd, vd,
                                       jnp.float32(0.1), jnp.asarray(True),
                                       cfgd)
        timeit("disparity_step (P=128, F=64)", stepd)
    except Exception as e:
        print(f"disparity timing skipped: {e}")

    os.makedirs("results", exist_ok=True)
    with open("results/stage_profile.json", "w") as f:
        json.dump(RECORD, f, indent=1)
    print("wrote results/stage_profile.json")


if __name__ == "__main__":
    main()
