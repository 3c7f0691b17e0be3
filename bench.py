"""Benchmark: dense-stress GM-PHD SLAM step on the default (TPU) backend.

BASELINE.md primary metric: ms per SLAM step & particle-updates/sec at 8192
particles (dense config: 512 padded map components, clutter-heavy scene),
compared against the CPU reference path (reference_cpu.py — the faithful
NumPy implementation of the reference algorithm; the reference repo's own
CPU path, scphd_cpu.cpp, is an empty stub).

Prints ONE JSON line:
  {"metric": "ms_per_slam_step_8192p", "value": <ms>, "unit": "ms",
   "vs_baseline": <speedup over CPU reference, extrapolated to 8192p>}

vs_baseline > 50 meets the BASELINE.md target.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def make_stress_inputs(cfg, n_steps, seed=0):
    """Clutter-heavy measurement stream + wandering controls."""
    rng = np.random.default_rng(seed)
    m = cfg.maxMeasurements
    rb = np.zeros((n_steps, m, 2), np.float32)
    valid = np.zeros((n_steps, m), bool)
    k = int(m * 0.9)
    rb[:, :k, 0] = rng.uniform(0.5, cfg.maxRange, (n_steps, k))
    rb[:, :k, 1] = rng.uniform(-cfg.maxBearing, cfg.maxBearing, (n_steps, k))
    valid[:, :k] = True
    controls = np.zeros((n_steps, 2), np.float32)
    controls[:, 0] = 1.5
    controls[:, 1] = 0.1 * np.sin(np.arange(n_steps) / 10.0)
    return rb, valid, controls


def bench_tpu(cfg, n_steps=19, warmup=3):
    import jax
    import jax.numpy as jnp

    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import slam_step

    rb, valid, controls = make_stress_inputs(cfg, n_steps)
    state = SlamState.create(cfg)
    key = jax.random.PRNGKey(0)
    labels = jnp.zeros((cfg.maxMeasurements,), jnp.int32)

    def one(state, key, t):
        z = Measurements(rb=jnp.asarray(rb[t]), label=labels,
                         valid=jnp.asarray(valid[t]))
        u = (jnp.float32(controls[t, 0]), jnp.float32(controls[t, 1]))
        return slam_step(state, key, u, z, jnp.float32(cfg.dt),
                         jnp.asarray(t > 0), cfg)

    # warmup (compile + map fill-in). NOTE: sync by fetching to host —
    # through the experimental TPU tunnel jax.block_until_ready returns
    # before the computation finishes (verified: a 2.75-TFLOP graph
    # "completed" in 0.1 ms), so a fetch is the only honest barrier.
    for t in range(warmup):
        key, sk = jax.random.split(key)
        state, aux = one(state, sk, t)
    _ = np.asarray(state.log_weights)

    # median of 3 timed repeats: the tunnel's queueing state drifts on
    # a seconds scale and single-window draws vary +-50% on identical
    # code (measured 16.4 / 24.8 / 28.2 ms back-to-back); the median is
    # the stable statistic
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for t in range(warmup, n_steps):
            key, sk = jax.random.split(key)
            state, aux = one(state, sk, t)
        _ = np.asarray(state.log_weights)
        reps.append((time.perf_counter() - t0) / (n_steps - warmup)
                    * 1000.0)
    assert np.isfinite(float(aux.neff)), "NaN in benchmark run"
    return float(np.median(reps))


def bench_cpu_reference(cfg, n_particles=32, n_steps=4):
    """CPU reference path ms/step at a small particle count, extrapolated
    linearly in particle count (the algorithm is independent per particle)."""
    from phdslam_tpu import reference_cpu as R

    cfg_small = cfg.replace(n_particles=n_particles)
    rb, valid, controls = make_stress_inputs(cfg_small, n_steps + 1)
    meas = [rb[t][valid[t]] for t in range(n_steps + 1)]
    # one step of warm-in so maps are non-empty
    t0 = time.perf_counter()
    R.run(cfg_small, controls[1:], meas, seed=0)
    total = time.perf_counter() - t0
    return total / (n_steps + 1) * 1000.0, n_particles


def main():
    from phdslam_tpu.config import load_config
    from phdslam_tpu.utils import ensure_backend
    ensure_backend()

    import jax
    from phdslam_tpu.utils import tpu_reexec_retry
    # Re-exec (bounded) so the driver's benchmark lands on the real chip
    # instead of silently recording the CPU fallback; no-op on machines
    # without the tunnel (utils.tpu_expected).
    tpu_reexec_retry()

    stress = load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=8192, maxFeatures=512, maxMeasurements=64,
        y0=0.0, birthWeight=1e-3, clutterRate=50.0)

    quick = "--quick" in sys.argv
    if jax.default_backend() not in ("tpu", "axon"):
        # tunnel down -> CPU fallback; run the small config so the driver
        # still gets a line in bounded time, and say so in the metric name
        quick = True
    if quick:
        stress = stress.replace(n_particles=512, maxFeatures=128)

    # headline: fast merge mode (merge_mode=1 — prune+renormalize before
    # the greedy merge; accuracy evidence = exact-vs-fast MC envelopes in
    # RESULTS.md). Exact reference-semantics greedy reported alongside.
    ms_fast = bench_tpu(stress.replace(mergeMode=1))
    ms_exact = bench_tpu(stress)
    cpu_ms, cpu_p = bench_cpu_reference(stress)
    cpu_ms_extrap = cpu_ms * (stress.n_particles / cpu_p)
    speedup = cpu_ms_extrap / ms_fast
    updates_per_sec = stress.n_particles / (ms_fast / 1000.0)

    backend = jax.default_backend()
    print(json.dumps({
        "metric": f"ms_per_slam_step_{stress.n_particles}p"
                  + ("" if backend in ("tpu", "axon")
                     else f"_{backend}_fallback"),
        "value": round(ms_fast, 3),
        "unit": "ms",
        "vs_baseline": round(speedup, 2),
        "particle_updates_per_sec": round(updates_per_sec),
        "ms_exact_merge": round(ms_exact, 3),
        "cpu_reference_ms_extrapolated": round(cpu_ms_extrap, 1),
    }))


if __name__ == "__main__":
    main()
