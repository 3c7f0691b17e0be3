"""TPU check: fused Pallas kernel path vs XLA path of phd_update_static.

Builds a random-but-realistic update problem, runs the full update once with
the kernel (TPU backend triggers it) and once with the XLA selection path
(forced), and compares normalizers, particle weight deltas, and merged maps.
Then times the dense-stress step both ways with a true device sync
(np.asarray fetch — block_until_ready is a no-op through the tunnel).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")

import jax
import jax.numpy as jnp
import numpy as np

from phdslam_tpu.config import load_config
from phdslam_tpu.utils import ensure_backend

ensure_backend()
from phdslam_tpu.filter import update as U
from phdslam_tpu.filter.state import Gaussian2DMixture

QUICK = "--quick" in sys.argv


def make_problem(key, cfg, P, F, M):
    ks = jax.random.split(key, 8)
    pose = jnp.concatenate([
        jax.random.uniform(ks[0], (P, 2), minval=-2, maxval=2),
        jax.random.uniform(ks[1], (P, 1), minval=-3, maxval=3),
        jnp.zeros((P, 3))], axis=1).astype(jnp.float32)
    n_act = F * 3 // 4
    mx = jax.random.uniform(ks[2], (P, F), minval=-0.7 * cfg.maxRange,
                            maxval=0.7 * cfg.maxRange)
    my = jax.random.uniform(ks[3], (P, F), minval=-0.7 * cfg.maxRange,
                            maxval=0.7 * cfg.maxRange)
    w = jnp.where(jnp.arange(F) < n_act,
                  jax.random.uniform(ks[4], (P, F), minval=0.05, maxval=1.5),
                  0.0)
    c00 = jax.random.uniform(ks[5], (P, F), minval=0.05, maxval=2.0)
    c11 = jax.random.uniform(ks[6], (P, F), minval=0.05, maxval=2.0)
    c01 = 0.3 * jnp.sqrt(c00 * c11) * jax.random.uniform(
        ks[7], (P, F), minval=-1, maxval=1)
    gm = Gaussian2DMixture(w=w.astype(jnp.float32), mx=mx.astype(jnp.float32),
                           my=my.astype(jnp.float32),
                           c00=c00.astype(jnp.float32),
                           c01=c01.astype(jnp.float32),
                           c11=c11.astype(jnp.float32))
    kz1, kz2 = jax.random.split(ks[0])
    rng = jax.random.uniform(kz1, (M,), minval=0.3, maxval=0.95 * cfg.maxRange)
    brg = jax.random.uniform(kz2, (M,), minval=-0.9 * cfg.maxBearing,
                             maxval=0.9 * cfg.maxBearing)
    z_rb = jnp.stack([rng, brg], axis=1).astype(jnp.float32)
    z_label = jnp.zeros((M,), jnp.int32)
    z_valid = jnp.arange(M) < (M - 3)
    return pose, gm, z_rb, z_label, z_valid


def run_both(cfg, pose, gm, z_rb, z_label, z_valid):
    import phdslam_tpu.filter.update as upd

    res_pal = jax.jit(U.phd_update_static, static_argnames=("cfg",))(
        pose, gm, z_rb, z_label, z_valid, cfg)
    res_pal = jax.tree.map(np.asarray, res_pal)

    # force the XLA path by lying about the backend inside the trace
    real = jax.default_backend
    jax.default_backend = lambda: "forced_xla"
    try:
        f = jax.jit(U.phd_update_static, static_argnames=("cfg",))
        res_xla = f(pose, gm, z_rb, z_label, z_valid, cfg)
        res_xla = jax.tree.map(np.asarray, res_xla)
    finally:
        jax.default_backend = real
    return res_pal, res_xla


def compare(res_pal, res_xla):
    def summarize(name, a, b, tol):
        d = np.max(np.abs(a - b))
        rel = d / (np.max(np.abs(b)) + 1e-30)
        ok = rel < tol or d < tol
        print(f"  {name:24s} max|d|={d:.3e} rel={rel:.3e} "
              f"{'OK' if ok else 'MISMATCH'}")
        return ok

    ok = True
    ok &= summarize("log_weight_delta", res_pal.log_weight_delta,
                    res_xla.log_weight_delta, 2e-3)
    ok &= summarize("w_nondetect", res_pal.w_nondetect,
                    res_xla.w_nondetect, 1e-5)
    ok &= summarize("w_birth", res_pal.w_birth, res_xla.w_birth, 1e-5)
    # merged maps: compare total mass and sorted weights (selection ties can
    # reorder equal-weight components)
    wp = np.sort(res_pal.map_out.w, axis=1)
    wx = np.sort(res_xla.map_out.w, axis=1)
    ok &= summarize("map weights (sorted)", wp, wx, 5e-3)
    ok &= summarize("map mass", res_pal.map_out.w.sum(1),
                    res_xla.map_out.w.sum(1), 2e-3)
    mp = np.sort(res_pal.map_out.mx * (res_pal.map_out.w > 0), axis=1)
    mxx = np.sort(res_xla.map_out.mx * (res_xla.map_out.w > 0), axis=1)
    ok &= summarize("map means x (sorted)", mp, mxx, 5e-3)
    return ok


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    if jax.default_backend() not in ("tpu", "axon"):
        print("SKIP: compiled Pallas kernels need a TPU backend "
              "(interpret-mode parity is covered by tests/test_pallas.py)")
        sys.exit(0)
    cfg = load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=256, maxFeatures=128, maxMeasurements=32,
        gateBirths=True, gateThreshold=9.0)
    key = jax.random.PRNGKey(0)
    prob = make_problem(key, cfg, 256, 128, 32)
    print("== parity: P=256 F=128 M=32, scheme", cfg.particleWeighting)
    ok = compare(*run_both(cfg, *prob))

    cfg1 = cfg.replace(particleWeighting=1)
    print("== parity: scheme 1 (Vo empty-map)")
    ok &= compare(*run_both(cfg1, *prob))

    cfgp = cfg.replace(selectByIndex=False)
    print("== parity: in-kernel payload selection (select_by_index=0)")
    ok &= compare(*run_both(cfgp, *prob))

    if not QUICK:
        # dense-stress timing, honest sync
        cfgd = load_config("cfg/ackerman_synth.cfg").replace(
            n_particles=8192, maxFeatures=512, maxMeasurements=64,
            clutterRate=40.0, gateBirths=True, gateThreshold=9.0)
        probd = make_problem(jax.random.PRNGKey(1), cfgd, 8192, 512, 64)
        f = jax.jit(U.phd_update_static, static_argnames=("cfg",))
        r = f(*probd, cfgd)
        _ = np.asarray(r.map_out.w)
        t0 = time.time()
        for _i in range(5):
            r = f(*probd, cfgd)
        _ = np.asarray(r.map_out.w)
        t_pal = (time.time() - t0) / 5 * 1000
        print(f"dense update, pallas path: {t_pal:.1f} ms")

        real = jax.default_backend
        jax.default_backend = lambda: "forced_xla"
        try:
            f2 = jax.jit(U.phd_update_static, static_argnames=("cfg",))
            r = f2(*probd, cfgd)
            _ = np.asarray(r.map_out.w)
            t0 = time.time()
            for _i in range(5):
                r = f2(*probd, cfgd)
            _ = np.asarray(r.map_out.w)
            t_xla = (time.time() - t0) / 5 * 1000
        finally:
            jax.default_backend = real
        print(f"dense update, XLA path:    {t_xla:.1f} ms")

    # merge kernel: on-chip parity + timing at the dense pool shape
    from phdslam_tpu.kernels.merge_pallas import greedy_merge_pallas
    from phdslam_tpu.ops import gm as G

    kk = jax.random.split(jax.random.PRNGKey(2), 6)
    P, K, F = (256, 320, 128) if QUICK else (8192, 1088, 512)
    wm = jnp.where(jax.random.uniform(kk[0], (P, K)) < 0.6,
                   jax.random.uniform(kk[1], (P, K), minval=0.01, maxval=2.0),
                   0.0)
    mxm = jax.random.uniform(kk[2], (P, K), minval=-20, maxval=20)
    mym = jax.random.uniform(kk[3], (P, K), minval=-20, maxval=20)
    c00m = jax.random.uniform(kk[4], (P, K), minval=0.05, maxval=1.5)
    c11m = jax.random.uniform(kk[5], (P, K), minval=0.05, maxval=1.5)
    c01m = 0.3 * jnp.sqrt(c00m * c11m)
    margs = (wm, mxm, mym, c00m, c01m, c11m)

    got = greedy_merge_pallas(*margs, 5.0, F)
    got = [np.asarray(g) for g in got]
    real = jax.default_backend
    jax.default_backend = lambda: "forced_xla"
    try:
        ref = G.greedy_merge_channels(*margs, 5.0, F, metric=0)
        ref = [np.asarray(r) for r in ref]
    finally:
        jax.default_backend = real
    for name, g, r in zip(("w", "mx", "my", "c00", "c01", "c11"), got, ref):
        d = np.max(np.abs(g - r))
        print(f"  merge {name:4s} max|d|={d:.3e} "
              f"{'OK' if d < 1e-3 else 'MISMATCH'}")
        ok &= d < 1e-3

    if not QUICK:
        fj = greedy_merge_pallas  # already jitted with static shape args
        _ = np.asarray(fj(*margs, 5.0, F)[0])
        t0 = time.time()
        for _i in range(5):
            out = fj(*margs, 5.0, F)
        _ = np.asarray(out[0])
        print(f"merge pallas [{P},{K}]->{F}: "
              f"{(time.time() - t0) / 5 * 1000:.1f} ms")
        jax.default_backend = lambda: "forced_xla"
        try:
            fx = jax.jit(lambda *a: G.greedy_merge_channels(
                *a, 5.0, F, metric=0))
            _ = np.asarray(fx(*margs)[0])
            t0 = time.time()
            for _i in range(5):
                out = fx(*margs)
            _ = np.asarray(out[0])
            print(f"merge XLA    [{P},{K}]->{F}: "
                  f"{(time.time() - t0) / 5 * 1000:.1f} ms")
        finally:
            jax.default_backend = real

    # ESF kernel (CPHD): full + deleted log-ESFs vs the XLA scan forms
    from phdslam_tpu.filter.cphd import esf_deleted, esf_log
    from phdslam_tpu.kernels.esf_pallas import esf_all_pallas

    rng = np.random.default_rng(3)
    ll = rng.normal(-3, 1, (256, 32)).astype(np.float32)
    ll[:, 27:] = -np.inf
    llj = jnp.asarray(ll)
    esf_x = np.asarray(jax.jit(esf_log)(llj))
    esfd_x = np.asarray(jax.jit(esf_deleted)(llj))
    esf_p, esfd_p = esf_all_pallas(llj)
    esf_p, esfd_p = np.asarray(esf_p), np.asarray(esfd_p)
    fin, find = np.isfinite(esf_x), np.isfinite(esfd_x)
    d_esf = float(np.abs(esf_p[fin] - esf_x[fin]).max())
    d_esfd = float(np.abs(esfd_p[find] - esfd_x[find]).max())
    sent = bool((esf_p[~fin] < -1e29).all() and (esfd_p[~find] < -1e29).all())
    esf_ok = d_esf < 1e-4 and d_esfd < 1e-4 and sent
    print(f"  esf kernel max|d| esf={d_esf:.2e} esfd={d_esfd:.2e} "
          f"sentinels={'OK' if sent else 'BAD'} "
          f"{'OK' if esf_ok else 'MISMATCH'}")
    ok = ok and esf_ok

    print("PARITY", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
