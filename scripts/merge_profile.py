"""Dense-step decomposition + merge trip-count measurement.

Reconstructs the exact candidate pool the bench's dense step feeds the
greedy merge (steady-state map after a few stress steps), then times each
stage separately and counts actual merge trips (nonzero output clusters)
per particle/tile. This is the measurement that decides where the next
milliseconds come from.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/merge_profile.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from phdslam_tpu.utils import ensure_backend

ensure_backend()


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:8])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:8])
    ms = (time.time() - t0) / reps * 1000
    print(f"{name:52s} {ms:9.2f} ms", flush=True)
    return ms, out


def dense_config():
    """EXACTLY bench.py's dense config (same jit cache keys -> compiles
    come from /tmp/jaxcache, same steady-state pool statistics)."""
    from phdslam_tpu.config import load_config
    return load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=8192, maxFeatures=512, maxMeasurements=64,
        y0=0.0, birthWeight=1e-3, clutterRate=50.0)


def steady_state(cfg, warm_steps=6):
    """Run the stress scenario to a steady-state map; returns
    (pose, gm, z_rb, z_labels, z_valid) for the next step's inputs."""
    from bench import make_stress_inputs
    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import slam_step
    M = cfg.maxMeasurements
    rb, valid, controls = make_stress_inputs(cfg, warm_steps + 2)
    state = SlamState.create(cfg)
    key = jax.random.PRNGKey(0)
    labels = jnp.zeros((M,), jnp.int32)
    for t in range(warm_steps):
        key, sk = jax.random.split(key)
        z = Measurements(rb=jnp.asarray(rb[t]), label=labels,
                         valid=jnp.asarray(valid[t]))
        u = (jnp.float32(controls[t, 0]), jnp.float32(controls[t, 1]))
        state, _ = slam_step(state, sk, u, z, jnp.float32(cfg.dt),
                             jnp.asarray(t > 0), cfg)
    _ = np.asarray(state.log_weights)
    return (state.pose, state.map_static, jnp.asarray(rb[warm_steps]),
            labels, jnp.asarray(valid[warm_steps]))


def build_pool(cfg, pose, gm, pre, sel, z_rb, z_valid, k1):
    """Reconstruct the merge candidate pool exactly as
    phdslam_tpu/filter/update.py assembles it (non-detect | selected
    detections | births). Returns the six channel arrays [P, K]."""
    P = pose.shape[0]
    M = z_rb.shape[0]
    (sum_exp, w_sel, mx_sel, my_sel, u00_sel, u01_sel, u11_sel,
     lpw_sel, compat) = sel
    sum_exp = jnp.where(z_valid[None, :], sum_exp, 0.0)
    w_selm = jnp.where(z_valid[None, :, None], w_sel, 0.0)
    minw = cfg.minFeatureWeight
    normalizer = cfg.clutterDensity + cfg.birthWeight + sum_exp
    in_mask = pre.rclass == 1
    pd_eff = jnp.where(in_mask, pre.pd, 0.0)
    w_nondetect = gm.w * (1.0 - pd_eff)
    w_nd_p = jnp.where(w_nondetect >= minw, w_nondetect, 0.0)
    w_birth = jnp.broadcast_to(
        cfg.birthWeight / normalizer * z_valid[None, :], (P, M))
    w_birth_p = jnp.where(w_birth >= minw, w_birth, 0.0)
    w_sec1 = jnp.where(in_mask, w_nd_p, gm.w)
    theta_b = pose[:, None, 2] + z_rb[None, :, 1]
    ct, st = jnp.cos(theta_b), jnp.sin(theta_b)
    bdx = z_rb[None, :, 0] * ct
    bdy = z_rb[None, :, 0] * st
    var_rb = (cfg.stdRange * cfg.birthNoiseFactor) ** 2
    var_bb = (cfg.stdBearing * cfg.birthNoiseFactor) ** 2
    flat = lambda a: a.reshape(P, M * k1)
    cat = lambda a, b, c: jnp.concatenate([a, b, c], axis=-1)
    cand_w = cat(w_sec1, flat(jnp.where(w_selm >= minw, w_selm, 0.0)),
                 w_birth_p)
    cand_mx = cat(gm.mx, flat(mx_sel), pose[:, None, 0] + bdx)
    cand_my = cat(gm.my, flat(my_sel), pose[:, None, 1] + bdy)
    cand_00 = cat(gm.c00, flat(u00_sel),
                  ct * ct * var_rb + bdy * bdy * var_bb)
    cand_01 = cat(gm.c01, flat(u01_sel),
                  ct * st * var_rb - bdy * bdx * var_bb)
    cand_11 = cat(gm.c11, flat(u11_sel),
                  st * st * var_rb + bdx * bdx * var_bb)
    return cand_w, cand_mx, cand_my, cand_00, cand_01, cand_11


def main():
    from phdslam_tpu.filter import update as U
    from phdslam_tpu.kernels.preupdate_pallas import fused_update_select
    from phdslam_tpu.kernels.merge_pallas import greedy_merge_pallas
    from phdslam_tpu.ops.gm import fast_prune_renormalize

    cfg = dense_config()
    P, F, M = cfg.n_particles, cfg.maxFeatures, cfg.maxMeasurements
    print(f"dense config: P={P} F={F} M={M} "
          f"minw={cfg.minFeatureWeight} minSep={cfg.minSeparation} "
          f"mergeMinW={cfg.mergeMinWeight}")

    pose, gm, z_rb, labels, z_valid = steady_state(cfg)
    nz = np.asarray((gm.w > 0).sum(axis=1))
    print(f"steady-state map occupancy: mean {nz.mean():.0f} "
          f"max {nz.max()} of {F}")

    # --- stage timings -------------------------------------------------
    pre_j = jax.jit(U.kalman_preupdate, static_argnames=("cfg",))
    ms_pre, pre = timeit("kalman_preupdate", pre_j, pose, gm, cfg)

    k1 = 8
    sel_j = jax.jit(lambda zz, pp, gg: fused_update_select(
        zz, pp, gg, cfg, k1=k1))
    ms_sel, sel = timeit("fused_update_select", sel_j, z_rb, pre, gm)

    upd_j = jax.jit(U.phd_update_static, static_argnames=("cfg",))
    ms_upd, res = timeit("phd_update_static (full, exact)", upd_j, pose,
                         gm, z_rb, labels, z_valid, cfg)

    (cand_w, cand_mx, cand_my, cand_00, cand_01,
     cand_11) = build_pool(cfg, pose, gm, pre, sel, z_rb, z_valid, k1)
    cand_w = jax.block_until_ready(cand_w)
    K = cand_w.shape[1]

    np.savez("/tmp/dense_pool.npz", w=np.asarray(cand_w),
             mx=np.asarray(cand_mx), my=np.asarray(cand_my),
             c00=np.asarray(cand_00), c01=np.asarray(cand_01),
             c11=np.asarray(cand_11), minsep=cfg.minSeparation,
             F=F, mergeMinW=cfg.mergeMinWeight)
    surv = np.asarray((cand_w > 0).sum(axis=1))
    print(f"pool K={K}; survivors/particle: mean {surv.mean():.0f} "
          f"max {surv.max()}")
    fw = np.asarray((fast_prune_renormalize(cand_w, cfg.mergeMinWeight)
                     > 0).sum(axis=1))
    print(f"fast-pruned survivors: mean {fw.mean():.0f} max {fw.max()}")

    merge = jax.jit(lambda w, a, b, c, d, e: greedy_merge_pallas(
        w, a, b, c, d, e, float(cfg.minSeparation), F))
    ms_mx, mout = timeit("merge exact [P,K]->F", merge, cand_w, cand_mx,
                         cand_my, cand_00, cand_01, cand_11)
    merge_s = jax.jit(lambda w, a, b, c, d, e: greedy_merge_pallas(
        w, a, b, c, d, e, float(cfg.minSeparation), F, sort_rows=True))
    ms_ms, sout = timeit("merge exact, sort_rows", merge_s, cand_w,
                         cand_mx, cand_my, cand_00, cand_01, cand_11)
    same = all(bool(jnp.array_equal(a, b)) for a, b in zip(mout, sout))
    print(f"sort_rows output identical: {same}")
    fastw = fast_prune_renormalize(cand_w, cfg.mergeMinWeight)
    ms_mf, fout = timeit("merge fast-pruned", merge, fastw, cand_mx,
                         cand_my, cand_00, cand_01, cand_11)

    for name, out in (("exact", mout), ("fast", fout)):
        ow = np.asarray(out[0])
        nzc = (ow > 0).sum(axis=1)
        tile_max = nzc.reshape(-1, 128).max(axis=1)
        print(f"{name}: output clusters mean {nzc.mean():.0f} "
              f"max {nzc.max()}; per-tile trip bound mean "
              f"{tile_max.mean():.0f} max {tile_max.max()}")

    print(f"summary: preupdate {ms_pre:.1f} + select {ms_sel:.1f} "
          f"+ merge(exact) {ms_mx:.1f} = {ms_pre + ms_sel + ms_mx:.1f} "
          f"(update measured {ms_upd:.1f}; merge fast {ms_mf:.1f})",
          flush=True)

    if "--compact" not in sys.argv:
        print("(skip compaction probes; pass --compact)")
        return

    # candidate compaction probes
    def topk_compact(w, k):
        _, idx = jax.lax.top_k(w, k)
        take = lambda a: jnp.take_along_axis(a, idx, axis=1)
        return (take(w), take(cand_mx), take(cand_my), take(cand_00),
                take(cand_01), take(cand_11))

    for kk in (512, 256, 128):
        tk = jax.jit(lambda w, kk=kk: topk_compact(w, kk))
        ms_tk, comp = timeit(f"top_k compaction K->{kk} (+5 gathers)",
                             tk, fastw)
        mg = jax.jit(lambda *a, kk=kk: greedy_merge_pallas(
            *a, float(cfg.minSeparation), F))
        ms_mc, cout = timeit(f"merge fast on compacted {kk}", mg, *comp)
        ow = np.asarray(cout[0])
        print(f"   -> clusters mean {(ow > 0).sum(1).mean():.0f}; "
              f"compact+merge total {ms_tk + ms_mc:.1f} ms")

    def sort_compact(w, k):
        ops = jax.lax.sort((-w, cand_mx, cand_my, cand_00, cand_01,
                            cand_11), dimension=1, num_keys=1)
        return (-ops[0][:, :k],) + tuple(o[:, :k] for o in ops[1:])

    sk_j = jax.jit(lambda w: sort_compact(w, 256))
    try:
        ms_sc, comp = timeit("sort-based compaction K->256", sk_j, fastw)
    except Exception as e:
        print(f"sort compaction failed: {e}")

if __name__ == "__main__":
    main()
