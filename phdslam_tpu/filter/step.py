"""The full SLAM step as one jit-compiled function, plus a `lax.scan` runner.

Replaces the reference's per-step host orchestration (run_synth loop,
src/main.cpp:1178-1312) — which crosses the host/device boundary >=8 times
per step — with a single on-device function:

    predict -> PHD update -> weight normalize -> nEff -> resample

All shapes are static; `cfg` is a hashable frozen dataclass closed over as a
static jit argument (the analog of __constant__ dev_config). Prediction and
update are gated with `lax.cond` on traced booleans so one compiled
executable serves measurement-less odometry steps too (the timestamped
interleave of src/main.cpp:1187-1237).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from phdslam_tpu.config import CPHD_TYPE, FASTSLAM_TYPE, SlamConfig
from phdslam_tpu.filter.predict import predict, shotgun_expand
from phdslam_tpu.filter.state import Measurements, SlamState
from phdslam_tpu.filter.update import phd_update_static, phd_variance
from phdslam_tpu.ops.resample import neff, stratified_resample_indices


class StepAux(NamedTuple):
    expected_pose: jax.Array   # [6]
    neff: jax.Array            # scalar (normalized)
    resampled: jax.Array       # bool
    n_measure: jax.Array       # int
    log_lik: jax.Array         # scalar: logsumexp of unnormalized weights


class LogAux(NamedTuple):
    """Per-step state needed to write the state_estimate log contract
    (src/main.cpp:848-954) after a whole-run scan: the MAP particle's map
    plus the per-particle quantities. Stacked over T by lax.scan; small
    (O(F + P) per step, the full [P, F] maps never leave the device)."""

    map_w: jax.Array           # [F] MAP particle's static weights
    map_mx: jax.Array          # [F]
    map_my: jax.Array          # [F]
    map_c00: jax.Array         # [F]
    map_c01: jax.Array         # [F]
    map_c11: jax.Array         # [F]
    dyn_w: jax.Array           # [Fd] MAP particle's dynamic weights
    dyn_mean: jax.Array        # [4, Fd] channels
    dyn_cov: jax.Array         # [10, Fd] channels
    log_weights: jax.Array     # [P]
    poses: jax.Array           # [P, 6]
    resample_idx: jax.Array    # [P]
    cardinality: jax.Array     # [Nmax+1] MAP particle's (zeros(1) for PHD)


def _log_aux(state: SlamState) -> LogAux:
    idx = jnp.argmax(state.log_weights)
    ms, md = state.map_static, state.map_dynamic
    cn = (jnp.zeros((1,), state.log_weights.dtype)
          if state.cardinality is None else state.cardinality[idx])
    return LogAux(
        map_w=ms.w[idx], map_mx=ms.mx[idx], map_my=ms.my[idx],
        map_c00=ms.c00[idx], map_c01=ms.c01[idx], map_c11=ms.c11[idx],
        dyn_w=md.w[idx], dyn_mean=md.mean_channels[idx],
        dyn_cov=md.cov_channels[idx],
        log_weights=state.log_weights, poses=state.pose,
        resample_idx=state.resample_idx, cardinality=cn)


def _pshard(pmesh, f, sharded, replicated):
    """Run ``f(*sharded, *replicated)`` under `shard_map` over ``pmesh``'s
    (single) particle axis: every `sharded` arg/output shards on its leading
    axis, `replicated` args replicate.

    The measurement updates are RNG-free and per-particle independent, so
    this is bit-identical to the plain call — but manual partitioning lets
    the Pallas kernel custom calls lower per-shard on a multi-chip mesh,
    which GSPMD cannot do for a `pallas_call` (it would fail to propagate a
    sharding through the opaque custom call). Prediction, weight
    normalization, and the global resample stay outside in GSPMD-land where
    XLA's collective insertion handles them (parallel/mesh.py docstring).
    """
    if pmesh is None:
        return f(*sharded, *replicated)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = pmesh.axis_names[0]
    in_specs = tuple(jax.tree.map(lambda _: P(axis), a) for a in sharded) \
        + tuple(jax.tree.map(lambda _: P(), r) for r in replicated)
    out_shape = jax.eval_shape(f, *sharded, *replicated)
    out_specs = jax.tree.map(lambda _: P(axis), out_shape)
    return shard_map(f, mesh=pmesh, in_specs=in_specs,
                     out_specs=out_specs,
                     check_vma=False)(*sharded, *replicated)


def _gather_particles(state: SlamState, idx, new_log_w) -> SlamState:
    take = lambda x: jnp.take(x, idx, axis=0)
    new = jax.tree.map(take, state)
    return new.replace(log_weights=new_log_w, resample_idx=idx)


def _run_prediction(state: SlamState, k_pred, control, dt, do_predict,
                    cfg: SlamConfig) -> SlamState:
    """Shotgun expansion + (subdivided) pose/map prediction, gated on
    `do_predict` (src/main.cpp:1244-1254). Shared by slam_step and the
    standalone predicted_state (save_prediction dumps)."""
    is_cphd = cfg.filterType == CPHD_TYPE

    def do_pred(st):
        sub = max(int(cfg.subdividePredict), 1)
        st = shotgun_expand(st, cfg.nPredictParticles)
        keys = jax.random.split(k_pred, sub)
        for i in range(sub):
            st = predict(keys[i], st, control, cfg, dt / sub)
        if is_cphd and not cfg.cnPoissonPredict:
            # cardinality prediction by birth convolution (phdPredict CPHD
            # branch, src/phdfilter.cu.bak:564-612). The reference computes
            # this but its update overwrites the result with a Poisson
            # rebuild (.bak:2473-2497), so under the default
            # cnPoissonPredict=True we skip the (discarded) convolution.
            from phdslam_tpu.filter import cphd as C
            st = st.replace(cardinality=C.cardinality_predict(
                st.cardinality, st.cn_birth))
        return st

    def no_pred(st):
        return shotgun_expand(st, cfg.nPredictParticles)

    return jax.lax.cond(do_predict, do_pred, no_pred, state)


@partial(jax.jit, static_argnames=("cfg",))
def predicted_state(state: SlamState, key, control, dt, do_predict,
                    cfg: SlamConfig) -> SlamState:
    """The post-prediction state exactly as slam_step computes it internally
    (same PRNG key derivation), so save_prediction dumps
    (writeParticlesMat(particles, n, "particles_predict"),
    src/main.cpp:1256-1257) match what the update actually consumes."""
    k_pred, _, _ = jax.random.split(key, 3)
    return _run_prediction(state, k_pred, control, dt, do_predict, cfg)


@partial(jax.jit, static_argnames=("cfg", "with_variance", "pmesh"))
def slam_step(state: SlamState, key, control, z: Measurements, dt,
              do_predict, cfg: SlamConfig, with_variance: bool = False,
              z_prev: Measurements = None, pmesh=None):
    """One SLAM time step.

    state       SlamState with P == cfg.n_particles
    key         jax PRNG key for this step
    control     (v_encoder, alpha) traced scalars (ignored for CV motion)
    z           padded Measurements
    dt          traced time delta for this step
    do_predict  traced bool: skip prediction on step 0 (src/main.cpp:1244)
    z_prev      previous step's measurements — CPHD births come from them
                (addBirths(particles, ZPrev), src/phdfilter.cu.bak:68)
    pmesh       optional jax.sharding.Mesh with one (particle) axis: the
                measurement update runs under shard_map over it so the
                Pallas kernels lower per-shard (see _pshard). Numerics are
                identical to pmesh=None.

    Returns (state', StepAux).
    """
    k_pred, k_var, k_res = jax.random.split(key, 3)
    is_cphd = cfg.filterType == CPHD_TYPE
    if is_cphd:
        from phdslam_tpu.filter import cphd as C
        consts = C.make_constants(cfg)
        if z_prev is None:
            m = z.rb.shape[0]
            z_prev = Measurements(
                rb=jnp.zeros((m, 2), z.rb.dtype),
                label=jnp.zeros((m,), jnp.int32),
                valid=jnp.zeros((m,), bool))

    # ---- informed 4-D birth anchors (cfg.birthVelocityInit) -------------
    # Previous measurements in the world frame at pose_{t-1} (BEFORE the
    # prediction moves the particles) — the two-detection velocity init's
    # first endpoint (update4.informed_birth_velocity).
    zw_prev = None
    if (cfg.featureModel in (1, 2) and cfg.birthVelocityInit
            and z_prev is not None):
        from phdslam_tpu.filter.update4 import prev_measurement_world
        zw_prev = prev_measurement_world(state.pose, z_prev.rb, z_prev.valid)
        if cfg.nPredictParticles > 1:
            # shotgun expansion duplicates particles; anchors follow
            zw_prev = jnp.repeat(zw_prev, cfg.nPredictParticles, axis=0)

    # ---- prediction (with sub-step subdivision, src/main.cpp:1248-1254) ----
    state = _run_prediction(state, k_pred, control, dt, do_predict, cfg)

    # ---- CPHD births from the previous measurements ---------------------
    if is_cphd:
        def births(st):
            new_map, cn_birth = C.add_births(
                st.map_static, st.pose, z_prev.rb, z_prev.valid, cfg, consts)
            return st.replace(map_static=new_map, cn_birth=cn_birth)

        state = jax.lax.cond(z_prev.count > 0, births, lambda s: s, state)

    # ---- measurement update -------------------------------------------
    n_measure = z.count

    def do_update(st):
        if cfg.filterType == FASTSLAM_TYPE:
            from phdslam_tpu.filter.fastslam import fastslam_update
            gm_out, dw = _pshard(
                pmesh,
                lambda pose, g, zrb, zval: fastslam_update(
                    pose, g, zrb, zval, cfg),
                (st.pose, st.map_static),
                (z.rb, z.valid))
            lw = st.log_weights + dw
            log_lik = jax.scipy.special.logsumexp(lw)
            lw = lw - log_lik
            return st.replace(map_static=gm_out, log_weights=lw), log_lik
        if is_cphd:
            map_out, cn_update, dw = _pshard(
                pmesh,
                lambda pose, ms, cn, zrb, zlab, zval, cc: C.cphd_update(
                    pose, ms, cn, zrb, zlab, zval, cfg, cc),
                (st.pose, st.map_static, st.cardinality),
                (z.rb, z.label, z.valid, consts))
            lw = st.log_weights + dw
            log_lik = jax.scipy.special.logsumexp(lw)
            lw = lw - log_lik
            return st.replace(map_static=map_out, log_weights=lw,
                              cardinality=cn_update), log_lik
        if cfg.featureModel in (1, 2):  # DYNAMIC / MIXED
            from phdslam_tpu.filter.update4 import phd_update_mixed
            if zw_prev is not None:
                from phdslam_tpu.filter.update4 import (
                    informed_birth_velocity)

                def upd_mixed(pose, g2, g4, zw, zrb, zlab, zval, zpv, dtt):
                    bv = informed_birth_velocity(pose, zrb, zval, zw, zpv,
                                                 dtt, cfg)
                    return phd_update_mixed(pose, g2, g4, zrb, zlab, zval,
                                            cfg, birth_vel=bv)

                gm2_out, gm4_out, dw = _pshard(
                    pmesh, upd_mixed,
                    (st.pose, st.map_static, st.map_dynamic, zw_prev),
                    (z.rb, z.label, z.valid, z_prev.valid, dt))
            else:
                gm2_out, gm4_out, dw = _pshard(
                    pmesh,
                    lambda pose, g2, g4, zrb, zlab, zval: phd_update_mixed(
                        pose, g2, g4, zrb, zlab, zval, cfg),
                    (st.pose, st.map_static, st.map_dynamic),
                    (z.rb, z.label, z.valid))
            lw = st.log_weights + dw
            log_lik = jax.scipy.special.logsumexp(lw)
            lw = lw - log_lik
            return st.replace(map_static=gm2_out, map_dynamic=gm4_out,
                              log_weights=lw), log_lik
        res = _pshard(
            pmesh,
            lambda pose, g, zrb, zlab, zval: phd_update_static(
                pose, g, zrb, zlab, zval, cfg),
            (st.pose, st.map_static),
            (z.rb, z.label, z.valid))
        lw = st.log_weights + res.log_weight_delta
        # normalize (src/phdfilter.cu:3749-3755)
        log_lik = jax.scipy.special.logsumexp(lw)
        lw = lw - log_lik
        if with_variance:
            var = phd_variance(res, z.valid)
        else:
            var = st.variances
        return st.replace(map_static=res.map_out, log_weights=lw,
                          variances=var), log_lik

    def no_update(st):
        return st, jnp.asarray(0.0, st.log_weights.dtype)

    state, log_lik = jax.lax.cond(n_measure > 0, do_update, no_update, state)

    # ---- expected pose (recoverSlamState, src/main.cpp:324-340) --------
    w_lin = jnp.exp(state.log_weights)
    exp_pose = jnp.sum(w_lin[:, None] * state.pose, axis=0)

    # ---- resampling (src/main.cpp:1281-1297) ---------------------------
    n_eff = neff(state.log_weights)

    if cfg.debug:
        # in-kernel instrumentation analog (cuPrintf around the update,
        # src/phdfilter.cu:3448,3672; config.debug branches): per-step
        # normalizer / weight stats, compile-time gated (cfg is static)
        jax.debug.print(
            "[debug] log_lik={ll:.6f} neff={ne:.4f} lw[min,max]=[{lo:.4f},"
            "{hi:.4f}] card0={c0:.2f}",
            ll=log_lik, ne=n_eff, lo=jnp.min(state.log_weights),
            hi=jnp.max(state.log_weights),
            c0=jnp.sum(state.map_static.w[0]))
    p_now = state.pose.shape[0]
    n_target = cfg.n_particles
    if p_now == n_target:
        trigger = (n_eff <= cfg.resampleThresh) & (n_measure > 0)

        def do_resample(st):
            res_idx = stratified_resample_indices(
                k_res, st.log_weights, n_target)
            new_lw = jnp.full((n_target,), -jnp.log(float(n_target)),
                              st.log_weights.dtype)
            return _gather_particles(st, res_idx, new_lw)

        def no_resample(st):
            # identity lineage (src/main.cpp:1292-1297); cond avoids the
            # full-map gather copy on non-resampling steps
            return st.replace(
                resample_idx=jnp.arange(n_target, dtype=jnp.int32))

        state = jax.lax.cond(trigger, do_resample, no_resample, state)
        resampled = trigger
    else:
        # shotgun-expanded step: always resample back to the target count
        # (the reference forces this once P > 5*n_particles,
        # src/main.cpp:1286; with static shapes we contract every step)
        idx = stratified_resample_indices(k_res, state.log_weights, n_target)
        new_lw = jnp.full((n_target,), -jnp.log(float(n_target)),
                          state.log_weights.dtype)
        state = _gather_particles(state, idx, new_lw)
        resampled = jnp.asarray(True)

    aux = StepAux(expected_pose=exp_pose, neff=n_eff, resampled=resampled,
                  n_measure=n_measure, log_lik=log_lik)
    return state, aux


@partial(jax.jit,
         static_argnames=("cfg", "length", "with_log_state", "pmesh"))
def run_scan(state: SlamState, key, controls, zs: Measurements, dts,
             cfg: SlamConfig, length: int, with_log_state: bool = False,
             pmesh=None):
    """Scan `slam_step` over a whole dataset on-device.

    controls [T,2]; zs: Measurements with leading [T]; dts [T].
    Step 0 skips prediction like the reference (src/main.cpp:1244-1246).
    Returns (final_state, stacked StepAux) — or
    (final_state, (stacked StepAux, stacked LogAux)) when `with_log_state`,
    so the runner can write the per-step state_estimate log contract after
    the scan completes.
    """
    keys = jax.random.split(key, length)
    t_idx = jnp.arange(length)
    # previous-step measurements (CPHD births): shift by one, empty at t=0
    zs_prev = jax.tree.map(
        lambda x: jnp.concatenate(
            [jnp.zeros_like(x[:1]), x[:-1]], axis=0), zs)

    def body(st, inp):
        k, ctrl, z, zp, dt, t = inp
        st, aux = slam_step(st, k, (ctrl[0], ctrl[1]), z, dt, t > 0, cfg,
                            z_prev=zp, pmesh=pmesh)
        if with_log_state:
            return st, (aux, _log_aux(st))
        return st, aux

    return jax.lax.scan(body, state,
                        (keys, controls, zs, zs_prev, dts, t_idx))
