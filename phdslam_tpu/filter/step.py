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

from phdslam_tpu.config import CPHD_TYPE, SlamConfig
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


def _gather_particles(state: SlamState, idx, new_log_w) -> SlamState:
    take = lambda x: jnp.take(x, idx, axis=0)
    new = jax.tree.map(take, state)
    return new.replace(log_weights=new_log_w, resample_idx=idx)


@partial(jax.jit, static_argnames=("cfg", "with_variance"))
def slam_step(state: SlamState, key, control, z: Measurements, dt,
              do_predict, cfg: SlamConfig, with_variance: bool = False,
              z_prev: Measurements = None):
    """One SLAM time step.

    state       SlamState with P == cfg.n_particles
    key         jax PRNG key for this step
    control     (v_encoder, alpha) traced scalars (ignored for CV motion)
    z           padded Measurements
    dt          traced time delta for this step
    do_predict  traced bool: skip prediction on step 0 (src/main.cpp:1244)
    z_prev      previous step's measurements — CPHD births come from them
                (addBirths(particles, ZPrev), src/phdfilter.cu.bak:68)

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

    # ---- prediction (with sub-step subdivision, src/main.cpp:1248-1254) ----
    def do_pred(st):
        sub = max(int(cfg.subdividePredict), 1)
        st = shotgun_expand(st, cfg.nPredictParticles)
        keys = jax.random.split(k_pred, sub)
        for i in range(sub):
            st = predict(keys[i], st, control, cfg, dt / sub)
        if is_cphd:
            # cardinality prediction (phdPredict CPHD branch,
            # src/phdfilter.cu.bak:564-612)
            st = st.replace(cardinality=C.cardinality_predict(
                st.cardinality, st.cn_birth))
        return st

    def no_pred(st):
        return shotgun_expand(st, cfg.nPredictParticles)

    state = jax.lax.cond(do_predict, do_pred, no_pred, state)

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
        if is_cphd:
            map_out, cn_update, dw = C.cphd_update(
                st.pose, st.map_static, st.cardinality, z.rb, z.label,
                z.valid, cfg, consts)
            lw = st.log_weights + dw
            log_lik = jax.scipy.special.logsumexp(lw)
            lw = lw - log_lik
            return st.replace(map_static=map_out, log_weights=lw,
                              cardinality=cn_update), log_lik
        if cfg.featureModel in (1, 2):  # DYNAMIC / MIXED
            from phdslam_tpu.filter.update4 import phd_update_mixed
            gm2_out, gm4_out, dw = phd_update_mixed(
                st.pose, st.map_static, st.map_dynamic, z.rb, z.label,
                z.valid, cfg)
            lw = st.log_weights + dw
            log_lik = jax.scipy.special.logsumexp(lw)
            lw = lw - log_lik
            return st.replace(map_static=gm2_out, map_dynamic=gm4_out,
                              log_weights=lw), log_lik
        res = phd_update_static(
            st.pose, st.map_static, z.rb, z.label, z.valid, cfg)
        lw = st.log_weights + res.log_weight_delta
        # normalize (src/phdfilter.cu:3749-3755)
        log_lik = jax.scipy.special.logsumexp(lw)
        lw = lw - log_lik
        if with_variance:
            var = phd_variance(k_var, res, st.pose, st.map_static,
                               z.rb, z.valid, cfg)
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


@partial(jax.jit, static_argnames=("cfg", "length"))
def run_scan(state: SlamState, key, controls, zs: Measurements, dts,
             cfg: SlamConfig, length: int):
    """Scan `slam_step` over a whole dataset on-device.

    controls [T,2]; zs: Measurements with leading [T]; dts [T].
    Step 0 skips prediction like the reference (src/main.cpp:1244-1246).
    Returns (final_state, stacked StepAux).
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
                            z_prev=zp)
        return st, aux

    return jax.lax.scan(body, state,
                        (keys, controls, zs, zs_prev, dts, t_idx))
