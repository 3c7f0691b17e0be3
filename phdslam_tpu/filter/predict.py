"""Prediction: particle pose propagation + feature-map prediction.

Replaces phdPredict (src/phdfilter.cu:1080-1257) and predictMapMixed
(src/phdfilter.cu:910-1035). Noise is drawn on-device with jax.random
(counter-based, reproducible) instead of host boost RNG + memcpy.

Particle "shotgunning" (nPredictParticles copies per prior particle with
weight - log n, src/phdfilter.cu:1185-1238) is a static-shape repeat: the
caller owns the expanded particle count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phdslam_tpu.config import (
    ACKERMAN_MOTION,
    CV_MOTION,
    DYNAMIC_MODEL,
    MIXED_MODEL,
    STATIC_MODEL,
)
from phdslam_tpu.filter.state import SlamState
from phdslam_tpu.models.motion import ackerman_predict, cv_predict


def shotgun_expand(state: SlamState, n_copies: int) -> SlamState:
    """Duplicate each particle n_copies times, downscaling weights by
    log(n_copies) (src/phdfilter.cu:1185-1238). resample_idx is repeated so
    the lineage bookkeeping matches the reference."""
    if n_copies <= 1:
        return state

    def rep(x):
        return jnp.repeat(x, n_copies, axis=0)

    new = jax.tree.map(rep, state)
    return new.replace(
        log_weights=new.log_weights - jnp.log(float(n_copies)))


def predict_pose(key, pose, control, cfg, dt):
    """One pose-prediction sub-step over all particles.

    control: (v_encoder, alpha) scalars for Ackerman; ignored for CV.
    Noise scaling follows the reference exactly: CV uses *3x* the configured
    accel sigmas (src/phdfilter.cu:1112-1118), Ackerman uses stdEncoder /
    stdAlpha unscaled (src/phdfilter.cu:1146-1152).
    """
    n = pose.shape[0]
    if cfg.motionType == ACKERMAN_MOTION:
        noise = jax.random.normal(key, (n, 2), pose.dtype)
        noise = noise * jnp.array([cfg.stdEncoder, cfg.stdAlpha], pose.dtype)
        return ackerman_predict(pose, control, noise, cfg, dt)
    elif cfg.motionType == CV_MOTION:
        noise = jax.random.normal(key, (n, 3), pose.dtype)
        noise = noise * jnp.array(
            [3.0 * cfg.ax, 3.0 * cfg.ay, 3.0 * cfg.ayaw], pose.dtype)
        return cv_predict(pose, noise, dt)
    raise ValueError(f"unknown motionType {cfg.motionType}")


def predict(key, state: SlamState, control, cfg, dt) -> SlamState:
    """Full prediction: pose (with subdivision handled by caller) + map.

    The static map needs no prediction under the static feature model (the
    reference's constant-position noise path is wired but unused with
    default std_vx_features applied only in disparity/mixed configs)."""
    pose = predict_pose(key, state.pose, control, cfg, dt)
    state = state.replace(pose=pose)
    if cfg.featureModel in (DYNAMIC_MODEL, MIXED_MODEL) \
            and state.map_dynamic.max_features > 0:
        from phdslam_tpu.filter.update4 import cv_predict4, jump_markov_scales
        scale, _jump_w = jump_markov_scales(state.map_dynamic, cfg)
        state = state.replace(map_dynamic=cv_predict4(
            state.map_dynamic, cfg, dt, w_scale=scale))
    return state
