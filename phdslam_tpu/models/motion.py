"""Vehicle and feature motion models as pure batched functions.

Vehicle models (pose = [px, py, ptheta, vx, vy, vtheta]):
 - ``ackerman_predict``  — Ackerman/bicycle steering with encoder-velocity
   to vehicle-center conversion and sensor-offset terms, matching
   phdPredictKernelAckerman (src/phdfilter.cu:785-825).
 - ``cv_predict``        — constant-velocity with 2nd-order accel noise
   integration, matching phdPredictKernel (src/phdfilter.cu:827-859).

Feature models (per device_math.cuh:608-683):
 - ``cv_feature_predict``       — 4-D [x,y,vx,vy] constant velocity,
   cov' = F cov F^T + Q(dt) with white-accel Q.
 - ``cp_feature_predict``       — 2-D constant position, additive diag noise.
 - ``jump_markov_split``        — static<->dynamic transition weights via the
   speed sigmoid, matching predictMapKernelMixed (src/phdfilter.cu:910-963).

Noise is sampled by the *caller* with jax.random keys (the reference samples
on the host with boost RNG, src/phdfilter.cu:1112-1152); models take noise
arrays so they stay deterministic and testable.
"""

from __future__ import annotations

import jax.numpy as jnp

from phdslam_tpu.ops.linalg import wrap_angle, logistic


def ackerman_predict(pose, control, noise, cfg, dt):
    """Ackerman-steering pose prediction.

    pose    [..., 6]
    control (v_encoder, alpha) scalars (broadcastable)
    noise   [..., 2]: (n_encoder, n_alpha) pre-sampled Gaussian noise
    dt      effective step (already divided by subdividePredict by caller)

    Velocities in the output are zeroed, as the reference does
    (src/phdfilter.cu:818-820).
    """
    v_encoder, alpha = control
    theta = pose[..., 2]
    ve = v_encoder + noise[..., 0]
    al = alpha + noise[..., 1]
    vc = ve / (1.0 - jnp.tan(al) * cfg.h / cfg.l)
    xc_dot = vc * jnp.cos(theta)
    yc_dot = vc * jnp.sin(theta)
    thetac_dot = vc * jnp.tan(al) / cfg.l
    px = pose[..., 0] + dt * (
        xc_dot - thetac_dot * (cfg.a * jnp.sin(theta) + cfg.b * jnp.cos(theta)))
    py = pose[..., 1] + dt * (
        yc_dot + thetac_dot * (cfg.a * jnp.cos(theta) - cfg.b * jnp.sin(theta)))
    ptheta = wrap_angle(theta + dt * thetac_dot)
    zeros = jnp.zeros_like(px)
    return jnp.stack([px, py, ptheta, zeros, zeros, zeros], axis=-1)


def cv_predict(pose, noise, dt):
    """Constant-velocity pose prediction with accel noise.

    noise [..., 3]: (ax, ay, atheta) pre-sampled accelerations.
    """
    theta = pose[..., 2]
    vx, vy, vtheta = pose[..., 3], pose[..., 4], pose[..., 5]
    ax, ay, ath = noise[..., 0], noise[..., 1], noise[..., 2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    px = pose[..., 0] + dt * (vx * c - vy * s) + 0.5 * dt * dt * (ax * c - ay * s)
    py = pose[..., 1] + dt * (vx * s + vy * c) + 0.5 * dt * dt * (ax * s + ay * c)
    ptheta = wrap_angle(theta + dt * vtheta + 0.5 * dt * dt * ath)
    return jnp.stack(
        [px, py, ptheta, vx + dt * ax, vy + dt * ay, vtheta + dt * ath],
        axis=-1)


def _cv_transition(dt, dtype):
    f = jnp.eye(4, dtype=dtype)
    return f.at[0, 2].set(dt).at[1, 3].set(dt)


def cv_feature_q(dt, var_x, var_y, dtype=jnp.float32):
    """White-acceleration process noise for the 4-D CV feature model
    (device_math.cuh:628-656): per axis q*[[dt^4/4, dt^3/2],[dt^3/2, dt^2]]
    in (pos, vel) coordinates."""
    d4, d3, d2 = dt ** 4 / 4.0, dt ** 3 / 2.0, dt ** 2
    q = jnp.zeros((4, 4), dtype)
    q = q.at[0, 0].set(d4 * var_x).at[0, 2].set(d3 * var_x)
    q = q.at[2, 0].set(d3 * var_x).at[2, 2].set(d2 * var_x)
    q = q.at[1, 1].set(d4 * var_y).at[1, 3].set(d3 * var_y)
    q = q.at[3, 1].set(d3 * var_y).at[3, 3].set(d2 * var_y)
    return q


def cv_feature_predict(mean, cov, cfg, dt, scale_x=1.0, scale_y=1.0):
    """4-D feature CV prediction: mean' = F mean; cov' = F cov F^T + Q."""
    f = _cv_transition(dt, mean.dtype)
    var_x = cfg.stdAxMap ** 2 * scale_x
    var_y = cfg.stdAyMap ** 2 * scale_y
    q = cv_feature_q(dt, var_x, var_y, mean.dtype)
    mean_p = jnp.einsum("ij,...j->...i", f, mean)
    cov_p = jnp.einsum("ij,...jk,lk->...il", f, cov, f) + q
    return mean_p, cov_p


def cp_feature_predict(mean, cov, cfg, dt):
    """2-D constant-position feature: additive (std*dt)^2 diagonal noise
    (device_math.cuh:661-683)."""
    q = jnp.array([[(cfg.stdVxMap * dt) ** 2, 0.0],
                   [0.0, (cfg.stdVyMap * dt) ** 2]], cov.dtype)
    return mean, cov + q


def jump_markov_split(w, mean, cfg, feature_model):
    """Survival & jump-Markov weight scaling for dynamic features
    (src/phdfilter.cu:923-954).

    Returns (w_dynamic_scale, w_jump, scale_x, scale_y): the dynamic map's
    weights are multiplied by p_jmm*ps; the static 'jump' copies carry
    (1-p_jmm)*w.
    """
    vx, vy = mean[..., 2], mean[..., 3]
    v_mag = jnp.sqrt(vx * vx + vy * vy)
    sigmoid_v = 1.0 / (1.0 + jnp.exp(cfg.beta * (cfg.tau - v_mag)))
    if feature_model == 1:  # DYNAMIC
        p_jmm = jnp.ones_like(v_mag)
        ps = 1.0 - logistic(v_mag, 0.0, 1.0 - cfg.ps, cfg.beta, cfg.tau)
        scale_x = logistic(vx, 0.0, 1.0, cfg.beta, cfg.tau)
        scale_y = logistic(vy, 0.0, 1.0, cfg.beta, cfg.tau)
    else:  # MIXED
        p_jmm = sigmoid_v
        ps = jnp.full_like(v_mag, cfg.ps)
        scale_x = jnp.ones_like(v_mag)
        scale_y = jnp.ones_like(v_mag)
    w_dyn = p_jmm * ps * w
    w_jump = (1.0 - p_jmm) * w
    return w_dyn, w_jump, scale_x, scale_y
