"""Camera geometry for the monocular SC-PHD (disparity-space) pipeline.

Rebuild of the reference's camera transforms (src/phdfilter.cu:3894-3955)
and the world<->disparity thrust functors (src/phdfilter.cu:3974-4046):

  - 6-DOF camera pose [x, y, z, roll, pitch, yaw] with the reference's
    rotation convention (R = Rz(-yaw)... the exact expanded matrix is
    replicated; camera +z looks along -fx rays)
  - disparity space (baseline = 1): u = u0 - fx*xc/zc, v = v0 - fy*yc/zc,
    d = -fx/zc; visibility = u in (0,W), v in (0,H), d >= 0

Everything is pure batched functions over [..., 3] point arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def _rotation_terms(pose):
    roll, pitch, yaw = pose[..., 3], pose[..., 4], pose[..., 5]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    # rows of the camera->world rotation (src/phdfilter.cu:3906-3914)
    r00 = cp * cy
    r01 = cr * sy + sr * sp * cy
    r02 = sr * sy - cr * sp * cy
    r10 = -cp * sy
    r11 = cr * cy - sr * sp * sy
    r12 = sr * cy + cr * sp * sy
    r20 = sp
    r21 = -sr * cp
    r22 = cr * cp
    return (r00, r01, r02, r10, r11, r12, r20, r21, r22)


def camera_to_world(xc, yc, zc, pose, is_point=True):
    """pose [..., >=6]; xc/yc/zc broadcastable against pose batch dims."""
    (r00, r01, r02, r10, r11, r12, r20, r21, r22) = _rotation_terms(pose)
    xw = xc * r00 + yc * r01 + zc * r02
    yw = xc * r10 + yc * r11 + zc * r12
    zw = xc * r20 + yc * r21 + zc * r22
    if is_point:
        xw = xw + pose[..., 0]
        yw = yw + pose[..., 1]
        zw = zw + pose[..., 2]
    return xw, yw, zw


def world_to_camera(xw, yw, zw, pose, is_point=True):
    (r00, r01, r02, r10, r11, r12, r20, r21, r22) = _rotation_terms(pose)
    if is_point:
        xw = xw - pose[..., 0]
        yw = yw - pose[..., 1]
        zw = zw - pose[..., 2]
    # transpose of the camera->world rotation (src/phdfilter.cu:3934-3942)
    xc = xw * r00 + yw * r10 + zw * r20
    yc = xw * r01 + yw * r11 + zw * r21
    zc = xw * r02 + yw * r12 + zw * r22
    return xc, yc, zc


def world_to_disparity(xw, yw, zw, pose, cfg):
    """Returns (u, v, d, in_fov). src/phdfilter.cu:3993-4004."""
    xc, yc, zc = world_to_camera(xw, yw, zw, pose)
    zc_safe = jnp.where(jnp.abs(zc) < 1e-12, 1e-12, zc)
    u = cfg.u0 - cfg.fx * xc / zc_safe
    v = cfg.v0 - cfg.fy * yc / zc_safe
    d = -cfg.fx / zc_safe
    in_fov = ((u > 0) & (u < cfg.imageWidth)
              & (v > 0) & (v < cfg.imageHeight) & (d >= 0))
    return u, v, d, in_fov


def disparity_to_world(u, v, d, pose, cfg):
    """Inverse transform (src/phdfilter.cu:4039-4044)."""
    d_safe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    xc = (u - cfg.u0) / d_safe
    yc = cfg.fx / cfg.fy * (v - cfg.v0) / d_safe
    zc = -cfg.fx / d_safe
    return camera_to_world(xc, yc, zc, pose)


def camera_cv_predict(pose, noise, cfg, dt):
    """6-DOF constant-velocity camera prediction with accel noise
    (disparityPredict, src/phdfilter.cu:4520-4570): translation integrates
    velocity in the CAMERA frame then rotates to world; angles wrap.

    pose [..., 12] = [x y z roll pitch yaw vx vy vz vroll vpitch vyaw];
    noise [..., 6] pre-sampled accelerations (ax..ayaw).
    """
    from phdslam_tpu.ops.linalg import wrap_angle

    dxc = dt * pose[..., 6] + 0.5 * noise[..., 0] * dt * dt
    dyc = dt * pose[..., 7] + 0.5 * noise[..., 1] * dt * dt
    dzc = dt * pose[..., 8] + 0.5 * noise[..., 2] * dt * dt
    dxw, dyw, dzw = camera_to_world(dxc, dyc, dzc, pose, is_point=False)
    return jnp.stack([
        pose[..., 0] + dxw,
        pose[..., 1] + dyw,
        pose[..., 2] + dzw,
        wrap_angle(pose[..., 3] + dt * pose[..., 9]
                   + 0.5 * noise[..., 3] * dt * dt),
        wrap_angle(pose[..., 4] + dt * pose[..., 10]
                   + 0.5 * noise[..., 4] * dt * dt),
        wrap_angle(pose[..., 5] + dt * pose[..., 11]
                   + 0.5 * noise[..., 5] * dt * dt),
        pose[..., 6] + dt * noise[..., 0],
        pose[..., 7] + dt * noise[..., 1],
        pose[..., 8] + dt * noise[..., 2],
        pose[..., 9] + dt * noise[..., 3],
        pose[..., 10] + dt * noise[..., 4],
        pose[..., 11] + dt * noise[..., 5],
    ], axis=-1)
