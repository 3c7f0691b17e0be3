"""Range-bearing measurement model as pure batched functions.

Implements h(x), the measurement Jacobian w.r.t. the feature, the inverse
measurement (for births), and the field-of-view detection probability —
the building blocks of the reference's computePreUpdate / computeBirth
(src/phdfilter.cu:205-521) and computeInRangeKernel
(src/phdfilter.cu:1279-1358).
"""

from __future__ import annotations

import jax.numpy as jnp

from phdslam_tpu.ops.linalg import wrap_angle


def predict_measurement(pose, feature_xy):
    """h(pose, feature) -> (range, bearing, dx, dy, r2).

    pose [..., >=3]; feature_xy [..., 2]; broadcasting allowed.
    Returns extras (dx, dy, r2) so callers can build Jacobians without
    recomputation.
    """
    dx = feature_xy[..., 0] - pose[..., 0]
    dy = feature_xy[..., 1] - pose[..., 1]
    r2 = dx * dx + dy * dy
    r = jnp.sqrt(r2)
    bearing = wrap_angle(jnp.arctan2(dy, dx) - pose[..., 2])
    return r, bearing, dx, dy, r2


def measurement_jacobian(dx, dy, r, r2):
    """Jacobian of (range, bearing) w.r.t. feature (x, y): [..., 2, 2].

    Row-major: [[dr/dx, dr/dy], [db/dx, db/dy]] — the reference stores the
    same four values column-major as J[0],J[2],J[1],J[3]
    (src/phdfilter.cu:324-328).
    """
    row_r = jnp.stack([dx / r, dy / r], axis=-1)
    row_b = jnp.stack([-dy / r2, dx / r2], axis=-1)
    return jnp.stack([row_r, row_b], axis=-2)


def detection_probability(r, bearing, cfg):
    """pd if (r <= maxRange and |bearing| <= maxBearing) else 0
    (src/phdfilter.cu:315-317). NB: no minRange check here — that is only in
    the in-range gating kernel."""
    inside = (r <= cfg.maxRange) & (jnp.abs(bearing) <= cfg.maxBearing)
    return jnp.where(inside, cfg.pd, 0.0)


def range_class(r, bearing, cfg):
    """Three-way FOV classification per computeInRangeKernel
    (src/phdfilter.cu:1333-1346): 1 = in range, 2 = nearly in range
    (0.8*minRange..1.2*maxRange, 1.2*maxBearing), 0 = out of range."""
    in_r = ((r >= cfg.minRange) & (r <= cfg.maxRange)
            & (jnp.abs(bearing) <= cfg.maxBearing))
    near = ((r >= 0.8 * cfg.minRange) & (r <= 1.2 * cfg.maxRange)
            & (jnp.abs(bearing) <= 1.2 * cfg.maxBearing))
    return jnp.where(in_r, 1, jnp.where(near, 2, 0)).astype(jnp.int32)


def birth_gaussian(pose, z_rb, cfg):
    """Inverse-measurement birth Gaussian (src/phdfilter.cu:205-242).

    pose [..., >=3]; z_rb [..., 2] (range, bearing).
    Returns (mean [..., 2], cov [..., 2, 2]); the (log) birth weight is
    handled by the caller since it also depends on measurement labels.
    """
    rng = z_rb[..., 0]
    theta = pose[..., 2] + z_rb[..., 1]
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    dx = rng * cos_t
    dy = rng * sin_t
    mean = jnp.stack([pose[..., 0] + dx, pose[..., 1] + dy], axis=-1)

    # Inverse measurement Jacobian columns. The reference computes
    # J0 = dx/range, J1 = dy/range (src/phdfilter.cu:217-221), which are
    # exactly cos(theta), sin(theta) — used directly here so zero-range
    # padding slots and negative-range measurements (Gaussian range noise on
    # near-zero clutter produces them in the shipped datasets) stay finite.
    j0 = cos_t      # dmx/dr
    j1 = sin_t      # dmy/dr
    j2 = -dy        # dmx/db
    j3 = dx         # dmy/db
    var_range = (cfg.stdRange * cfg.birthNoiseFactor) ** 2
    var_bearing = (cfg.stdBearing * cfg.birthNoiseFactor) ** 2
    c00 = j0 * j0 * var_range + j2 * j2 * var_bearing
    c01 = j0 * j1 * var_range + j2 * j3 * var_bearing
    c11 = j1 * j1 * var_range + j3 * j3 * var_bearing
    cov = jnp.stack(
        [jnp.stack([c00, c01], axis=-1), jnp.stack([c01, c11], axis=-1)],
        axis=-2)
    return mean, cov


def birth_gaussian_4d(pose, z_rb, cfg):
    """4-D dynamic-feature birth (src/phdfilter.cu:244-299): position block
    from the 2-D birth, zero velocity mean, diag(covVxBirth, covVyBirth)
    velocity covariance."""
    mean2, cov2 = birth_gaussian(pose, z_rb, cfg)
    zeros = jnp.zeros_like(mean2)
    mean4 = jnp.concatenate([mean2, zeros], axis=-1)
    batch = mean2.shape[:-1]
    cov4 = jnp.zeros(batch + (4, 4), cov2.dtype)
    cov4 = cov4.at[..., :2, :2].set(cov2)
    cov4 = cov4.at[..., 2, 2].set(cfg.covVxBirth)
    cov4 = cov4.at[..., 3, 3].set(cfg.covVyBirth)
    return mean4, cov4
