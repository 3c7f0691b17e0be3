"""GM-PHD measurement update, fully on-device with fixed shapes.

The TPU-native re-design of the reference's update path
(src/phdfilter.cu:3336-3761):

  reference (dynamic shapes, host staging)      this module (static shapes)
  ------------------------------------------    ---------------------------
  computeInRangeKernel + host 3-way split       per-(P,F) range-class masks
  preUpdateSynthKernel (thread/feature x        batched [P,F] Kalman terms +
    loop over <=256 const-mem measurements)       [P,M,F] log-likelihoods
  phdUpdateKernel (block/particle; update       per-(P,M) normalizers via
    array [nondet|detect|births])                 masked sums; weights stay
                                                  factored (nondet/det/birth)
  merge_flags + thrust prune                    weight thresholding (w -> 0)
  recombine + phdUpdateMergeKernel              top-K candidate pool ->
                                                  bounded greedy merge
  out-of-range pass-through concat              weight-ranked union back to
                                                  the padded [P,F] map

Key structural observation exploited here: the Kalman gain, updated
covariance, innovation covariance and its determinant depend only on the
(particle, feature) pair — not on the measurement — so detection terms share
per-feature covariances and only an [P,M,F] scalar likelihood plus [P,M,F,2]
innovations are measurement-indexed. Means of surviving detection terms are
recomputed after top-K selection instead of materializing [P,M,F] Gaussians.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from phdslam_tpu.config import SlamConfig, STATIC_MEASUREMENT
from phdslam_tpu.filter.state import GaussianMixture
from phdslam_tpu.models.measurement import (
    birth_gaussian,
    measurement_jacobian,
    predict_measurement,
    range_class,
)
from phdslam_tpu.ops.gm import greedy_merge_batch, top_k_components
from phdslam_tpu.ops.linalg import (
    det2,
    inv2,
    safe_log,
    sym2,
    wrap_angle,
)

LOG_2PI = 1.8378770664093453


class PreUpdate(NamedTuple):
    """Measurement-independent Kalman terms per (particle, feature)."""

    r: jax.Array          # [P, F] predicted range
    bearing: jax.Array    # [P, F] predicted bearing
    pd: jax.Array         # [P, F] detection probability (0 if not in range)
    gain: jax.Array       # [P, F, 2, 2] Kalman gain
    cov_update: jax.Array # [P, F, 2, 2] Joseph-form updated covariance
    s_inv: jax.Array      # [P, F, 2, 2] innovation covariance inverse
    log_det_s: jax.Array  # [P, F]
    rclass: jax.Array     # [P, F] 0=out, 1=in, 2=near (0 for empty slots)


def kalman_preupdate(pose, gm: GaussianMixture, cfg: SlamConfig) -> PreUpdate:
    """Per-(P,F) EKF pre-update terms (src/phdfilter.cu:301-395).

    Innovation covariance is symmetrized exactly as the reference does; the
    covariance update uses the Joseph form (I-KJ)P(I-KJ)^T + K R K^T, which
    is the matrix form of the reference's Maple-expanded expressions.
    """
    mean_xy = gm.mean[..., :2]
    r, b, dx, dy, r2 = predict_measurement(pose[:, None, :], mean_xy)
    rc = range_class(r, b, cfg)
    rc = jnp.where(gm.valid, rc, 0)
    in_mask = rc == 1
    pd = jnp.where(in_mask, cfg.pd, 0.0).astype(gm.w.dtype)

    # For slots that take no part in the update (empty / not in range),
    # substitute a benign geometry (dx=1, dy=0) so every downstream Kalman
    # quantity stays finite — otherwise 0*inf NaNs would leak through the
    # masked weighted sums in the merge.
    dx = jnp.where(in_mask, dx, 1.0)
    dy = jnp.where(in_mask, dy, 0.0)
    r2 = dx * dx + dy * dy
    r_safe = jnp.sqrt(r2)
    r2_safe = r2
    jac = measurement_jacobian(dx, dy, r_safe, r2_safe)        # [P,F,2,2]

    p = gm.cov[..., :2, :2]
    var_r = cfg.stdRange ** 2
    var_b = cfg.stdBearing ** 2
    rmat = jnp.array([[var_r, 0.0], [0.0, var_b]], gm.w.dtype)
    a = jnp.einsum("...ij,...jk,...lk->...il", jac, p, jac)  # J P J^T
    sigma = sym2(a + rmat)
    # Cancellation-free determinant. The naive s00*s11 - s01^2 suffers
    # catastrophic float32 cancellation once feature covariances grow, which
    # feeds garbage Kalman gains back into the covariances (runaway). For
    # PSD A = J P J^T and diagonal R:
    #   det(A + R) = det(A) + A00*var_b + A11*var_r + var_r*var_b
    # and det(A) = det(J)^2 det(P) = det(P) / r^2  (det(J) = 1/r for the
    # range-bearing Jacobian). Every term is nonnegative, and det(R) is a
    # mathematically valid lower bound (det(A+B) >= det(A)+det(B) for PSD
    # 2x2), used as the clamp floor.
    det_p = jnp.maximum(det2(p), 0.0)
    det_s = (det_p / r2_safe + a[..., 0, 0] * var_b
             + a[..., 1, 1] * var_r + var_r * var_b)
    det_s = jnp.maximum(det_s, var_r * var_b)
    s_inv = inv2(sigma, det_s)
    # K = P J^T S^-1
    gain = jnp.einsum("...ij,...kj,...kl->...il", p, jac, s_inv)
    ikj = jnp.eye(2, dtype=gm.w.dtype) - jnp.einsum(
        "...ij,...jk->...ik", gain, jac)
    cov_up = (jnp.einsum("...ij,...jk,...lk->...il", ikj, p, ikj)
              + jnp.einsum("...ij,jk,...lk->...il", gain, rmat, gain))
    return PreUpdate(
        r=r, bearing=b, pd=pd, gain=gain, cov_update=cov_up, s_inv=s_inv,
        log_det_s=safe_log(jnp.maximum(det_s, 0.0)), rclass=rc)


def detection_log_weights(pre: PreUpdate, gm: GaussianMixture, z_rb, z_label,
                          z_valid, cfg: SlamConfig):
    """Log partial weights of detection terms, [P, M, F]
    (src/phdfilter.cu:366-394):
        log pd + log w + log N(innov; 0, S)
    with N evaluated through the symmetrized S inverse.
    Also returns innovations [P, M, F, 2] for mean reconstruction.
    """
    innov_r = z_rb[None, :, None, 0] - pre.r[:, None, :]
    innov_b = wrap_angle(z_rb[None, :, None, 1] - pre.bearing[:, None, :])
    innov = jnp.stack([innov_r, innov_b], axis=-1)          # [P,M,F,2]
    si = pre.s_inv[:, None]                                  # [P,1,F,2,2]
    dist = (innov_r * innov_r * si[..., 0, 0]
            + innov_r * innov_b * (si[..., 0, 1] + si[..., 1, 0])
            + innov_b * innov_b * si[..., 1, 1])
    lw = (safe_log(pre.pd)[:, None, :]
          + safe_log(gm.w)[:, None, :]
          - 0.5 * dist
          - LOG_2PI
          - 0.5 * pre.log_det_s[:, None, :])
    # mask: in-range features, valid measurements, label gating
    in_mask = (pre.rclass == 1)[:, None, :]
    ok = in_mask & z_valid[None, :, None]
    if cfg.labeledMeasurements:
        ok = ok & (z_label[None, :, None] == STATIC_MEASUREMENT)
    neg_inf = jnp.asarray(-jnp.inf, lw.dtype)
    lw = jnp.where(ok, lw, neg_inf)
    return lw, innov


class UpdateResult(NamedTuple):
    map_out: GaussianMixture     # merged + pass-through map, [P, F]
    log_weight_delta: jax.Array  # [P] multi-object likelihood increment
    # factored update-component weights, for variance estimation / debugging
    w_nondetect: jax.Array       # [P, F]
    w_detect: jax.Array          # [P, M, F]
    w_birth: jax.Array           # [P, M]
    pre: PreUpdate               # measurement-independent Kalman terms


def phd_update_static(pose, gm: GaussianMixture, z_rb, z_label, z_valid,
                      cfg: SlamConfig) -> UpdateResult:
    """Full static-model PHD update for all particles.

    pose [P,6]; gm: [P,F] 2-D mixture; z_rb [M,2]; z_valid [M] bool.
    """
    P, F = gm.w.shape
    M = z_rb.shape[0]
    dtype = gm.w.dtype

    pre = kalman_preupdate(pose, gm, cfg)
    lw, innov = detection_log_weights(pre, gm, z_rb, z_label, z_valid, cfg)

    # --- per-measurement normalizers (src/phdfilter.cu:2190-2223) ---
    # The reference sums raw exp() of the log partial weights, then adds
    # clutter density and birth weight.
    sum_exp = jnp.sum(jnp.exp(lw), axis=-1)                  # [P, M]
    birth_w_lin = jnp.asarray(cfg.birthWeight, dtype)
    if cfg.labeledMeasurements:
        birth_ok = (z_label == STATIC_MEASUREMENT)[None, :]
    else:
        birth_ok = jnp.ones((1, M), bool)
    normalizer = sum_exp + cfg.clutterDensity + birth_w_lin
    log_norm = safe_log(normalizer)                           # [P, M]

    # --- updated component weights (linear space) ---
    w_nondetect = jnp.where(pre.rclass == 1, gm.w * (1.0 - pre.pd), 0.0)
    w_detect = jnp.exp(lw - log_norm[..., None])              # [P, M, F]
    w_birth = jnp.where(
        birth_ok & z_valid[None, :],
        birth_w_lin / normalizer, 0.0)                        # [P, M]

    # --- particle weighting (src/phdfilter.cu:2256-2305) ---
    mvalid = z_valid.astype(dtype)
    sum_log_norm = jnp.sum(log_norm * mvalid[None, :], axis=-1)   # [P]
    n_measure = jnp.sum(mvalid)
    if cfg.particleWeighting == 0:
        # cluster-process: sum log normalizers - predicted cardinality,
        # where cardinality counts pd*w for persistent + birthWeight per z.
        card_pred = (jnp.sum(pre.pd * gm.w, axis=-1)
                     + n_measure * birth_w_lin)
        dw = sum_log_norm - card_pred
    else:
        # Vo empty-map (scheme 1):
        #   m*clutterDensity + cn_update - cn_predict - clutterRate
        in_mask = pre.rclass == 1
        cn_predict = jnp.sum(jnp.where(in_mask, gm.w, 0.0), axis=-1)
        cn_update = (jnp.sum(w_nondetect, axis=-1)
                     + jnp.sum(w_detect * mvalid[None, :, None], axis=(-2, -1))
                     + jnp.sum(w_birth * mvalid[None, :], axis=-1))
        dw = (n_measure * cfg.clutterDensity + cn_update - cn_predict
              - cfg.clutterRate)

    # --- prune (merge flags, src/phdfilter.cu:2307-2319) ---
    minw = cfg.minFeatureWeight
    w_nd_p = jnp.where(w_nondetect >= minw, w_nondetect, 0.0)
    w_det_p = jnp.where(w_detect >= minw, w_detect, 0.0)
    w_birth_p = jnp.where(w_birth >= minw, w_birth, 0.0)

    # --- build the merge candidate pool ---------------------------------
    # logical flat layout per particle:
    #   [0,F)          : nearly-in-range originals (merged but not pruned,
    #                     src/phdfilter.cu:3218-3257)
    #   [F,2F)         : non-detection terms
    #   [2F,2F+M*F)    : detection terms, index 2F + m*F + f
    #   [2F+M*F, ...)  : birth terms
    w_near = jnp.where(pre.rclass == 2, gm.w, 0.0)
    w_pool = jnp.concatenate(
        [w_near, w_nd_p, w_det_p.reshape(P, M * F), w_birth_p], axis=-1)

    K = min(cfg.merge_pool_size, w_pool.shape[-1])
    top_w, top_idx = jax.lax.top_k(w_pool, K)                 # [P, K]

    # decode candidate kind and reconstruct mean/cov per candidate
    is_near = top_idx < F
    is_nd = (top_idx >= F) & (top_idx < 2 * F)
    is_det = (top_idx >= 2 * F) & (top_idx < 2 * F + M * F)
    f_near = jnp.clip(top_idx, 0, F - 1)
    f_nd = jnp.clip(top_idx - F, 0, F - 1)
    det_off = jnp.clip(top_idx - 2 * F, 0, M * F - 1)
    f_det = det_off % F
    m_det = det_off // F
    m_birth = jnp.clip(top_idx - 2 * F - M * F, 0, M - 1)

    f_orig = jnp.where(is_near, f_near, f_nd)                 # near/nondet
    f_any = jnp.where(is_det, f_det, f_orig)

    def take_f(arr, idx):  # arr [P, F, ...] gather along F with [P,K] idx
        extra = arr.ndim - 2
        ix = idx.reshape(idx.shape + (1,) * extra)
        return jnp.take_along_axis(arr, ix, axis=1)

    mean_f = take_f(gm.mean[..., :2], f_any)                  # [P,K,2]
    cov_f = take_f(gm.cov[..., :2, :2], f_any)                # [P,K,2,2]
    gain_f = take_f(pre.gain, f_any)
    cov_up_f = take_f(pre.cov_update, f_any)
    innov_mf = jnp.take_along_axis(
        innov.reshape(P, M * F, 2), det_off[..., None], axis=1)  # [P,K,2]

    mean_det = mean_f + jnp.einsum("...ij,...j->...i", gain_f, innov_mf)

    # births: [P, M] gaussians from inverse measurement
    b_mean, b_cov = birth_gaussian(pose[:, None, :], z_rb[None, :, :], cfg)
    mean_b = jnp.take_along_axis(b_mean, m_birth[..., None], axis=1)
    cov_b = jnp.take_along_axis(b_cov, m_birth[..., None, None], axis=1)

    is_orig = is_near | is_nd
    cand_mean = jnp.where(
        is_orig[..., None], mean_f,
        jnp.where(is_det[..., None], mean_det, mean_b))
    cand_cov = jnp.where(
        is_orig[..., None, None], cov_f,
        jnp.where(is_det[..., None, None], cov_up_f, cov_b))
    cand_w = jnp.maximum(top_w, 0.0)

    # --- greedy merge (src/phdfilter.cu:2707-2898) ------------------------
    merged_w, merged_mean, merged_cov = greedy_merge_batch(
        cand_w, cand_mean, cand_cov, cfg.minSeparation, F,
        metric=cfg.distanceMetric)

    # --- union with out-of-range pass-through (src/phdfilter.cu:3258-3291)
    w_out_range = jnp.where(pre.rclass == 0, gm.w, 0.0)
    union_w = jnp.concatenate([merged_w, w_out_range], axis=-1)
    union_mean = jnp.concatenate([merged_mean, gm.mean[..., :2]], axis=-2)
    union_cov = jnp.concatenate([merged_cov, gm.cov[..., :2, :2]], axis=-3)
    final_w, final_mean, final_cov = top_k_components(
        union_w, union_mean, union_cov, F)

    map_out = GaussianMixture(w=final_w, mean=final_mean, cov=final_cov)
    return UpdateResult(
        map_out=map_out,
        log_weight_delta=dw,
        w_nondetect=w_nondetect,
        w_detect=w_detect * mvalid[None, :, None],
        w_birth=w_birth * mvalid[None, :],
        pre=pre,
    )


def phd_variance(key, result: UpdateResult, pose, gm_prior: GaussianMixture,
                 z_rb, z_valid, cfg: SlamConfig):
    """Monte-Carlo PHD variance estimate per particle
    (phdVarianceKernel, src/phdfilter.cu:2643-2705).

    For each of nSamples draws, every update component g contributes
    val = N(x; g) evaluated at x ~ g: non-detection terms add val,
    detection/birth terms add val*(1-val); summed over samples & components.
    Sampling a Gaussian and evaluating *itself* at the sample only depends
    on its covariance determinant: with x - mu = L u, u ~ N(0, I_2),
    val = exp(-0.5 |u|^2) / (2 pi sqrt(det P)). So only per-component dets
    and chi-square draws are needed — no means, no Cholesky.

    This statistic only feeds the exported logs (particles.variances),
    never the filter, so the step computes it optionally.
    """
    pre = result.pre
    P, F = result.w_nondetect.shape
    M = result.w_birth.shape[1]
    S = max(int(cfg.nSamples), 1)
    dtype = result.w_nondetect.dtype

    def vals(key, det, comp_shape):
        u = jax.random.normal(key, comp_shape + (S, 2), dtype)
        quad = jnp.sum(u * u, axis=-1)
        return jnp.exp(-0.5 * quad) / (
            2.0 * jnp.pi * jnp.sqrt(jnp.maximum(det, 1e-38))[..., None])

    k1, k2, k3 = jax.random.split(key, 3)
    in_mask = pre.rclass == 1                                   # [P,F]
    mvalid = z_valid.astype(dtype)                              # [M]

    # non-detection terms keep the prior covariance
    det_nd = det2(gm_prior.cov[..., :2, :2])
    v_nd = vals(k1, det_nd, (P, F))                             # [P,F,S]
    var = jnp.sum(jnp.where(in_mask[..., None], v_nd, 0.0), axis=(1, 2))

    # Detection terms share the per-feature updated covariance. The
    # reference draws independently per (feature, measurement); since the
    # draws are iid given the covariance, summing over measurements equals
    # n_measure * E[v(1-v)] in expectation — we reuse one draw set per
    # feature and scale by the valid-measurement count to bound memory at
    # [P,F,S] instead of [P,F,M,S].
    det_up = det2(pre.cov_update)
    v_det = vals(k2, det_up, (P, F))                            # [P,F,S]
    g = v_det * (1.0 - v_det) * in_mask[..., None]
    var += jnp.sum(mvalid) * jnp.sum(g, axis=(1, 2))

    # birth terms
    from phdslam_tpu.models.measurement import birth_gaussian
    _, b_cov = birth_gaussian(pose[:, None, :], z_rb[None, :, :], cfg)
    v_b = vals(k3, det2(b_cov), (P, M))                         # [P,M,S]
    gb = v_b * (1.0 - v_b) * mvalid[None, :, None]
    var += jnp.sum(gb, axis=(1, 2))
    return var
