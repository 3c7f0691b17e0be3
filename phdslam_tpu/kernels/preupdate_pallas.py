"""Fused particle x measurement x feature likelihood kernel (Pallas, TPU).

The north-star kernel replacing preUpdateSynthKernel + the normalizer loop
of phdUpdateKernel (src/phdfilter.cu:1824-1925, 2190-2223): for every
(particle, measurement) pair it computes

    sum_exp[p, m] = sum_f exp( log pd_f + log w_f + log N(z_m - h_f; S_f) )

— the per-measurement PHD normalizer numerator — plus the scheme-0 particle
weight ingredients, streaming over feature tiles held in VMEM so the
[P, M, F] log-likelihood tensor never exists in HBM (at the dense-stress
config it is >1 GB per materialization; this kernel reads the [P, F]
channel inputs exactly once).

Layout matches the filter: channel-separated scalars. Measurements ride in
as a small replicated [M, 2] block (the analog of the reference's
__constant__ RangeBearingMeasurement Z[256], src/phdfilter.cu:120).

The candidate-selection top-k stays outside (XLA's TPU top_k custom call is
already optimal for it and needs the w_det values only for the selected
k1 << F slots, recomputed from the outputs here).

Measured on one v5e chip (P=2048, F=512, M=64): numerically exact vs the
XLA path (2e-6 max relative) at matched throughput — the op is bound by the
VPU transcendental (exp) rate, which XLA's elementwise fusion already
saturates, so the kernel's value is the HBM savings at configurations where
the [P,M,F] intermediates would not fit, not raw speed.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_2PI = 1.8378770664093453
NEG_LARGE = -1e30


def _kernel(z_ref, r_ref, b_ref, lpw_ref, si00_ref, si01_ref, si11_ref,
            lds_ref, sum_ref, *, n_measure: int):
    """One program: a [TP, F] tile of particles-x-features against all M
    measurements. lpw = log(pd * w) precomputed channel (the
    measurement-independent part of the partial weight)."""
    r = r_ref[:, :]
    b = b_ref[:, :]
    base = lpw_ref[:, :] - LOG_2PI - 0.5 * lds_ref[:, :]
    si00 = si00_ref[:, :]
    si01 = si01_ref[:, :]
    si11 = si11_ref[:, :]

    two_pi = 2.0 * math.pi
    cols = []
    # static unroll over measurements (M <= a few hundred; the reference
    # similarly loops over const-memory Z inside the kernel)
    for m in range(n_measure):
        ir = z_ref[m, 0] - r
        ib = z_ref[m, 1] - b
        # wrap to [-pi, pi] (device_math.cuh:242-251)
        ib = ib - two_pi * jnp.round(ib / two_pi)
        dist = ir * ir * si00 + 2.0 * ir * ib * si01 + ib * ib * si11
        cols.append(jnp.sum(jnp.exp(base - 0.5 * dist), axis=1))
    sum_ref[:, :] = jnp.stack(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("tile_p",))
def fused_sum_exp(z_rb, r, bearing, log_pd_w, si00, si01, si11, log_det_s,
                  tile_p: int = 128):
    """sum_exp [P, M] = per-measurement normalizer numerators.

    z_rb [M, 2]; all channel args [P, F]. Masked slots must carry
    log_pd_w = -inf (exp -> 0) and finite Kalman channels. P must be a
    multiple of tile_p (pad the particle axis if needed).
    """
    P, F = r.shape
    M = z_rb.shape[0]
    assert P % tile_p == 0, (P, tile_p)
    grid = (P // tile_p,)
    chan = pl.BlockSpec((tile_p, F), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    # replace -inf with a large negative finite value: exp underflows to 0
    # identically and the kernel arithmetic stays NaN-free
    lpw = jnp.maximum(log_pd_w, NEG_LARGE)
    return pl.pallas_call(
        functools.partial(_kernel, n_measure=M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            chan, chan, chan, chan, chan, chan, chan,
        ],
        out_specs=pl.BlockSpec((tile_p, M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, M), r.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(14e6)),
        cost_estimate=pl.CostEstimate(
            flops=10 * P * M * F,
            bytes_accessed=(8 * P * F + P * M) * 4,
            transcendentals=P * M * F),
    )(z_rb, r, bearing, lpw, si00, si01, si11, log_det_s)


def sum_exp_reference(z_rb, z_valid, pre, gm, cfg):
    """XLA reference path for the same quantity (used by tests and as the
    CPU fallback): materializes the [P, M, F] log-likelihoods."""
    from phdslam_tpu.filter.update import detection_log_weights

    lw = detection_log_weights(pre, gm, z_rb,
                               jnp.zeros(z_rb.shape[0], jnp.int32),
                               z_valid, cfg)
    return jnp.sum(jnp.exp(lw), axis=-1)
