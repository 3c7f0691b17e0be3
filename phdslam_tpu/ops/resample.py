"""Particle resampling.

Vectorized stratified/systematic resampling with the reference's semantics
(resampleParticles, src/main.cpp:453-501): slot j draws position
r_j = (j + u_j) / n_out with u_j ~ U(0,1) (per-slot uniforms => stratified
resampling), walks the cumulative sum of exp(log_weights), and on numerical
overrun back-fills with the maximum-weight particle
(src/main.cpp:470-494).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_resample_indices(key, log_weights, n_out: int):
    """Return int32 indices [n_out] into the particle axis."""
    n = log_weights.shape[0]
    w = jnp.exp(log_weights)
    csum = jnp.cumsum(w)
    u = jax.random.uniform(key, (n_out,), log_weights.dtype)
    r = (jnp.arange(n_out, dtype=log_weights.dtype) + u) / float(n_out)
    idx = jnp.searchsorted(csum, r, side="left").astype(jnp.int32)
    # overrun guard: weights may not sum exactly to 1 in float32
    max_idx = jnp.argmax(log_weights).astype(jnp.int32)
    idx = jnp.where(idx >= n, max_idx, idx)
    return idx


def neff(log_weights):
    """Normalized effective sample size: 1 / sum(exp(w)^2) / N
    (src/main.cpp:1281-1284). Assumes weights already normalized."""
    n = log_weights.shape[0]
    return 1.0 / jnp.sum(jnp.exp(2.0 * log_weights)) / n
