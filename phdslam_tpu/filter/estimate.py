"""State recovery: expected pose, MAP/EAP map estimates, cardinality.

Mirror of recoverSlamState (src/main.cpp:318-388) and computeExpectedMap
(src/main.cpp:290-316): the expected pose and the MAP map are cheap,
jit-safe device ops; the EAP map (weight-scaled concat of every particle's
mixture followed by greedy reduction) is a host-side numpy function because
its output length is data-dependent and it only feeds logging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from phdslam_tpu.filter.state import SlamState
from phdslam_tpu.ops.gm import reduce_mixture_np


def expected_pose(state: SlamState):
    """Weighted mean of particle poses (src/main.cpp:324-340)."""
    w = jnp.exp(state.log_weights)
    return jnp.sum(w[:, None] * state.pose, axis=0)


def map_map_static(state: SlamState):
    """MAP map = the argmax-weight particle's map (src/main.cpp:344-361)."""
    idx = jnp.argmax(state.log_weights)
    return jax.tree.map(lambda x: x[idx], state.map_static)


def map_map_dynamic(state: SlamState):
    idx = jnp.argmax(state.log_weights)
    return jax.tree.map(lambda x: x[idx], state.map_dynamic)


def eap_map_np(weights_log, gm_w, gm_mean, gm_cov, min_separation):
    """Expected (EAP) map: scale each particle's mixture by its particle
    weight, concatenate, greedy-reduce (src/main.cpp:290-316 +
    src/gm_reduce.cpp:57-134). Host-side numpy; dynamic output length."""
    wl = np.asarray(weights_log)
    w = np.asarray(gm_w) * np.exp(wl)[:, None]
    valid = w > 0
    if not valid.any():
        d = np.asarray(gm_mean).shape[-1]
        return np.zeros((0,)), np.zeros((0, d)), np.zeros((0, d, d))
    flat_w = w[valid]
    flat_mean = np.asarray(gm_mean)[valid]
    flat_cov = np.asarray(gm_cov)[valid]
    from phdslam_tpu import native
    if native.available():
        return native.gm_reduce(flat_w, flat_mean, flat_cov, min_separation)
    return reduce_mixture_np(flat_w, flat_mean, flat_cov, min_separation)


def expected_cardinality(state: SlamState):
    """Expected landmark count of the MAP particle's map."""
    idx = jnp.argmax(state.log_weights)
    return jnp.sum(state.map_static.w[idx])
