"""OSPA (Optimal SubPattern Assignment) metric.

Semantics of python/ospa.py:221-269 (the reference's evaluation metric,
used by python/batch_analyze.py:30 with p=1, c=5):

  - swap so |X| = m <= n = |Y|
  - cost matrix of Euclidean distances, cut off at c *before* assignment
  - optimal assignment (the reference uses a Cython Munkres; here the exact
    Jonker-Volgenant solver from scipy for host-side eval and a vectorized
    JAX auction algorithm for in-loop scoring on device)
  - ospa  = ((sum_assigned d^p + (n-m) c^p) / n)^(1/p)
    loc   = (sum_assigned d^p / n)^(1/p)
    card  = ((n-m) c^p / n)^(1/p)
  - empty/empty -> (0,0,0); one empty -> (c,0,c)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def ospa_np(x, y, p: float = 1.0, c: float = 10.0):
    """Exact OSPA on host via scipy's Jonker-Volgenant assignment.

    x [m,d], y [n,d] numpy arrays. Returns (ospa, loc, card).

    Uses the native C++ Jonker-Volgenant solver when built (native/), else
    scipy."""
    from scipy.optimize import linear_sum_assignment

    x = np.atleast_2d(np.asarray(x, np.float64))
    y = np.atleast_2d(np.asarray(y, np.float64))
    m, n = x.shape[0], y.shape[0]
    if m == 0 and n == 0:
        return 0.0, 0.0, 0.0
    if m == 0 or n == 0:
        return float(c), 0.0, float(c)
    if m > n:
        x, y = y, x
        m, n = n, m
    d = np.linalg.norm(x[:, None, :] - y[None, :, :], axis=-1)
    d = np.minimum(d, c)
    from phdslam_tpu import native
    if native.available():
        _, total_loc = native.hungarian(d ** p)
    else:
        rows, cols = linear_sum_assignment(d ** p)
        total_loc = float((d[rows, cols] ** p).sum())
    err_cn = (c ** p * (n - m) / n) ** (1.0 / p)
    err_loc = (total_loc / n) ** (1.0 / p)
    err = ((total_loc + (n - m) * c ** p) / n) ** (1.0 / p)
    return err, err_loc, err_cn


def _auction_assign(cost, n_iters: int):
    """Forward auction algorithm for square min-cost assignment under jit.

    cost [n, n]. Returns owner[j] = row assigned to column j (-1 none).
    Converted to a max-benefit auction internally. eps-scaling fixed by
    iteration count; adequate for OSPA scoring where costs are in [0, c].
    """
    n = cost.shape[0]
    benefit = -cost
    eps = 1.0 / (n + 1)

    def body(state):
        it, price, owner, assigned = state
        # first unassigned row
        i = jnp.argmin(assigned)
        values = benefit[i] - price
        j_best = jnp.argmax(values)
        v_best = values[j_best]
        values2 = values.at[j_best].set(-jnp.inf)
        v_second = jnp.max(values2)
        bid = v_best - v_second + eps
        price = price.at[j_best].add(bid)
        # previous owner of j_best becomes unassigned
        prev = owner[j_best]
        assigned = jnp.where(prev >= 0, assigned.at[prev].set(False),
                             assigned)
        owner = owner.at[j_best].set(i)
        assigned = assigned.at[i].set(True)
        return it + 1, price, owner, assigned

    def cond(state):
        it, _, _, assigned = state
        return (~jnp.all(assigned)) & (it < n_iters)

    init = (jnp.array(0, jnp.int32),
            jnp.zeros((n,), cost.dtype),
            jnp.full((n,), -1, jnp.int32),
            jnp.zeros((n,), bool))
    _, _, owner, _ = jax.lax.while_loop(cond, body, init)
    return owner


@partial(jax.jit, static_argnames=("p", "c", "max_iters"))
def ospa_jax(x, x_valid, y, y_valid, p: float = 1.0, c: float = 10.0,
             max_iters: int = 0):
    """Fixed-shape OSPA on device with a JAX auction solver.

    x [Mx, d] with mask x_valid; y [My, d] with mask y_valid. Padded entries
    are treated as absent by pinning their pairwise cost to the cutoff c,
    which makes them behave exactly like the (n-m) dummy points in the OSPA
    definition. Returns (ospa, loc, card).
    """
    mx, my = x.shape[0], y.shape[0]
    n = max(mx, my)
    iters = max_iters or 8 * n * n

    # build padded square cost: real-real pairs get min(dist, c); any pair
    # involving a padded slot costs exactly c
    big_x = jnp.zeros((n, x.shape[1]), x.dtype).at[:mx].set(x)
    big_y = jnp.zeros((n, y.shape[1]), y.dtype).at[:my].set(y)
    vx = jnp.zeros((n,), bool).at[:mx].set(x_valid)
    vy = jnp.zeros((n,), bool).at[:my].set(y_valid)
    d = jnp.linalg.norm(big_x[:, None, :] - big_y[None, :, :], axis=-1)
    d = jnp.minimum(d, c)
    d = jnp.where(vx[:, None] & vy[None, :], d, c)
    owner = _auction_assign(d ** p, iters)

    cols = jnp.arange(n)
    pair_cost = d[owner, cols] ** p
    both_real = vx[owner] & vy
    total_loc = jnp.sum(jnp.where(both_real, pair_cost, 0.0))

    m_count = jnp.minimum(jnp.sum(vx), jnp.sum(vy)).astype(x.dtype)
    n_count = jnp.maximum(jnp.sum(vx), jnp.sum(vy)).astype(x.dtype)
    cp = jnp.asarray(c ** p, x.dtype)
    n_safe = jnp.maximum(n_count, 1.0)
    err = ((total_loc + (n_count - m_count) * cp) / n_safe) ** (1.0 / p)
    loc = (total_loc / n_safe) ** (1.0 / p)
    card = ((n_count - m_count) * cp / n_safe) ** (1.0 / p)
    # empty-set conventions
    both_empty = (m_count == 0) & (n_count == 0)
    one_empty = (m_count == 0) & (n_count > 0)
    err = jnp.where(both_empty, 0.0, jnp.where(one_empty, c, err))
    loc = jnp.where(both_empty | one_empty, 0.0, loc)
    card = jnp.where(both_empty, 0.0, jnp.where(one_empty, c, card))
    return err, loc, card
