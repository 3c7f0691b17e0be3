"""Elementary-symmetric-function kernel (Pallas, TPU).

VMEM-resident version of filter/cphd.py::esf_log + esf_deleted — the CPHD
update's Vieta build-up of the log-ESF coefficients for the full
measurement set AND for every measurement-deleted subset (the reference
computes these in computeEsfKernel, src/phdfilter.cu.bak:1194-1286, one
block per particle with the polynomial in shared memory).

MEASURED RESULT (v5e, P=1024, M=64, the CPHD baseline shape): this
kernel does NOT beat the XLA scan in its real consumer — psi_terms runs
5.6 ms with the XLA esf/esfd forms vs 6.3 ms with this kernel (exact
scalar agreement). XLA fuses the esfd scan into the downstream
logsumexp reductions, so the [M_deleted, P, M+1] carry never
round-trips HBM and the computation sits at the transcendental-compute
roofline (the work is M dependent logaddexp sweeps — exp+log1p per
element — which a VMEM-resident kernel cannot reduce). The CPHD Psi
machinery therefore has no remaining kernel-level headroom at this
shape; psi_terms keeps the XLA forms and this kernel stays as an
exact-parity alternative (tests/test_pallas.py) for shapes where the
scan's HBM traffic ever dominates (standalone materializing use, or
M >> 64 with small P).

Grid: (particle tiles) x (deleted-lane tiles). Each grid step holds
e[D_TILE+1, tile_p, M+1] in registers/VMEM — D_TILE deleted lanes (lane
l = the set with measurement d0+l removed) plus one full-set lane (no
deletion; every d-tile computes it, the esf output block is just written
identically by each). Step j updates every lane with measurement j's
Lambda except the lane whose global deleted index equals j:

  e[l] <- logaddexp(e[l], val[l] + shift_right(e[l])),
  val[l] = log_lambda[j] if (d0 + l != j or l == D_TILE) else -BIG

-inf inputs are clamped to -BIG = -1e30 (finite sentinel: the in-kernel
logaddexp needs no NaN guards, and exp(-1e30 - x) underflows to exactly 0
downstream, so psi_terms' logsumexp consumers see identical results).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_NEG = -1e30
D_TILE = 16


def _logaddexp(a, b):
    """logaddexp for finite inputs (sentinel -1e30, never -inf/NaN)."""
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    return mx + jnp.log1p(jnp.exp(mn - mx))


def _kernel(ll_ref, oesf_ref, oesfd_ref, *, M: int, d_tile: int):
    tp = ll_ref.shape[1]
    D = d_tile + 1                      # + the full-set lane
    K = M + 1
    d0 = pl.program_id(1) * d_tile

    # e[:, :, 0] = 0 (e_0 = 1), everything else empty
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (D, tp, K), 2)
    e0 = jnp.where(k_iota == 0, 0.0, BIG_NEG).astype(ll_ref.dtype)
    # global deleted index per lane; the full-set lane gets -1 (never hit)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, tp), 0)
    d_global = jnp.where(d_iota < d_tile, d_iota + d0, -1)

    def step(j, e):
        ll_j = ll_ref[pl.ds(j, 1), :]                     # [1, tp]
        val = jnp.where(d_global == j, BIG_NEG,
                        jnp.broadcast_to(ll_j, (D, tp)))  # [D, tp]
        shifted = jnp.concatenate(
            [jnp.full((D, tp, 1), BIG_NEG, e.dtype), e[:, :, :-1]], axis=-1)
        return _logaddexp(e, val[:, :, None] + shifted)

    e = jax.lax.fori_loop(0, M, step, e0)
    oesf_ref[:, :] = e[d_tile]                             # [tp, M+1]
    oesfd_ref[:, :, :] = e[:d_tile, :, :M]                 # [d_tile, tp, M]


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret"))
def esf_all_pallas(log_lambda, tile_p: int = 128, interpret: bool = False):
    """(esf [P, M+1], esfd [P, M, M]) — log-ESFs of {exp(log_lambda_m)}
    for the full set and each measurement-deleted subset.

    Matches esf_log/esf_deleted up to the -inf -> -1e30 sentinel (empty
    coefficients come back ~-1e30 instead of -inf; exact zero after exp).
    """
    P, M = log_lambda.shape
    if P < tile_p:
        tile_p = max(8, 1 << (P - 1).bit_length() if P > 1 else 8)
        tile_p = min(tile_p, 128)
    pad = (-P) % tile_p
    ll = jnp.maximum(log_lambda, BIG_NEG)
    if pad:
        ll = jnp.pad(ll, ((0, pad), (0, 0)), constant_values=BIG_NEG)
    Pp = ll.shape[0]
    ll_t = ll.T                                            # [M, Pp]
    num_d = -(-M // D_TILE)
    Dpad = num_d * D_TILE

    esf, esfd_t = pl.pallas_call(
        functools.partial(_kernel, M=M, d_tile=D_TILE),
        grid=(Pp // tile_p, num_d),
        in_specs=[pl.BlockSpec((M, tile_p), lambda i, d: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((tile_p, M + 1), lambda i, d: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D_TILE, tile_p, M), lambda i, d: (d, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, M + 1), ll.dtype),
            jax.ShapeDtypeStruct((Dpad, Pp, M), ll.dtype),
        ],
        interpret=interpret,
    )(ll_t)
    esfd = jnp.swapaxes(esfd_t[:M], 0, 1)                  # [Pp, M, M]
    return esf[:P], esfd[:P]
