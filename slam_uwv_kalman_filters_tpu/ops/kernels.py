"""Pallas TPU kernels for the filter hot path.

Profiling on a real v5e chip (chained measurements, bank=8192, f32) shows the
batched 53×53 Cholesky factorization dominating the PoseUKF step: XLA's
``cholesky`` costs ~52 ms of the ~70 ms predict (the MXU matmuls and the
whole process model together are <20 ms). XLA lowers small-matrix Cholesky
through a blocked while-loop expander that re-touches the full (N,53,53)
buffer every block — ~11 GB of HBM traffic per call.

:func:`cholesky_banked` replaces it with a Pallas kernel using a
**batch-on-lanes** layout: the bank is tiled into lane groups of 128
instances, a matrix element (i,j) of all 128 instances lives in one lane
vector, and the factorization runs the right-looking outer-product form with
53 rank-1 VPU updates over a (53,53,128) VMEM tile — every operation is a
fused elementwise op/broadcast, no loops over HBM, total traffic = one read
+ one write of the bank.

The wrapper pads the bank to a lane multiple, transposes in/out with XLA
(cheap, bandwidth-bound), runs in interpret mode off-TPU (so the same code
path is unit-testable on CPU), and falls back to the unrolled scalar
factorization from ``linalg_small`` for small static sizes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linalg_small import UNROLL_LIMIT, cholesky_unrolled

__all__ = ["cholesky_banked", "LANE_TILE"]

LANE_TILE = 128  # instances per lane group (hardware lane width)


def _cholesky_lanes_kernel(a_ref, out_ref):
    """Right-looking Cholesky over a (n, n, LANE_TILE) tile, batch on lanes.

    Invariant after iteration j: columns ≤ j of ``a`` hold the final L
    columns; the trailing submatrix (rows,cols > j) holds the downdated
    Schur complement. Rows above the diagonal are zeroed at the end.
    """
    a = a_ref[:]  # (n, n, B)
    n, _, b = a.shape
    # Mosaic cannot lower dynamic_slice on values, and lane-broadcasting
    # (n,1)-shaped masks trips relayout errors — so column j is extracted and
    # written back with FULL-SHAPE iota masks and pure arithmetic (VPU FMAs).
    row2 = jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)
    row3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, b), 0)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, b), 1)

    def body(j, a):
        colj_mask = (col3 == j).astype(a.dtype)  # (n, n, B) selects column j
        col_full = jnp.sum(a * colj_mask, axis=1)  # (n, B) = a[:, j, :]
        pivot_mask = (row2 == j).astype(a.dtype)  # (n, B) selects row j
        pivot = jnp.sum(col_full * pivot_mask, axis=0)  # (B,) = a[j, j, :]
        d = jnp.sqrt(pivot)
        col = col_full * (1.0 / d)[None, :]  # L[:, j] for rows ≥ j
        col_below = col * (row2 > j).astype(a.dtype)  # zero at/above diagonal
        # final column j: zeros above, pivot on the diagonal, scaled below
        new_col = col_below + d[None, :] * pivot_mask  # (n, B)
        a = a * (1.0 - colj_mask) + new_col[:, None, :] * colj_mask
        # Schur downdate of strictly-trailing columns (k > j); rows ≤ j have
        # col_below == 0 so they are untouched automatically.
        update = col_below[:, None, :] * col_below[None, :, :]  # (n, n, B)
        a = a - update * (col3 > j).astype(a.dtype)
        return a

    a = jax.lax.fori_loop(0, n, body, a)
    out_ref[:] = a * (row3 >= col3).astype(a.dtype)


def _cholesky_lanes(x_t: jax.Array, *, interpret: bool) -> jax.Array:
    """x_t: (n, n, N) with N a multiple of LANE_TILE."""
    n, _, nb = x_t.shape
    grid = (nb // LANE_TILE,)
    return pl.pallas_call(
        _cholesky_lanes_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n, nb), x_t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((n, n, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_t)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("force_pallas",))
def cholesky_banked(cov: jax.Array, force_pallas: bool = False) -> jax.Array:
    """Lower Cholesky of a batch of SPD matrices, TPU-optimal.

    * ``cov`` (N, n, n) or (n, n).
    * n ≤ 8 → fully unrolled scalar factorization (fuses, no kernel launch);
    * TPU (or ``force_pallas`` for interpret-mode testing) → the
      batch-on-lanes Pallas kernel;
    * otherwise → ``jnp.linalg.cholesky`` (LAPACK on CPU is already fast).
    """
    single = cov.ndim == 2
    if single:
        cov = cov[None]
    n = cov.shape[-1]
    if n <= UNROLL_LIMIT:
        out = cholesky_unrolled(cov)
        return out[0] if single else out
    # Small banks don't amortize the lane-tile padding (and may execute on a
    # CPU device inside a TPU-default process, where non-interpret Pallas
    # cannot run) — use the library kernel there.
    use_pallas = force_pallas or (_on_tpu() and cov.shape[0] >= 64)
    if not use_pallas:
        out = jnp.linalg.cholesky(cov)
        return out[0] if single else out

    nb = cov.shape[0]
    pad = (-nb) % LANE_TILE
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=cov.dtype), (pad, n, n))
        cov = jnp.concatenate([cov, eye], axis=0)
    x_t = jnp.transpose(cov, (1, 2, 0))  # batch → lanes
    l_t = _cholesky_lanes(x_t, interpret=not _on_tpu())
    out = jnp.transpose(l_t, (2, 0, 1))[:nb]
    return out[0] if single else out


# ---------------------------------------------------------------------------
# vmap-aware entry point: per-instance filter code (ops/ukf.py) calls
# ``cholesky_fast`` on a single (n, n) matrix; when the whole filter step is
# vmapped over a bank, this custom batching rule routes the entire stacked
# bank into one banked kernel launch instead of N tiny factorizations.
# ---------------------------------------------------------------------------


@jax.custom_batching.custom_vmap
def cholesky_fast(cov: jax.Array) -> jax.Array:
    """Lower Cholesky of one SPD matrix; bank-optimal under vmap."""
    return cholesky_banked(cov)


@cholesky_fast.def_vmap
def _cholesky_fast_vmap(axis_size, in_batched, cov):
    del axis_size
    (batched,) = in_batched
    if not batched:
        return cholesky_banked(cov), False
    lead = cov.shape[: cov.ndim - 2]
    flat = cov.reshape((-1,) + cov.shape[-2:])
    out = cholesky_banked(flat).reshape(lead + cov.shape[-2:])
    return out, True
