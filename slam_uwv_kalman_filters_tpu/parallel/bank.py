"""Filter-bank data parallelism — the capability layer the reference lacks.

The reference runs ONE filter instance per process (SURVEY.md §2.4: no
threads, no parallelism of any kind). Here a bank of N independent filters
(multi-vehicle fleets, Monte-Carlo tuning sweeps, parameter ensembles) is a
single pytree with a leading bank axis, and every filter operation is a
``vmap`` of the corresponding pure function — per-instance measurement
validity and χ² gating are masked selects, so the bank never diverges in
control flow (BASELINE.json north-star: 100k vmapped PoseUKF instances).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = [
    "replicate",
    "bank_size",
    "vmap_filter",
    "masked",
    "select_where",
    "mask_rows",
]


def replicate(tree: Any, n: int) -> Any:
    """Tile a single filter state/params pytree into an N-instance bank."""
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (n, *jnp.shape(a))), tree
    )


def bank_size(tree: Any) -> int:
    return jax.tree_util.tree_leaves(tree)[0].shape[0]


def vmap_filter(fn: Callable, *, state_axis=0, params_axis=None, data_axes=0) -> Callable:
    """vmap a filter function ``fn(state, params, *data)`` over the bank axis.

    ``params_axis=None`` shares one parameter set across the bank (fleet of
    identical vehicles); ``params_axis=0`` sweeps parameters per instance
    (Monte-Carlo tuning — the reference analogue would be N processes)."""

    def in_axes_for(nargs):
        extra = data_axes if isinstance(data_axes, tuple) else (data_axes,) * nargs
        return (state_axis, params_axis, *extra)

    def wrapped(state, params, *data, **kw):
        return jax.vmap(partial(fn, **kw), in_axes=in_axes_for(len(data)))(state, params, *data)

    return wrapped


def select_where(mask: jax.Array, a: Any, b: Any) -> Any:
    """Pytree select with a per-instance boolean mask broadcast from the left."""

    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(sel, a, b)


def mask_rows(mask: jax.Array, tree: Any) -> Any:
    """Scrub per-instance rows of an auxiliary pytree where ``mask`` is False:
    booleans become False, numbers become 0. Leaves whose leading shape does
    not match the mask (non-banked scalars/constants) pass through untouched.

    This is how discarded work is kept out of telemetry: an update/step that
    ran but was rolled back must not leave its ``accepted`` flags or
    NaN-poisoned statistics in the records a driver aggregates."""

    def sel(x):
        x = jnp.asarray(x)
        if x.ndim < mask.ndim or x.shape[: mask.ndim] != mask.shape:
            return x
        m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
        if jnp.issubdtype(x.dtype, jnp.bool_):
            return x & m
        return jnp.where(m, x, jnp.zeros_like(x))

    return jax.tree_util.tree_map(sel, tree)


def masked(update_fn: Callable) -> Callable:
    """Wrap a (vmapped) update so instances with ``valid=False`` keep their
    state — the batch equivalent of the reference's checkMeasurment exception
    (``src/PoseUKF.cpp:478``) and the only jit-compatible way to express
    per-instance measurement presence in an irregular sensor schedule.

    The info record is masked alongside the state (``accepted`` False, NIS 0
    for invalid instances): the discarded update must not surface phantom
    acceptances or NaN statistics to metrics consumers.

    usage: ``state, info = masked(bank_update)(state, valid, params, z, R)``
    """

    def wrapped(state, valid, *args, **kw):
        out = update_fn(state, *args, **kw)
        # plain tuple = (state, info); a NamedTuple filter state is also a
        # tuple instance, so the check must be on the exact type
        if type(out) is tuple:
            new_state, info = out
            return select_where(valid, new_state, state), mask_rows(valid, info)
        return select_where(valid, out, state)

    return wrapped
