"""Failure detection & elastic recovery for filter banks.

The reference's recovery story is entirely manual/algorithmic: χ² innovation
gates (``/root/reference/src/PoseUKF.cpp:261-286,578,610``), measurement
validation (``checkMeasurment``, ``src/PoseUKF.cpp:478``), and an operator-
invoked ``resetFilterWithExternalPose`` (``src/PoseUKF.cpp:685-691``). Those
exist in this framework too (the gates in ``ops.ukf``, ``utils.validation``,
``models.pose_ukf.reset_with_external_pose``). What a 100k-instance pod job
additionally needs — SURVEY.md §5 "failure detection / elastic recovery" —
is the *automated* version: detect diverged instances (NaN/Inf state,
non-positive variances, covariance blow-up) after every step, quarantine them
with a masked rollback, and re-seed them from a healthy snapshot. Everything
here is pure/jittable, so detection and recovery run on-device and the bank
never diverges in control flow (a dead instance is a masked select, not an
exception).

Composition with ``parallel.checkpoint`` gives checkpoint-based restart: save
a known-good bank snapshot periodically, and ``reseed_where(bank, dead,
snapshot)`` restarts exactly the dead instances from it.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .bank import mask_rows, select_where

__all__ = [
    "instance_health",
    "health_mask",
    "guarded",
    "reseed_where",
    "self_healing_step",
]


def instance_health(
    state: Any,
    *,
    max_cov_trace: Optional[float] = None,
) -> jax.Array:
    """Scalar bool: is one filter instance numerically alive?

    Checks every leaf of the state pytree for NaN/Inf, the covariance diagonal
    for non-positive variances (a symptom of the f32 cancellation failure mode
    — see the ``Precision.HIGHEST`` note in ``ops/ukf.py``), and optionally a
    trace cap (covariance blow-up = slow divergence that never NaNs).

    ``state`` is any of the filter state NamedTuples (all carry ``.cov``).
    """
    ok = jnp.asarray(True)
    for leaf in jax.tree_util.tree_leaves(state):
        ok = ok & jnp.all(jnp.isfinite(leaf))
    diag = jnp.diagonal(state.cov, axis1=-2, axis2=-1)
    ok = ok & jnp.all(diag > 0)
    if max_cov_trace is not None:
        tr = jnp.trace(state.cov, axis1=-2, axis2=-1)
        ok = ok & (tr <= jnp.asarray(max_cov_trace, dtype=tr.dtype))
    return ok


def health_mask(bank_state: Any, *, max_cov_trace: Optional[float] = None) -> jax.Array:
    """(B,) bool mask over a bank (leading-axis) state."""
    return jax.vmap(lambda s: instance_health(s, max_cov_trace=max_cov_trace))(bank_state)


def guarded(
    step_fn: Callable,
    *,
    max_cov_trace: Optional[float] = None,
) -> Callable:
    """Wrap a bank step so instances that diverge DURING the step roll back.

    ``step_fn(bank_state, *args, **kw)`` returns either ``new_bank`` or
    ``(new_bank, aux)``. The wrapper returns ``(bank_out, healthy, [aux])``
    where ``healthy`` is the (B,) post-step health mask and ``bank_out`` keeps
    the pre-step state wherever ``healthy`` is False. ``aux`` rows of
    rolled-back instances are scrubbed (numbers 0, booleans False) — the
    diverged step's NaN telemetry must not poison driver-side reductions. A
    rolled-back instance is frozen, not fixed — pair with :func:`reseed_where`
    (or ``models.pose_ukf.reset_with_external_pose``) to restart it.
    """

    def wrapped(bank_state, *args, **kw):
        out = step_fn(bank_state, *args, **kw)
        # plain tuple = (state, aux); anything else (incl. NamedTuple filter
        # states, which ARE tuples) is a bare state
        new_state, aux = out if type(out) is tuple else (out, None)
        healthy = health_mask(new_state, max_cov_trace=max_cov_trace)
        bank_out = select_where(healthy, new_state, bank_state)
        if aux is None:
            return bank_out, healthy
        return bank_out, healthy, mask_rows(healthy, aux)

    return wrapped


def reseed_where(bank_state: Any, dead: jax.Array, donor: Any) -> Any:
    """Restart the instances marked ``dead`` from ``donor``.

    ``donor`` is either a single-instance state (broadcast to every dead slot
    — the reference's construct-from-state resume, ``src/PoseUKF.cpp:374-391``)
    or a full bank snapshot of the same layout (per-instance restart from a
    ``parallel.checkpoint`` save).
    """
    b_leaf = jax.tree_util.tree_leaves(bank_state)[0]
    d_leaf = jax.tree_util.tree_leaves(donor)[0]
    if d_leaf.ndim == b_leaf.ndim - 1:  # single-instance donor → broadcast
        from .bank import replicate

        donor = replicate(donor, b_leaf.shape[0])
    return select_where(dead, donor, bank_state)


class SelfHealInfo(NamedTuple):
    healthy: jax.Array  # (B,) post-step, pre-reseed health mask
    n_reseeded: jax.Array  # () int32 — instances restarted this step


def self_healing_step(
    step_fn: Callable,
    *,
    max_cov_trace: Optional[float] = None,
) -> Callable:
    """Fully-automated recovery: step → detect → restart dead from a snapshot.

    Returns ``wrapped(bank_state, snapshot, *args, **kw) -> (bank_out, info)``
    (plus ``aux`` if ``step_fn`` returned one). ``snapshot`` is the known-good
    donor state passed by the driver loop — typically the bank saved at the
    last checkpoint interval, restored via ``parallel.checkpoint``.
    """
    g = guarded(step_fn, max_cov_trace=max_cov_trace)

    def wrapped(bank_state, snapshot, *args, **kw):
        out = g(bank_state, *args, **kw)
        bank_out, healthy = out[0], out[1]
        bank_out = reseed_where(bank_out, ~healthy, snapshot)
        info = SelfHealInfo(
            healthy=healthy, n_reseeded=jnp.sum(~healthy).astype(jnp.int32)
        )
        if len(out) == 3:
            return bank_out, info, out[2]
        return bank_out, info

    return wrapped
