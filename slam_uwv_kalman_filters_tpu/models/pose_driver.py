"""Whole-trajectory replay driver for PoseUKF — the scan-based offline
equivalent of the reference's host-component driving pattern (SURVEY.md §3.6:
on each IMU tick → ``predictionStep``; on each sensor arrival → the matching
``integrateMeasurement``).

An irregular multi-rate sensor schedule is packed into a dense per-tick
:class:`PoseInputs` structure with validity flags; absent measurements are
masked selects (never control flow), so one ``lax.scan`` jit-compiles the
entire replay and the same code path vmaps over trajectory banks.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..parallel.bank import select_where
from . import pose_ukf as pukf

__all__ = [
    "PoseInputs",
    "make_inputs",
    "pose_step",
    "run_trajectory",
    "pose_step_bank",
    "run_trajectory_bank",
    "TickOutput",
]


class PoseInputs(NamedTuple):
    """One tick of the packed sensor schedule (leading time axis when used
    with :func:`run_trajectory`). ``*_valid`` flags express the multi-rate /
    dropout structure (e.g. 100 Hz IMU, 5 Hz DVL, 1 Hz pressure)."""

    dt: jax.Array  # () prediction interval
    rotation_rate: jax.Array  # (3,) gyro input (always present — drives predict)
    acc: jax.Array  # (3,)
    acc_cov: jax.Array  # (3,3)
    acc_valid: jax.Array  # () bool
    dvl: jax.Array  # (3,)
    dvl_cov: jax.Array  # (3,3)
    dvl_valid: jax.Array  # () bool
    pressure: jax.Array  # (1,)
    pressure_cov: jax.Array  # (1,1)
    pressure_valid: jax.Array  # () bool
    xy: jax.Array  # (2,)
    xy_cov: jax.Array  # (2,2)
    xy_valid: jax.Array  # () bool
    adcp: jax.Array  # (2,)
    adcp_cov: jax.Array  # (2,2)
    adcp_cell_weighting: jax.Array  # ()
    adcp_valid: jax.Array  # () bool
    efforts: jax.Array  # (6,)
    efforts_cov: jax.Array  # (6,6)
    efforts_valid: jax.Array  # () bool


def make_inputs(
    n: int,
    dt: float,
    rotation_rate,
    *,
    acc=None,
    acc_cov=None,
    acc_valid=None,
    dvl=None,
    dvl_cov=None,
    dvl_valid=None,
    pressure=None,
    pressure_cov=None,
    pressure_valid=None,
    xy=None,
    xy_cov=None,
    xy_valid=None,
    adcp=None,
    adcp_cov=None,
    adcp_cell_weighting=None,
    adcp_valid=None,
    efforts=None,
    efforts_cov=None,
    efforts_valid=None,
    dtype=jnp.float64,
) -> PoseInputs:
    """Assemble a dense (n,)-tick schedule; omitted sensors are all-invalid."""

    def fill(x, shape, default=0.0):
        if x is None:
            return jnp.full((n, *shape), default, dtype)
        x = jnp.asarray(x, dtype)
        if x.ndim == len(shape):  # one constant value → every tick
            return jnp.broadcast_to(x, (n, *shape))
        if x.shape != (n, *shape):
            raise ValueError(
                f"sensor stream has shape {x.shape}; expected {(n, *shape)} "
                f"(per tick) or {tuple(shape)} (constant)"
            )
        return x

    def fill_cov(x, d):
        if x is None:
            return jnp.tile(jnp.eye(d, dtype=dtype)[None], (n, 1, 1))
        x = jnp.asarray(x, dtype)
        return jnp.tile(x[None], (n, 1, 1)) if x.ndim == 2 else x

    def flag(v, provided):
        if v is None:
            return jnp.full((n,), bool(provided))
        v = jnp.asarray(v, bool)
        return jnp.broadcast_to(v, (n,)) if v.ndim == 0 else v

    return PoseInputs(
        dt=jnp.full((n,), dt, dtype),
        rotation_rate=fill(rotation_rate, (3,)),
        acc=fill(acc, (3,)),
        acc_cov=fill_cov(acc_cov, 3),
        acc_valid=flag(acc_valid, acc is not None),
        dvl=fill(dvl, (3,)),
        dvl_cov=fill_cov(dvl_cov, 3),
        dvl_valid=flag(dvl_valid, dvl is not None),
        pressure=fill(pressure, (1,)),
        pressure_cov=fill_cov(pressure_cov, 1),
        pressure_valid=flag(pressure_valid, pressure is not None),
        xy=fill(xy, (2,)),
        xy_cov=fill_cov(xy_cov, 2),
        xy_valid=flag(xy_valid, xy is not None),
        adcp=fill(adcp, (2,)),
        adcp_cov=fill_cov(adcp_cov, 2),
        adcp_cell_weighting=fill(adcp_cell_weighting, ()),
        adcp_valid=flag(adcp_valid, adcp is not None),
        efforts=fill(efforts, (6,)),
        efforts_cov=fill_cov(efforts_cov, 6),
        efforts_valid=flag(efforts_valid, efforts is not None),
    )


class TickOutput(NamedTuple):
    position: jax.Array
    orientation: jax.Array
    velocity: jax.Array
    cov_trace: jax.Array
    # per-step observability (utils.metrics semantics): the DVL NIS — the
    # highest-rate consistency signal — and the χ²-gate outcome of the ADCP
    # update; both neutral (0 / False) on ticks without that measurement
    dvl_nis: jax.Array
    adcp_accepted: jax.Array


def _masked_update(state, valid, update_fn, *args):
    """Apply an update only where ``valid``; returns (state, info) so gated
    sensors stay observable (``info`` fields are only meaningful under
    ``valid`` — mask them at use sites). Rank-agnostic via
    ``bank.select_where``: serves both the solo path (scalar mask) and the
    bank path ((B,) mask)."""
    new_state, info = update_fn(*args)
    return select_where(valid, new_state, state), info


def pose_step(
    state: pukf.PoseUKFState, params: pukf.PoseUKFParams, inp: PoseInputs
) -> tuple[pukf.PoseUKFState, TickOutput]:
    """One tick: cache gyro input → predict → masked sensor updates, in the
    reference's integration order (prediction first, then synchronous
    updates — SURVEY.md §3.6)."""
    state = pukf.integrate_rotation_rate(state, inp.rotation_rate)
    state = pukf.predict(state, params, inp.dt)

    state, _ = _masked_update(
        state, inp.acc_valid, pukf.update_acceleration, state, params, inp.acc, inp.acc_cov
    )
    state, dvl_info = _masked_update(
        state, inp.dvl_valid, pukf.update_velocity, state, params, inp.dvl, inp.dvl_cov
    )
    state, _ = _masked_update(
        state,
        inp.pressure_valid,
        pukf.update_pressure,
        state,
        params,
        inp.pressure,
        inp.pressure_cov,
    )
    state, _ = _masked_update(
        state, inp.xy_valid, pukf.update_xy_position, state, params, inp.xy, inp.xy_cov
    )
    state, adcp_info = _masked_update(
        state,
        inp.adcp_valid,
        pukf.update_water_velocity,
        state,
        params,
        inp.adcp,
        inp.adcp_cov,
        inp.adcp_cell_weighting,
    )
    state, _ = _masked_update(
        state,
        inp.efforts_valid,
        pukf.update_body_efforts,
        state,
        params,
        inp.efforts,
        inp.efforts_cov,
    )

    out = TickOutput(
        position=state.mu.position,
        orientation=state.mu.orientation,
        velocity=state.mu.velocity,
        cov_trace=jnp.trace(state.cov),
        dvl_nis=jnp.where(inp.dvl_valid, dvl_info.mahalanobis2, 0.0),
        adcp_accepted=inp.adcp_valid & adcp_info.accepted,
    )
    return state, out


def run_trajectory(
    state: pukf.PoseUKFState, params: pukf.PoseUKFParams, inputs: PoseInputs
) -> tuple[pukf.PoseUKFState, TickOutput]:
    """lax.scan over the packed schedule — one compilation for the whole
    replay; vmap this over a bank of initial states / parameter sets for
    fleet-scale reprocessing."""
    return jax.lax.scan(lambda s, i: pose_step(s, params, i), state, inputs)


def pose_step_bank(
    bstate: pukf.PoseUKFState, params: pukf.PoseUKFParams, inp: PoseInputs
) -> tuple[pukf.PoseUKFState, TickOutput]:
    """Bank-level tick: same integration order as :func:`pose_step`, but each
    phase is one fused Pallas launch over the whole bank on the TPU f32 path
    (``pukf.predict_bank`` / ``pukf.update_*_bank``). ``inp`` carries a
    leading bank axis on every leaf (per-vehicle sensor streams)."""
    banked = params.process_noise.ndim == 3  # per-instance (Monte-Carlo) params
    bstate = bstate._replace(rotation_rate=inp.rotation_rate)
    bstate = pukf.predict_bank(bstate, params, inp.dt[0])

    bstate, _ = _masked_update(
        bstate, inp.acc_valid, pukf.update_acceleration_bank, bstate, params, inp.acc, inp.acc_cov
    )
    bstate, dvl_info = _masked_update(
        bstate, inp.dvl_valid, pukf.update_velocity_bank, bstate, params, inp.dvl, inp.dvl_cov
    )
    # the pressure model reads params.atmospheric_pressure; the bank entry
    # handles banked values itself (fused banked-aux lanes on TPU, a
    # per-instance vmap elsewhere), so sweeps stay on the fused route
    bstate, _ = _masked_update(
        bstate,
        inp.pressure_valid,
        pukf.update_pressure_bank,
        bstate,
        params,
        inp.pressure,
        inp.pressure_cov,
    )
    bstate, _ = _masked_update(
        bstate, inp.xy_valid, pukf.update_xy_position_bank, bstate, params, inp.xy, inp.xy_cov
    )
    bstate, adcp_info = _masked_update(
        bstate,
        inp.adcp_valid,
        pukf.update_water_velocity_bank,
        bstate,
        params,
        inp.adcp,
        inp.adcp_cov,
        inp.adcp_cell_weighting,
    )
    # body efforts need the per-instance compensated body rate -- generic
    # path; with a banked (Monte-Carlo sweep) parameter set the params must
    # be vmapped alongside the state, not closed over as (B,...)-constants
    def _efforts_one(s, p, z, r):
        s2, _ = pukf.update_body_efforts(s, p, z, r)
        return s2

    if banked:
        eff_state = jax.vmap(_efforts_one)(bstate, params, inp.efforts, inp.efforts_cov)
    else:
        eff_state = jax.vmap(lambda s, z, r: _efforts_one(s, params, z, r))(
            bstate, inp.efforts, inp.efforts_cov
        )
    bstate = select_where(inp.efforts_valid, eff_state, bstate)
    out = TickOutput(
        position=bstate.mu.position,
        orientation=bstate.mu.orientation,
        velocity=bstate.mu.velocity,
        cov_trace=jnp.trace(bstate.cov, axis1=-2, axis2=-1),
        dvl_nis=jnp.where(inp.dvl_valid, dvl_info.mahalanobis2, 0.0),
        adcp_accepted=inp.adcp_valid & adcp_info.accepted,
    )
    return bstate, out


def run_trajectory_bank(
    bstate: pukf.PoseUKFState, params: pukf.PoseUKFParams, inputs: PoseInputs
) -> tuple[pukf.PoseUKFState, TickOutput]:
    """Fleet-scale replay: ``lax.scan`` over ticks of :func:`pose_step_bank`
    — inputs have shape (T, bank, ...); one compilation, fused kernels every
    tick. Note: unlike ``vmap(run_trajectory)``, the prediction interval is
    shared across the bank at each tick (the per-vehicle sensor values,
    validity, covariances and ADCP cell weightings still vary)."""
    return jax.lax.scan(lambda s, i: pose_step_bank(s, params, i), bstate, inputs)
