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

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.bank import select_where
from . import pose_ukf as pukf

__all__ = [
    "PoseInputs",
    "MarkerSetup",
    "PoseStepConstants",
    "make_inputs",
    "pose_step",
    "run_trajectory",
    "pose_step_bank",
    "run_trajectory_bank",
    "pose_step_bank_lanes",
    "run_trajectory_bank_lanes",
    "gps_update_lanes",
    "delayed_xy_update_lanes",
    "TickOutput",
]


class MarkerSetup(NamedTuple):
    """Mission constants for the visual-marker stream (the marker geometry,
    pose prior and camera calibration of ``integrateMeasurement(
    VisualFeatureMeasurement, ...)``, ``src/PoseUKF.hpp:168-174``) — fixed for
    a replay, so they ride the scan closure instead of the per-tick inputs."""

    feature_positions: jax.Array  # (K,3) corner geometry in the marker frame
    marker_position: jax.Array  # (3,) prior mean, nav frame
    marker_orientation: jax.Array  # (4,) prior mean quaternion
    cov_marker_pose: jax.Array  # (6,6) prior covariance
    camera: object  # CameraConfiguration (static floats)
    camera_in_imu_position: jax.Array  # (3,)
    camera_in_imu_orientation: jax.Array  # (4,)


class PoseStepConstants(NamedTuple):
    """Per-mission constants consumed by :func:`pose_step` /
    :func:`pose_step_bank` — sensor mounting and marker setup that the
    reference passes per call but never varies within a mission."""

    gps_in_body: Optional[jax.Array] = None  # (3,) antenna lever arm
    marker: Optional[MarkerSetup] = None


class PoseInputs(NamedTuple):
    """One tick of the packed sensor schedule (leading time axis when used
    with :func:`run_trajectory`). ``*_valid`` flags express the multi-rate /
    dropout structure (e.g. 100 Hz IMU, 5 Hz DVL, 1 Hz pressure).

    Any sensor group may be ``None`` when the mission carries no such sensor
    at all — its update phase is then not even traced (None leaves are empty
    pytree nodes, so scan/vmap treat lean and full schedules uniformly;
    presence is static per compilation). :func:`make_inputs` keeps the
    classic always-on streams dense by default and the event-rate streams
    ``None`` when omitted."""

    dt: jax.Array  # () prediction interval
    rotation_rate: jax.Array  # (3,) gyro input (always present — drives predict)
    acc: Optional[jax.Array]  # (3,)
    acc_cov: Optional[jax.Array]  # (3,3)
    acc_valid: Optional[jax.Array]  # () bool
    dvl: Optional[jax.Array]  # (3,)
    dvl_cov: Optional[jax.Array]  # (3,3)
    dvl_valid: Optional[jax.Array]  # () bool
    pressure: Optional[jax.Array]  # (1,)
    pressure_cov: Optional[jax.Array]  # (1,1)
    pressure_valid: Optional[jax.Array]  # () bool
    xy: Optional[jax.Array]  # (2,)
    xy_cov: Optional[jax.Array]  # (2,2)
    xy_valid: Optional[jax.Array]  # () bool
    adcp: Optional[jax.Array]  # (2,)
    adcp_cov: Optional[jax.Array]  # (2,2)
    adcp_cell_weighting: Optional[jax.Array]  # ()
    adcp_valid: Optional[jax.Array]  # () bool
    efforts: Optional[jax.Array]  # (6,)
    efforts_cov: Optional[jax.Array]  # (6,6)
    efforts_valid: Optional[jax.Array]  # () bool
    # Optional streams (None when the mission has no such sensor — None leaves
    # are empty pytree nodes, so scan/vmap treat a lean schedule and a full
    # ICRA'18 schedule uniformly; presence is static per compilation):
    z: Optional[jax.Array] = None  # (1,) depth
    z_cov: Optional[jax.Array] = None  # (1,1)
    z_valid: Optional[jax.Array] = None  # () bool
    gps: Optional[jax.Array] = None  # (2,) lat, lon in radians
    gps_cov: Optional[jax.Array] = None  # (2,2) planar covariance
    gps_valid: Optional[jax.Array] = None  # () bool
    delayed_xy: Optional[jax.Array] = None  # (2,) delayed XY fix
    delayed_xy_cov: Optional[jax.Array] = None  # (2,2)
    delayed_position: Optional[jax.Array] = None  # (2,) state at capture time
    delayed_valid: Optional[jax.Array] = None  # () bool
    marker_features: Optional[jax.Array] = None  # (K,2) detected pixels
    marker_feature_covs: Optional[jax.Array] = None  # (K,2,2)
    marker_valid: Optional[jax.Array] = None  # () bool


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
    z=None,
    z_cov=None,
    z_valid=None,
    gps=None,
    gps_cov=None,
    gps_valid=None,
    delayed_xy=None,
    delayed_xy_cov=None,
    delayed_position=None,
    delayed_valid=None,
    marker_features=None,
    marker_feature_covs=None,
    marker_valid=None,
    dtype=jnp.float64,
) -> PoseInputs:
    """Assemble a dense (n,)-tick schedule; omitted sensors are all-invalid.

    The always-on streams get dense dummy slots when omitted (the masked
    update is cheap); the event-rate streams (``z``/``gps``/``delayed_*``/
    ``marker_*``) stay ``None`` when absent so their — much heavier —
    update phases are not even traced."""
    if marker_features is not None:
        marker_features = jnp.asarray(marker_features, dtype)
        if marker_features.ndim not in (2, 3):
            raise ValueError(
                f"marker_features has shape {marker_features.shape}; expected "
                "(K,2) (constant detections) or (n,K,2) (per tick)"
            )

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
        z=None if z is None else fill(z, (1,)),
        z_cov=None if z is None else fill_cov(z_cov, 1),
        z_valid=None if z is None else flag(z_valid, True),
        gps=None if gps is None else fill(gps, (2,)),
        gps_cov=None if gps is None else fill_cov(gps_cov, 2),
        gps_valid=None if gps is None else flag(gps_valid, True),
        delayed_xy=None if delayed_xy is None else fill(delayed_xy, (2,)),
        delayed_xy_cov=None if delayed_xy is None else fill_cov(delayed_xy_cov, 2),
        delayed_position=(
            None
            if delayed_xy is None
            else fill(_required(delayed_position, "delayed_position"), (2,))
        ),
        delayed_valid=None if delayed_xy is None else flag(delayed_valid, True),
        marker_features=(
            None if marker_features is None else fill(marker_features, marker_features.shape[-2:])
        ),
        marker_feature_covs=(
            None
            if marker_features is None
            else _fill_corner_covs(
                _required(marker_feature_covs, "marker_feature_covs"),
                n,
                marker_features.shape[-2],
                dtype,
            )
        ),
        marker_valid=None if marker_features is None else flag(marker_valid, True),
    )


def _required(x, name):
    if x is None:
        raise ValueError(f"{name} is required when its sensor stream is provided")
    return x


def _fill_corner_covs(x, n, k, dtype):
    """(K,2,2) constant per-corner covariances → (n,K,2,2), or pass through a
    full per-tick stream."""
    x = jnp.asarray(x, dtype)
    if x.shape == (k, 2, 2):
        return jnp.broadcast_to(x[None], (n, k, 2, 2))
    if x.shape != (n, k, 2, 2):
        raise ValueError(
            f"marker_feature_covs has shape {x.shape}; expected {(k, 2, 2)} or {(n, k, 2, 2)}"
        )
    return x


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
    # gate outcomes of the optional event-rate streams; None when the mission
    # schedule carries no such stream (mirrors PoseInputs)
    gps_accepted: Optional[jax.Array] = None  # () bool
    marker_nis: Optional[jax.Array] = None  # (K,) per-corner NIS


def _masked_update(state, valid, update_fn, *args):
    """Apply an update only where ``valid``; returns (state, info) so gated
    sensors stay observable (``info`` fields are only meaningful under
    ``valid`` — mask them at use sites). Rank-agnostic via
    ``bank.select_where``: serves both the solo path (scalar mask) and the
    bank path ((B,) mask)."""
    new_state, info = update_fn(*args)
    return select_where(valid, new_state, state), info


def pose_step(
    state: pukf.PoseUKFState,
    params: pukf.PoseUKFParams,
    inp: PoseInputs,
    consts: Optional[PoseStepConstants] = None,
) -> tuple[pukf.PoseUKFState, TickOutput]:
    """One tick: cache gyro input → predict → masked sensor updates, in the
    reference's integration order (prediction first, then synchronous
    updates — SURVEY.md §3.6). With every optional stream populated this
    covers the reference's full ``integrateMeasurement`` surface
    (``src/PoseUKF.hpp:137-177``): rotation rate, acceleration, DVL, pressure,
    depth, XY, GPS, delayed XY, ADCP, efforts, visual markers."""
    state = pukf.integrate_rotation_rate(state, inp.rotation_rate)
    state = pukf.predict(state, params, inp.dt)

    if inp.acc is not None:
        state, _ = _masked_update(
            state, inp.acc_valid, pukf.update_acceleration, state, params, inp.acc, inp.acc_cov
        )
    dvl_info = None
    if inp.dvl is not None:
        state, dvl_info = _masked_update(
            state, inp.dvl_valid, pukf.update_velocity, state, params, inp.dvl, inp.dvl_cov
        )
    if inp.pressure is not None:
        state, _ = _masked_update(
            state,
            inp.pressure_valid,
            pukf.update_pressure,
            state,
            params,
            inp.pressure,
            inp.pressure_cov,
        )
    if inp.xy is not None:
        state, _ = _masked_update(
            state, inp.xy_valid, pukf.update_xy_position, state, params, inp.xy, inp.xy_cov
        )
    adcp_info = None
    if inp.adcp is not None:
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
    if inp.efforts is not None:
        state, _ = _masked_update(
            state,
            inp.efforts_valid,
            pukf.update_body_efforts,
            state,
            params,
            inp.efforts,
            inp.efforts_cov,
        )

    if inp.z is not None:
        state, _ = _masked_update(
            state, inp.z_valid, pukf.update_z_position, state, params, inp.z, inp.z_cov
        )
    gps_accepted = None
    if inp.gps is not None:
        gps_in_body = consts.gps_in_body if consts is not None else None
        state, gps_info = _masked_update(
            state,
            inp.gps_valid,
            pukf.update_geographic_position,
            state,
            params,
            inp.gps[0],
            inp.gps[1],
            inp.gps_cov,
            gps_in_body,
        )
        gps_accepted = inp.gps_valid & gps_info.accepted
    if inp.delayed_xy is not None:
        state, _ = _masked_update(
            state,
            inp.delayed_valid,
            pukf.update_delayed_position,
            state,
            params,
            inp.delayed_xy,
            inp.delayed_xy_cov,
            inp.delayed_position,
        )
    marker_nis = None
    if inp.marker_features is not None:
        if consts is None or consts.marker is None:
            raise ValueError(
                "schedule carries marker detections; pass "
                "PoseStepConstants(marker=MarkerSetup(...))"
            )
        ms = consts.marker
        state, m_info = _masked_update(
            state,
            inp.marker_valid,
            pukf.update_visual_features,
            state,
            params,
            inp.marker_features,
            inp.marker_feature_covs,
            ms.feature_positions,
            ms.marker_position,
            ms.marker_orientation,
            ms.cov_marker_pose,
            ms.camera,
            ms.camera_in_imu_position,
            ms.camera_in_imu_orientation,
        )
        marker_nis = jnp.where(inp.marker_valid, m_info.mahalanobis2, 0.0)

    zero = jnp.zeros_like(inp.dt)
    out = TickOutput(
        position=state.mu.position,
        orientation=state.mu.orientation,
        velocity=state.mu.velocity,
        cov_trace=jnp.trace(state.cov),
        dvl_nis=(
            jnp.where(inp.dvl_valid, dvl_info.mahalanobis2, 0.0)
            if dvl_info is not None
            else zero
        ),
        adcp_accepted=(
            inp.adcp_valid & adcp_info.accepted
            if adcp_info is not None
            else zero.astype(bool)
        ),
        gps_accepted=gps_accepted,
        marker_nis=marker_nis,
    )
    return state, out


def run_trajectory(
    state: pukf.PoseUKFState,
    params: pukf.PoseUKFParams,
    inputs: PoseInputs,
    consts: Optional[PoseStepConstants] = None,
) -> tuple[pukf.PoseUKFState, TickOutput]:
    """lax.scan over the packed schedule — one compilation for the whole
    replay; vmap this over a bank of initial states / parameter sets for
    fleet-scale reprocessing."""
    return jax.lax.scan(lambda s, i: pose_step(s, params, i, consts), state, inputs)


def pose_step_bank(
    bstate: pukf.PoseUKFState,
    params: pukf.PoseUKFParams,
    inp: PoseInputs,
    consts: Optional[PoseStepConstants] = None,
    *,
    use_fused: str | bool = "auto",
) -> tuple[pukf.PoseUKFState, TickOutput]:
    """Bank-level tick: same integration order as :func:`pose_step`, but each
    phase is one fused Pallas launch over the whole bank on the TPU f32 path
    (``pukf.predict_bank`` / ``pukf.update_*_bank``). ``inp`` carries a
    leading bank axis on every leaf (per-vehicle sensor streams).

    ``use_fused`` forwards to every fused-capable bank entry ("auto" = fused
    kernels on TPU f32; "interpret" runs the exact production kernels through
    the Pallas interpreter — how CI asserts kernel-path missions off-TPU; the
    event-rate streams GPS/delayed/markers are vmapped generic either way)."""
    banked = params.process_noise.ndim == 3  # per-instance (Monte-Carlo) params
    fu = dict(use_fused=use_fused)
    bstate = bstate._replace(rotation_rate=inp.rotation_rate)
    bstate = pukf.predict_bank(bstate, params, inp.dt[0], **fu)

    if inp.acc is not None:
        bstate, _ = _masked_update(
            bstate,
            inp.acc_valid,
            partial(pukf.update_acceleration_bank, **fu),
            bstate,
            params,
            inp.acc,
            inp.acc_cov,
        )
    dvl_info = None
    if inp.dvl is not None:
        bstate, dvl_info = _masked_update(
            bstate,
            inp.dvl_valid,
            partial(pukf.update_velocity_bank, **fu),
            bstate,
            params,
            inp.dvl,
            inp.dvl_cov,
        )
    # the pressure model reads params.atmospheric_pressure; the bank entry
    # handles banked values itself (fused banked-aux lanes on TPU, a
    # per-instance vmap elsewhere), so sweeps stay on the fused route
    if inp.pressure is not None:
        bstate, _ = _masked_update(
            bstate,
            inp.pressure_valid,
            partial(pukf.update_pressure_bank, **fu),
            bstate,
            params,
            inp.pressure,
            inp.pressure_cov,
        )
    if inp.xy is not None:
        bstate, _ = _masked_update(
            bstate,
            inp.xy_valid,
            partial(pukf.update_xy_position_bank, **fu),
            bstate,
            params,
            inp.xy,
            inp.xy_cov,
        )
    adcp_info = None
    if inp.adcp is not None:
        bstate, adcp_info = _masked_update(
            bstate,
            inp.adcp_valid,
            partial(pukf.update_water_velocity_bank, **fu),
            bstate,
            params,
            inp.adcp,
            inp.adcp_cov,
            inp.adcp_cell_weighting,
        )
    # body efforts need each instance's compensated body rate: shared params
    # ride the banked entry (fused tail on TPU — the per-instance rates go
    # through the measurement stage's aux lanes); a banked (Monte-Carlo
    # sweep) parameter set must be vmapped alongside the state instead of
    # closed over as (B,...)-constants
    if inp.efforts is not None:
        if banked:

            def _efforts_one(s, p, z, r):
                s2, _ = pukf.update_body_efforts(s, p, z, r)
                return s2

            eff_state = jax.vmap(_efforts_one)(bstate, params, inp.efforts, inp.efforts_cov)
        else:
            rr_bank = pukf.get_rotation_rate_bank(bstate, params)
            eff_state, _ = pukf.update_body_efforts_bank(
                bstate, params, inp.efforts, inp.efforts_cov, rr_bank, **fu
            )
        bstate = select_where(inp.efforts_valid, eff_state, bstate)

    if inp.z is not None:
        bstate, _ = _masked_update(
            bstate,
            inp.z_valid,
            partial(pukf.update_z_position_bank, **fu),
            bstate,
            params,
            inp.z,
            inp.z_cov,
        )
    gps_accepted = None
    if inp.gps is not None:
        gps_in_body = consts.gps_in_body if consts is not None else None
        bstate, gps_info = _masked_update(
            bstate,
            inp.gps_valid,
            pukf.update_geographic_position_bank,
            bstate,
            params,
            inp.gps[:, 0],
            inp.gps[:, 1],
            inp.gps_cov,
            gps_in_body,
        )
        gps_accepted = inp.gps_valid & gps_info.accepted
    if inp.delayed_xy is not None:
        bstate, _ = _masked_update(
            bstate,
            inp.delayed_valid,
            pukf.update_delayed_position_bank,
            bstate,
            params,
            inp.delayed_xy,
            inp.delayed_xy_cov,
            inp.delayed_position,
        )
    marker_nis = None
    if inp.marker_features is not None:
        if consts is None or consts.marker is None:
            raise ValueError(
                "schedule carries marker detections; pass "
                "PoseStepConstants(marker=MarkerSetup(...))"
            )
        ms = consts.marker
        bstate, m_info = _masked_update(
            bstate,
            inp.marker_valid,
            pukf.update_visual_features_bank,
            bstate,
            params,
            inp.marker_features,
            inp.marker_feature_covs,
            ms.feature_positions,
            ms.marker_position,
            ms.marker_orientation,
            ms.cov_marker_pose,
            ms.camera,
            ms.camera_in_imu_position,
            ms.camera_in_imu_orientation,
        )
        marker_nis = jnp.where(inp.marker_valid[:, None], m_info.mahalanobis2, 0.0)

    zero = jnp.zeros_like(inp.dt)
    out = TickOutput(
        position=bstate.mu.position,
        orientation=bstate.mu.orientation,
        velocity=bstate.mu.velocity,
        cov_trace=jnp.trace(bstate.cov, axis1=-2, axis2=-1),
        dvl_nis=(
            jnp.where(inp.dvl_valid, dvl_info.mahalanobis2, 0.0)
            if dvl_info is not None
            else zero
        ),
        adcp_accepted=(
            inp.adcp_valid & adcp_info.accepted
            if adcp_info is not None
            else zero.astype(bool)
        ),
        gps_accepted=gps_accepted,
        marker_nis=marker_nis,
    )
    return bstate, out


def run_trajectory_bank(
    bstate: pukf.PoseUKFState,
    params: pukf.PoseUKFParams,
    inputs: PoseInputs,
    consts: Optional[PoseStepConstants] = None,
    *,
    use_fused: str | bool = "auto",
) -> tuple[pukf.PoseUKFState, TickOutput]:
    """Fleet-scale replay: ``lax.scan`` over ticks of :func:`pose_step_bank`
    — inputs have shape (T, bank, ...); one compilation, fused kernels every
    tick. Note: unlike ``vmap(run_trajectory)``, the prediction interval is
    shared across the bank at each tick (the per-vehicle sensor values,
    validity, covariances and ADCP cell weightings still vary)."""
    return jax.lax.scan(
        lambda s, i: pose_step_bank(s, params, i, consts, use_fused=use_fused),
        bstate,
        inputs,
    )


# ---------------------------------------------------------------------------
# lanes-persistent fleet replay: the whole scan in kernel layout
# ---------------------------------------------------------------------------


def _lanes_select(valid, new_ls, old_ls, pad):
    """Masked accept on kernel-layout state: (B,) validity broadcast along
    the trailing lane axis (padding lanes keep their old filler values)."""
    m = jnp.pad(valid, (0, pad))
    return old_ls._replace(
        cov_t=jnp.where(m, new_ls.cov_t, old_ls.cov_t),
        mu_t=jnp.where(m, new_ls.mu_t, old_ls.mu_t),
    )


def gps_update_lanes(
    ls, params, lat, lon, gps_cov, gps_in_body=None, *, nb, interpret=False
):
    """GPS surface fix on kernel-layout state — ``PoseUKF.cpp:567-579``
    semantics (as ``update_geographic_position_bank``): project each
    instance's (lat, lon) fix, correct the antenna lever arm with that
    instance's OWN mean orientation read from the lanes-resident mean, then
    the χ²-95-gated XY update in-kernel. Returns ``(LanesBankState, info)``
    (apply through the caller's validity mask)."""
    from ..ops import geodesy as geo, manifolds as mf, ukf as ukfops
    from . import pose_update_fused as puf

    dtype = ls.cov_t.dtype
    lat = jnp.broadcast_to(jnp.asarray(lat, dtype), (nb,))
    lon = jnp.broadcast_to(jnp.asarray(lon, dtype), (nb,))
    x, y = geo.world_to_nav(params.projection, lat, lon)
    projected = jnp.stack(
        [jnp.broadcast_to(x, (nb,)), jnp.broadcast_to(y, (nb,))], axis=-1
    ).astype(dtype)
    if gps_in_body is not None:
        g = jnp.asarray(gps_in_body, dtype)
        quat = ls.mu_t[3:7, :nb].T
        lever = jax.vmap(mf.quat_rotate, in_axes=(0, 0 if g.ndim == 2 else None))(
            quat, g
        )
        projected = projected - lever[:, :2]
    return puf.update_model_lanes(
        "xy_position", ls, projected, gps_cov, ukfops.D2P95, interpret=interpret
    )


def delayed_xy_update_lanes(
    ls, delayed_xy, delayed_cov, delayed_position, *, nb, interpret=False
):
    """Active delayed-position fix on kernel-layout state —
    ``PoseUKF.cpp:514-527``: shift by each instance's (current − delayed)
    position, then the standard in-kernel XY update."""
    from . import pose_update_fused as puf

    dtype = ls.cov_t.dtype
    pos_xy = ls.mu_t[0:2, :nb].T
    shifted = jnp.asarray(delayed_xy, dtype) + (
        pos_xy - jnp.asarray(delayed_position, dtype)
    )
    return puf.update_model_lanes(
        "xy_position", ls, shifted, delayed_cov, interpret=interpret
    )


def pose_step_bank_lanes(
    lstate,
    params: pukf.PoseUKFParams,
    inp: PoseInputs,
    consts: Optional[PoseStepConstants] = None,
    *,
    nb: int,
    interpret: bool = False,
    banked_ops=None,
):
    """Bank tick on kernel-layout state (``pose_fused.LanesBankState``): the
    integration order of :func:`pose_step_bank`, but the covariance never
    leaves the (col, row, B) lanes layout between launches and every
    scheduled measurement model runs in-kernel — the production steady-state
    loop as a scannable step (measured ≈1.6× :func:`pose_step_bank` on the
    full mission tick, docs/TUNING.md "Roofline"). Banked (Monte-Carlo
    sweep) parameter sets are supported: pass the pre-built
    ``pose_fused.banked_predict_operands`` via ``banked_ops`` (the fully-
    banked predict kernel mode); the pressure model routes its per-instance
    ``atmospheric_pressure`` through the kernel's banked-aux lanes, while
    banked dynamic-model parameters send the efforts update through the
    generic fused-tail pipeline (per-instance model in the measurement
    stage's aux pytree — see ``update_body_efforts_lanes``). Sensor groups
    the mission lacks entirely should be ``None`` in ``inp`` so their
    update phases are never traced. Marker ticks run the fused 59-DOF
    augmentation kernel (``models/pose_marker_fused.py``)."""
    from ..ops import ukf as ukfops
    from . import pose_fused as pf
    from . import pose_update_fused as puf

    dtype = lstate.cov_t.dtype
    pad = lstate.cov_t.shape[-1] - nb
    it = dict(interpret=interpret)

    ls = pf.set_rotation_rate_lanes(lstate, inp.rotation_rate)
    ls = pf.predict_lanes(ls, params, inp.dt[0], banked_ops=banked_ops, **it)

    if inp.acc is not None:
        new, _ = puf.update_model_lanes("acceleration", ls, inp.acc, inp.acc_cov, **it)
        ls = _lanes_select(inp.acc_valid, new, ls, pad)
    dvl_info = None
    if inp.dvl is not None:
        new, dvl_info = puf.update_velocity_lanes(ls, params, inp.dvl, inp.dvl_cov, **it)
        ls = _lanes_select(inp.dvl_valid, new, ls, pad)
    if inp.pressure is not None:
        if jnp.ndim(params.atmospheric_pressure) >= 1:
            # banked p_atm (Monte-Carlo sweep) rides the per-instance aux lanes
            new, _ = puf.update_model_lanes(
                "pressure", ls, inp.pressure, inp.pressure_cov,
                aux_bank=jnp.asarray(params.atmospheric_pressure, dtype)[:, None], **it,
            )
        else:
            new, _ = puf.update_model_lanes(
                "pressure", ls, inp.pressure, inp.pressure_cov,
                aux=(params.atmospheric_pressure, 0.0, 0.0, 0.0), **it,
            )
        ls = _lanes_select(inp.pressure_valid, new, ls, pad)
    if inp.xy is not None:
        new, _ = puf.update_model_lanes("xy_position", ls, inp.xy, inp.xy_cov, **it)
        ls = _lanes_select(inp.xy_valid, new, ls, pad)
    adcp_info = None
    if inp.adcp is not None:
        new, adcp_info = puf.update_model_lanes(
            "water_velocity", ls, inp.adcp, inp.adcp_cov, ukfops.D2P95,
            aux_bank=inp.adcp_cell_weighting[:, None], **it,
        )
        ls = _lanes_select(inp.adcp_valid, new, ls, pad)
    if inp.efforts is not None:
        new, _ = puf.update_body_efforts_lanes(
            ls, params, inp.efforts, inp.efforts_cov, **it
        )
        ls = _lanes_select(inp.efforts_valid, new, ls, pad)

    if inp.z is not None:
        new, _ = puf.update_model_lanes("z_position", ls, inp.z, inp.z_cov, **it)
        ls = _lanes_select(inp.z_valid, new, ls, pad)
    gps_accepted = None
    if inp.gps is not None:
        gps_in_body = consts.gps_in_body if consts is not None else None
        new, gps_info = gps_update_lanes(
            ls, params, inp.gps[:, 0], inp.gps[:, 1], inp.gps_cov, gps_in_body,
            nb=nb, **it,
        )
        ls = _lanes_select(inp.gps_valid, new, ls, pad)
        gps_accepted = inp.gps_valid & gps_info.accepted
    if inp.delayed_xy is not None:
        new, _ = delayed_xy_update_lanes(
            ls, inp.delayed_xy, inp.delayed_xy_cov, inp.delayed_position,
            nb=nb, **it,
        )
        ls = _lanes_select(inp.delayed_valid, new, ls, pad)
    marker_nis = None
    if inp.marker_features is not None:
        if consts is None or consts.marker is None:
            raise ValueError(
                "schedule carries marker detections; pass "
                "PoseStepConstants(marker=MarkerSetup(...))"
            )
        ms = consts.marker
        # fused 59-DOF augmentation in VMEM (models/pose_marker_fused.py):
        # marker ticks stay in kernel layout — no bank round trip, no
        # per-corner 59×59 Cholesky through XLA (parity pinned by
        # tests/test_marker_fused.py; round-trip-vs-fused cost measured in
        # docs/TUNING.md "Marker ticks at fleet scale")
        from . import pose_marker_fused as pmf

        new, m_info = pmf.update_visual_features_lanes(
            ls,
            inp.marker_features,
            inp.marker_feature_covs,
            ms.feature_positions,
            ms.marker_position,
            ms.marker_orientation,
            ms.cov_marker_pose,
            ms.camera,
            ms.camera_in_imu_position,
            ms.camera_in_imu_orientation,
            nb=nb,
            **it,
        )
        ls = _lanes_select(inp.marker_valid, new, ls, pad)
        marker_nis = jnp.where(inp.marker_valid[:, None], m_info.mahalanobis2, 0.0)

    mu_b = ls.mu_t[:, :nb]
    # one diagonal gather (valid in the lower-triangle-valid layout — the
    # diagonal belongs to the half the kernels write) instead of 53 slices
    cov_trace = jnp.diagonal(ls.cov_t, axis1=0, axis2=1).sum(axis=-1)[:nb]
    zero = jnp.zeros_like(inp.dt)
    out = TickOutput(
        position=mu_b[0:3].T,
        orientation=mu_b[3:7].T,
        velocity=mu_b[7:10].T,
        cov_trace=cov_trace,
        dvl_nis=(
            jnp.where(inp.dvl_valid, dvl_info.mahalanobis2, 0.0)
            if dvl_info is not None
            else zero
        ),
        adcp_accepted=(
            inp.adcp_valid & adcp_info.accepted
            if adcp_info is not None
            else zero.astype(bool)
        ),
        gps_accepted=gps_accepted,
        marker_nis=marker_nis,
    )
    return ls, out


def run_trajectory_bank_lanes(
    bstate: pukf.PoseUKFState,
    params: pukf.PoseUKFParams,
    inputs: PoseInputs,
    consts: Optional[PoseStepConstants] = None,
    *,
    interpret: bool = False,
) -> tuple[pukf.PoseUKFState, TickOutput]:
    """Fleet replay with the bank held in kernel layout for the WHOLE scan:
    one ``to_lanes`` in, one ``from_lanes`` out, fused kernels with in-kernel
    measurement models every tick (:func:`pose_step_bank_lanes`). Same
    semantics as :func:`run_trajectory_bank` — for shared parameter sets
    (parity pinned by ``tests/test_full_mission.py::
    test_run_trajectory_bank_lanes_matches_bank``) AND for banked
    Monte-Carlo parameter sweeps (``tests/test_full_mission.py::
    test_run_trajectory_bank_lanes_banked_params``): a banked ``params``
    (leading bank axis on every leaf) pre-builds the fully-banked predict
    operands once and closes over them as scan constants. The banked path
    bakes the tick-0 prediction interval into those operands, so it requires
    a constant ``dt`` across the schedule (what :func:`make_inputs`
    produces)."""
    from . import pose_fused as pf

    nb = bstate.cov.shape[0]
    ls0 = pf.to_lanes(bstate)
    banked_ops = None
    if params.process_noise.ndim == 3:
        # the banked operands bake the prediction interval once — a
        # variable-dt schedule would silently use tick-0's Q/decay scaling,
        # so reject it loudly whenever dt is inspectable (outside jit; under
        # jit the tracer can't be checked — the docstring requirement and
        # this eager-path guard are the contract)
        if not isinstance(inputs.dt, jax.core.Tracer):
            dt_vals = np.asarray(inputs.dt)
            if dt_vals.size and not np.all(dt_vals == dt_vals.flat[0]):
                raise ValueError(
                    "run_trajectory_bank_lanes with banked parameters "
                    "requires a constant prediction interval (the banked "
                    "predict operands bake dt once); this schedule's dt "
                    f"varies over [{dt_vals.min()}, {dt_vals.max()}] — use "
                    "run_trajectory_bank for variable-dt banked replays"
                )
        dt0 = inputs.dt[(0,) * inputs.dt.ndim]  # scalar tick-0 interval
        banked_ops = pf.banked_predict_operands(
            params, dt0, bstate.cov.dtype, ls0.cov_t.shape[-1]
        )
    ls_f, outs = jax.lax.scan(
        lambda ls, i: pose_step_bank_lanes(
            ls, params, i, consts, nb=nb, interpret=interpret, banked_ops=banked_ops
        ),
        ls0,
        inputs,
    )
    return pf.from_lanes(ls_f, bstate), outs
