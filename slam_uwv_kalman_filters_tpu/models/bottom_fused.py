"""Fused BottomUKF step — the S²-manifold small-filter Pallas fast path.

Single-launch whole step for banks of the 3-DOF seafloor tracking filter
(``/root/reference/src/BottomUKF.cpp``): the 3×3 Cholesky, 7 sigma points,
the distance process model with per-instance speed²·dt²-scaled process noise
(``BottomUKF.cpp:48-54``), the **iterative Karcher mean on S²** for the
bottom-normal state, and any chain of DVL ray/plane range updates
(``BottomUKF.cpp:18-30,56-61``) and direct S²-valued normal observations
(``BottomUKF.cpp:63-67``) — one kernel launch per bank, same bank-on-lanes
protocol as ``models/velocity_fused.py``.

The S² algebra runs entirely in-kernel on lane vectors, mirroring
``ops.manifolds`` (Householder tangent basis, guarded exp/log maps); the
log map's ``atan2`` uses the same Cephes polynomial as the pose kernel's
quaternion log (``pose_fused._atan2_nonneg``), extended to negative
cosines. The 7 sigma-point normals ride the sublane axis of one (7, B)
tile per vector component, so each Karcher iteration is ~45 VPU ops for
all points at once. Like the pose kernel's quaternion mean, the S² mean
runs a fixed ``MEAN_ITERS`` iterations instead of a tolerance loop — the
sigma set is ±symmetric about the seed (point 0 = the prior mean), so the
first correction is nearly exact and converged iterations are fixed points.

Parity vs ``vmap`` of the generic path (which tests/test_bottom_ukf.py pins
to the reference semantics) is ~1e-6 relative in f32, pinned by
``tests/test_bottom_fused.py``. Dispatch lives in ``bottom_ukf.predict_bank``
/ ``update_range_bank`` / ``update_normal_bank``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, TYPE_CHECKING

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import kernels
from ..ops.kernels import LANE_TILE
from ..ops import ukf
from .pose_fused import _atan2_nonneg
from .velocity_fused import _draw_deltas, _kalman_tail

if TYPE_CHECKING:
    from .bottom_ukf import BottomUKFParams, BottomUKFState

__all__ = [
    "FUSED_MODELS",
    "MEAN_ITERS",
    "BottomLanesState",
    "to_lanes",
    "from_lanes",
    "set_velocity_lanes",
    "predict_lanes",
    "update_model_lanes",
    "step_lanes",
    "StepUpdate",
    "predict_fused_banked",
    "update_model_fused_banked",
]

DOF = 3  # distance (1) + normal (S², 2 DOF), BottomUKF.hpp:15-21
NSIG = 2 * DOF + 1  # 7
MEAN_ITERS = 4  # fixed-point S² Karcher iterations (see module docstring)

# in-kernel measurement models: name → measurement dim
FUSED_MODELS = {"range": 1, "normal": 2}

# SMEM scalar-operand indices
_S_DT = 0
_S_Q = 1  # 1:10 process noise, row-major 3×3 (scaled per-lane in-kernel)
_NSCAL = 10

_PI = 3.14159265358979323846


class BottomLanesState(NamedTuple):
    """BottomUKF bank in kernel layout; ``nb`` padded to a lane multiple."""

    cov_t: jax.Array  # (3, 3, nb) covariance, (col, row, B)
    mu_t: jax.Array  # (4, nb) storage rows: distance, normal xyz
    vel_t: jax.Array  # (3, nb) cached vehicle-velocity input


def to_lanes(state: "BottomUKFState") -> BottomLanesState:
    """Bank-first pytree state → kernel layout (pads to LANE_TILE; pad lanes
    get identity covariance and copies of instance 0)."""
    dtype = state.cov.dtype
    nb = state.cov.shape[0]
    pad = (-nb) % LANE_TILE
    cov = state.cov
    mu = jnp.concatenate([state.mu.distance, state.mu.normal], axis=-1)
    vel = state.velocity
    if pad:
        eye = jnp.broadcast_to(jnp.eye(DOF, dtype=dtype), (pad, DOF, DOF))
        cov = jnp.concatenate([cov, eye], axis=0)
        tile = lambda a: jnp.concatenate([a, jnp.tile(a[:1], (pad, 1))], axis=0)
        mu, vel = tile(mu), tile(vel)
    return BottomLanesState(
        cov_t=jnp.transpose(cov, (2, 1, 0)), mu_t=mu.T, vel_t=vel.T
    )


def from_lanes(lstate: BottomLanesState, like: "BottomUKFState") -> "BottomUKFState":
    nb = like.cov.shape[0]
    mu_rows = lstate.mu_t.T[:nb]
    return like._replace(
        mu=like.mu._replace(distance=mu_rows[:, 0:1], normal=mu_rows[:, 1:4]),
        cov=jnp.transpose(lstate.cov_t, (2, 1, 0))[:nb],
        velocity=lstate.vel_t.T[:nb],
    )


def set_velocity_lanes(lstate: BottomLanesState, velocity: jax.Array) -> BottomLanesState:
    """Cache a new (B, 3) velocity input (``setVelocity``, ``BottomUKF.cpp:69-72``)."""
    pad = lstate.vel_t.shape[-1] - velocity.shape[0]
    v = jnp.asarray(velocity, lstate.vel_t.dtype)
    if pad:
        v = jnp.concatenate([v, jnp.tile(v[:1], (pad, 1))], axis=0)
    return lstate._replace(vel_t=v.T)


# ---------------------------------------------------------------------------
# In-kernel S² algebra on lane-vector components (mirrors ops.manifolds;
# every guard constant matches so parity tests can pin tight tolerances).
# All inputs/outputs are tuples of arrays broadcastable over (rows, B).
# ---------------------------------------------------------------------------


def _s2_basis(x):
    """Householder tangent basis columns (b0, b1) at unit vector x."""
    x0, x1, x2 = x
    one = jnp.ones_like(x2)
    sign = jnp.where(x2 >= 0.0, one, -one)
    v0, v1, v2 = sign * x0, sign * x1, sign * x2 - 1.0
    vv = v0 * v0 + v1 * v1 + v2 * v2
    degen = vv < 1e-24
    safe = jnp.where(degen, one, vv)
    s = 2.0 / safe
    b0 = (1.0 - s * v0 * v0, -s * v0 * v1, -s * v0 * v2)
    b1 = (-s * v1 * v0, 1.0 - s * v1 * v1, -s * v1 * v2)
    zero = jnp.zeros_like(x2)
    b0 = tuple(jnp.where(degen, e, c) for e, c in zip((one, zero, zero), b0))
    b1 = tuple(jnp.where(degen, e, c) for e, c in zip((zero, one, zero), b1))
    return b0, b1


def _s2_boxplus(x, d0, d1, basis=None):
    """x ⊞ (d0, d1): sphere exponential map (ops.manifolds.s2_boxplus)."""
    b0, b1 = _s2_basis(x) if basis is None else basis
    v = tuple(b0[i] * d0 + b1[i] * d1 for i in range(3))
    t2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    theta = jnp.sqrt(t2)
    small = t2 < 1e-24
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    sinc = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe) / safe)
    c = jnp.cos(theta)
    y = tuple(c * x[i] + sinc * v[i] for i in range(3))
    # 1/sqrt rather than lax.rsqrt: the VPU rsqrt approximation's relative
    # error lands directly on the unit-vector components, and unlike the
    # quaternion case (where scale cancels) downstream dot/cross ratios keep
    # a unit-norm assumption through cos(θ)·x.
    inv = 1.0 / jnp.sqrt(y[0] * y[0] + y[1] * y[1] + y[2] * y[2])
    return tuple(inv * yi for yi in y)


def _atan2_pos_y(s, d):
    """atan2(s, d) for s ≥ 0, d of any sign (range [0, π])."""
    a = _atan2_nonneg(s, jnp.abs(d))
    return jnp.where(d >= 0.0, a, _PI - a)


def _s2_boxminus(y, x, basis=None):
    """(d0, d1) = y ⊟ x: sphere log map in the basis at x
    (ops.manifolds.s2_boxminus, incl. the antipode guard)."""
    b0, b1 = _s2_basis(x) if basis is None else basis
    cx = (
        x[1] * y[2] - x[2] * y[1],
        x[2] * y[0] - x[0] * y[2],
        x[0] * y[1] - x[1] * y[0],
    )
    s = jnp.sqrt(cx[0] * cx[0] + cx[1] * cx[1] + cx[2] * cx[2])
    d = x[0] * y[0] + x[1] * y[1] + x[2] * y[2]
    theta = _atan2_pos_y(s, d)
    t = tuple(y[i] - d * x[i] for i in range(3))
    tn2 = t[0] * t[0] + t[1] * t[1] + t[2] * t[2]
    tn = jnp.sqrt(tn2)
    small = tn < 1e-12
    inv = 1.0 / jnp.where(small, jnp.ones_like(tn), tn)
    zero = jnp.zeros_like(tn)
    u = tuple(
        jnp.where(small, jnp.where(d > 0.0, zero, b0[i]), t[i] * inv) for i in range(3)
    )
    v = tuple(theta * u[i] for i in range(3))
    return (
        b0[0] * v[0] + b0[1] * v[1] + b0[2] * v[2],
        b1[0] * v[0] + b1[1] * v[1] + b1[2] * v[2],
    )


def _s2_karcher_mean(pts, nrow):
    """Fixed-iteration equal-weight S² mean of ``nrow`` stacked points
    (components shaped (nrow, B)), seeded from row 0 (ukfom convention —
    ops.manifolds._iterative_mean)."""
    m = tuple(p[0:1] for p in pts)
    for _ in range(MEAN_ITERS):
        basis = _s2_basis(m)
        d0, d1 = _s2_boxminus(pts, m, basis)  # (nrow, B) each, broadcast over m
        m = _s2_boxplus(
            m,
            jnp.sum(d0, axis=0, keepdims=True) * (1.0 / nrow),
            jnp.sum(d1, axis=0, keepdims=True) * (1.0 / nrow),
            basis,
        )
    return m


# ---------------------------------------------------------------------------
# The fused step kernel.
# ---------------------------------------------------------------------------


def _sigma_normals(P, mu_n):
    """Redraw sigma points from the current 3×3 covariance: returns
    (delta rows list of (NSIG, B), normal components (NSIG, B)×3)."""
    drow = _draw_deltas(P, DOF)
    basis = _s2_basis(mu_n)
    normals = _s2_boxplus(mu_n, drow[1], drow[2], basis)  # (NSIG, B) comps
    return drow, normals


def _make_step_kernel(models: tuple[str, ...], do_predict: bool):
    def kernel(*refs):
        cov_ref, mu_ref, vel_ref, scal_ref = refs[:4]
        pos = 4
        upd_refs = []
        for mdl in models:
            n_ops = 4 if mdl == "range" else 2  # z, R [, dir, origin] + gate
            upd_refs.append(refs[pos : pos + n_ops + 1])
            pos += n_ops + 1
        covo_ref, muo_ref = refs[pos : pos + 2]
        flat = refs[pos + 2 :]
        info_refs = [flat[3 * k : 3 * k + 3] for k in range(len(models))]

        dtype = cov_ref.dtype
        s = lambda i: scal_ref[i, 0]
        dt = s(_S_DT)

        dist = mu_ref[0:1, :]
        mu_n = tuple(mu_ref[1 + i : 2 + i, :] for i in range(3))
        P = [[None] * DOF for _ in range(DOF)]
        for i in range(DOF):
            for j in range(i + 1):
                v = cov_ref[j, i : i + 1, :]
                P[i][j] = v
                P[j][i] = v

        if do_predict:
            drow, normals = _sigma_normals(P, mu_n)
            # process model (BottomUKF.cpp:5-16): distance ⊞ (−v_z)·dt
            dists = (dist + drow[0]) - dt * vel_ref[2:3, :]  # (NSIG, B)
            # manifold mean: distance arithmetic; normal Karcher (seed row 0)
            mean_d = jnp.sum(dists, axis=0, keepdims=True) * (1.0 / NSIG)
            mean_n = _s2_karcher_mean(normals, NSIG)
            # deviations & covariance; Q scaled per-lane by speed²·dt²
            basis = _s2_basis(mean_n)
            dd = dists - mean_d
            dn0, dn1 = _s2_boxminus(normals, mean_n, basis)
            D = [dd, dn0, dn1]
            qs = (vel_ref[0:1, :] ** 2 + vel_ref[1:2, :] ** 2) * dt * dt
            P = [
                [
                    0.5 * jnp.sum(D[i] * D[j], axis=0, keepdims=True)
                    + qs * s(_S_Q + 3 * i + j)
                    for j in range(DOF)
                ]
                for i in range(DOF)
            ]
            dist, mu_n = mean_d, mean_n

        for refs_u, (m2_ref, acc_ref, nu_ref), mdl in zip(upd_refs, info_refs, models):
            m = FUSED_MODELS[mdl]
            if mdl == "range":
                z_ref, r_ref, dir_ref, org_ref, gate_ref = refs_u
            else:
                z_ref, r_ref, gate_ref = refs_u
            drow, normals = _sigma_normals(P, mu_n)
            dists = dist + drow[0]  # (NSIG, B)
            if mdl == "range":
                # ray/plane intersection (measurementDistance, BottomUKF.cpp:18-30)
                dirv = tuple(dir_ref[i : i + 1, :] for i in range(3))
                org = tuple(org_ref[i : i + 1, :] for i in range(3))
                vdn = dirv[0] * normals[0] + dirv[1] * normals[1] + dirv[2] * normals[2]
                num = (
                    (-org[0]) * normals[0]
                    + (-org[1]) * normals[1]
                    + (-dists - org[2]) * normals[2]
                )
                degen = vdn == 0.0
                h = jnp.where(degen, jnp.zeros_like(num), num / jnp.where(degen, jnp.ones_like(vdn), vdn))
                z_mean = jnp.sum(h, axis=0, keepdims=True) * (1.0 / NSIG)
                dz = [h - z_mean]
                nu_v = [z_ref[0:1, :] - z_mean]
            else:
                # S²-valued normal observation (BottomUKF.cpp:32-37,63-67)
                z_mean = _s2_karcher_mean(normals, NSIG)
                basis = _s2_basis(z_mean)
                dz0, dz1 = _s2_boxminus(normals, z_mean, basis)
                dz = [dz0, dz1]
                zv = tuple(z_ref[i : i + 1, :] for i in range(3))
                i0, i1 = _s2_boxminus(zv, z_mean, basis)
                nu_v = [i0, i1]
            S = [
                [
                    0.5 * jnp.sum(dz[a] * dz[bb], axis=0, keepdims=True)
                    + r_ref[a, bb : bb + 1, :]
                    for bb in range(m)
                ]
                for a in range(m)
            ]
            C = [
                [0.5 * jnp.sum(drow[i] * dz[a], axis=0, keepdims=True) for a in range(m)]
                for i in range(DOF)
            ]
            corr, P, m2, accf = _kalman_tail(P, S, C, nu_v, gate_ref[0, 0], dtype)
            dist = dist + corr[0]
            mu_n = _s2_boxplus(mu_n, corr[1], corr[2])
            m2_ref[:] = m2
            acc_ref[:] = accf
            nu_ref[:] = jnp.concatenate(nu_v, axis=0)

        for j in range(DOF):
            covo_ref[j] = jnp.concatenate([P[i][j] for i in range(DOF)], axis=0)
        muo_ref[:] = jnp.concatenate([dist, mu_n[0], mu_n[1], mu_n[2]], axis=0)

    return kernel


@partial(jax.jit, static_argnames=("models", "do_predict", "interpret"))
def _bottom_step_lanes(
    models: tuple[str, ...],
    do_predict: bool,
    cov_t,
    mu_t,
    vel_t,
    scal,
    meas_ops,
    *,
    interpret: bool = False,
):
    nb = cov_t.shape[-1]
    dtype = cov_t.dtype
    lane_spec = kernels.lane_block_spec
    smem = lambda n: pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [lane_spec(DOF, DOF), lane_spec(DOF + 1), lane_spec(3), smem(_NSCAL)]
    operands = [cov_t, mu_t, vel_t, scal]
    out_shape = [
        jax.ShapeDtypeStruct((DOF, DOF, nb), dtype),
        jax.ShapeDtypeStruct((DOF + 1, nb), dtype),
    ]
    out_specs = [lane_spec(DOF, DOF), lane_spec(DOF + 1)]
    info_shape, info_specs = [], []
    for mdl, ops_k in zip(models, meas_ops):
        m = FUSED_MODELS[mdl]
        zdim = 3 if mdl == "normal" else m  # normal measurements are S² vectors
        if mdl == "range":
            z_t, r_t, dir_t, org_t, gate = ops_k
            in_specs += [lane_spec(zdim), lane_spec(m, m), lane_spec(3), lane_spec(3), smem(1)]
            operands += [z_t, r_t, dir_t, org_t, gate]
        else:
            z_t, r_t, gate = ops_k
            in_specs += [lane_spec(zdim), lane_spec(m, m), smem(1)]
            operands += [z_t, r_t, gate]
        info_shape += [
            jax.ShapeDtypeStruct((1, nb), dtype),
            jax.ShapeDtypeStruct((1, nb), dtype),
            jax.ShapeDtypeStruct((m, nb), dtype),
        ]
        info_specs += [lane_spec(1), lane_spec(1), lane_spec(m)]
    return pl.pallas_call(
        _make_step_kernel(models, do_predict),
        out_shape=tuple(out_shape + info_shape),
        grid=(nb // LANE_TILE,),
        in_specs=in_specs,
        out_specs=tuple(out_specs + info_specs),
        interpret=interpret,
    )(*operands)


class StepUpdate(NamedTuple):
    """One measurement in a fused BottomUKF step chain. ``model`` ∈
    :data:`FUSED_MODELS`; ``range`` needs per-instance (or broadcastable)
    beam ``direction``/``origin``; ``normal`` takes a (B, 3) unit-vector
    measurement (S²-valued, like the reference's ``NormalType``)."""

    model: str
    z: jax.Array  # (B, 1) range or (B, 3) unit normal
    meas_cov: jax.Array  # (B, m, m) or (m, m)
    direction: jax.Array | None = None  # (B, 3) or (3,) — range only
    origin: jax.Array | None = None  # (B, 3) or (3,) — range only
    gate_threshold: float | None = None


def _measurement_operands(updates, nb, pad, dtype):
    ops_all = []
    for u in updates:
        m = FUSED_MODELS[u.model]
        zdim = 3 if u.model == "normal" else m
        z = jnp.asarray(u.z, dtype).reshape(-1, zdim)
        if z.shape[0] != nb:
            raise ValueError(
                f"inconsistent bank sizes across step updates: {z.shape[0]} vs {nb}"
            )
        r = jnp.broadcast_to(jnp.asarray(u.meas_cov, dtype), (nb, m, m))
        if pad:
            fill = jnp.zeros((pad, zdim), dtype)
            if u.model == "normal":
                fill = fill.at[:, 2].set(1.0)  # unit vector in pad lanes
            z = jnp.concatenate([z, fill], axis=0)
            r = jnp.concatenate(
                [r, jnp.broadcast_to(jnp.eye(m, dtype=dtype), (pad, m, m))], axis=0
            )
        thr = -1.0 if u.gate_threshold is None else u.gate_threshold
        gate = jnp.asarray(thr, dtype)[None, None]
        if u.model == "range":
            if u.direction is None or u.origin is None:
                raise ValueError("range updates need direction and origin")
            d = jnp.broadcast_to(jnp.asarray(u.direction, dtype), (nb, 3))
            o = jnp.broadcast_to(jnp.asarray(u.origin, dtype), (nb, 3))
            if pad:
                down = jnp.zeros((pad, 3), dtype).at[:, 2].set(-1.0)
                d = jnp.concatenate([d, down], axis=0)
                o = jnp.concatenate([o, jnp.zeros((pad, 3), dtype)], axis=0)
            ops_all.append((z.T, jnp.transpose(r, (1, 2, 0)), d.T, o.T, gate))
        else:
            ops_all.append((z.T, jnp.transpose(r, (1, 2, 0)), gate))
    return ops_all


def _run(lstate, params, dt, updates, do_predict, nb, *, interpret):
    dtype = lstate.cov_t.dtype
    pad = lstate.cov_t.shape[-1] - nb
    updates = [u if isinstance(u, StepUpdate) else StepUpdate(*u) for u in updates]
    meas_ops = _measurement_operands(updates, nb, pad, dtype)
    if do_predict:
        scal = jnp.concatenate(
            [
                jnp.asarray(dt, dtype)[None],
                params.process_noise.astype(dtype).reshape(9),
            ]
        )[:, None]
    else:
        scal = jnp.zeros((_NSCAL, 1), dtype)
    outs = _bottom_step_lanes(
        tuple(u.model for u in updates),
        do_predict,
        lstate.cov_t,
        lstate.mu_t,
        lstate.vel_t,
        scal,
        meas_ops,
        interpret=interpret,
    )
    covo_t, muo_t = outs[:2]
    infos = []
    for k in range(len(updates)):
        m2, acc, nu_t = outs[2 + 3 * k : 5 + 3 * k]
        infos.append(
            ukf.UpdateInfo(
                mahalanobis2=m2[0, :nb], accepted=acc[0, :nb] > 0.5, innovation=nu_t.T[:nb]
            )
        )
    return lstate._replace(cov_t=covo_t, mu_t=muo_t), infos


def step_lanes(
    lstate: BottomLanesState,
    params: "BottomUKFParams",
    dt,
    updates: Sequence[StepUpdate] = (),
    *,
    nb: int | None = None,
    interpret: bool = False,
):
    """One whole BottomUKF step — predict(dt) + a chain of range/normal
    updates — in a single kernel launch on kernel-layout state (each update
    re-draws sigma points from the then-current covariance, exactly like the
    reference's sequential ``integrateMeasurement`` calls)."""
    updates = [u if isinstance(u, StepUpdate) else StepUpdate(*u) for u in updates]
    if nb is None:
        nb = updates[0].z.shape[0] if updates else lstate.cov_t.shape[-1]
    return _run(lstate, params, dt, updates, True, nb, interpret=interpret)


def predict_lanes(
    lstate: BottomLanesState,
    params: "BottomUKFParams",
    dt,
    *,
    nb: int | None = None,
    interpret: bool = False,
) -> BottomLanesState:
    """Fused prediction only (``BottomUKF::predictionStepImpl``)."""
    out, _ = _run(
        lstate, params, dt, [], True,
        lstate.cov_t.shape[-1] if nb is None else nb, interpret=interpret,
    )
    return out


def update_model_lanes(
    model: str,
    lstate: BottomLanesState,
    z: jax.Array,
    meas_cov: jax.Array,
    direction: jax.Array | None = None,
    origin: jax.Array | None = None,
    gate_threshold: float | None = None,
    *,
    interpret: bool = False,
):
    """One fused measurement update (no predict) on kernel-layout state."""
    nb = jnp.asarray(z).shape[0]
    out, infos = _run(
        lstate, None, 0.0,
        [StepUpdate(model, z, meas_cov, direction, origin, gate_threshold)],
        False, nb, interpret=interpret,
    )
    return out, infos[0]


# ---------------------------------------------------------------------------
# Public bank-API entries: pack → one launch → unpack.
# ---------------------------------------------------------------------------


def predict_fused_banked(
    bstate: "BottomUKFState", params: "BottomUKFParams", dt, *, interpret: bool = False
) -> "BottomUKFState":
    ls = predict_lanes(to_lanes(bstate), params, dt, interpret=interpret)
    return from_lanes(ls, bstate)


def update_model_fused_banked(
    model: str,
    bstate: "BottomUKFState",
    z: jax.Array,
    meas_cov: jax.Array,
    direction: jax.Array | None = None,
    origin: jax.Array | None = None,
    gate_threshold: float | None = None,
    *,
    interpret: bool = False,
):
    ls, info = update_model_lanes(
        model, to_lanes(bstate), z, meas_cov, direction, origin, gate_threshold,
        interpret=interpret,
    )
    return from_lanes(ls, bstate), info
