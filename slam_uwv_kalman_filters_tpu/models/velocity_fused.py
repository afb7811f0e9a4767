"""Fused VelocityUKF step — the small-filter Pallas fast path.

The generic VelocityUKF step (``models.velocity_ukf`` → ``ops.ukf``) is
correct on banks via ``vmap``, but a 4-DOF filter is pure overhead for XLA:
profiling a v5e at bank 32k shows the whole predict+DVL chain running at
~4.8 M steps/s — two orders of magnitude below the HBM roofline for the
~350 bytes of state a step actually touches, because every tiny (4,4)/(9,4)
intermediate round-trips HBM with layout changes and the launch/fusion
overhead dwarfs the math.

This module collapses the entire step — the 4×4 Cholesky, the 9 sigma
points through the **full Fossen forward dynamics** (the reference's
``processMotionModel``, ``/root/reference/src/VelocityUKF.cpp:6-33``), the
unscented reconstruction, the orientation-tracker advance
(``motion_model->sendEffort``, ``src/VelocityUKF.cpp:126-127``), and any
chain of DVL / pressure measurement updates (``src/VelocityUKF.cpp:79-85,
106-112``) — into ONE Pallas launch per bank in the same bank-on-lanes
layout as the PoseUKF kernels (``ops/kernels.py`` protocol: 128 instances
per lane group).

Layout trick specific to the small filter: the 9 sigma points AND the
orientation tracker ride the **sublane axis** of one (10, B) tile per
6-DOF-dynamics component, so the whole dynamics pipeline (M·ν, Coriolis,
damping, restoring term, M⁻¹·rhs) is evaluated once on (10, 128) vectors
instead of 10 times on (1, 128) vectors — the VPU runs at full width where
a row-per-quantity layout would idle 7/8 of the sublanes.

Numerics: identical math to the generic path except summation order and the
closed-form linear-measurement algebra — both DVL and pressure observe state
rows directly (H = row selector), for which the ukfom sigma-point update
(redraw ±chol(P) columns, S = ½ΣdZdZᵀ + R) reduces *exactly* to
S = H·L·Lᵀ·Hᵀ + R = H·P·Hᵀ + R in exact arithmetic; the kernel computes that
form directly (f32 parity ~1e-6 relative, pinned by
``tests/test_velocity_fused.py``). Gating is a masked select, bankwide.

Applies when the bank shares one parameter set and runs f32 (the TPU
deployment configuration); f64 oracle runs and parameter sweeps use the
generic ``vmap`` path. Dispatch lives in ``velocity_ukf.predict_bank`` /
``update_dvl_bank`` / ``update_pressure_bank``.
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
from .pose_fused import _qexp, _qmul, _qnorm4

if TYPE_CHECKING:
    from .velocity_ukf import VelocityUKFParams, VelocityUKFState

__all__ = [
    "FUSED_MODELS",
    "VelLanesState",
    "to_lanes",
    "from_lanes",
    "set_inputs_lanes",
    "predict_lanes",
    "update_model_lanes",
    "step_lanes",
    "StepUpdate",
    "predict_fused_banked",
    "update_model_fused_banked",
]

DOF = 4  # velocity (3) + z_position (1), VelocityUKF.hpp:24-27
NSIG = 2 * DOF + 1  # 9
NROW = NSIG + 1  # sigma points + the orientation tracker share the dynamics tile
TRK_DIM = 13  # tracker PoseVelocityState: position 3, quat 4, lin vel 3, ang vel 3

# in-kernel measurement models: state rows observed directly
FUSED_MODELS = {"dvl": (0, 1, 2), "pressure": (3,)}

# SMEM scalar-operand indices
_S_DT = 0
_S_M = 1  # 1:37   inertia matrix, row-major
_S_MI = 37  # 37:73  inverse inertia matrix
_S_DL = 73  # 73:109 linear damping
_S_DQ = 109  # 109:145 quadratic damping
_S_BW = 145  # buoyancy − weight
_S_RV = 146  # 146:149 restoring lever  buoyancy·cob − weight·cog
_S_Q = 149  # 149:165 dt-scaled process noise, row-major 4×4
_NSCAL = 165


class VelLanesState(NamedTuple):
    """VelocityUKF bank in kernel layout; ``nb`` is padded to a lane
    multiple (the true bank size is a static property the caller supplies,
    as in ``pose_fused.LanesBankState``)."""

    cov_t: jax.Array  # (4, 4, nb) covariance, (col, row, B)
    mu_t: jax.Array  # (4, nb) state rows: velocity xyz, z_position
    eff_t: jax.Array  # (6, nb) cached body-effort input
    av_t: jax.Array  # (3, nb) cached gyro-rate input
    trk_t: jax.Array  # (13, nb) orientation tracker (pos, quat wxyz, lin vel, ang vel)


def _pack_tracker(ms) -> jax.Array:
    """dyn.PoseVelocityState bank (B, ·) → (B, 13) storage rows."""
    return jnp.concatenate(
        [ms.position, ms.orientation, ms.linear_velocity, ms.angular_velocity], axis=-1
    )


def _unpack_tracker(rows: jax.Array, like):
    return like._replace(
        position=rows[:, 0:3],
        orientation=rows[:, 3:7],
        linear_velocity=rows[:, 7:10],
        angular_velocity=rows[:, 10:13],
    )


def to_lanes(state: "VelocityUKFState") -> VelLanesState:
    """Bank-first pytree state → kernel layout (pads to LANE_TILE).

    Pad lanes get identity covariance and copies of instance 0 (finite math
    everywhere, incl. a unit tracker quaternion); they are dropped again by
    :func:`from_lanes` / the lanes updates."""
    dtype = state.cov.dtype
    nb = state.cov.shape[0]
    pad = (-nb) % LANE_TILE
    cov = state.cov
    mu = jnp.concatenate([state.mu.velocity, state.mu.z_position], axis=-1)
    eff, av = state.body_efforts, state.angular_velocity
    trk = _pack_tracker(state.model_state)
    if pad:
        eye = jnp.broadcast_to(jnp.eye(DOF, dtype=dtype), (pad, DOF, DOF))
        cov = jnp.concatenate([cov, eye], axis=0)
        tile = lambda a: jnp.concatenate([a, jnp.tile(a[:1], (pad, 1))], axis=0)
        mu, eff, av, trk = tile(mu), tile(eff), tile(av), tile(trk)
    return VelLanesState(
        cov_t=jnp.transpose(cov, (2, 1, 0)),
        mu_t=mu.T,
        eff_t=eff.T,
        av_t=av.T,
        trk_t=trk.T,
    )


def from_lanes(lstate: VelLanesState, like: "VelocityUKFState") -> "VelocityUKFState":
    """Kernel layout → bank-first pytree state (drops padding)."""
    nb = like.cov.shape[0]
    mu_rows = lstate.mu_t.T[:nb]
    return like._replace(
        mu=like.mu._replace(velocity=mu_rows[:, 0:3], z_position=mu_rows[:, 3:4]),
        cov=jnp.transpose(lstate.cov_t, (2, 1, 0))[:nb],
        body_efforts=lstate.eff_t.T[:nb],
        angular_velocity=lstate.av_t.T[:nb],
        model_state=_unpack_tracker(lstate.trk_t.T[:nb], like.model_state),
    )


def set_inputs_lanes(
    lstate: VelLanesState,
    *,
    body_efforts: jax.Array | None = None,  # (B, 6)
    angular_velocity: jax.Array | None = None,  # (B, 3)
) -> VelLanesState:
    """Cache new inputs on kernel-layout state — ``integrateMeasurement(
    GyroMeasurement/BodyEffortsMeasurement)`` (``src/VelocityUKF.cpp:87-104``).
    A gyro input also refreshes the tracker's angular-velocity rows, exactly
    like ``velocity_ukf.integrate_gyro``."""
    nb_pad = lstate.mu_t.shape[-1]

    def padded(a):
        pad = nb_pad - a.shape[0]
        if pad:
            a = jnp.concatenate([a, jnp.tile(a[:1], (pad, 1))], axis=0)
        return a.T

    if body_efforts is not None:
        lstate = lstate._replace(eff_t=padded(jnp.asarray(body_efforts, lstate.eff_t.dtype)))
    if angular_velocity is not None:
        av_t = padded(jnp.asarray(angular_velocity, lstate.av_t.dtype))
        trk_t = jnp.concatenate([lstate.trk_t[:10], av_t], axis=0)
        lstate = lstate._replace(av_t=av_t, trk_t=trk_t)
    return lstate


def _params_scalars(params: "VelocityUKFParams", dt, dtype) -> jax.Array:
    """(_NSCAL, 1) SMEM operand: dt, the four 6×6 model matrices (inertia,
    its inverse, linear/quadratic damping), the precomputed restoring-term
    scalars, and the dt-scaled process noise (VelocityUKF scales Q linearly
    in dt, ``src/VelocityUKF.cpp:122`` — unlike PoseUKF's dt²)."""
    m = params.model
    dt = jnp.asarray(dt, dtype)
    inertia = m.inertia_matrix.astype(dtype)
    minv = jnp.linalg.inv(m.inertia_matrix).astype(dtype)
    w = m.weight.astype(dtype)
    b = m.buoyancy.astype(dtype)
    vals = jnp.concatenate(
        [
            dt[None],
            inertia.reshape(36),
            minv.reshape(36),
            m.damping_linear.astype(dtype).reshape(36),
            m.damping_quadratic.astype(dtype).reshape(36),
            (b - w)[None],
            b * m.cob.astype(dtype) - w * m.cog.astype(dtype),
            (dt * params.process_noise.astype(dtype)).reshape(16),
        ]
    )
    return vals[:, None]


def _crout(P, n):
    """Unrolled Cholesky–Crout on an n×n grid of (1, B) lane vectors —
    the in-kernel twin of ``ops.linalg_small._scalar_cholesky_factors``
    (plain, unequilibrated: the generic small-n path it must match uses
    ``cholesky_unrolled``)."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = P[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            t = P[i][j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv_d
    return L


def _solve_chol(L, rhs, n):
    """x = (L·Lᵀ)⁻¹ rhs on lane vectors; rhs is a list of n (1, B) vectors."""
    inv_d = [1.0 / L[i][i] for i in range(n)]
    y = [None] * n
    for i in range(n):
        t = rhs[i]
        for k in range(i):
            t = t - L[i][k] * y[k]
        y[i] = t * inv_d[i]
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i]
        for k in range(i + 1, n):
            t = t - L[k][i] * x[k]
        x[i] = t * inv_d[i]
    return x


def _cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _draw_deltas(P, ndof):
    """(2·ndof+1, B) interleaved ukfom sigma deltas per tangent row from the
    plain unrolled Cholesky of the (ndof, ndof) lane-vector grid P — row 0
    zero, rows 2j+1 / 2j+2 the ±j-th factor column. The single definition of
    the in-kernel sigma-draw convention, shared by the velocity, bottom and
    indirect fused kernels."""
    L = _crout(P, ndof)
    z1 = jnp.zeros_like(P[0][0])
    drow = []
    for i in range(ndof):
        parts = [z1]
        for j in range(ndof):
            c = L[i][j] if j <= i else z1
            parts += [c, -c]
        drow.append(jnp.concatenate(parts, axis=0))
    return drow


def _kalman_tail(P, S, C, nu_v, thr, dtype):
    """Shared linear-algebra tail of the fused updates: unrolled Cholesky of
    the m×m innovation covariance grid ``S``, gain K = C·S⁻¹, Mahalanobis²,
    the χ² mask (``thr`` < 0 ⇒ accept any), the masked correction K·ν and
    the exactly-symmetric masked downdate P − (K·Lₛ)(K·Lₛ)ᵀ. ``P``/``C`` are
    n×n / n×m grids of lane vectors. Returns (corr, Pn, m2, accf)."""
    n, m = len(P), len(nu_v)
    Ls = _crout(S, m)
    q_sol = _solve_chol(Ls, nu_v, m)
    m2 = sum(nu_v[a] * q_sol[a] for a in range(m))
    K = [_solve_chol(Ls, C[i], m) for i in range(n)]
    accf = jnp.where(thr < 0.0, jnp.ones_like(m2), (m2 <= thr).astype(dtype))
    corr = [accf * sum(K[i][a] * nu_v[a] for a in range(m)) for i in range(n)]
    W = [
        [sum(K[i][bb] * Ls[bb][a] for bb in range(a, m)) for a in range(m)]
        for i in range(n)
    ]
    Pn = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            v = P[i][j] - accf * sum(W[i][a] * W[j][a] for a in range(m))
            Pn[i][j] = v
            Pn[j][i] = v
    return corr, Pn, m2, accf


def _make_step_kernel(models: tuple[str, ...], do_predict: bool):
    """Kernel factory: (optional) predict + a chain of in-kernel linear
    measurement updates, all state VMEM-resident between phases."""

    def kernel(*refs):
        cov_ref, mu_ref, eff_ref, av_ref, trk_ref, scal_ref = refs[:6]
        pos = 6
        upd_refs = []
        for _ in models:
            upd_refs.append(refs[pos : pos + 3])  # z, R, gate
            pos += 3
        covo_ref, muo_ref, trko_ref = refs[pos : pos + 3]
        flat = refs[pos + 3 :]
        info_refs = [flat[3 * k : 3 * k + 3] for k in range(len(models))]

        b = cov_ref.shape[-1]
        dtype = cov_ref.dtype
        s = lambda i: scal_ref[i, 0]
        dt = s(_S_DT)

        mu = [mu_ref[i : i + 1, :] for i in range(DOF)]
        # read the lower triangle, mirror in registers (input is symmetric)
        P = [[None] * DOF for _ in range(DOF)]
        for i in range(DOF):
            for j in range(i + 1):
                v = cov_ref[j, i : i + 1, :]  # (col j, row i)
                P[i][j] = v
                P[j][i] = v

        if do_predict:
            # --- sigma deltas: (NSIG, B) ukfom-interleaved per state row ---
            drow = _draw_deltas(P, DOF)

            # --- shared per-instance quantities ---
            q = [trk_ref[3 + i : 4 + i, :] for i in range(4)]  # wxyz
            qw, qx, qy, qz = q
            # third row of R(q): both up_body = Rᵀe_z and the depth rate
            # (R·v)_z read exactly these three numbers
            r2 = (
                2.0 * (qx * qz - qw * qy),
                2.0 * (qy * qz + qw * qx),
                1.0 - 2.0 * (qx * qx + qy * qy),
            )
            # restoring term g(q) = −[(B−W)·up; (B·cob − W·cog) × up]
            rv = [s(_S_RV + i) for i in range(3)]
            tau_ext = [
                rv[1] * r2[2] - rv[2] * r2[1],
                rv[2] * r2[0] - rv[0] * r2[2],
                rv[0] * r2[1] - rv[1] * r2[0],
            ]
            g6 = [-(s(_S_BW)) * r2[0], -(s(_S_BW)) * r2[1], -(s(_S_BW)) * r2[2]] + [
                -t for t in tau_ext
            ]
            tau = [eff_ref[i : i + 1, :] for i in range(6)]

            # --- the (NROW, B) dynamics tile: 9 sigma points + the tracker ---
            tlv = [trk_ref[7 + i : 8 + i, :] for i in range(3)]
            tav = [trk_ref[10 + i : 11 + i, :] for i in range(3)]
            nu = [
                jnp.concatenate([mu[i] + drow[i], tlv[i]], axis=0) for i in range(3)
            ] + [
                jnp.concatenate(
                    [jnp.broadcast_to(av_ref[i : i + 1, :], (NSIG, b)), tav[i]], axis=0
                )
                for i in range(3)
            ]
            p6 = [sum(s(_S_M + 6 * i + j) * nu[j] for j in range(6)) for i in range(6)]
            cor = _cross(nu[3:], p6[:3])
            cor += [c1 + c2 for c1, c2 in zip(_cross(nu[3:], p6[3:]), _cross(nu[:3], p6[:3]))]
            anu = [jnp.abs(x) * x for x in nu]
            rhs = [
                tau[i]
                - cor[i]
                - sum(s(_S_DL + 6 * i + j) * nu[j] + s(_S_DQ + 6 * i + j) * anu[j] for j in range(6))
                - g6[i]
                for i in range(6)
            ]
            acc = [sum(s(_S_MI + 6 * i + j) * rhs[j] for j in range(6)) for i in range(6)]
            nv = [nu[i] + dt * acc[i] for i in range(3)]  # new linear velocity

            # --- unscented reconstruction over the sigma rows ---
            nv_s = [x[:NSIG] for x in nv]
            znew = (mu[3] + drow[3]) + dt * (
                r2[0] * nv_s[0] + r2[1] * nv_s[1] + r2[2] * nv_s[2]
            )
            Y = nv_s + [znew]
            mY = [jnp.sum(y, axis=0, keepdims=True) * (1.0 / NSIG) for y in Y]
            dY = [y - m for y, m in zip(Y, mY)]
            mu = mY
            P = [
                [
                    0.5 * jnp.sum(dY[i] * dY[j], axis=0, keepdims=True) + s(_S_Q + 4 * i + j)
                    for j in range(DOF)
                ]
                for i in range(DOF)
            ]

            # --- orientation-tracker advance (full kinematic step) ---
            nlv = [x[NSIG:] for x in nv]
            nav = [nu[3 + i][NSIG:] + dt * acc[3 + i][NSIG:] for i in range(3)]
            u = [qx, qy, qz]
            t2 = [2.0 * c for c in _cross(u, nlv)]
            rot = [nlv[i] + qw * t2[i] + _cross(u, t2)[i] for i in range(3)]
            npos = [trk_ref[i : i + 1, :] + dt * rot[i] for i in range(3)]
            e = _qexp(nav[0] * dt, nav[1] * dt, nav[2] * dt)
            qn = _qnorm4(*_qmul(qw, qx, qy, qz, *e))
            trko_ref[:] = jnp.concatenate(npos + list(qn) + nlv + nav, axis=0)
        else:
            trko_ref[:] = trk_ref[:]

        # --- measurement-update chain (linear H: direct state rows) ---
        for (z_ref, r_ref, gate_ref), (m2_ref, acc_ref, nu_ref), mdl in zip(
            upd_refs, info_refs, models
        ):
            rows = FUSED_MODELS[mdl]
            m = len(rows)
            Ssub = [
                [P[rows[a]][rows[bb]] + r_ref[a, bb : bb + 1, :] for bb in range(m)]
                for a in range(m)
            ]
            nu_v = [z_ref[a : a + 1, :] - mu[rows[a]] for a in range(m)]
            C = [[P[i][rows[a]] for a in range(m)] for i in range(DOF)]
            corr, P, m2, accf = _kalman_tail(P, Ssub, C, nu_v, gate_ref[0, 0], dtype)
            mu = [mu[i] + corr[i] for i in range(DOF)]
            m2_ref[:] = m2
            acc_ref[:] = accf
            nu_ref[:] = jnp.concatenate(nu_v, axis=0)

        for j in range(DOF):
            covo_ref[j] = jnp.concatenate([P[i][j] for i in range(DOF)], axis=0)
        muo_ref[:] = jnp.concatenate(mu, axis=0)

    return kernel


@partial(jax.jit, static_argnames=("models", "do_predict", "interpret"))
def _velocity_step_lanes(
    models: tuple[str, ...],
    do_predict: bool,
    cov_t,
    mu_t,
    eff_t,
    av_t,
    trk_t,
    scal,
    z_ts,
    r_ts,
    gates,
    *,
    interpret: bool = False,
):
    nb = cov_t.shape[-1]
    dtype = cov_t.dtype
    # Lanes per grid step: stay on the protocol width (128). Measured on a
    # v5e at bank 131k: 8 lane groups per grid step (lb=1024) DROPS predict+
    # DVL throughput 150 → 109 M steps/s — the fatter blocks starve the
    # grid's double-buffered HBM pipelining and gain nothing (the kernel is
    # not issue-bound at 128 once the bank is large enough to hide per-step
    # dispatch).
    lb = LANE_TILE
    lane_spec = kernels.lane_block_spec
    smem = lambda n: pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [
        lane_spec(DOF, DOF),
        lane_spec(DOF),
        lane_spec(6),
        lane_spec(3),
        lane_spec(TRK_DIM),
        smem(_NSCAL),
    ]
    operands = [cov_t, mu_t, eff_t, av_t, trk_t, scal]
    out_shape = [
        jax.ShapeDtypeStruct((DOF, DOF, nb), dtype),
        jax.ShapeDtypeStruct((DOF, nb), dtype),
        jax.ShapeDtypeStruct((TRK_DIM, nb), dtype),
    ]
    out_specs = [lane_spec(DOF, DOF), lane_spec(DOF), lane_spec(TRK_DIM)]
    for mdl, z_t, r_t, gate in zip(models, z_ts, r_ts, gates):
        m = len(FUSED_MODELS[mdl])
        in_specs += [lane_spec(m), lane_spec(m, m), smem(1)]
        operands += [z_t, r_t, gate]
        out_shape += [
            jax.ShapeDtypeStruct((1, nb), dtype),
            jax.ShapeDtypeStruct((1, nb), dtype),
            jax.ShapeDtypeStruct((m, nb), dtype),
        ]
        out_specs += [lane_spec(1), lane_spec(1), lane_spec(m)]
    return pl.pallas_call(
        _make_step_kernel(models, do_predict),
        out_shape=tuple(out_shape),
        grid=(nb // lb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*operands)


class StepUpdate(NamedTuple):
    """One measurement in a fused VelocityUKF step chain (:func:`step_lanes`);
    ``model`` ∈ :data:`FUSED_MODELS` (``"dvl"`` or ``"pressure"``)."""

    model: str
    z: jax.Array  # (B, m)
    meas_cov: jax.Array  # (B, m, m) or (m, m)
    gate_threshold: float | None = None


def _measurement_operands(updates, nb, pad, dtype):
    z_ts, r_ts, gates = [], [], []
    for u in updates:
        m = len(FUSED_MODELS[u.model])
        z = jnp.asarray(u.z, dtype)
        if z.shape[0] != nb:
            raise ValueError(
                f"inconsistent bank sizes across step updates: {z.shape[0]} vs {nb}"
            )
        r = jnp.broadcast_to(jnp.asarray(u.meas_cov, dtype), (nb, m, m))
        if pad:
            z = jnp.concatenate([z, jnp.zeros((pad, m), dtype)], axis=0)
            r = jnp.concatenate(
                [r, jnp.broadcast_to(jnp.eye(m, dtype=dtype), (pad, m, m))], axis=0
            )
        z_ts.append(z.T)
        r_ts.append(jnp.transpose(r, (1, 2, 0)))
        thr = -1.0 if u.gate_threshold is None else u.gate_threshold
        gates.append(jnp.asarray(thr, dtype)[None, None])
    return z_ts, r_ts, gates


def _run(lstate, params, dt, updates, do_predict, nb, *, interpret):
    dtype = lstate.cov_t.dtype
    pad = lstate.cov_t.shape[-1] - nb
    updates = [u if isinstance(u, StepUpdate) else StepUpdate(*u) for u in updates]
    z_ts, r_ts, gates = _measurement_operands(updates, nb, pad, dtype)
    outs = _velocity_step_lanes(
        tuple(u.model for u in updates),
        do_predict,
        lstate.cov_t,
        lstate.mu_t,
        lstate.eff_t,
        lstate.av_t,
        lstate.trk_t,
        _params_scalars(params, dt, dtype),
        z_ts,
        r_ts,
        gates,
        interpret=interpret,
    )
    covo_t, muo_t, trko_t = outs[:3]
    infos = []
    for k in range(len(updates)):
        m2, acc, nu_t = outs[3 + 3 * k : 6 + 3 * k]
        infos.append(
            ukf.UpdateInfo(
                mahalanobis2=m2[0, :nb], accepted=acc[0, :nb] > 0.5, innovation=nu_t.T[:nb]
            )
        )
    return lstate._replace(cov_t=covo_t, mu_t=muo_t, trk_t=trko_t), infos


def step_lanes(
    lstate: VelLanesState,
    params: "VelocityUKFParams",
    dt,
    updates: Sequence[StepUpdate] = (),
    *,
    nb: int | None = None,
    interpret: bool = False,
):
    """One whole VelocityUKF step — predict(dt) + a chain of measurement
    updates — in a single kernel launch on kernel-layout state. ``nb`` is the
    true (unpadded) bank size; defaults to the first update's ``z.shape[0]``
    (required when ``updates`` is empty and the bank is padded). Matches the
    multi-launch predict_lanes + update_model_lanes chain to one f32 ulp (the
    launch boundary blocks cross-phase FMA contraction, so exact bit equality
    is not guaranteed). Returns ``(VelLanesState, [UpdateInfo, ...])``."""
    updates = [u if isinstance(u, StepUpdate) else StepUpdate(*u) for u in updates]
    if nb is None:
        nb = updates[0].z.shape[0] if updates else lstate.cov_t.shape[-1]
    return _run(lstate, params, dt, updates, True, nb, interpret=interpret)


def predict_lanes(
    lstate: VelLanesState,
    params: "VelocityUKFParams",
    dt,
    *,
    nb: int | None = None,
    interpret: bool = False,
) -> VelLanesState:
    """Fused prediction only (``VelocityUKF::predictionStepImpl``,
    ``src/VelocityUKF.cpp:114-130``) on kernel-layout state."""
    out, _ = _run(
        lstate, params, dt, [], True,
        lstate.cov_t.shape[-1] if nb is None else nb, interpret=interpret,
    )
    return out


def update_model_lanes(
    model: str,
    lstate: VelLanesState,
    z: jax.Array,
    meas_cov: jax.Array,
    gate_threshold: float | None = None,
    *,
    interpret: bool = False,
):
    """One fused measurement update (no predict) on kernel-layout state.
    Returns ``(VelLanesState, UpdateInfo)``. The SMEM params block is all
    zeros (never read when ``do_predict`` is False)."""
    dtype = lstate.cov_t.dtype
    nb = jnp.asarray(z).shape[0]
    scal = jnp.zeros((_NSCAL, 1), dtype)
    pad = lstate.cov_t.shape[-1] - nb
    z_ts, r_ts, gates = _measurement_operands(
        [StepUpdate(model, jnp.asarray(z, dtype), meas_cov, gate_threshold)],
        nb, pad, dtype,
    )
    outs = _velocity_step_lanes(
        (model,),
        False,
        lstate.cov_t,
        lstate.mu_t,
        lstate.eff_t,
        lstate.av_t,
        lstate.trk_t,
        scal,
        z_ts,
        r_ts,
        gates,
        interpret=interpret,
    )
    covo_t, muo_t, trko_t, m2, acc, nu_t = outs
    info = ukf.UpdateInfo(
        mahalanobis2=m2[0, :nb], accepted=acc[0, :nb] > 0.5, innovation=nu_t.T[:nb]
    )
    return lstate._replace(cov_t=covo_t, mu_t=muo_t, trk_t=trko_t), info


# ---------------------------------------------------------------------------
# Public bank-API entries: pack → one launch → unpack.
# ---------------------------------------------------------------------------


def predict_fused_banked(
    bstate: "VelocityUKFState", params: "VelocityUKFParams", dt, *, interpret: bool = False
) -> "VelocityUKFState":
    ls = to_lanes(bstate)
    ls = predict_lanes(ls, params, dt, interpret=interpret)
    return from_lanes(ls, bstate)


def update_model_fused_banked(
    model: str,
    bstate: "VelocityUKFState",
    z: jax.Array,
    meas_cov: jax.Array,
    gate_threshold: float | None = None,
    *,
    interpret: bool = False,
):
    ls = to_lanes(bstate)
    ls, info = update_model_lanes(
        model, ls, jnp.asarray(z, bstate.cov.dtype), meas_cov, gate_threshold,
        interpret=interpret,
    )
    return from_lanes(ls, bstate), info
