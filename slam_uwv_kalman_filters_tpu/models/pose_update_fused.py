"""Fused PoseUKF measurement update — the linear-algebra tail in one launch.

The generic update (``ops.ukf.update``) re-draws sigma points (Pallas), then
runs S/C/gain/covariance algebra as a chain of small XLA ops whose layout
copies dominate. This path keeps everything bank-on-lanes:

1. ``ops.kernels._sigma_deltas_lanes`` — sigma tangent deltas, bank-last;
2. XLA: the measurement model ``h`` evaluated on only the tangent rows it
   depends on (each update declares its field dependencies), producing the
   measurement-space deviations and innovation — a few-MB tensor;
3. ``_pose_update_lanes`` (here): S = ½ΣdZdZᵀ + R, cross-covariance
   C = ½ΣδdZᵀ, the m×m Cholesky solve unrolled on lanes, the Mahalanobis
   gate, the manifold state correction (flats + quaternion boxplus) and the
   covariance downdate cov − W·Wᵀ (W = K·chol(S)), written half-triangle
   like the predict reconstruct (the outer product is exactly symmetric, so
   the public-API mirror rebuilds the full matrix bit-identically) — one
   kernel launch for the whole bank.

Generic over the measurement model because ``h`` never enters the kernel;
only the measurement dimension ``m`` is static. Semantics match
``vmap(ops.ukf.update)`` (ukfom conventions, masked χ² gating) to f32
accuracy; parity pinned by ``tests/test_pose_fused.py``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, TYPE_CHECKING

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import geodesy as geo
from ..ops import manifolds as mf
from ..ops import ukf
from ..ops import kernels
from ..ops.kernels import (
    LANE_TILE,
    _sigma_deltas_lanes,
    equilibrated_sigma_columns,
)
from .pose_fused import (
    NSIG,
    STORAGE_DIM,
    TANGENT_DIM,
    _mirror_half,
    _pack_storage,
    _pad_bank,
    _qexp,
    _qmul,
    _qnorm4,
    _unpack_storage,
)

if TYPE_CHECKING:
    from .pose_ukf import PoseUKFParams, PoseUKFState

__all__ = [
    "FUSED_MODELS",
    "update_fused_banked",
    "update_body_efforts_lanes",
    "update_lanes",
    "update_model_fused_banked",
    "update_model_lanes",
    "update_velocity_lanes",
    "update_velocity_fused_banked",
    "StepUpdate",
    "step_lanes",
    "step_velocity_lanes",
]


def _make_update_kernel(m: int):
    def kernel(
        d_ref,  # (107, 53, B) sigma tangent deltas
        dz_ref,  # (107, m, B) measurement-space deviations
        nu_ref,  # (m, B) innovation
        r_ref,  # (m, m, B) measurement covariance
        mu_ref,  # (54, B) prior mean, storage layout
        cov_ref,  # (53, 53, B) prior covariance (bank-last, minor dims symmetric)
        scal_ref,  # (1, 1) SMEM: χ² gate threshold (< 0 ⇒ accept any)
        covo_ref,  # out: (53, 53, B)
        muo_ref,  # out: (54, B)
        m2_ref,  # out: (1, B) Mahalanobis² (the NIS)
        acc_ref,  # out: (1, B) gate outcome as 1.0/0.0
    ):
        # measurement-space components as (107, B) — sigma axis on sublanes
        # (a (107, 1, B) slice tiles at 1/8 sublane occupancy)
        dzc = [dz_ref[:, a, :] for a in range(m)]
        _update_tail(
            m, d_ref, dzc, nu_ref[:], r_ref[:], mu_ref[:], scal_ref[0, 0],
            cov_ref, covo_ref, muo_ref, m2_ref, acc_ref,
        )

    return kernel


def _update_tail(m, d_ref, dzc, nu, r, mu, thr, cov_ref, covo_ref, muo_ref, m2_ref, acc_ref):
    """Shared linear-algebra tail of the fused updates: S/C/gain, Mahalanobis
    gate, gated manifold state correction and the exactly-symmetric
    covariance downdate. ``dzc`` is a list of m (107, B) measurement-space
    deviation components; ``nu`` (m, B), ``r`` (m, m, B) and ``mu`` (54, B)
    are values; ``d_ref`` holds the (107, 53, B) tangent deltas (input ref or
    VMEM scratch)."""
    # S = ½ΣdZdZᵀ + R (m small — all entries as (1, B) lane vectors)
    S = [[None] * m for _ in range(m)]
    for a in range(m):
        for b2 in range(a + 1):
            v = 0.5 * jnp.sum(dzc[a] * dzc[b2], axis=0, keepdims=True) + r[
                a, b2 : b2 + 1, :
            ]
            S[a][b2] = v
            S[b2][a] = v

    # cross-covariance C = ½ΣδdZᵀ, sigma-chunked to bound VMEM temps
    # (the explicit 0:TANGENT_DIM column slice lets d_ref be the 54-wide
    # predict scratch in the whole-step kernel; it is a no-op for the
    # 53-wide delta inputs of the standalone update kernels)
    C = [None] * m
    for lo, hi in ((0, 54), (54, NSIG)):
        slab = d_ref[lo:hi, 0:TANGENT_DIM]  # one slab read shared by all m
        for a in range(m):
            part = jnp.sum(slab * dzc[a][lo:hi][:, None, :], axis=0)
            C[a] = part if C[a] is None else C[a] + part
    C = [0.5 * c for c in C]  # (53, B) each
    _update_tail_from_sc(m, S, C, nu, mu, thr, cov_ref, covo_ref, muo_ref, m2_ref, acc_ref)


def _update_tail_from_sc(m, S, C, nu, mu, thr, cov_ref, covo_ref, muo_ref, m2_ref, acc_ref):
    """Gain/gate/correction/downdate half of the update tail, from the
    already-assembled innovation covariance ``S`` (m×m of (1, B)) and
    cross-covariance ``C`` (m of (53, B)) — shared by the sigma-delta
    formulation (:func:`_update_tail`) and the streaming-from-factor kernels
    (:func:`_make_update_model_kernel`)."""
    # unrolled lane-wise Cholesky of S (ops/linalg_small.py pattern)
    L = [[None] * m for _ in range(m)]
    for j in range(m):
        s = S[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        dgj = jnp.sqrt(s)
        L[j][j] = dgj
        inv_d = 1.0 / dgj
        for i in range(j + 1, m):
            t = S[i][j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv_d
    inv_diag = [1.0 / L[i][i] for i in range(m)]

    # W = K·L  solves K·S·Kᵀ = W·Wᵀ without forming S⁻¹:
    # K = C·S⁻¹ = C·L⁻ᵀ·L⁻¹ ⇒ W = K·L = C·L⁻ᵀ, i.e. L·Wᵀ = Cᵀ —
    # forward substitution (ascending; the descending variant computes
    # C·L⁻¹, which agrees only when S is (near-)diagonal)
    W = [None] * m
    for i in range(m):
        t = C[i]
        for k in range(i):
            t = t - L[i][k] * W[k]
        W[i] = t * inv_diag[i]
    # y = L⁻¹·ν (forward substitution): m2 = |y|², and K·ν = W·y
    y = [None] * m
    for i in range(m):
        t = nu[i : i + 1, :]
        for k in range(i):
            t = t - L[i][k] * y[k]
        y[i] = t * inv_diag[i]
    m2 = sum(y[i] * y[i] for i in range(m))  # (1, B)
    # Gate via SELECTS, not arithmetic masking: a numerically non-SPD S
    # (NaN through sqrt) must leave rejected instances untouched, exactly
    # like the generic jnp.where path — NaN·0 is NaN, so multiplication
    # would corrupt the prior.
    acc_b = jnp.logical_or(m2 <= thr, thr < 0.0)  # (1, B) bool
    m2_ref[:] = m2
    acc_ref[:] = acc_b.astype(nu.dtype)

    # state correction: corr = K·ν = Σ W[i]·y[i] (53, B), gated boxplus
    corr = sum(W[i] * y[i] for i in range(m))
    muo_ref[0:3] = jnp.where(acc_b, mu[0:3] + corr[0:3], mu[0:3])
    muo_ref[7:54] = jnp.where(acc_b, mu[7:54] + corr[6:53], mu[7:54])
    ew, ex, ey, ez = _qexp(corr[3:4][None], corr[4:5][None], corr[5:6][None])
    qw, qx, qy, qz = _qnorm4(
        *_qmul(mu[3:4][None], mu[4:5][None], mu[5:6][None], mu[6:7][None], ew, ex, ey, ez)
    )
    muo_ref[3:4] = jnp.where(acc_b, qw[0], mu[3:4])
    muo_ref[4:5] = jnp.where(acc_b, qx[0], mu[4:5])
    muo_ref[5:6] = jnp.where(acc_b, qy[0], mu[5:6])
    muo_ref[6:7] = jnp.where(acc_b, qz[0], mu[6:7])

    # covariance downdate: cov − Σᵢ Wᵢ⊗Wᵢ, half-triangle only (row ≥ col in
    # the (col, row, B) layout — the same half the predict reconstruct writes
    # and the only half any fused consumer reads; the outer product is
    # exactly symmetric, so the public-API mirror reproduces the full matrix
    # bit-identically). vs the full-matrix version this halves the downdate
    # FMAs/VMEM writes and drops the (53, 53, B) T temp from the VMEM stack.
    for nn in range(TANGENT_DIM):
        cp = cov_ref[nn, nn:]  # (53-nn, B) column tail of the prior
        t = sum(W[i][nn : nn + 1] * W[i][nn:] for i in range(m))
        covo_ref[nn, nn:] = jnp.where(acc_b, cp - t, cp)



def _pose_update_lanes(deltas_t, dz_t, nu_t, r_t, mu_t, cov_t, thr, *, interpret):
    nb = deltas_t.shape[-1]
    n = TANGENT_DIM
    m = dz_t.shape[1]
    lane_spec = kernels.lane_block_spec
    return pl.pallas_call(
        _make_update_kernel(m),
        out_shape=(
            jax.ShapeDtypeStruct((n, n, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((STORAGE_DIM, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((1, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((1, nb), cov_t.dtype),
        ),
        grid=(nb // LANE_TILE,),
        in_specs=[
            lane_spec(NSIG, n),
            lane_spec(NSIG, m),
            lane_spec(m),
            lane_spec(m, m),
            lane_spec(STORAGE_DIM),
            lane_spec(n, n),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(lane_spec(n, n), lane_spec(STORAGE_DIM), lane_spec(1), lane_spec(1)),
        interpret=interpret,
    )(deltas_t, dz_t, nu_t, r_t, mu_t, cov_t, thr)


# ---------------------------------------------------------------------------
# In-kernel measurement models. Each computes the sigma-point measurement
# components (107, B) — sigma axis on sublanes — from the prior mean and the
# tangent deltas in y_ref, with every field the model does not read pinned to
# the mean (identical semantics to the generic ``_measurement_stage`` with
# the matching deps). ``aux`` is a (5,) tuple of SMEM scalars for models with
# static parameters. Tangent-row indices follow the storage table in
# models/pose_fused.py.
# ---------------------------------------------------------------------------

FUSED_MODELS = {
    "velocity": 3,  # h = R(q)⁻¹·v                         (PoseUKF.cpp:117-123)
    "z_position": 1,  # h = position.z                     (PoseUKF.cpp:100-105)
    "xy_position": 2,  # h = position.xy                   (PoseUKF.cpp:87-92)
    "acceleration": 3,  # h = R⁻¹(a + [0,0,g]) + b_acc     (PoseUKF.cpp:125-131)
    "pressure": 1,  # h = p_atm − z_sensor·g·ρ             (PoseUKF.cpp:107-115)
    "water_velocity": 2,  # ADCP cell-weighted blend       (PoseUKF.cpp:133-151)
    "body_efforts": 6,  # Fossen inverse dynamics          (PoseUKF.cpp:153-196)
}

# shared-parameter SMEM block layout of the in-kernel body_efforts model:
# the full 6x6 hydrodynamic matrices plus restoring/lever constants, read as
# scalars inside the kernel (the per-sigma-point (x, y, psi) substitution of
# PoseUKF.cpp:159-171 comes from the state, not from here)
_EFF_NSCAL = 119


def _efforts_model_scal(params: "PoseUKFParams", dtype) -> jax.Array:
    """(119, 1) SMEM operand: [M row-major x36; D_lin x36; D_quad x36;
    weight; buoyancy; cog x3; cob x3; imu_in_body x3]."""
    m = params.model
    return jnp.concatenate(
        [
            m.inertia_matrix.reshape(-1),
            m.damping_linear.reshape(-1),
            m.damping_quadratic.reshape(-1),
            m.weight.reshape(1),
            m.buoyancy.reshape(1),
            m.cog.reshape(-1),
            m.cob.reshape(-1),
            params.imu_in_body.reshape(-1),
        ]
    ).astype(dtype)[:, None]


def _sigma_quats(mu, y_ref):
    """Per-sigma-point orientation q_i = mu_q ⊗ Exp(δ[3:6]); (107, B) comps."""
    ew, ex, ey, ez = _qexp(y_ref[:, 3, :], y_ref[:, 4, :], y_ref[:, 5, :])
    return _qnorm4(*_qmul(mu[3:4], mu[4:5], mu[5:6], mu[6:7], ew, ex, ey, ez))


def _rot_inv(q, v):
    """R(q)⁻¹·v, componentwise Rodrigues (conjugated vector part)."""
    qw, qx, qy, qz = q
    vx, vy, vz = v
    tx = 2.0 * (qz * vy - qy * vz)
    ty = 2.0 * (qx * vz - qz * vx)
    tz = 2.0 * (qy * vx - qx * vy)
    return (
        vx + qw * tx + (qz * ty - qy * tz),
        vy + qw * ty + (qx * tz - qz * tx),
        vz + qw * tz + (qy * tx - qx * ty),
    )


def _rot_fwd(q, v):
    """R(q)·v, componentwise Rodrigues."""
    qw, qx, qy, qz = q
    vx, vy, vz = v
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    return (
        vx + qw * tx + (qy * tz - qz * ty),
        vy + qw * ty + (qz * tx - qx * tz),
        vz + qw * tz + (qx * ty - qy * tx),
    )


def _model_measurement(model, mu, y_ref, aux, mscal=None):
    """Measurement components Z (tuple of (107, B)) for ``model``.
    ``mscal`` is the shared model-parameter scalar tuple, required only by
    ``body_efforts`` (:func:`_efforts_model_scal` layout)."""
    if model == "velocity":
        q = _sigma_quats(mu, y_ref)
        v = (mu[7:8] + y_ref[:, 6, :], mu[8:9] + y_ref[:, 7, :], mu[9:10] + y_ref[:, 8, :])
        return _rot_inv(q, v)
    if model == "z_position":
        return (mu[2:3] + y_ref[:, 2, :],)
    if model == "xy_position":
        return (mu[0:1] + y_ref[:, 0, :], mu[1:2] + y_ref[:, 1, :])
    if model == "acceleration":
        q = _sigma_quats(mu, y_ref)
        g = mu[19:20] + y_ref[:, 18, :]
        a = (
            mu[10:11] + y_ref[:, 9, :],
            mu[11:12] + y_ref[:, 10, :],
            mu[12:13] + y_ref[:, 11, :] + g,
        )
        rx, ry, rz = _rot_inv(q, a)
        return (
            rx + mu[16:17] + y_ref[:, 15, :],
            ry + mu[17:18] + y_ref[:, 16, :],
            rz + mu[18:19] + y_ref[:, 17, :],
        )
    if model == "pressure":
        p_atm, lx, ly, lz = aux[0], aux[1], aux[2], aux[3]
        q = _sigma_quats(mu, y_ref)
        _, _, rlz = _rot_fwd(q, (lx, ly, lz))  # scalars broadcast to (107, B)
        sensor_z = mu[2:3] + y_ref[:, 2, :] + rlz
        g = mu[19:20] + y_ref[:, 18, :]
        rho = mu[53:54] + y_ref[:, 52, :]
        return (p_atm - sensor_z * g * rho,)
    if model == "water_velocity":
        cw = aux[0]
        q = _sigma_quats(mu, y_ref)
        v = (mu[7:8] + y_ref[:, 6, :], mu[8:9] + y_ref[:, 7, :], mu[9:10] + y_ref[:, 8, :])
        wv = (mu[47:48] + y_ref[:, 46, :], mu[48:49] + y_ref[:, 47, :])
        wvb = (mu[49:50] + y_ref[:, 48, :], mu[50:51] + y_ref[:, 49, :])
        ax, ay, _ = _rot_inv(q, (v[0] - wv[0], v[1] - wv[1], v[2]))
        bx, by, _ = _rot_inv(q, (v[0] - wvb[0], v[1] - wvb[1], v[2]))
        blended_x = cw * bx + (1.0 - cw) * ax
        blended_y = cw * by + (1.0 - cw) * ay
        return (
            blended_x + mu[51:52] + y_ref[:, 50, :],
            blended_y + mu[52:53] + y_ref[:, 51, :],
        )
    if model == "body_efforts":
        # measurementEfforts (PoseUKF.cpp:153-196): Fossen inverse dynamics
        # tau = M*nu_dot + C(nu)nu + D_lin*nu + D_quad*(|nu| o nu) + g(q),
        # with the per-sigma-point online (x, y, psi) inertia/damping blocks
        # substituted into the shared 6x6 matrices (PoseUKF.cpp:159-171) and
        # each instance's own compensated body rate riding the aux lanes.
        if mscal is None:
            raise ValueError("body_efforts needs the shared model-parameter block")
        wx, wy, wz = aux[0], aux[1], aux[2]  # getRotationRate per instance
        weight, buoy = mscal[108], mscal[109]
        cog = (mscal[110], mscal[111], mscal[112])
        cob = (mscal[113], mscal[114], mscal[115])
        pib = (mscal[116], mscal[117], mscal[118])

        def embedded(base, sb, tb):
            # shared 6x6 grid with the (0,1,5)x(0,1,5) block replaced by the
            # per-sigma-point state matrix (col-major mat33 storage rows)
            grid = [[mscal[base + 6 * i + j] for j in range(6)] for i in range(6)]
            idx = (0, 1, 5)
            for a2, i in enumerate(idx):
                for b2, j in enumerate(idx):
                    k = 3 * b2 + a2
                    grid[i][j] = mu[sb + k : sb + k + 1] + y_ref[:, tb + k, :]
            return grid

        M6 = embedded(0, 20, 19)
        L6 = embedded(36, 29, 28)
        Q6 = embedded(72, 38, 37)

        cross = lambda u, t: (
            u[1] * t[2] - u[2] * t[1],
            u[2] * t[0] - u[0] * t[2],
            u[0] * t[1] - u[1] * t[0],
        )
        q = _sigma_quats(mu, y_ref)
        # velocity in body: R^-1 v − omega x p_imu − R^-1 wv (reference order)
        v = (mu[7:8] + y_ref[:, 6, :], mu[8:9] + y_ref[:, 7, :], mu[9:10] + y_ref[:, 8, :])
        vbx, vby, vbz = _rot_inv(q, v)
        cw = cross((wx, wy, wz), pib)  # omega x p_imu, (1, B) rows
        wvx, wvy, wvz = _rot_inv(
            q, (mu[47:48] + y_ref[:, 46, :], mu[48:49] + y_ref[:, 47, :], 0.0)
        )
        v6 = (vbx - cw[0] - wvx, vby - cw[1] - wvy, vbz - cw[2] - wvz, wx, wy, wz)
        # acceleration in body: R^-1 a − omega x (omega x p_imu)
        a = (
            mu[10:11] + y_ref[:, 9, :],
            mu[11:12] + y_ref[:, 10, :],
            mu[12:13] + y_ref[:, 11, :],
        )
        abx, aby, abz = _rot_inv(q, a)
        cc = cross((wx, wy, wz), cw)
        a3 = (abx - cc[0], aby - cc[1], abz - cc[2])

        # M * nu_dot (angular acceleration is zero -> only the first 3 cols)
        Ma = [sum(M6[i][j] * a3[j] for j in range(3)) for i in range(6)]
        # C(nu)nu = [w x p1; w x p2 + v x p1], p = M*nu (ops/dynamics.py:100)
        p1 = [sum(M6[i][j] * v6[j] for j in range(6)) for i in range(3)]
        p2 = [sum(M6[3 + i][j] * v6[j] for j in range(6)) for i in range(3)]
        c1 = cross((wx, wy, wz), p1)
        c2a = cross((wx, wy, wz), p2)
        c2b = cross(v6[:3], p1)
        cor = (c1[0], c1[1], c1[2], c2a[0] + c2b[0], c2a[1] + c2b[1], c2a[2] + c2b[2])
        # damping
        av6 = [jnp.abs(v6[j]) * v6[j] for j in range(6)]
        D = [
            sum(L6[i][j] * v6[j] for j in range(6))
            + sum(Q6[i][j] * av6[j] for j in range(6))
            for i in range(6)
        ]
        # restoring term g(q) (ops/dynamics.py:119-132)
        upx, upy, upz = _rot_inv(q, (0.0, 0.0, 1.0))
        dwb = buoy - weight
        fg = (-upx * weight, -upy * weight, -upz * weight)
        fb = (upx * buoy, upy * buoy, upz * buoy)
        tg, tb2 = cross(cog, fg), cross(cob, fb)
        g6 = (
            -(upx * dwb), -(upy * dwb), -(upz * dwb),
            -(tg[0] + tb2[0]), -(tg[1] + tb2[1]), -(tg[2] + tb2[2]),
        )
        return tuple(Ma[i] + cor[i] + D[i] + g6[i] for i in range(6))
    raise ValueError(f"no in-kernel measurement model {model!r}")


class _ColDeltas:
    """``y_ref[:, k, :]``-shaped view of the ± sigma tangent deltas read
    straight from the keep-columns factor scratch: row ``k`` of every column
    is ``sign · s_ref[:, k] · dvec[k]``. Lets :func:`_model_measurement`
    evaluate on (53, B) ±column slabs without ever materializing the
    (107, 53, B) delta tensor."""

    def __init__(self, c_ref, dvec, sign):
        self.c_ref = c_ref
        self.dvec = dvec
        self.sign = sign

    def __getitem__(self, idx):
        _, k, _ = idx
        return self.sign * self.c_ref[:, k] * self.dvec[k : k + 1]


class _ZeroDeltas:
    """The sigma point 0 (zero tangent delta) in the same view protocol."""

    def __init__(self, b, dtype):
        self.zero = jnp.zeros((1, b), dtype)

    def __getitem__(self, idx):
        return self.zero


def _make_update_model_kernel(model: str, banked_aux: bool = False):
    """Whole-update kernel for one in-kernel measurement model, STREAMING
    from the Cholesky factor: the shared equilibrated factorization keeps its
    finalized columns in the (53, 53, B) scratch, ``h`` is evaluated on the
    ±column slabs through :class:`_ColDeltas`, and the cross-covariance
    contracts the factor directly — C = ½·dvec ⊙ Σⱼ Lⱼ·(Z⁺ⱼ − Z⁻ⱼ), exact
    because the ±pair cancels the measurement mean. The (107, 53, B) delta
    tensor is never materialized (bit-identical outputs, ~6% faster and
    ~3 MB less VMEM than the interleaved-delta formulation at a 128-lane
    block).

    ``banked_aux`` swaps the shared SMEM aux scalars for a (5, B) VMEM lane
    operand — per-instance model parameters (Monte-Carlo sweeps over e.g.
    ``atmospheric_pressure``, or per-instance ADCP cell weightings); each aux
    entry is then a (1, B) row broadcasting across the (53, B) sigma-column
    components exactly like a scalar."""
    m = FUSED_MODELS[model]

    def kernel(
        z_ref,  # (m, B) measurement
        r_ref,  # (m, m, B) measurement covariance
        mu_ref,  # (54, B) prior mean, storage layout
        cov_ref,  # (53, 53, B) prior covariance
        scal_ref,  # (6, 1) SMEM: [gate threshold (<0 ⇒ accept any), aux×5]
        *refs,  # [msc_ref (119, 1) SMEM if body_efforts]
        #   + [auxb_ref (5, B) if banked_aux] + outs + scratch:
        #   covo_ref (53, 53, B), muo_ref (54, B), m2_ref (1, B),
        #   acc_ref (1, B), nu_ref (m, B), c_ref scratch (53, 53, B)
    ):
        refs = list(refs)
        msc_ref = refs.pop(0) if model == "body_efforts" else None
        if banked_aux:
            auxb_ref = refs.pop(0)
        covo_ref, muo_ref, m2_ref, acc_ref, nu_ref, c_ref = refs

        dvec = equilibrated_sigma_columns(cov_ref, c_ref, None, keep_columns=True)

        mu = mu_ref[:]
        if banked_aux:
            aux = tuple(auxb_ref[i : i + 1, :] for i in range(5))
        else:
            aux = tuple(scal_ref[1 + i, 0] for i in range(5))
        mscal = (
            tuple(msc_ref[k, 0] for k in range(_EFF_NSCAL)) if msc_ref is not None else None
        )
        S, C, nu = _factor_innovation(
            model, mu, c_ref, dvec, aux, z_ref[:], r_ref[:], mscal
        )
        nu_ref[:] = nu
        _update_tail_from_sc(
            m, S, C, nu, mu, scal_ref[0, 0],
            cov_ref, covo_ref, muo_ref, m2_ref, acc_ref,
        )

    return kernel


def _factor_innovation(model, mu, c_ref, dvec, aux, z_in, r, mscal=None):
    """(S, C, nu) of an in-kernel measurement model evaluated on the ±factor
    columns kept in ``c_ref`` (plus the zero point): measurement components
    on (53, B) slabs, S = ½Σdz dzᵀ + R over {0, +cols, −cols}, and the
    cross-covariance contracted straight from the factor —
    C = ½·dvec ⊙ Σⱼ Lⱼ·(Z⁺ⱼ − Z⁻ⱼ), exact because the ±pair cancels the
    measurement mean. Shared by the standalone streaming update kernels and
    the whole-step kernel's in-chain updates."""
    m = FUSED_MODELS[model]
    b = c_ref.shape[-1]
    dtype = dvec.dtype
    Zp = _model_measurement(model, mu, _ColDeltas(c_ref, dvec, 1.0), aux, mscal)
    Zm = _model_measurement(model, mu, _ColDeltas(c_ref, dvec, -1.0), aux, mscal)
    Z0 = _model_measurement(model, mu, _ZeroDeltas(b, dtype), aux, mscal)

    inv_n = 1.0 / NSIG
    zm = [
        (Z0[a] + jnp.sum(Zp[a], axis=0, keepdims=True)
         + jnp.sum(Zm[a], axis=0, keepdims=True)) * inv_n
        for a in range(m)
    ]
    nu = jnp.concatenate([z_in[a : a + 1] - zm[a] for a in range(m)], axis=0)

    dzp = [Zp[a] - zm[a] for a in range(m)]
    dzm = [Zm[a] - zm[a] for a in range(m)]
    dz0 = [Z0[a] - zm[a] for a in range(m)]
    S = [[None] * m for _ in range(m)]
    for a in range(m):
        for b2 in range(a + 1):
            v = 0.5 * (
                jnp.sum(dzp[a] * dzp[b2], axis=0, keepdims=True)
                + jnp.sum(dzm[a] * dzm[b2], axis=0, keepdims=True)
                + dz0[a] * dz0[b2]
            ) + r[a, b2 : b2 + 1, :]
            S[a][b2] = v
            S[b2][a] = v
    C = [
        0.5 * dvec * jnp.sum(c_ref[:] * (Zp[a] - Zm[a])[:, None, :], axis=0)
        for a in range(m)
    ]
    return S, C, nu


def _pose_update_model_lanes(
    model, z_t, r_t, mu_t, cov_t, scal, aux_bank_t=None, mscal=None, *, interpret
):
    """One-launch whole update for an in-kernel model; ``scal`` is the (6, 1)
    SMEM block [gate threshold; aux scalars×5]. ``aux_bank_t`` (optional,
    (5, B)) replaces the shared aux scalars with per-instance lanes;
    ``mscal`` is the (119, 1) shared model-parameter block required by
    ``body_efforts``."""
    nb = cov_t.shape[-1]
    n = TANGENT_DIM
    m = FUSED_MODELS[model]
    lane_spec = kernels.lane_block_spec
    in_specs = [
        lane_spec(m),
        lane_spec(m, m),
        lane_spec(STORAGE_DIM),
        lane_spec(n, n),
        pl.BlockSpec((6, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    operands = [z_t, r_t, mu_t, cov_t, scal]
    if model == "body_efforts":
        if mscal is None:
            raise ValueError("body_efforts needs the shared model-parameter block")
        in_specs.append(
            pl.BlockSpec((_EFF_NSCAL, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        operands.append(mscal)
    if aux_bank_t is not None:
        in_specs.append(lane_spec(5))
        operands.append(aux_bank_t)
    return pl.pallas_call(
        _make_update_model_kernel(model, banked_aux=aux_bank_t is not None),
        out_shape=(
            jax.ShapeDtypeStruct((n, n, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((STORAGE_DIM, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((1, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((1, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((m, nb), cov_t.dtype),
        ),
        grid=(nb // LANE_TILE,),
        in_specs=in_specs,
        out_specs=(
            lane_spec(n, n),
            lane_spec(STORAGE_DIM),
            lane_spec(1),
            lane_spec(1),
            lane_spec(m),
        ),
        scratch_shapes=[
            # streaming kernel: only the keep-columns factor scratch — the
            # (107, 53, B) delta tensor no longer exists
            pltpu.VMEM((n, n, LANE_TILE), cov_t.dtype),
        ],
        interpret=interpret,
    )(*operands)


def _make_step_kernel(models: tuple[str, ...]):
    """Whole filter step in ONE launch: predict (full process model) into
    VMEM scratch, then a chain of in-kernel measurement updates — each with
    fresh sigma deltas from the current covariance (ukfom convention:
    ``update`` re-draws sigma points, ``src/PoseUKF.cpp:479-481``), the
    in-kernel h and the shared linear-algebra tail. Neither the predicted
    covariance nor any intermediate posterior reaches HBM — vs the
    (1+K)-launch chain this saves 2K full covariance round-trips per step
    (~0.75 GB each at a 32k bank) and cuts launch count to one.

    Measured regime split (v5e, predict + DVL/pressure/XY chain): **1.23×
    faster** than the jitted launch chain at a single-lane-tile bank (128
    instances — the real-time few-vehicle regime, where per-launch overhead
    dominates), ~4-7% slower at ≥4k banks (the ~23 MB VMEM working set
    blocks the double-buffered pipelining the smaller chained kernels get).
    Throughput banks should keep using the chain; see docs/DEPLOYMENT.md."""
    from .pose_fused import _pose_predict_body

    ms = [FUSED_MODELS[mdl] for mdl in models]
    k_upd = len(models)

    def kernel(*refs):
        # inputs: a, mu, rr, coeff, offs, q0m, scal14, then per update k:
        # z_k (m,B), r_k (m,m,B), scal6_k (6,1) SMEM [thr, aux×5]
        (a_ref, mu_ref, rr_ref, coeff_ref, offs_ref, q0m_ref, scal_ref) = refs[:7]
        zs = refs[7 : 7 + 3 * k_upd : 3]
        rs = refs[8 : 8 + 3 * k_upd : 3]
        scal6s = refs[9 : 9 + 3 * k_upd : 3]
        off = 7 + 3 * k_upd
        # outputs: covo, muo, then per update k: m2_k, acc_k, nu_k
        covo_ref, muo_ref = refs[off : off + 2]
        m2s = refs[off + 2 : off + 2 + 3 * k_upd : 3]
        accs = refs[off + 3 : off + 3 + 3 * k_upd : 3]
        nus = refs[off + 4 : off + 4 + 3 * k_upd : 3]
        # scratch: predict working set, Schur complement, running cov/mean
        y_ref, c_ref, covp_ref, mup_ref = refs[off + 2 + 3 * k_upd :]

        _pose_predict_body(
            False, a_ref, mu_ref, rr_ref, coeff_ref, offs_ref, q0m_ref,
            scal_ref, covp_ref, mup_ref, y_ref, c_ref,
        )

        for k, model in enumerate(models):
            m = ms[k]
            # fresh sigma columns from the current covariance (STREAMING
            # formulation, same as the standalone update kernels — the
            # (107, 53, B) delta tensor is never rebuilt); the running
            # covp/mup are updated in place (the tail loads cov/mu as values
            # before storing, so aliasing cov_ref = covo_ref is safe), with
            # the last update writing the kernel outputs instead
            dvec = equilibrated_sigma_columns(covp_ref, c_ref, None, keep_columns=True)
            mu = mup_ref[:]
            aux = tuple(scal6s[k][1 + i, 0] for i in range(5))
            S, C, nu = _factor_innovation(model, mu, c_ref, dvec, aux, zs[k][:], rs[k][:])
            nus[k][:] = nu
            last = k == k_upd - 1
            _update_tail_from_sc(
                m, S, C, nu, mu, scal6s[k][0, 0],
                covp_ref, covo_ref if last else covp_ref,
                muo_ref if last else mup_ref, m2s[k], accs[k],
            )

    return kernel


def _pose_step_lanes(models, cov_t, mu_t, rr_t, coeff, offs, q0m, scal,
                     z_ts, r_ts, scal6s, *, interpret):
    nb = cov_t.shape[-1]
    n = TANGENT_DIM
    ms = [FUSED_MODELS[mdl] for mdl in models]
    lane_spec = kernels.lane_block_spec
    full_spec = kernels.full_block_spec
    meas_in_specs = []
    meas_ops = []
    out_shapes = [
        jax.ShapeDtypeStruct((n, n, nb), cov_t.dtype),
        jax.ShapeDtypeStruct((STORAGE_DIM, nb), cov_t.dtype),
    ]
    out_specs = [lane_spec(n, n), lane_spec(STORAGE_DIM)]
    for k, m in enumerate(ms):
        meas_in_specs += [
            lane_spec(m),
            lane_spec(m, m),
            pl.BlockSpec((6, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        meas_ops += [z_ts[k], r_ts[k], scal6s[k]]
        out_shapes += [
            jax.ShapeDtypeStruct((1, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((1, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((m, nb), cov_t.dtype),
        ]
        out_specs += [lane_spec(1), lane_spec(1), lane_spec(m)]
    return pl.pallas_call(
        _make_step_kernel(tuple(models)),
        out_shape=tuple(out_shapes),
        grid=(nb // LANE_TILE,),
        in_specs=[
            lane_spec(n, n),
            lane_spec(STORAGE_DIM),
            lane_spec(3),
            full_spec(STORAGE_DIM, 1),
            full_spec(STORAGE_DIM, 1),
            full_spec(n, n, 1),
            pl.BlockSpec((14, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            *meas_in_specs,
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((NSIG, STORAGE_DIM, LANE_TILE), cov_t.dtype),
            pltpu.VMEM((n, n, LANE_TILE), cov_t.dtype),
            pltpu.VMEM((n, n, LANE_TILE), cov_t.dtype),
            pltpu.VMEM((STORAGE_DIM, LANE_TILE), cov_t.dtype),
        ],
        # the combined working set (predict scratch + second factorization +
        # double-buffered I/O) is ~23 MB — over the 16 MB default scoped-vmem
        # budget but well inside the physical VMEM; raise the cap
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(cov_t, mu_t, rr_t, coeff, offs, q0m, scal, *meas_ops)


class StepUpdate(NamedTuple):
    """One measurement in a fused whole-step chain (:func:`step_lanes`).
    ``model`` must be an in-kernel model (:data:`FUSED_MODELS`); ``aux`` is
    the model's static-scalar tuple (same convention as
    :func:`update_model_lanes` — e.g. ``(p_atm, lx, ly, lz)`` for pressure,
    ``(cell_weighting,)`` for water_velocity)."""

    model: str
    z: jax.Array  # (B, m)
    meas_cov: jax.Array  # (B, m, m) or (m, m)
    gate_threshold: float | None = None
    aux: tuple = ()


def step_lanes(
    lstate,
    params: "PoseUKFParams",
    dt,
    updates: Sequence[StepUpdate],
    *,
    interpret: bool = False,
):
    """One whole filter step — predict(dt) + a chain of measurement updates —
    in a single kernel launch on kernel-layout state (shared parameter set).
    The steady-state production loop at its shortest: the predicted and all
    intermediate covariances live only in VMEM. Each update re-draws sigma
    points from the then-current covariance, exactly like dispatching the
    reference's ``predictionStep`` + sequential ``integrateMeasurement`` calls
    (``src/PoseUKF.cpp:446-481``) — results are bit-identical to
    ``predict_lanes`` followed by the matching chain of
    :func:`update_model_lanes` calls. Returns
    ``(LanesBankState, [UpdateInfo, ...])`` in update order."""
    from .pose_fused import _predict_operands_shared

    updates = [u if isinstance(u, StepUpdate) else StepUpdate(*u) for u in updates]
    if not updates:
        raise ValueError("step_lanes needs at least one measurement update")
    dtype = lstate.cov_t.dtype
    nb_pad = lstate.cov_t.shape[-1]
    nb = updates[0].z.shape[0]
    pad = nb_pad - nb
    coeff, offs, q0m, scal = _predict_operands_shared(params, dt, dtype)
    z_ts, r_ts, scal6s = [], [], []
    for u in updates:
        m = FUSED_MODELS[u.model]
        z = jnp.asarray(u.z, dtype)
        if z.shape[0] != nb:
            raise ValueError(
                f"inconsistent bank sizes across step updates: {z.shape[0]} vs {nb}"
            )
        meas_cov = jnp.broadcast_to(jnp.asarray(u.meas_cov, dtype), (nb, m, m))
        z, meas_cov = _pad_measurement(z, meas_cov, pad, m, dtype)
        z_ts.append(z.T)
        r_ts.append(jnp.transpose(meas_cov, (1, 2, 0)))
        scal6s.append(_scal_block(u.gate_threshold, u.aux, dtype))
    outs = _pose_step_lanes(
        tuple(u.model for u in updates),
        lstate.cov_t, lstate.mu_t, lstate.rr_t, coeff, offs, q0m, scal,
        z_ts, r_ts, scal6s, interpret=interpret,
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


def step_velocity_lanes(
    lstate,
    params: "PoseUKFParams",
    dt,
    z: jax.Array,  # (B, 3)
    meas_cov: jax.Array,  # (B, 3, 3) or (3, 3)
    gate_threshold: float | None = None,
    *,
    interpret: bool = False,
):
    """One whole filter step — predict(dt) + DVL velocity update — in a
    single kernel launch (the ``updates=[velocity]`` case of
    :func:`step_lanes`). Returns ``(LanesBankState, UpdateInfo)``."""
    out, infos = step_lanes(
        lstate, params, dt,
        [StepUpdate("velocity", z, meas_cov, gate_threshold)],
        interpret=interpret,
    )
    return out, infos[0]


def _pad_measurement(z, meas_cov, pad, m, dtype):
    """Neutral pad-lane measurement filler (z = 0, R = I): finite math in pad
    lanes, gate-accepted, dropped again on unpack."""
    if pad:
        z = jnp.concatenate([z, jnp.zeros((pad, m), dtype)], axis=0)
        meas_cov = jnp.concatenate(
            [meas_cov, jnp.broadcast_to(jnp.eye(m, dtype=dtype), (pad, m, m))], axis=0
        )
    return z, meas_cov


def _scal_block(gate_threshold, aux, dtype):
    """(6, 1) SMEM operand: [gate threshold (<0 ⇒ accept any); aux×5].
    Threshold and aux entries may be jit-traced values."""
    vals = [-1.0 if gate_threshold is None else gate_threshold]
    vals += list(aux) + [0.0] * (5 - len(aux))
    return jnp.stack([jnp.asarray(v, dtype) for v in vals])[:, None]


def _aux_bank_lanes(aux_bank, nb, pad, dtype):
    """(5, nb+pad) lane operand from a (B, k≤5) per-instance aux array —
    zero-filled to 5 columns and neutral zero pad lanes — or ``None``."""
    if aux_bank is None:
        return None
    ab = jnp.asarray(aux_bank, dtype)
    if ab.ndim != 2 or ab.shape[0] != nb or ab.shape[1] > 5:
        raise ValueError(
            f"aux_bank must be (bank={nb}, k<=5); got {ab.shape}"
        )
    ab = jnp.pad(ab, ((0, pad), (0, 5 - ab.shape[1])))
    return ab.T


def update_model_fused_banked(
    model: str,
    bstate: "PoseUKFState",
    z: jax.Array,  # (B, m)
    meas_cov: jax.Array,  # (B, m, m) or (m, m)
    gate_threshold: float | None = None,
    aux: tuple = (),
    aux_bank: jax.Array | None = None,  # (B, k≤5) per-instance aux values
    mscal: jax.Array | None = None,  # (119, 1) shared model block (body_efforts)
    *,
    interpret: bool = False,
) -> tuple["PoseUKFState", ukf.UpdateInfo]:
    """Public-bank-API entry of the in-kernel measurement models
    (:data:`FUSED_MODELS`): pack → one launch → unpack. ``aux_bank``
    replaces ALL aux values with per-instance lanes (parameter sweeps);
    callers with a mix of shared and per-instance entries broadcast the
    shared ones into their ``aux_bank`` columns (the kernel reads only the
    lanes when they are present, so passing both is rejected)."""
    if aux and aux_bank is not None:
        raise ValueError(
            "pass either shared aux scalars or a per-instance aux_bank, not "
            "both — broadcast shared entries into their aux_bank columns"
        )
    dtype = bstate.cov.dtype
    nb = bstate.cov.shape[0]
    m = FUSED_MODELS[model]
    z = jnp.asarray(z, dtype)
    meas_cov = jnp.broadcast_to(jnp.asarray(meas_cov, dtype), (nb, m, m))

    pad = (-nb) % LANE_TILE
    cov, mu_s, _ = _pad_bank(bstate.cov, _pack_storage(bstate.mu), None, pad, dtype)
    z, meas_cov = _pad_measurement(z, meas_cov, pad, m, dtype)
    aux_bank_t = _aux_bank_lanes(aux_bank, nb, pad, dtype)

    covo_t, muo_t, m2, acc, nu_t = _pose_update_model_lanes(
        model,
        z.T,
        jnp.transpose(meas_cov, (1, 2, 0)),
        mu_s.T,
        jnp.transpose(cov, (2, 1, 0)),
        _scal_block(gate_threshold, aux, dtype),
        aux_bank_t,
        mscal,
        interpret=interpret,
    )
    cov_out = jnp.transpose(_mirror_half(covo_t), (2, 1, 0))[:nb]
    mu_out = _unpack_storage(muo_t.T[:nb], bstate.mu)
    info = ukf.UpdateInfo(
        mahalanobis2=m2[0, :nb], accepted=acc[0, :nb] > 0.5, innovation=nu_t.T[:nb]
    )
    return bstate._replace(mu=mu_out, cov=cov_out), info


def update_model_lanes(
    model: str,
    lstate,
    z: jax.Array,  # (B, m)
    meas_cov: jax.Array,  # (B, m, m) or (m, m)
    gate_threshold: float | None = None,
    aux: tuple = (),
    aux_bank: jax.Array | None = None,  # (B, k≤5) per-instance aux values
    mscal: jax.Array | None = None,  # (119, 1) shared model block (body_efforts)
    *,
    interpret: bool = False,
):
    """Whole-update launch for an in-kernel measurement model on
    kernel-layout state — the zero-HBM-round-trip path of the steady-state
    loop; measurement models outside :data:`FUSED_MODELS` use the generic
    :func:`update_lanes`. Returns ``(LanesBankState, UpdateInfo)``."""
    if aux and aux_bank is not None:
        raise ValueError(
            "pass either shared aux scalars or a per-instance aux_bank, not "
            "both — broadcast shared entries into their aux_bank columns"
        )
    dtype = lstate.cov_t.dtype
    nb_pad = lstate.cov_t.shape[-1]
    nb = z.shape[0]
    pad = nb_pad - nb
    m = FUSED_MODELS[model]
    z = jnp.asarray(z, dtype)
    meas_cov = jnp.broadcast_to(jnp.asarray(meas_cov, dtype), (nb, m, m))
    z, meas_cov = _pad_measurement(z, meas_cov, pad, m, dtype)
    covo_t, muo_t, m2, acc, nu_t = _pose_update_model_lanes(
        model, z.T, jnp.transpose(meas_cov, (1, 2, 0)), lstate.mu_t, lstate.cov_t,
        _scal_block(gate_threshold, aux, dtype),
        _aux_bank_lanes(aux_bank, nb, pad, dtype),
        mscal,
        interpret=interpret,
    )
    info = ukf.UpdateInfo(
        mahalanobis2=m2[0, :nb], accepted=acc[0, :nb] > 0.5, innovation=nu_t.T[:nb]
    )
    return lstate._replace(cov_t=covo_t, mu_t=muo_t), info


def update_body_efforts_lanes(
    lstate,
    params: "PoseUKFParams",
    z: jax.Array,  # (B, 6)
    meas_cov: jax.Array,  # (B, 6, 6) or (6, 6)
    *,
    interpret: bool = False,
):
    """Model-aided effort update on kernel-layout state
    (``PoseUKF.cpp:153-196,581-602``, full mode). Each instance's own bias-
    and earth-rate-compensated body rate — the exact ``getRotationRate``
    semantics (``PoseUKF.cpp:693-699``) read straight from the lanes-resident
    mean — rides the kernel's per-instance aux lanes, so the steady-state
    loop never leaves the (col, row, B) layout for the 10 Hz efforts stream.

    With shared model parameters the full inverse-dynamics measurement runs
    IN-KERNEL (``FUSED_MODELS["body_efforts"]``) — one launch, no delta-slab
    HBM round trip; banked (Monte-Carlo) parameter sets fall back to the
    generic deltas → XLA-h → fused-tail pipeline."""
    from .pose_ukf import _EFFORTS_DEPS, _efforts_measurement

    dtype = lstate.cov_t.dtype
    nb = z.shape[0]
    mu_bank = _unpack_storage(lstate.mu_t.T[:nb], _pose_state_like(dtype))
    lat, _ = geo.nav_to_world(
        params.projection, mu_bank.position[:, 0], mu_bank.position[:, 1]
    )
    earth_rot = jax.vmap(geo.earth_rotation_nav)(lat).astype(dtype)
    rr_bank = (
        lstate.rr_t.T[:nb]
        - mu_bank.bias_gyro
        - jax.vmap(mf.quat_rotate_inv)(mu_bank.orientation, earth_rot)
    )
    model_banked = params.model.inertia_matrix.ndim == 3
    iib_banked = params.imu_in_body.ndim == 2
    if not (model_banked or iib_banked):
        return update_model_lanes(
            "body_efforts", lstate, z, meas_cov,
            aux_bank=rr_bank, mscal=_efforts_model_scal(params, dtype),
            interpret=interpret,
        )

    # banked (Monte-Carlo sweep) model parameters: the generic fused-tail
    # pipeline with each instance's model riding the measurement stage's aux
    # pytree (None entries for whichever leaves are shared)
    def h(chi, aux):
        rr_one, model_one, iib_one = aux
        p_one = params._replace(
            model=model_one if model_banked else params.model,
            imu_in_body=iib_one if iib_banked else params.imu_in_body,
        )
        return _efforts_measurement(chi, p_one, rr_one)

    h_aux = (
        rr_bank,
        params.model if model_banked else None,
        params.imu_in_body if iib_banked else None,
    )
    return update_lanes(
        lstate, params, z, meas_cov, h, _EFFORTS_DEPS, h_aux=h_aux,
        interpret=interpret,
    )


def update_velocity_fused_banked(
    bstate, params, z, meas_cov, gate_threshold=None, *, interpret=False
):
    """Fused-h DVL update, public bank API (``PoseUKF.cpp:117-123,476-482``)."""
    del params  # h reads no parameters (also valid for banked-params sweeps)
    return update_model_fused_banked(
        "velocity", bstate, z, meas_cov, gate_threshold, interpret=interpret
    )


def update_velocity_lanes(lstate, params, z, meas_cov, gate_threshold=None, *, interpret=False):
    """Fused-h DVL update on kernel-layout state — the highest-rate sensor of
    the steady-state loop (``PoseUKF.cpp:117-123,476-482``)."""
    del params
    return update_model_lanes("velocity", lstate, z, meas_cov, gate_threshold, interpret=interpret)


def _measurement_stage(deltas_t, mu_bank, z, meas_cov, deps, nb, pad, dtype, h, h_aux=None):
    """Shared XLA stage of both fused update entry points: evaluate ``h`` on
    the dependent tangent rows, form (dZ, innovation) and pad lane filler
    (S=R, C=0, ν=0 for pad instances — neutral under the gate). With
    ``h_aux`` (a (B, ...) array vmapped alongside the bank), ``h`` is called
    as ``h(chi, aux_one)`` — per-instance NON-state model inputs (e.g. each
    instance's own compensated body rate for the efforts model)."""
    from ..ops import manifolds as mf

    m = z.shape[-1]
    field_rows = _field_rows()
    rows = sorted((field_rows[f], f) for f in deps)
    d_small = jnp.concatenate([deltas_t[:, lo:hi, :] for (lo, hi), _ in rows], axis=1)
    d_small = jnp.transpose(d_small, (2, 0, 1))[:nb]  # (B, 107, k)

    def h_of(delta_k, mu_one, aux_one):
        updates, off = {}, 0
        for (lo, hi), name in rows:
            k = hi - lo
            dpart = delta_k[off : off + k]
            off += k
            val = getattr(mu_one, name)
            if name == "orientation":
                updates[name] = mf.so3_boxplus(val, dpart)
            elif val.ndim == 2:  # mat33, column-major tangent
                updates[name] = val + dpart.reshape(3, 3).T
            else:
                updates[name] = val + dpart
        chi = mu_one._replace(**updates)
        return h(chi) if aux_one is None else h(chi, aux_one)

    # pin h's output to the kernel dtype (same policy as ops.ukf.update):
    # h may read float64 params, and f64 refs cannot lower into the f32 kernel
    if h_aux is None:
        Z = jax.vmap(lambda dk, mo: jax.vmap(lambda d1: h_of(d1, mo, None))(dk))(
            d_small, mu_bank
        )
    else:
        Z = jax.vmap(
            lambda dk, mo, ax: jax.vmap(lambda d1: h_of(d1, mo, ax))(dk)
        )(d_small, mu_bank, h_aux)
    Z = Z.astype(dtype)
    z_mean = jnp.mean(Z, axis=1)  # (B, m)
    dZ = Z - z_mean[:, None, :]
    innovation = z - z_mean  # (B, m)

    if pad:
        dZ = jnp.concatenate([dZ, jnp.zeros((pad, NSIG, m), dtype)], axis=0)
    innovation_p, meas_cov_p = _pad_measurement(innovation, meas_cov, pad, m, dtype)
    return dZ, innovation, innovation_p, meas_cov_p


def _field_rows() -> dict[str, tuple[int, int]]:
    """Tangent-row slice of each PoseState field, derived from the single
    source of truth (``POSE_MANIFOLD`` — never a second hand-written copy of
    the MTK layout that could silently desync)."""
    from .pose_ukf import POSE_MANIFOLD

    return {
        f.name: (POSE_MANIFOLD.block(f.name).start, POSE_MANIFOLD.block(f.name).stop)
        for f in POSE_MANIFOLD.fields
    }


def update_fused_banked(
    bstate: "PoseUKFState",
    params: "PoseUKFParams",
    z: jax.Array,  # (B, m)
    meas_cov: jax.Array,  # (B, m, m) or (m, m)
    h: Callable,  # PoseState → (m,) measurement prediction
    deps: Sequence[str],  # PoseState fields h reads (others fed the mean)
    gate_threshold: float | None = None,
    *,
    h_aux: jax.Array | None = None,  # (B, ...) per-instance non-state input
    interpret: bool = False,
) -> tuple["PoseUKFState", ukf.UpdateInfo]:
    """Fused-kernel unscented update over a bank (shared params, f32 TPU
    path). ``h`` runs in XLA on sigma points whose non-``deps`` fields are
    pinned to the mean (valid because ``deps`` lists every field ``h``
    reads), so only a ``(B, 107, Σdep-dims)`` tensor leaves the kernel
    pipeline. ``h_aux`` vmaps a per-instance non-state model input alongside
    the bank (``h`` is then called as ``h(chi, aux)``)."""
    dtype = bstate.cov.dtype
    nb = bstate.cov.shape[0]
    z = jnp.asarray(z, dtype)
    m = z.shape[-1]
    meas_cov = jnp.broadcast_to(jnp.asarray(meas_cov, dtype), (nb, m, m))

    pad = (-nb) % LANE_TILE
    cov, mu_s, _ = _pad_bank(bstate.cov, _pack_storage(bstate.mu), None, pad, dtype)

    cov_t = jnp.transpose(cov, (2, 1, 0))
    deltas_t = _sigma_deltas_lanes(cov_t, interpret=interpret)  # (107, 53, nb)
    dZ, innovation, innovation_p, meas_cov_p = _measurement_stage(
        deltas_t, bstate.mu, z, meas_cov, deps, nb, pad, dtype, h, h_aux
    )

    dz_t = jnp.transpose(dZ, (1, 2, 0))  # (107, m, nb)
    nu_t = innovation_p.T  # (m, nb)
    r_t = jnp.transpose(meas_cov_p, (1, 2, 0))  # (m, m, nb)
    thr = jnp.full((1, 1), -1.0 if gate_threshold is None else gate_threshold, dtype)

    covo_t, muo_t, m2, acc = _pose_update_lanes(
        deltas_t, dz_t, nu_t, r_t, mu_s.T, cov_t, thr, interpret=interpret
    )
    cov_out = jnp.transpose(_mirror_half(covo_t), (2, 1, 0))[:nb]
    mu_out = _unpack_storage(muo_t.T[:nb], bstate.mu)
    info = ukf.UpdateInfo(
        mahalanobis2=m2[0, :nb], accepted=acc[0, :nb] > 0.5, innovation=innovation
    )
    return bstate._replace(mu=mu_out, cov=cov_out), info


def update_lanes(
    lstate,
    params: "PoseUKFParams",
    z: jax.Array,  # (B, m)
    meas_cov: jax.Array,  # (B, m, m) or (m, m)
    h: Callable,
    deps: Sequence[str],
    gate_threshold: float | None = None,
    *,
    h_aux: jax.Array | None = None,
    interpret: bool = False,
):
    """Measurement update directly on kernel-layout state
    (:class:`models.pose_fused.LanesBankState`) — the covariance never leaves
    the (col, row, B) layout between consecutive fused steps. Returns
    ``(LanesBankState, UpdateInfo)`` with bank-first info fields."""
    dtype = lstate.cov_t.dtype
    nb_pad = lstate.cov_t.shape[-1]
    nb = z.shape[0]
    pad = nb_pad - nb
    z = jnp.asarray(z, dtype)
    m = z.shape[-1]
    meas_cov = jnp.broadcast_to(jnp.asarray(meas_cov, dtype), (nb, m, m))

    deltas_t = _sigma_deltas_lanes(lstate.cov_t, interpret=interpret)  # (107, 53, nb_pad)
    mu_bank = _unpack_storage(lstate.mu_t.T[:nb], _pose_state_like(dtype))
    dZ, innovation, innovation_p, meas_cov_p = _measurement_stage(
        deltas_t, mu_bank, z, meas_cov, deps, nb, pad, dtype, h, h_aux
    )

    thr = jnp.full((1, 1), -1.0 if gate_threshold is None else gate_threshold, dtype)
    covo_t, muo_t, m2, acc = _pose_update_lanes(
        deltas_t,
        jnp.transpose(dZ, (1, 2, 0)),
        innovation_p.T,
        jnp.transpose(meas_cov_p, (1, 2, 0)),
        lstate.mu_t,
        lstate.cov_t,
        thr,
        interpret=interpret,
    )
    info = ukf.UpdateInfo(
        mahalanobis2=m2[0, :nb], accepted=acc[0, :nb] > 0.5, innovation=innovation
    )
    return lstate._replace(cov_t=covo_t, mu_t=muo_t), info


def _pose_state_like(dtype):
    """Zero PoseState template for _unpack_storage's structure argument."""
    from .pose_ukf import PoseState

    z = lambda *s: jnp.zeros(s, dtype)
    return PoseState(
        position=z(3), orientation=z(4), velocity=z(3), acceleration=z(3),
        bias_gyro=z(3), bias_acc=z(3), gravity=z(1), inertia=z(3, 3),
        lin_damping=z(3, 3), quad_damping=z(3, 3), water_velocity=z(2),
        water_velocity_below=z(2), bias_adcp=z(2), water_density=z(1),
    )
