"""Fused PoseUKF prediction — the flagship Pallas fast path.

The generic predict (``models.pose_ukf.predict`` → ``ops.ukf.predict``) is a
chain of XLA ops whose intermediate tensors (sigma points, propagated points,
deviations) each round-trip HBM with layout changes; profiling a v5e shows
~35% of the step in pure layout copies. This module collapses the whole
prediction into **one Pallas launch** (``_pose_predict_lanes``) in a
bank-on-lanes layout with no relayout between phases: the equilibrated
Cholesky + sigma-delta generation (the ops/kernels.py algorithm inlined),
boxplus, the full PoseUKF process model
(``/root/reference/src/PoseUKF.cpp:12-84``: IMU mechanization with
earth-rate compensation, 8 first-order-Markov decays), the iterative
quaternion mean, the unscented covariance reconstruction and the
per-instance process-noise assembly (``src/PoseUKF.cpp:446-474``) — all
vectorized over the sigma points *and* 128 lane instances at once, with the
sigma axis chunked in two where full width would overflow the 16 MB VMEM.

Numerics: identical math to the generic path except (a) the quaternion mean
runs a fixed ``MEAN_ITERS`` iterations instead of a tolerance loop (converged
iterations are fixed points, so extras are harmless), and (b) summations are
VPU f32 instead of MXU-HIGHEST — both well below sensor noise (validated to
~1e-5 relative against the generic path in ``tests/test_pose_fused.py``).

The fast path applies when the filter bank shares one parameter set and runs
f32 (the TPU deployment configuration); Monte-Carlo *parameter* sweeps and
f64 oracle runs use the generic path. Dispatch lives in
:func:`predict_bank`.

State storage layout inside the kernel (rows of the (54, B) state block;
field order follows ``PoseState`` / ``src/PoseState.hpp:29-45``):

====  ==========================  ====================================
rows  field                       tangent rows (53-dim, MTK layout)
====  ==========================  ====================================
0:3   position                    0:3
3:7   orientation quaternion      3:6 (rotation vector)
7:10  velocity                    6:9
10:13 acceleration                9:12
13:16 bias_gyro                   12:15
16:19 bias_acc                    15:18
19:20 gravity                     18:19
20:29 inertia (col-major)         19:28
29:38 lin_damping (col-major)     28:37
38:47 quad_damping (col-major)    37:46
47:49 water_velocity              46:48
49:51 water_velocity_below        48:50
51:53 bias_adcp                   50:52
53:54 water_density               52:53
====  ==========================  ====================================
"""

from __future__ import annotations

from typing import NamedTuple, TYPE_CHECKING

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import geodesy as geo
from ..ops import kernels
from ..ops.kernels import LANE_TILE, equilibrated_sigma_columns

if TYPE_CHECKING:  # circular-import guard: pose_ukf imports this lazily
    from .pose_ukf import PoseUKFParams, PoseUKFState

__all__ = [
    "predict_fused_banked",
    "LanesBankState",
    "to_lanes",
    "from_lanes",
    "predict_lanes",
    "BankedPredictOperands",
    "banked_predict_operands",
    "set_rotation_rate_lanes",
    "MEAN_ITERS",
    "STORAGE_DIM",
    "TANGENT_DIM",
]

STORAGE_DIM = 54  # 53 tangent DOF + 1 (quaternion stores 4 for 3 DOF)
TANGENT_DIM = 53
NSIG = 2 * TANGENT_DIM + 1  # 107
# Fixed-point quaternion-mean iterations. The sigma-point set is ±symmetric
# about the seed (point 0 = the prior mean), which makes the first Karcher
# correction nearly exact: measured on ±column sets, the correction norm is
# at f32 roundoff (~1e-8) by iteration 2 even for 140°-spread orientation
# covariances, so 4 carries ≥2 iterations of slack (tests pin a 60°-spread
# bank against the tol-driven generic mean).
MEAN_ITERS = 4

# scalar-operand indices (SMEM (14, 1) array)
_S_DT = 0
_S_LAT0 = 1
_S_MRADINV = 2
_S_EARTHW = 3
_S_WVQ = 4  # water_velocity_scale · dt³  (dt²-scaled Q + dt-scaled inflation)
_S_QROT = 5  # 5:14 — dt²·(orientation block of Q), row-major
_NSCAL = 14


def _qmul(aw, ax, ay, az, bw, bx, by, bz):
    """Hamilton product, componentwise (broadcasts over any shape)."""
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _qexp(vx, vy, vz):
    """Rotation vector → quaternion components (MTK half-angle convention,
    Taylor-guarded like ``ops.manifolds.quat_exp``)."""
    theta2 = vx * vx + vy * vy + vz * vz
    theta = jnp.sqrt(theta2)
    small = theta2 < 1e-12
    taylor = 0.5 - theta2 / 48.0
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    sinc = jnp.where(small, taylor, jnp.sin(0.5 * safe) / safe)
    w = jnp.cos(0.5 * theta)
    return w, sinc * vx, sinc * vy, sinc * vz


def _atan2_nonneg(n, w):
    """atan2(n, w) for n, w ≥ 0 (first quadrant), branch-free.

    Mosaic has no inverse-trig primitives, so this is the Cephes ``atanf``
    minimax polynomial after range reduction to [0, tan π/8] — max error
    ~1e-7 rad in f32, well under sensor noise. Inputs here are a unit
    quaternion's |xyz| and (canonicalized, clipped) w, never both zero."""
    mx = jnp.maximum(n, w)
    mn = jnp.minimum(n, w)
    t = mn / jnp.maximum(mx, jnp.asarray(jnp.finfo(n.dtype).tiny, n.dtype))
    red = t > 0.4142135623730950  # tan(π/8): fold into [-tan π/8, tan π/8]
    u = jnp.where(red, (t - 1.0) / (t + 1.0), t)
    z = u * u
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z - 3.33329491539e-1
    a = p * z * u + u
    a = jnp.where(red, 0.7853981633974483 + a, a)
    return jnp.where(n > w, 1.5707963267948966 - a, a)


def _qlog(w, x, y, z):
    """Quaternion → rotation vector (hemisphere-canonical, Taylor-guarded,
    mirroring ``ops.manifolds.quat_log``)."""
    neg = w < 0.0
    w = jnp.where(neg, -w, w)
    x = jnp.where(neg, -x, x)
    y = jnp.where(neg, -y, y)
    z = jnp.where(neg, -z, z)
    w = jnp.clip(w, -1.0, 1.0)
    n2 = x * x + y * y + z * z
    n = jnp.sqrt(n2)
    theta = 2.0 * _atan2_nonneg(n, w)
    small = n2 < 1e-24
    safe_n = jnp.where(small, jnp.ones_like(n), n)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-6), theta / safe_n)
    return scale * x, scale * y, scale * z


def _qnorm4(w, x, y, z):
    inv = jax.lax.rsqrt(w * w + x * x + y * y + z * z)
    return w * inv, x * inv, y * inv, z * inv


def _make_predict_kernel(mode):
    """Kernel factory over the three parameter modes:

    - ``False`` ("shared"): one shared parameter set — decay vectors are
      (54, 1), geography comes from SMEM scalars and the per-instance process
      noise is assembled in-kernel.
    - ``True`` ("raw" banked): decay vectors are per-lane (54, B), the
      geography anchor is a per-lane (2, B) operand in the q0m slot, and the
      kernel emits the RAW ½ΣDDᵀ — the per-instance Q is added in XLA by the
      wrapper (it needs the full banked params).
    - ``"full"`` (fully-banked, in-kernel Q — the lanes-persistent
      Monte-Carlo path): per-lane decay vectors, a per-lane (53, 53, B) base
      Q in the q0m slot and a (12, B) aux lane operand
      [lat0; 1/m_rad; dt²·Qrot ×9; wv_scale·dt³] — the whole per-instance
      noise assembly stays in-kernel, so the predicted covariance never
      round-trips HBM for the Q add."""

    if mode == "full":

        def kernel(a_ref, mu_ref, rr_ref, coeff_ref, offs_ref, q0m_ref,
                   aux_ref, scal_ref, cov_ref, muo_ref, y_ref, c_ref):
            _pose_predict_body(
                mode, a_ref, mu_ref, rr_ref, coeff_ref, offs_ref, q0m_ref,
                scal_ref, cov_ref, muo_ref, y_ref, c_ref, aux_ref=aux_ref,
            )

        return kernel

    def kernel(a_ref, mu_ref, rr_ref, coeff_ref, offs_ref, q0m_ref, scal_ref,
               cov_ref, muo_ref, y_ref, c_ref):
        _pose_predict_body(
            mode, a_ref, mu_ref, rr_ref, coeff_ref, offs_ref, q0m_ref,
            scal_ref, cov_ref, muo_ref, y_ref, c_ref,
        )

    return kernel


def _pose_predict_body(
    banked_params,  # False=shared | True=raw banked | "full"=banked in-kernel Q
    a_ref,  # (53, 53, B) raw covariance, (col, row, B) layout
    mu_ref,  # (54, B) pre-predict mean, storage layout
    rr_ref,  # (3, B) cached rotation-rate input
    coeff_ref,  # (54, 1) or (54, B): per-row Markov coefficient -dt/tau
    offs_ref,  # (54, 1) or (54, B): per-row Markov rest point
    q0m_ref,  # shared: (53, 53, 1) dt^2-scaled Q, orientation block zeroed;
    #           raw banked: (2, B) per-lane [lat0; 1/m_rad];
    #           full banked: (53, 53, B) per-lane dt^2-scaled ori-zeroed Q
    scal_ref,  # (14, 1) SMEM scalars (see _S_* indices)
    cov_ref,  # out: (53, 53, B) predicted covariance (exactly symmetric)
    muo_ref,  # out: (54, B) predicted mean, storage layout
    y_ref,  # scratch: (107, 54, B) deltas -> propagated points -> deviations
    c_ref,  # scratch: (53, 53, B) equilibrated Schur complement (Cholesky)
    aux_ref=None,  # full banked only: (12, B) [lat0; 1/m_rad; dt²·Qrot×9; wvq]
):
    raw_banked = banked_params is True
    full_banked = banked_params == "full"
    n = TANGENT_DIM
    b = a_ref.shape[-1]
    f1 = lambda i: scal_ref[i, 0]
    dt = f1(_S_DT)
    mu = mu_ref[:]  # (54, B)

    # ---- phase A: equilibrated Cholesky -> sigma deltas in y_ref ---------
    # (shared core with the standalone sigma-delta kernel, ops/kernels.py;
    # deltas land directly in the rows the propagated points will overwrite)
    y_ref[0, 0:53] = jnp.zeros((n, b), mu.dtype)

    def _write_column(j, final):
        y_ref[2 * j + 1, 0:53] = final
        y_ref[2 * j + 2, 0:53] = -final

    equilibrated_sigma_columns(a_ref, c_ref, _write_column)

    # ---- phase B: boxplus + process model, chunked over sigma points -----
    # (src/PoseUKF.cpp:12-84; chunking bounds the VMEM stack to ~half the
    # (107, 54, B) working set -- the full-width version OOMs the 16 MB VMEM)
    coeff = coeff_ref[:]
    offs = offs_ref[:]
    rr = rr_ref[:]  # (3, B)
    # Scalar component math uses 2D (k, B) arrays throughout: a (k, 1, B)
    # shape tiles as (1, 128) minor dims -- 1 of 8 sublanes busy -- while
    # (k, B) packs the sigma axis onto sublanes at full VPU occupancy.
    for lo, hi in ((0, 54), (54, NSIG)):
        d = y_ref[lo:hi, 0:53]  # (k, 53, B) tangent deltas of this chunk
        # boxplus: X = mu [+] delta
        x_pos = mu[0:3][None] + d[:, 0:3]
        x_flat = mu[7:54][None] + d[:, 6:53]  # (k, 47, B)
        ew, ex, ey, ez = _qexp(d[:, 3], d[:, 4], d[:, 5])  # (k, B) each
        qw, qx, qy, qz = _qmul(
            mu[3:4], mu[4:5], mu[5:6], mu[6:7], ew, ex, ey, ez
        )
        qw, qx, qy, qz = _qnorm4(qw, qx, qy, qz)  # (k, B) each
        x_vel = x_flat[:, 0:3]  # velocity rows (storage 7:10)
        x_acc = x_flat[:, 3:6]
        # position [+] velocity*dt
        y_pos = x_pos + dt * x_vel
        # latitude at the (per-sigma-point) position -> earth rate (NWU)
        if raw_banked:
            geo_l = q0m_ref[:]  # (2, B): [lat0; 1/m_rad] per instance
            lat = geo_l[0:1] + x_pos[:, 0] * geo_l[1:2]  # (k, B)
        elif full_banked:
            lat = aux_ref[0:1, :] + x_pos[:, 0] * aux_ref[1:2, :]  # (k, B)
        else:
            lat = f1(_S_LAT0) + x_pos[:, 0] * f1(_S_MRADINV)  # (k, B)
        er_x = f1(_S_EARTHW) * jnp.cos(lat)
        er_z = f1(_S_EARTHW) * jnp.sin(lat)
        # body rate minus gyro bias, rotated to nav: R(q)*v via Rodrigues
        vx = rr[0:1] - x_flat[:, 6]  # bias_gyro rows (storage 13:16)
        vy = rr[1:2] - x_flat[:, 7]
        vz = rr[2:3] - x_flat[:, 8]
        tx = 2.0 * (qy * vz - qz * vy)
        ty = 2.0 * (qz * vx - qx * vz)
        tz = 2.0 * (qx * vy - qy * vx)
        wx = vx + qw * tx + (qy * tz - qz * ty) - er_x
        wy = vy + qw * ty + (qz * tx - qx * tz)
        wz = vz + qw * tz + (qx * ty - qy * tx) - er_z
        # orientation [+] omega*dt
        gw, gx, gy, gz = _qexp(wx * dt, wy * dt, wz * dt)
        yqw, yqx, yqy, yqz = _qnorm4(*_qmul(qw, qx, qy, qz, gw, gx, gy, gz))
        # velocity [+] acceleration*dt; blanket first-order-Markov decay
        # (coeff rows are 0 for position/quat/velocity/acceleration/gravity)
        y_flat = x_flat + coeff[7:54][None] * (x_flat - offs[7:54][None])
        y_ref[lo:hi, 7:10] = x_vel + dt * x_acc
        y_ref[lo:hi, 10:54] = y_flat[:, 3:]
        y_ref[lo:hi, 0:3] = y_pos
        y_ref[lo:hi, 3] = yqw
        y_ref[lo:hi, 4] = yqx
        y_ref[lo:hi, 5] = yqy
        y_ref[lo:hi, 6] = yqz

    # ---- phase C: manifold mean (flats closed-form, quaternion iterative) -
    inv_n = 1.0 / NSIG
    mean_flat = jnp.sum(y_ref[:, 7:54], axis=0) * inv_n  # (47, B)
    mean_pos = jnp.sum(y_ref[:, 0:3], axis=0) * inv_n  # (3, B)
    yqw = y_ref[:, 3, :]  # (107, B) -- sigma axis on sublanes, full VPU
    yqx = y_ref[:, 4, :]
    yqy = y_ref[:, 5, :]
    yqz = y_ref[:, 6, :]
    # seed = point 0 (ukfom convention), as (1, B) broadcasting rows
    mw, mx, my, mz = yqw[0:1], yqx[0:1], yqy[0:1], yqz[0:1]
    for _ in range(MEAN_ITERS):
        # delta_i = Log(m^-1 x q_i) -- conj(m) against all 107 points
        lw, lx, ly, lz = _qmul(mw, -mx, -my, -mz, yqw, yqx, yqy, yqz)
        rx, ry, rz = _qlog(lw, lx, ly, lz)
        gw, gx, gy, gz = _qexp(
            jnp.sum(rx, axis=0, keepdims=True) * inv_n,
            jnp.sum(ry, axis=0, keepdims=True) * inv_n,
            jnp.sum(rz, axis=0, keepdims=True) * inv_n,
        )
        mw, mx, my, mz = _qnorm4(*_qmul(mw, mx, my, mz, gw, gx, gy, gz))

    muo_ref[0:3] = mean_pos
    muo_ref[3:4] = mw
    muo_ref[4:5] = mx
    muo_ref[5:6] = my
    muo_ref[6:7] = mz
    muo_ref[7:54] = mean_flat

    # ---- phase D: deviations D = Y [-] mean, in place (tangent cols 0:53) -
    lw, lx, ly, lz = _qmul(mw, -mx, -my, -mz, yqw, yqx, yqy, yqz)
    rx, ry, rz = _qlog(lw, lx, ly, lz)
    y_ref[:, 0:3] = y_ref[:, 0:3] - mean_pos[None]
    y_ref[:, 6:53] = y_ref[:, 7:54] - mean_flat[None]
    y_ref[:, 3] = rx
    y_ref[:, 4] = ry
    y_ref[:, 5] = rz

    # ---- process-noise assembly (src/PoseUKF.cpp:446-460) ----------------
    # shared and full-banked modes (the raw-banked wrapper adds Q in XLA, so
    # phase E skips every consumer; guard the assembly too rather than rely
    # on Mosaic DCE to delete it). In full-banked mode the Qrot entries and
    # water-velocity scale come from the per-lane aux rows — (1, B) values
    # broadcast through the same expressions as the shared scalars.
    if not raw_banked:
        # orientation block: R(mu_in)*Qrot*R(mu_in)^T, Qrot pre-scaled by dt^2
        w0, x0, y0, z0 = mu[3:4], mu[4:5], mu[5:6], mu[6:7]  # (1, B)
        r00 = 1 - 2 * (y0 * y0 + z0 * z0)
        r01 = 2 * (x0 * y0 - w0 * z0)
        r02 = 2 * (x0 * z0 + w0 * y0)
        r10 = 2 * (x0 * y0 + w0 * z0)
        r11 = 1 - 2 * (x0 * x0 + z0 * z0)
        r12 = 2 * (y0 * z0 - w0 * x0)
        r20 = 2 * (x0 * z0 - w0 * y0)
        r21 = 2 * (y0 * z0 + w0 * x0)
        r22 = 1 - 2 * (x0 * x0 + y0 * y0)
        R = ((r00, r01, r02), (r10, r11, r12), (r20, r21, r22))
        if full_banked:
            Qr = tuple(
                tuple(aux_ref[2 + 3 * i + j : 3 + 3 * i + j, :] for j in range(3))
                for i in range(3)
            )
        else:
            Qr = tuple(tuple(f1(_S_QROT + 3 * i + j) for j in range(3)) for i in range(3))
        # T = R*Qr ; B3 = T*R^T (exact-symmetric assembly: compute lower, mirror)
        T = tuple(
            tuple(sum(R[i][k] * Qr[k][j] for k in range(3)) for j in range(3)) for i in range(3)
        )
        B3 = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(i + 1):
                v = sum(T[i][k] * R[j][k] for k in range(3))
                B3[i][j] = v
                B3[j][i] = v
        # velocity-scaled water-current inflation (z-velocity x10), dt^3 total
        v0, v1, v2 = mu[7:8], mu[8:9], mu[9:10]
        wv_scale = aux_ref[11:12, :] if full_banked else f1(_S_WVQ)
        wvq = wv_scale * (v0 * v0 + v1 * v1 + 100.0 * v2 * v2)  # (1, B)

    # ---- phase E: covariance 1/2*sum_i(D_i D_i^T) + Q, rows, sigma-chunked -
    # Half-triangle only: cov_ref[nn, nn:] — exactly the half the downstream
    # equilibrated Cholesky reads (column j at entries >= j in this (col,
    # row, B) layout). The matrix and Q are symmetric, so the other half is
    # mirrored in XLA at the public boundary (_mirror_half; the lanes
    # protocol defers it to from_lanes). This phase is VPU-FMA-bound; halving
    # the range cuts its work ~1.8x (padded-sublane average 31 vs 56).
    # (Column-pair register blocking was tried and measured 11% SLOWER: the
    # shared-slab variant's off-by-one sub-slices are sublane-misaligned and
    # Mosaic's shifts cost more than the saved read.)
    def _finish_column(nn, acc):
        if raw_banked:
            cov_ref[nn, nn:53] = 0.5 * acc  # raw reconstruction; Q added in XLA
            return
        # q0m broadcast over lanes (shared) or per-lane (full banked) — the
        # same indexing serves both layouts
        acc = 0.5 * acc + q0m_ref[nn, nn:53]
        if 3 <= nn < 6:
            # rotated-orientation noise block entries (nn, c) for c in nn..5;
            # B3 is exactly symmetric, so the mirror reproduces the rest
            pieces = [acc[c - nn : c - nn + 1] + B3[c - 3][nn - 3] for c in range(nn, 6)]
            acc = jnp.concatenate(pieces + [acc[6 - nn :]], axis=0)
        if 46 <= nn < 50:
            acc = jnp.concatenate([acc[0:1] + wvq, acc[1:]], axis=0)
        cov_ref[nn, nn:53] = acc

    # NOTE — ±-pair folding tried and REVERTED (r4, measured): the flat
    # (non-orientation) components propagate affinely, so a ± column pair's
    # deviations are antisymmetric up to f32 roundoff and the reconstruct
    # could in principle sum only the +half at 2× weight (~40% fewer FMAs on
    # this phase; measured 1.15× on the full mission tick). But for states
    # with large absolute offsets (water density ~1025, gravity ~9.8) the
    # per-point f32 rounding ε reaches ~6e-5·|dev|, and the FULL ± sum
    # cancels those errors SYMMETRICALLY — the folded flat block becomes
    # inconsistent with the full-summed orientation-crossing rows at ~1e-4,
    # the covariance drifts off PSD, and the update kernels' redraw
    # factorization NaNs mid-mission (first at tick ~40-700 depending on
    # schedule). The symmetric error structure of the full sum is
    # load-bearing; see docs/TUNING.md "Kernel experiment log".
    for nn in range(TANGENT_DIM):
        acc = None
        for lo, hi in ((0, 54), (54, NSIG)):
            part = jnp.sum(y_ref[lo:hi, nn:53] * y_ref[lo:hi, nn, :][:, None, :], axis=0)
            acc = part if acc is None else acc + part
        _finish_column(nn, acc)


def _pose_predict_lanes(cov_t, mu_t, rr_t, coeff, offs, q0m, scal, *, interpret,
                        banked_params=False, aux=None):
    nb = cov_t.shape[-1]
    n = TANGENT_DIM
    grid = (nb // LANE_TILE,)
    lane_spec = kernels.lane_block_spec
    full_spec = kernels.full_block_spec
    if banked_params == "full":
        # per-lane decay vectors, per-lane base Q and the (12, B) aux rows
        param_specs = [
            lane_spec(STORAGE_DIM),
            lane_spec(STORAGE_DIM),
            lane_spec(n, n),
            lane_spec(12),
        ]
        operands = (coeff, offs, q0m, aux)
    elif banked_params:
        # per-lane decay vectors and geography anchor (q0m slot = (2, B))
        param_specs = [lane_spec(STORAGE_DIM), lane_spec(STORAGE_DIM), lane_spec(2)]
        operands = (coeff, offs, q0m)
    else:
        param_specs = [
            full_spec(STORAGE_DIM, 1),
            full_spec(STORAGE_DIM, 1),
            full_spec(n, n, 1),
        ]
        operands = (coeff, offs, q0m)
    cov_out, mu_out = pl.pallas_call(
        _make_predict_kernel(banked_params),
        out_shape=(
            jax.ShapeDtypeStruct((n, n, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((STORAGE_DIM, nb), cov_t.dtype),
        ),
        grid=grid,
        in_specs=[
            lane_spec(n, n),
            lane_spec(STORAGE_DIM),
            lane_spec(3),
            *param_specs,
            pl.BlockSpec((_NSCAL, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(lane_spec(n, n), lane_spec(STORAGE_DIM)),
        scratch_shapes=[
            pltpu.VMEM((NSIG, STORAGE_DIM, LANE_TILE), cov_t.dtype),
            pltpu.VMEM((n, n, LANE_TILE), cov_t.dtype),
        ],
        interpret=interpret,
    )(cov_t, mu_t, rr_t, *operands, scal)
    # NOTE: cov_out is LOWER-TRIANGLE-VALID only (upper half is uninitialized
    # VMEM). Callers either mirror it (_mirror_half — the public bank API) or
    # pass it on as-is: every fused consumer (the equilibrated Cholesky and
    # the elementwise update downdate) reads only the lower triangle, so the
    # lanes protocol defers the mirror to from_lanes.
    return cov_out, mu_out


def _pad_bank(cov, mu_s, rr, pad, dtype):
    """Append ``pad`` neutral filler instances so the bank is a LANE_TILE
    multiple: identity covariance + copies of instance 0's mean/rates — the
    single definition of the pad-lane convention (finite math in pad lanes,
    rows dropped again on unpack). ``rr`` may be None."""
    if pad:
        eye = jnp.broadcast_to(jnp.eye(TANGENT_DIM, dtype=dtype), (pad, TANGENT_DIM, TANGENT_DIM))
        cov = jnp.concatenate([cov, eye], axis=0)
        mu_s = jnp.concatenate([mu_s, jnp.tile(mu_s[:1], (pad, 1))], axis=0)
        if rr is not None:
            rr = jnp.concatenate([rr, jnp.tile(rr[:1], (pad, 1))], axis=0)
    return cov, mu_s, rr


def _mirror_half(cov_t: jax.Array) -> jax.Array:
    """Rebuild the exactly symmetric matrix from a half-valid (n, n, B)
    covariance (valid at [i, j>=i] — the half the predict kernel writes) by
    mirroring (a major-dims transpose — the lane axis stays minor, so this is
    a cheap relayout copy in XLA, far cheaper than computing the other half
    on the VPU in-kernel)."""
    n = cov_t.shape[0]
    keep = jnp.triu(jnp.ones((n, n), bool))[..., None]
    return jnp.where(keep, cov_t, jnp.swapaxes(cov_t, 0, 1))


# ---------------------------------------------------------------------------
# XLA-side packing / dispatch
# ---------------------------------------------------------------------------


def _pack_storage(mu) -> jax.Array:
    """PoseState (banked, leading bank axis) → (B, 54) storage matrix.
    3×3 fields flatten column-major to match the MTK tangent layout
    (``src/PoseState.hpp:37-39``)."""
    cm = lambda m: jnp.swapaxes(m, -1, -2).reshape(*m.shape[:-2], 9)
    return jnp.concatenate(
        [
            mu.position,
            mu.orientation,
            mu.velocity,
            mu.acceleration,
            mu.bias_gyro,
            mu.bias_acc,
            mu.gravity,
            cm(mu.inertia),
            cm(mu.lin_damping),
            cm(mu.quad_damping),
            mu.water_velocity,
            mu.water_velocity_below,
            mu.bias_adcp,
            mu.water_density,
        ],
        axis=-1,
    )


def _unpack_storage(s: jax.Array, like):
    """(B, 54) storage matrix → PoseState pytree shaped like ``like``."""
    icm = lambda v: jnp.swapaxes(v.reshape(*v.shape[:-1], 3, 3), -1, -2)
    return like._replace(
        position=s[..., 0:3],
        orientation=s[..., 3:7],
        velocity=s[..., 7:10],
        acceleration=s[..., 10:13],
        bias_gyro=s[..., 13:16],
        bias_acc=s[..., 16:19],
        gravity=s[..., 19:20],
        inertia=icm(s[..., 20:29]),
        lin_damping=icm(s[..., 29:38]),
        quad_damping=icm(s[..., 38:47]),
        water_velocity=s[..., 47:49],
        water_velocity_below=s[..., 49:51],
        bias_adcp=s[..., 51:53],
        water_density=s[..., 53:54],
    )


def _decay_vectors(params: "PoseUKFParams", dt, dtype):
    """(54, 1) per-storage-row Markov coefficient −dt/τ and rest point."""
    z3 = jnp.zeros(3, dtype)
    cm = lambda m: m.T.reshape(9)
    taus = jnp.concatenate(
        [
            jnp.zeros(13, dtype),  # pos, quat, vel, acc — no decay
            jnp.full(3, -dt / params.gyro_bias_tau, dtype),
            jnp.full(3, -dt / params.acc_bias_tau, dtype),
            jnp.zeros(1, dtype),  # gravity
            jnp.full(9, -dt / params.inertia_tau, dtype),
            jnp.full(9, -dt / params.lin_damping_tau, dtype),
            jnp.full(9, -dt / params.quad_damping_tau, dtype),
            jnp.full(4, -dt / params.water_velocity_tau, dtype),
            jnp.full(2, -dt / params.adcp_bias_tau, dtype),
            jnp.full(1, -dt / params.water_density_tau, dtype),
        ]
    )
    offs = jnp.concatenate(
        [
            jnp.zeros(13, dtype),
            params.gyro_bias_offset.astype(dtype),
            params.acc_bias_offset.astype(dtype),
            jnp.zeros(1, dtype),
            cm(params.inertia_offset).astype(dtype),
            cm(params.lin_damping_offset).astype(dtype),
            cm(params.quad_damping_offset).astype(dtype),
            jnp.zeros(4, dtype),
            jnp.zeros(2, dtype),
            params.water_density_offset[None].astype(dtype),
        ]
    )
    return taus[:, None], offs[:, None]


def predict_fused_banked(
    state: "PoseUKFState", params: "PoseUKFParams", dt, *, interpret: bool = False
) -> "PoseUKFState":
    """Fused-kernel prediction over a whole bank (leading bank axis on every
    state leaf). ``params`` may be a single shared set OR a bank (leading
    axis on every leaf — Monte-Carlo parameter sweeps): the banked mode runs
    per-lane decay/geography operands and adds the per-instance Q in XLA.
    Semantics match ``vmap(pose_ukf.predict)`` to f32 accuracy; see module
    docstring."""
    from . import pose_ukf as pukf  # local import (pose_ukf ↔ pose_fused)

    dtype = state.cov.dtype
    nb = state.cov.shape[0]
    dt = jnp.asarray(dt, dtype)
    banked_params = params.process_noise.ndim == 3

    pad = (-nb) % LANE_TILE
    cov, mu_s, rr = _pad_bank(
        state.cov, _pack_storage(state.mu), state.rotation_rate, pad, dtype
    )

    cov_t = jnp.transpose(cov, (2, 1, 0))
    mu_t = mu_s.T
    rr_t = rr.T

    pad_lane = lambda a: (
        jnp.concatenate([a, jnp.tile(a[:1], (pad, *(1,) * (a.ndim - 1)))], axis=0) if pad else a
    )
    q0 = params.process_noise.astype(dtype)
    so = pukf.POSE_MANIFOLD.block("orientation")
    if banked_params:
        coeff, offs = jax.vmap(lambda pr: _decay_vectors(pr, dt, dtype))(params)
        coeff = pad_lane(coeff[..., 0]).T  # (54, nb)
        offs = pad_lane(offs[..., 0]).T
        geo_l = jnp.stack(
            [
                params.projection.lat0.astype(dtype),
                1.0 / params.projection.m_rad.astype(dtype),
            ],
            axis=-1,
        )
        q0m = pad_lane(geo_l).T  # (2, nb) per-lane geography anchor
        scal = jnp.concatenate(
            [dt[None], jnp.zeros(2, dtype), jnp.asarray([geo.EARTHW], dtype), jnp.zeros(10, dtype)]
        )[:, None]
    else:
        coeff, offs = _decay_vectors(params, dt, dtype)
        q0m = dt**2 * q0
        q0m = q0m.at[so, so].set(0.0)[:, :, None]
        scal = jnp.concatenate(
            [
                dt[None],
                params.projection.lat0.astype(dtype)[None],
                (1.0 / params.projection.m_rad.astype(dtype))[None],
                jnp.asarray([geo.EARTHW], dtype),
                (params.water_velocity_scale.astype(dtype) * dt**3)[None],
                (dt**2 * q0[so, so]).reshape(9),
            ]
        )[:, None]

    cov_t2, mu_t2 = _pose_predict_lanes(
        cov_t, mu_t, rr_t, coeff, offs, q0m, scal, interpret=interpret,
        banked_params=banked_params,
    )
    cov_out = jnp.transpose(_mirror_half(cov_t2), (2, 1, 0))[:nb]
    if banked_params:
        # per-instance Q in XLA (needs the full banked params); symmetrized so
        # the output matches the kernel-side exact symmetry convention
        q = jax.vmap(lambda m, pr: pukf.assemble_process_noise(m, pr, dt))(state.mu, params)
        cov_out = cov_out + 0.5 * (q + jnp.swapaxes(q, -1, -2))
    mu_out = _unpack_storage(mu_t2.T[:nb], state.mu)
    return state._replace(mu=mu_out, cov=cov_out)


# ---------------------------------------------------------------------------
# Persistent lanes-layout state: keeps the bank in kernel layout between
# fused calls. Inside one jit XLA already cancels the boundary transposes
# (measured: chained banked and lanes steps are bit-identical and equally
# fast), so this matters only when predict/update are dispatched as SEPARATE
# jits — e.g. a host-driven online loop reacting to sensor arrivals — where
# each call would otherwise pay the full-bank layout conversions.
# ---------------------------------------------------------------------------


class LanesBankState(NamedTuple):
    """PoseUKF bank in kernel layout: covariance (53, 53, nb) (col, row, B),
    mean (54, nb) storage rows, rotation rate (3, nb); ``nb`` is padded to a
    lane multiple. The true (unpadded) bank size is NOT carried here — it is
    a static property the caller supplies (``from_lanes`` takes it from the
    ``like`` state's shape, the lanes updates from ``z.shape[0]``); a traced
    field could never drive those static slices anyway.

    ``cov_t`` is LOWER-TRIANGLE-VALID between fused calls: the predict kernel
    computes only cov(r, c≤r) (the symmetric upper half would double the
    VPU-bound reconstruct work) and every fused consumer reads only that
    half; ``from_lanes`` mirrors back to exact symmetry on exit. Read
    ``cov_t`` directly only through ``from_lanes``."""

    cov_t: jax.Array  # (53, 53, nb)
    mu_t: jax.Array  # (54, nb)
    rr_t: jax.Array  # (3, nb)


def to_lanes(state: "PoseUKFState") -> LanesBankState:
    """Bank-first pytree state → kernel-layout state (pads to LANE_TILE)."""
    dtype = state.cov.dtype
    nb = state.cov.shape[0]
    pad = (-nb) % LANE_TILE
    cov, mu_s, rr = _pad_bank(
        state.cov, _pack_storage(state.mu), state.rotation_rate, pad, dtype
    )
    return LanesBankState(
        cov_t=jnp.transpose(cov, (2, 1, 0)),
        mu_t=mu_s.T,
        rr_t=rr.T,
    )


def from_lanes(lstate: LanesBankState, like: "PoseUKFState") -> "PoseUKFState":
    """Kernel-layout state → bank-first pytree state (drops padding).
    ``like`` supplies the pytree structure (any state of the same bank).
    Mirrors the lower-triangle-valid covariance back to exact symmetry (the
    one place the lanes protocol pays the mirror — see _pose_predict_lanes)."""
    nb = like.cov.shape[0]
    cov = jnp.transpose(_mirror_half(lstate.cov_t), (2, 1, 0))[:nb]
    mu = _unpack_storage(lstate.mu_t.T[:nb], like.mu)
    return like._replace(mu=mu, cov=cov, rotation_rate=lstate.rr_t.T[:nb])


def _predict_operands_shared(params: "PoseUKFParams", dt, dtype):
    """(coeff, offs, q0m, scal) kernel operands of the shared-parameter
    predict — used by :func:`predict_lanes` and the whole-step fused kernel
    (``pose_update_fused.step_velocity_lanes``)."""
    from . import pose_ukf as pukf

    dt = jnp.asarray(dt, dtype)
    coeff, offs = _decay_vectors(params, dt, dtype)
    q0 = params.process_noise.astype(dtype)
    so = pukf.POSE_MANIFOLD.block("orientation")
    q0m = dt**2 * q0
    q0m = q0m.at[so, so].set(0.0)[:, :, None]
    scal = jnp.concatenate(
        [
            dt[None],
            params.projection.lat0.astype(dtype)[None],
            (1.0 / params.projection.m_rad.astype(dtype))[None],
            jnp.asarray([geo.EARTHW], dtype),
            (params.water_velocity_scale.astype(dtype) * dt**3)[None],
            (dt**2 * q0[so, so]).reshape(9),
        ]
    )[:, None]
    return coeff, offs, q0m, scal


class BankedPredictOperands(NamedTuple):
    """Pre-packed kernel operands of the fully-banked (Monte-Carlo
    parameter-sweep) lanes prediction — build ONCE per mission with
    :func:`banked_predict_operands` and reuse across every tick (all entries
    depend only on the parameter bank and the shared dt, so a scan closes
    over them as loop constants instead of re-deriving ~1.5 GB of transposed
    Q per tick at a 100k bank)."""

    coeff: jax.Array  # (54, nb) per-lane Markov coefficient −dt/τ
    offs: jax.Array  # (54, nb) per-lane Markov rest point
    q0m_t: jax.Array  # (53, 53, nb) per-lane dt²-scaled ori-zeroed base Q
    aux_t: jax.Array  # (12, nb) [lat0; 1/m_rad; dt²·Qrot ×9; wv_scale·dt³]
    scal: jax.Array  # (14, 1) SMEM scalars (dt, EARTHW)


def banked_predict_operands(
    params: "PoseUKFParams", dt, dtype, nb_padded: int
) -> BankedPredictOperands:
    """Kernel operands of the fully-banked lanes prediction (``params`` has a
    leading bank axis on every leaf; ``nb_padded`` is the lane-padded bank
    size). Pad lanes replicate instance 0's parameters — finite math in pad
    lanes, rows dropped on unpack."""
    from . import pose_ukf as pukf

    dt = jnp.asarray(dt, dtype)
    nb = params.process_noise.shape[0]
    # the per-lane operand build vmaps over EVERY leaf — a partially-banked
    # set (only some leaves carrying the bank axis) would die inside vmap
    # with an opaque axis-size error; fail with the fix instead
    bad = [
        jax.tree_util.keystr(path)
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        if jnp.ndim(leaf) == 0 or jnp.shape(leaf)[0] != nb
    ]
    if bad:
        raise ValueError(
            "banked lanes prediction requires a FULLY-banked parameter set "
            "(leading bank axis on every leaf); broadcast shared leaves "
            "first — e.g. jax.tree_util.tree_map(lambda x: "
            "jnp.broadcast_to(x, (n, *jnp.shape(x))), params) or "
            "examples/icra18_mission.monte_carlo_params; offending leaves: "
            f"{bad[:6]}"
        )
    pad = nb_padded - nb
    pad_lane = lambda a: (
        jnp.concatenate([a, jnp.tile(a[:1], (pad, *(1,) * (a.ndim - 1)))], axis=0)
        if pad
        else a
    )
    coeff, offs = jax.vmap(lambda pr: _decay_vectors(pr, dt, dtype))(params)
    coeff = pad_lane(coeff[..., 0]).T  # (54, nb_padded)
    offs = pad_lane(offs[..., 0]).T
    so = pukf.POSE_MANIFOLD.block("orientation")
    q0 = params.process_noise.astype(dtype)  # (B, 53, 53), symmetric
    qrot = (dt**2 * q0[:, so, so]).reshape(nb, 9)  # row-major 3×3 entries
    q0m = (dt**2 * q0).at[:, so, so].set(0.0)
    q0m_t = jnp.transpose(pad_lane(q0m), (1, 2, 0))  # (53, 53, nb_padded)
    aux = jnp.concatenate(
        [
            params.projection.lat0.astype(dtype)[:, None],
            (1.0 / params.projection.m_rad.astype(dtype))[:, None],
            qrot,
            (params.water_velocity_scale.astype(dtype) * dt**3)[:, None],
        ],
        axis=-1,
    )
    scal = jnp.zeros(_NSCAL, dtype).at[_S_DT].set(dt).at[_S_EARTHW].set(geo.EARTHW)
    return BankedPredictOperands(
        coeff=coeff, offs=offs, q0m_t=q0m_t, aux_t=pad_lane(aux).T, scal=scal[:, None]
    )


def predict_lanes(
    lstate: LanesBankState,
    params: "PoseUKFParams",
    dt,
    *,
    interpret: bool = False,
    banked_ops: BankedPredictOperands | None = None,
) -> LanesBankState:
    """Fused prediction directly on kernel-layout state — zero layout
    conversions (the transposes of :func:`predict_fused_banked` vanish).

    Accepts shared parameter sets AND banked (Monte-Carlo sweep) parameter
    sets: a banked ``params`` (leading bank axis) routes to the fully-banked
    kernel mode with the per-instance Q assembled in-kernel. Callers looping
    over ticks should pre-build the banked operands once with
    :func:`banked_predict_operands` and pass them via ``banked_ops``."""
    dtype = lstate.cov_t.dtype
    if banked_ops is None and params.process_noise.ndim == 3:
        banked_ops = banked_predict_operands(params, dt, dtype, lstate.cov_t.shape[-1])
    if banked_ops is not None:
        cov_t2, mu_t2 = _pose_predict_lanes(
            lstate.cov_t, lstate.mu_t, lstate.rr_t,
            banked_ops.coeff, banked_ops.offs, banked_ops.q0m_t, banked_ops.scal,
            interpret=interpret, banked_params="full", aux=banked_ops.aux_t,
        )
        return lstate._replace(cov_t=cov_t2, mu_t=mu_t2)
    coeff, offs, q0m, scal = _predict_operands_shared(params, dt, dtype)
    cov_t2, mu_t2 = _pose_predict_lanes(
        lstate.cov_t, lstate.mu_t, lstate.rr_t, coeff, offs, q0m, scal, interpret=interpret
    )
    return lstate._replace(cov_t=cov_t2, mu_t=mu_t2)


def set_rotation_rate_lanes(lstate: LanesBankState, rr: jax.Array) -> LanesBankState:
    """Cache a new (B, 3) gyro input (``integrateMeasurement(RotationRate)``)."""
    nb = lstate.rr_t.shape[-1]
    pad = nb - rr.shape[0]
    if pad:
        rr = jnp.concatenate([rr, jnp.tile(rr[:1], (pad, 1))], axis=0)
    return lstate._replace(rr_t=rr.T)
