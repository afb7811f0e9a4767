"""Fused IndirectPoseUKF step — the error-state corrector's Pallas fast path.

Single-launch whole step for banks of the 6-DOF error-state filter
(``/root/reference/src/IndirectPoseUKF.cpp``): the 6×6 Cholesky, 13 sigma
points through the τ-decay process model (quaternion log/exp in-kernel,
``IndirectPoseUKF.cpp:6-20``), the per-instance orientation-error-rotated
process noise (``:80-92``), the SO(3) Karcher mean, and the visual-marker
update with **state augmentation entirely in VMEM**: the 12-DOF augmented
covariance (filter ⊕ marker pose, ``:26-33,94-135``) is built, chained
through one S²-valued pinhole-bearing update per corner (25 sigma points,
12×12 unrolled Cholesky, Karcher mean of the predicted bearings), and
marginalized back to 6-DOF — all inside one kernel launch, so the augmented
state never exists in HBM at all.

Reuses the in-kernel manifold algebra of the sibling kernels: quaternion
exp/log/Hamilton product from ``pose_fused``, the S² tangent-basis/exp/log/
Karcher helpers from ``bottom_fused``, and the lane-vector Cholesky/solve
from ``velocity_fused``. Sigma points ride the sublane axis ((13, B) and
(25, B) tiles), the same layout trick as the other small-filter kernels.

Parity vs ``vmap`` of the generic path is pinned by
``tests/test_indirect_fused.py`` (interpret mode on CPU); the generic path
itself is oracle-pinned by tests/test_indirect_pose_ukf.py. Dispatch lives
in ``indirect_pose_ukf.predict_bank`` / ``update_markers_bank``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, TYPE_CHECKING

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import kernels
from ..ops.kernels import LANE_TILE
from ..ops import ukf
from .pose_fused import _qexp, _qlog, _qmul, _qnorm4
from .bottom_fused import _s2_basis, _s2_boxminus, _s2_karcher_mean
from .velocity_fused import _draw_deltas, _kalman_tail

if TYPE_CHECKING:
    from ..utils.config import CameraConfiguration
    from .indirect_pose_ukf import IndirectPoseUKFParams, IndirectPoseUKFState

__all__ = [
    "MEAN_ITERS",
    "IndirectLanesState",
    "to_lanes",
    "from_lanes",
    "predict_lanes",
    "update_markers_lanes",
    "predict_fused_banked",
    "update_markers_fused_banked",
]

DOF = 6  # position_error (3) + orientation_error (SO(3), 3 DOF)
NSIG = 2 * DOF + 1  # 13
AUG_DOF = 12  # + marker pose (IndirectPoseUKF.cpp:26-30)
AUG_NSIG = 2 * AUG_DOF + 1  # 25
MEAN_ITERS = 4  # fixed-point Karcher iterations (pose_fused convention)

# SMEM scalar layout (predict)
_S_DT = 0
_S_TAU = 1
_S_Q = 2  # 2:38 process noise, row-major 6×6
_NSCAL_P = 38


class IndirectLanesState(NamedTuple):
    """IndirectPoseUKF bank in kernel layout; ``nb`` padded to a lane multiple."""

    cov_t: jax.Array  # (6, 6, nb) covariance, (col, row, B)
    mu_t: jax.Array  # (7, nb) storage rows: position_error xyz, error quat wxyz
    ref_t: jax.Array  # (7, nb) pose reference: position xyz, quat wxyz


def to_lanes(state: "IndirectPoseUKFState") -> IndirectLanesState:
    dtype = state.cov.dtype
    nb = state.cov.shape[0]
    pad = (-nb) % LANE_TILE
    cov = state.cov
    mu = jnp.concatenate([state.mu.position_error, state.mu.orientation_error], axis=-1)
    ref = jnp.concatenate([state.pose_ref_position, state.pose_ref_orientation], axis=-1)
    if pad:
        eye = jnp.broadcast_to(jnp.eye(DOF, dtype=dtype), (pad, DOF, DOF))
        cov = jnp.concatenate([cov, eye], axis=0)
        tile = lambda a: jnp.concatenate([a, jnp.tile(a[:1], (pad, 1))], axis=0)
        mu, ref = tile(mu), tile(ref)
    return IndirectLanesState(
        cov_t=jnp.transpose(cov, (2, 1, 0)), mu_t=mu.T, ref_t=ref.T
    )


def from_lanes(lstate: IndirectLanesState, like: "IndirectPoseUKFState") -> "IndirectPoseUKFState":
    nb = like.cov.shape[0]
    mu_rows = lstate.mu_t.T[:nb]
    ref_rows = lstate.ref_t.T[:nb]
    return like._replace(
        mu=like.mu._replace(
            position_error=mu_rows[:, 0:3], orientation_error=mu_rows[:, 3:7]
        ),
        cov=jnp.transpose(lstate.cov_t, (2, 1, 0))[:nb],
        pose_ref_position=ref_rows[:, 0:3],
        pose_ref_orientation=ref_rows[:, 3:7],
    )


# ---------------------------------------------------------------------------
# In-kernel SO(3) helpers on quaternion component tuples (w, x, y, z), each
# an array broadcastable over (rows, B). _qexp/_qlog/_qmul come from the pose
# kernel (same MTK conventions, Taylor/hemisphere guards included).
# ---------------------------------------------------------------------------


def _qconj(q):
    return (q[0], -q[1], -q[2], -q[3])


def _qrot(q, v):
    """R(q)·v via the expanded Rodrigues form (unit q)."""
    u = (q[1], q[2], q[3])
    t = (
        2.0 * (u[1] * v[2] - u[2] * v[1]),
        2.0 * (u[2] * v[0] - u[0] * v[2]),
        2.0 * (u[0] * v[1] - u[1] * v[0]),
    )
    ut = (
        u[1] * t[2] - u[2] * t[1],
        u[2] * t[0] - u[0] * t[2],
        u[0] * t[1] - u[1] * t[0],
    )
    return tuple(v[i] + q[0] * t[i] + ut[i] for i in range(3))


def _so3_boxminus(a, b):
    """a ⊟ b = Log(b⁻¹ ⊗ a) componentwise (3-tuple)."""
    return _qlog(*_qmul(*_qconj(b), *a))


def _so3_boxplus(q, d, scale):
    """q ⊞ (scale·d), renormalized (matches ops.manifolds.so3_boxplus; the
    1/sqrt-vs-rsqrt choice follows bottom_fused._s2_boxplus)."""
    e = _qexp(d[0] * scale, d[1] * scale, d[2] * scale)
    y = _qmul(*q, *e)
    inv = 1.0 / jnp.sqrt(y[0] * y[0] + y[1] * y[1] + y[2] * y[2] + y[3] * y[3])
    return tuple(inv * c for c in y)


def _so3_karcher_mean(pts, nrow):
    """Fixed-iteration equal-weight SO(3) mean of ``nrow`` stacked quaternions
    (components (nrow, B)), seeded from row 0 (ukfom convention)."""
    m = tuple(p[0:1] for p in pts)
    one = 1.0 / nrow
    for _ in range(MEAN_ITERS):
        d = _so3_boxminus(pts, m)
        m = _so3_boxplus(
            m,
            tuple(jnp.sum(c, axis=0, keepdims=True) * one for c in d),
            1.0,
        )
    return m


def _rot_matrix(q):
    """3×3 rotation-matrix entries of unit quaternion q as a nested list."""
    w, x, y, z = q
    return [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]


# ---------------------------------------------------------------------------
# Predict kernel.
# ---------------------------------------------------------------------------


def _predict_kernel(cov_ref, mu_ref, scal_ref, covo_ref, muo_ref):
    s = lambda i: scal_ref[i, 0]
    dt, tau = s(_S_DT), s(_S_TAU)
    q33 = [[s(_S_Q + 6 * (3 + i) + 3 + j) for j in range(3)] for i in range(3)]

    pos = [mu_ref[i : i + 1, :] for i in range(3)]
    qm = tuple(mu_ref[3 + i : 4 + i, :] for i in range(4))
    P = [[None] * DOF for _ in range(DOF)]
    for i in range(DOF):
        for j in range(i + 1):
            v = cov_ref[j, i : i + 1, :]
            P[i][j] = v
            P[j][i] = v

    # per-instance Q: orientation block rotated by R(error quat), Markov
    # 2/(τ·dt) scale, then dt² overall (IndirectPoseUKF.cpp:80-92)
    R = _rot_matrix(qm)
    mscale = (2.0 / (tau * dt)) * dt * dt
    # Rq = R·q33 (3×3 of lane vectors), Qrot = Rq·Rᵀ
    Rq = [[sum(R[i][k] * q33[k][j] for k in range(3)) for j in range(3)] for i in range(3)]
    Qo = [[mscale * sum(Rq[i][k] * R[j][k] for k in range(3)) for j in range(3)] for i in range(3)]

    drow = _draw_deltas(P, DOF)
    # sigma points: position random walk (identity), orientation τ-decay
    qs = _so3_boxplus(qm, (drow[3], drow[4], drow[5]), 1.0)  # (NSIG, B) comps
    lg = _qlog(*qs)
    qs2 = _so3_boxplus(qs, tuple((-1.0 / tau) * c for c in lg), dt)

    mean_q = _so3_karcher_mean(qs2, NSIG)
    dq = _so3_boxminus(qs2, mean_q)
    D = [drow[0], drow[1], drow[2], dq[0], dq[1], dq[2]]
    dt2 = dt * dt
    Pn = [[None] * DOF for _ in range(DOF)]
    for i in range(DOF):
        for j in range(i + 1):
            v = 0.5 * jnp.sum(D[i] * D[j], axis=0, keepdims=True)
            if i >= 3 and j >= 3:
                v = v + Qo[i - 3][j - 3]
            else:
                v = v + dt2 * s(_S_Q + 6 * i + j)
            Pn[i][j] = v
            Pn[j][i] = v
    # position mean: deltas are ±symmetric ⇒ mean(pos + δ) = pos + mean(δ)
    mpos = [
        pos[i] + jnp.sum(drow[i], axis=0, keepdims=True) * (1.0 / NSIG) for i in range(3)
    ]
    for j in range(DOF):
        covo_ref[j] = jnp.concatenate([Pn[i][j] for i in range(DOF)], axis=0)
    muo_ref[:] = jnp.concatenate(list(mpos) + list(mean_q), axis=0)


@partial(jax.jit, static_argnames=("interpret",))
def _indirect_predict_lanes(cov_t, mu_t, scal, *, interpret: bool = False):
    nb = cov_t.shape[-1]
    dtype = cov_t.dtype
    lane_spec = kernels.lane_block_spec
    return pl.pallas_call(
        _predict_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((DOF, DOF, nb), dtype),
            jax.ShapeDtypeStruct((DOF + 1, nb), dtype),
        ),
        grid=(nb // LANE_TILE,),
        in_specs=[
            lane_spec(DOF, DOF),
            lane_spec(DOF + 1),
            pl.BlockSpec((_NSCAL_P, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(lane_spec(DOF, DOF), lane_spec(DOF + 1)),
        interpret=interpret,
    )(cov_t, mu_t, scal)


def predict_lanes(
    lstate: IndirectLanesState,
    params: "IndirectPoseUKFParams",
    dt,
    *,
    interpret: bool = False,
) -> IndirectLanesState:
    """Fused prediction (``IndirectPoseUKF::predictionStepImpl``)."""
    dtype = lstate.cov_t.dtype
    scal = jnp.concatenate(
        [
            jnp.asarray(dt, dtype)[None],
            params.orientation_error_tau.astype(dtype)[None],
            params.process_noise.astype(dtype).reshape(36),
        ]
    )[:, None]
    covo_t, muo_t = _indirect_predict_lanes(
        lstate.cov_t, lstate.mu_t, scal, interpret=interpret
    )
    return lstate._replace(cov_t=covo_t, mu_t=muo_t)


# ---------------------------------------------------------------------------
# Marker update kernel: augment → K chained S² corner updates → marginalize,
# all in VMEM (one launch).
# ---------------------------------------------------------------------------


def _make_marker_kernel(k: int):
    def kernel(
        cov_ref,  # (6, 6, B)
        mu_ref,  # (7, B)
        ref_ref,  # (7, B) pose reference rows
        mk_ref,  # (7, B) marker pose rows (position, quat)
        z_ref,  # (k, 3, B) unit bearings
        r_ref,  # (k, 2, 2, B) tangent covariances
        scal_ref,  # SMEM: cam extrinsics (7) + cov_marker (36) + features (3k)
        covo_ref,  # out (6, 6, B)
        muo_ref,  # out (7, B)
        m2_ref,  # out (k, B)
        nu_ref,  # out (k, 2, B)
    ):
        s = lambda i: scal_ref[i, 0]
        cam_p = (s(0), s(1), s(2))
        cam_q = (s(3), s(4), s(5), s(6))
        ref_p = tuple(ref_ref[i : i + 1, :] for i in range(3))
        ref_q = tuple(ref_ref[3 + i : 4 + i, :] for i in range(4))

        # augmented mean: filter error state ⊕ marker pose
        pos = [mu_ref[i : i + 1, :] for i in range(3)]
        qe = tuple(mu_ref[3 + i : 4 + i, :] for i in range(4))
        mpos = [mk_ref[i : i + 1, :] for i in range(3)]
        mq = tuple(mk_ref[3 + i : 4 + i, :] for i in range(4))

        n = AUG_DOF
        zero = jnp.zeros_like(pos[0])
        P = [[zero] * n for _ in range(n)]
        for i in range(DOF):
            for j in range(i + 1):
                v = cov_ref[j, i : i + 1, :]
                P[i][j] = v
                P[j][i] = v
        for i in range(6):
            for j in range(6):
                P[6 + i][6 + j] = s(7 + 6 * i + j) + zero  # broadcast to (1, B)

        for c in range(k):
            fp = (s(43 + 3 * c), s(44 + 3 * c), s(45 + 3 * c))
            drow = _draw_deltas(P, n)
            # sigma points on (AUG_NSIG, B) sublanes
            sp = [pos[i] + drow[i] for i in range(3)]
            sq = _so3_boxplus(qe, (drow[3], drow[4], drow[5]), 1.0)
            smp = [mpos[i] + drow[6 + i] for i in range(3)]
            smq = _so3_boxplus(mq, (drow[9], drow[10], drow[11]), 1.0)
            # measurementVisualLandmark (IndirectPoseUKF.cpp:38-50)
            body_q = _qmul(*ref_q, *sq)
            body_p = tuple(a + b for a, b in zip(_qrot(ref_q, sp), ref_p))
            cam_nav_q = _qmul(*body_q, *cam_q)
            cam_nav_p = tuple(a + b for a, b in zip(_qrot(body_q, cam_p), body_p))
            inv_q = _qconj(cam_nav_q)
            f_nav = tuple(a + b for a, b in zip(_qrot(smq, fp), smp))
            rel = tuple(a - b for a, b in zip(f_nav, cam_nav_p))
            f_cam = _qrot(inv_q, rel)
            inv_n = 1.0 / jnp.sqrt(
                f_cam[0] * f_cam[0] + f_cam[1] * f_cam[1] + f_cam[2] * f_cam[2]
            )
            bear = tuple(inv_n * v for v in f_cam)  # (AUG_NSIG, B) comps
            # S²-manifold measurement statistics
            z_mean = _s2_karcher_mean(bear, AUG_NSIG)
            basis = _s2_basis(z_mean)
            dz0, dz1 = _s2_boxminus(bear, z_mean, basis)
            zc = tuple(z_ref[c, i : i + 1, :] for i in range(3))
            i0, i1 = _s2_boxminus(zc, z_mean, basis)
            nu_v = [i0, i1]
            dz = [dz0, dz1]
            S = [
                [
                    0.5 * jnp.sum(dz[a] * dz[bb], axis=0, keepdims=True)
                    + r_ref[c, a, bb : bb + 1, :]
                    for bb in range(2)
                ]
                for a in range(2)
            ]
            C = [
                [0.5 * jnp.sum(drow[i] * dz[a], axis=0, keepdims=True) for a in range(2)]
                for i in range(n)
            ]
            # marker updates are accept-any (IndirectPoseUKF.cpp:131) — the
            # -1 sentinel disables the shared tail's χ² mask
            corr, P, m2, _ = _kalman_tail(P, S, C, nu_v, -1.0, P[0][0].dtype)
            pos = [pos[i] + corr[i] for i in range(3)]
            qe = _so3_boxplus(qe, (corr[3], corr[4], corr[5]), 1.0)
            mpos = [mpos[i] + corr[6 + i] for i in range(3)]
            mq = _so3_boxplus(mq, (corr[9], corr[10], corr[11]), 1.0)
            m2_ref[c] = m2[0]
            nu_ref[c] = jnp.concatenate(nu_v, axis=0)

        # marginalize the marker block back out (IndirectPoseUKF.cpp:134)
        for j in range(DOF):
            covo_ref[j] = jnp.concatenate([P[i][j] for i in range(DOF)], axis=0)
        muo_ref[:] = jnp.concatenate(pos + list(qe), axis=0)

    return kernel


@partial(jax.jit, static_argnames=("k", "interpret"))
def _indirect_markers_lanes(k, cov_t, mu_t, ref_t, mk_t, z_t, r_t, scal, *, interpret=False):
    nb = cov_t.shape[-1]
    dtype = cov_t.dtype
    lane_spec = kernels.lane_block_spec
    nscal = 43 + 3 * k
    return pl.pallas_call(
        _make_marker_kernel(k),
        out_shape=(
            jax.ShapeDtypeStruct((DOF, DOF, nb), dtype),
            jax.ShapeDtypeStruct((DOF + 1, nb), dtype),
            jax.ShapeDtypeStruct((k, nb), dtype),
            jax.ShapeDtypeStruct((k, 2, nb), dtype),
        ),
        grid=(nb // LANE_TILE,),
        in_specs=[
            lane_spec(DOF, DOF),
            lane_spec(DOF + 1),
            lane_spec(DOF + 1),
            lane_spec(DOF + 1),
            lane_spec(k, 3),
            lane_spec(k, 2, 2),
            pl.BlockSpec((nscal, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            lane_spec(DOF, DOF),
            lane_spec(DOF + 1),
            lane_spec(k),
            lane_spec(k, 2),
        ),
        interpret=interpret,
    )(cov_t, mu_t, ref_t, mk_t, z_t, r_t, scal)


def update_markers_lanes(
    lstate: IndirectLanesState,
    marker_features: jax.Array,  # (K, 2) or (B, K, 2) pixel coordinates
    feature_covs: jax.Array,  # (K, 2, 2) or (B, K, 2, 2) pixel covariances
    feature_positions: jax.Array,  # (K, 3) in the marker frame (shared)
    marker_position: jax.Array,  # (3,) or (B, 3)
    marker_orientation: jax.Array,  # (4,) or (B, 4)
    cov_marker_pose: jax.Array,  # (6, 6) shared
    camera: "CameraConfiguration",
    camera_in_body_position: jax.Array,  # (3,) shared
    camera_in_body_orientation: jax.Array,  # (4,) shared
    *,
    nb: int | None = None,
    interpret: bool = False,
):
    """Fused visual-marker update on kernel-layout state. Pixels are
    converted to S² bearings / tangent covariances in XLA (the cheap per-
    corner part, ``pixel_to_s2``/``pixel_cov_to_s2``); the augmentation, the
    K chained S² updates and the marginalization run in one kernel launch.
    Returns ``(IndirectLanesState, UpdateInfo)`` with a leading (K,) axis on
    the info record, like the generic ``update_markers``."""
    from .indirect_pose_ukf import pixel_cov_to_s2, pixel_to_s2

    dtype = lstate.cov_t.dtype
    nb_pad = lstate.cov_t.shape[-1]
    feats = jnp.asarray(marker_features, dtype)
    per_instance = feats.ndim == 3
    if not per_instance:
        feats = feats[None]
    k = feats.shape[1]
    if nb is None:
        # per-instance features carry the true bank size (incl. a bank of 1);
        # shared features don't — fall back to the padded width, which is
        # only correct for unpadded banks (the returned UpdateInfo would
        # include pad lanes otherwise). The bank-API wrapper always passes nb.
        nb = feats.shape[0] if per_instance else nb_pad
    fcovs = jnp.broadcast_to(jnp.asarray(feature_covs, dtype), (feats.shape[0], k, 2, 2))
    # pixel → bearing per corner (vmapped over bank + corners)
    z = jax.vmap(jax.vmap(lambda px: pixel_to_s2(px, camera)))(feats)  # (b?, K, 3)
    r = jax.vmap(jax.vmap(lambda pc: pixel_cov_to_s2(pc, camera)))(fcovs)
    z = jnp.broadcast_to(z, (nb, k, 3))
    r = jnp.broadcast_to(r, (nb, k, 2, 2))
    mk = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray(marker_position, dtype), (nb, 3)),
            jnp.broadcast_to(jnp.asarray(marker_orientation, dtype), (nb, 4)),
        ],
        axis=-1,
    )
    pad = nb_pad - nb
    if pad:
        zfill = jnp.zeros((pad, k, 3), dtype).at[:, :, 2].set(1.0)
        z = jnp.concatenate([z, zfill], axis=0)
        r = jnp.concatenate(
            [r, jnp.broadcast_to(jnp.eye(2, dtype=dtype), (pad, k, 2, 2))], axis=0
        )
        mkfill = jnp.zeros((pad, 7), dtype).at[:, 3].set(1.0)
        mk = jnp.concatenate([mk, mkfill], axis=0)
    scal = jnp.concatenate(
        [
            jnp.asarray(camera_in_body_position, dtype).reshape(3),
            jnp.asarray(camera_in_body_orientation, dtype).reshape(4),
            jnp.asarray(cov_marker_pose, dtype).reshape(36),
            jnp.asarray(feature_positions, dtype).reshape(3 * k),
        ]
    )[:, None]
    covo_t, muo_t, m2, nu_t = _indirect_markers_lanes(
        k,
        lstate.cov_t,
        lstate.mu_t,
        lstate.ref_t,
        mk.T,
        jnp.transpose(z, (1, 2, 0)),
        jnp.transpose(r, (1, 2, 3, 0)),
        scal,
        interpret=interpret,
    )
    # bank-leading layout, matching vmap(update_markers): (B, K[, m])
    info = ukf.UpdateInfo(
        mahalanobis2=m2.T[:nb],
        accepted=jnp.ones((nb, k), bool),
        innovation=jnp.transpose(nu_t, (2, 0, 1))[:nb],
    )
    return lstate._replace(cov_t=covo_t, mu_t=muo_t), info


# ---------------------------------------------------------------------------
# Public bank-API entries.
# ---------------------------------------------------------------------------


def predict_fused_banked(
    bstate: "IndirectPoseUKFState", params: "IndirectPoseUKFParams", dt, *, interpret=False
) -> "IndirectPoseUKFState":
    ls = predict_lanes(to_lanes(bstate), params, dt, interpret=interpret)
    return from_lanes(ls, bstate)


def update_markers_fused_banked(
    bstate: "IndirectPoseUKFState",
    marker_features,
    feature_covs,
    feature_positions,
    marker_position,
    marker_orientation,
    cov_marker_pose,
    camera,
    camera_in_body_position,
    camera_in_body_orientation,
    *,
    interpret=False,
):
    nb = bstate.cov.shape[0]
    ls, info = update_markers_lanes(
        to_lanes(bstate),
        marker_features,
        feature_covs,
        feature_positions,
        marker_position,
        marker_orientation,
        cov_marker_pose,
        camera,
        camera_in_body_position,
        camera_in_body_orientation,
        nb=nb,
        interpret=interpret,
    )
    return from_lanes(ls, bstate), info
