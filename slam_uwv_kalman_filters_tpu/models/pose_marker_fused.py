"""Fused PoseUKF visual-marker update — 59-DOF augmentation in VMEM.

The reference's marker update (``/root/reference/src/PoseUKF.cpp:613-654``)
augments the 53-DOF filter with the 6-DOF marker pose, runs one S²-valued
pinhole-bearing update per detected corner on the 59-DOF temporary filter
(119 sigma points), and marginalizes the filter block back out. Through r3
the lanes-persistent fleet loop served marker ticks by round-tripping the
whole bank out of kernel layout into the generic vmapped path — per-corner
59×59 Cholesky through XLA plus two full-bank layout conversions.

This kernel keeps the ENTIRE augmented update inside one Pallas launch on
kernel-layout state (the ``indirect_fused`` augmentation-in-VMEM pattern,
proven at 12 DOF, scaled to 59 DOF with the big-filter machinery):

1. build the 59×59 augmented covariance in VMEM scratch — pose block from
   the (lower-triangle-valid) lanes covariance, marker-pose prior from SMEM,
   zero cross-covariance (``PoseUKF.cpp:623-625``);
2. per corner (static K, unrolled): a fresh equilibrated 59×59 factorization
   (``ops.kernels.equilibrated_sigma_columns``, keep-columns mode), the
   bearing model evaluated on ±factor-column slabs through the streaming
   ``_ColDeltas`` view (the (119, 59, B) delta tensor never exists), the S²
   Karcher mean of the 119 predicted bearings, tangent-space innovation/
   S/C statistics, the 2-D lane-Cholesky gain, the manifold correction
   (two quaternion boxplus blocks: vehicle + marker orientation) and the
   exactly-symmetric half-triangle downdate of the augmented covariance;
3. marginalize: the top-left 53×53 half-triangle and the filter mean rows
   are written out in the lanes protocol (lower-triangle-valid).

Semantics match ``update_visual_features`` / ``update_visual_features_bank``
(accept-any corners, per-corner NIS record) to f32 accuracy; parity pinned by
``tests/test_marker_fused.py`` and at trajectory level by the lanes-vs-bank
full-mission test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import kernels, ukf
from ..ops.kernels import LANE_TILE, equilibrated_sigma_columns
from .bottom_fused import _s2_basis, _s2_boxminus, _s2_karcher_mean
from .pose_fused import STORAGE_DIM, TANGENT_DIM, _qexp, _qmul, _qnorm4
from .pose_update_fused import _ColDeltas, _ZeroDeltas, _rot_fwd, _rot_inv

__all__ = ["update_visual_features_lanes", "AUG_TANGENT", "AUG_NSIG"]

AUG_TANGENT = TANGENT_DIM + 6  # 59
AUG_STORAGE = STORAGE_DIM + 7  # 61 (marker position 3 + marker quaternion 4)
AUG_NSIG = 2 * AUG_TANGENT + 1  # 119



def _marker_bearing(mu, y, fp, cam_p, cam_q):
    """Predicted S² bearing components for sigma points given by the delta
    view ``y`` (``y[:, k, :]`` = tangent row k) around the augmented storage
    mean ``mu`` (61, B) — ``measurementVisualLandmark``
    (``PoseUKF.cpp:233-243``): feature → nav → camera frame → unit bearing."""
    pos = (mu[0:1] + y[:, 0, :], mu[1:2] + y[:, 1, :], mu[2:3] + y[:, 2, :])
    ew, ex, ey, ez = _qexp(y[:, 3, :], y[:, 4, :], y[:, 5, :])
    q = _qnorm4(*_qmul(mu[3:4], mu[4:5], mu[5:6], mu[6:7], ew, ex, ey, ez))
    mpos = (
        mu[54:55] + y[:, 53, :],
        mu[55:56] + y[:, 54, :],
        mu[56:57] + y[:, 55, :],
    )
    mw, mx, my, mz = _qexp(y[:, 56, :], y[:, 57, :], y[:, 58, :])
    mq = _qnorm4(*_qmul(mu[57:58], mu[58:59], mu[59:60], mu[60:61], mw, mx, my, mz))
    # camera pose in nav: (q, pos) ∘ (cam_q, cam_p)
    cam_nav_q = _qnorm4(*_qmul(*q, *cam_q))
    rp = _rot_fwd(q, cam_p)
    cam_nav_p = (pos[0] + rp[0], pos[1] + rp[1], pos[2] + rp[2])
    # feature in nav: marker pose ∘ fp, then into the camera frame
    fn = _rot_fwd(mq, fp)
    rel = (
        mpos[0] + fn[0] - cam_nav_p[0],
        mpos[1] + fn[1] - cam_nav_p[1],
        mpos[2] + fn[2] - cam_nav_p[2],
    )
    f_cam = _rot_inv(cam_nav_q, rel)
    n2 = f_cam[0] * f_cam[0] + f_cam[1] * f_cam[1] + f_cam[2] * f_cam[2]
    # tiny-norm guard: identity-covariance PAD lanes draw ±1-radian sigma
    # deltas that can march the predicted feature through the camera origin;
    # real geometry never does (the reference divides by the camera-frame
    # depth just the same), so this only keeps pad-lane math finite
    tiny = jnp.asarray(jnp.finfo(n2.dtype).tiny, n2.dtype)
    inv = 1.0 / jnp.sqrt(jnp.maximum(n2, tiny))
    return (inv * f_cam[0], inv * f_cam[1], inv * f_cam[2])


def _make_marker_kernel(k: int):
    n = AUG_TANGENT

    def kernel(
        cov_ref,  # (53, 53, B) lanes covariance (lower-triangle-valid)
        mu_ref,  # (54, B) filter mean, storage rows
        mk_ref,  # (7, B) marker-pose prior rows (position, quaternion)
        z_ref,  # (k, 3, B) measured unit bearings
        r_ref,  # (k, 2, 2, B) tangent measurement covariances
        scal_ref,  # SMEM (7 + 36 + 3k, 1): cam extrinsics, marker cov, corners
        covo_ref,  # out (53, 53, B) posterior (lower-triangle-valid)
        muo_ref,  # out (54, B)
        m2_ref,  # out (k, B) per-corner NIS
        nu_ref,  # out (k, 2, B) per-corner tangent innovation
        a_ref,  # scratch (59, 59, B): augmented covariance, (col, row, B)
        c_ref,  # scratch (59, 59, B): factorization columns
        mua_ref,  # scratch (61, B): augmented mean, storage rows
    ):
        s = lambda i: scal_ref[i, 0]
        cam_p = (s(0), s(1), s(2))
        cam_q = (s(3), s(4), s(5), s(6))
        b = cov_ref.shape[-1]
        dtype = cov_ref.dtype
        zrow = jnp.zeros((1, b), dtype)

        # augmented covariance (PoseUKF.cpp:623-625): pose block, zero cross,
        # marker-pose prior; full rows written so the scratch is never read
        # uninitialized (the factorization core tolerates but must not see
        # non-finite garbage under the masked head rows)
        for nn in range(TANGENT_DIM):
            head = jnp.zeros((nn, b), dtype) if nn else None
            col = cov_ref[nn, nn:]
            tail = jnp.zeros((6, b), dtype)
            parts = [col, tail] if head is None else [head, col, tail]
            a_ref[nn] = jnp.concatenate(parts, axis=0)
        for i in range(6):
            mcol = jnp.concatenate(
                [s(7 + 6 * i + j) + zrow for j in range(6)], axis=0
            )
            a_ref[TANGENT_DIM + i] = jnp.concatenate(
                [jnp.zeros((TANGENT_DIM, b), dtype), mcol], axis=0
            )
        mua_ref[0:STORAGE_DIM] = mu_ref[:]
        mua_ref[STORAGE_DIM:] = mk_ref[:]

        for c in range(k):
            fp = (s(43 + 3 * c), s(44 + 3 * c), s(45 + 3 * c))
            dvec = equilibrated_sigma_columns(a_ref, c_ref, None, keep_columns=True)
            mu = mua_ref[:]
            Zp = _marker_bearing(mu, _ColDeltas(c_ref, dvec, 1.0), fp, cam_p, cam_q)
            Zm = _marker_bearing(mu, _ColDeltas(c_ref, dvec, -1.0), fp, cam_p, cam_q)
            Z0 = _marker_bearing(mu, _ZeroDeltas(b, dtype), fp, cam_p, cam_q)
            # all 119 bearings stacked on sublanes (zero point first — the
            # ukfom mean seed), S² Karcher mean + tangent statistics
            pts = tuple(
                jnp.concatenate([Z0[a], Zp[a], Zm[a]], axis=0) for a in range(3)
            )
            z_mean = _s2_karcher_mean(pts, AUG_NSIG)
            basis = _s2_basis(z_mean)
            dz0, dz1 = _s2_boxminus(pts, z_mean, basis)  # (119, B) each
            zc = tuple(z_ref[c, a : a + 1, :] for a in range(3))
            nu0, nu1 = _s2_boxminus(zc, z_mean, basis)  # (1, B) each
            dz = (dz0, dz1)
            S = [[None] * 2 for _ in range(2)]
            for a in range(2):
                for b2 in range(a + 1):
                    v = 0.5 * jnp.sum(dz[a] * dz[b2], axis=0, keepdims=True) + r_ref[
                        c, a, b2 : b2 + 1, :
                    ]
                    S[a][b2] = v
                    S[b2][a] = v
            # C = ½ Σᵢ δᵢ dzᵢᵀ = ½·dvec ⊙ Σⱼ Lⱼ·(dz⁺ⱼ − dz⁻ⱼ): exact for the
            # manifold-valued dz too — the zero point contributes nothing
            # because δ₀ = 0, and the ± pair needs no symmetry of dz
            C = [
                0.5
                * dvec
                * jnp.sum(
                    c_ref[:] * (dz[a][1 : 1 + n] - dz[a][1 + n :])[:, None, :], axis=0
                )
                for a in range(2)
            ]
            # 2-D gain via lane Cholesky of S (accept-any — PoseUKF markers
            # carry no χ² gate, src/PoseUKF.cpp:646-648)
            l00 = jnp.sqrt(S[0][0])
            i00 = 1.0 / l00
            l10 = S[1][0] * i00
            l11 = jnp.sqrt(S[1][1] - l10 * l10)
            i11 = 1.0 / l11
            w0 = [C[0] * i00]
            w1 = [(C[1] - l10 * w0[0]) * i11]
            y0 = (nu0) * i00
            y1 = (nu1 - l10 * y0) * i11
            m2_ref[c : c + 1] = y0 * y0 + y1 * y1
            nu_ref[c] = jnp.concatenate([nu0, nu1], axis=0)
            corr = w0[0] * y0 + w1[0] * y1  # (59, B) state correction K·ν
            # manifold correction on the augmented storage mean
            mua_ref[0:3] = mu[0:3] + corr[0:3]
            mua_ref[7:54] = mu[7:54] + corr[6:53]
            ew, ex, ey, ez = _qexp(corr[3:4][None], corr[4:5][None], corr[5:6][None])
            qw, qx, qy, qz = _qnorm4(
                *_qmul(mu[3:4][None], mu[4:5][None], mu[5:6][None], mu[6:7][None],
                       ew, ex, ey, ez)
            )
            mua_ref[3:4] = qw[0]
            mua_ref[4:5] = qx[0]
            mua_ref[5:6] = qy[0]
            mua_ref[6:7] = qz[0]
            mua_ref[54:57] = mu[54:57] + corr[53:56]
            mw, mx, my, mz = _qexp(corr[56:57][None], corr[57:58][None], corr[58:59][None])
            nw, nx, ny, nz = _qnorm4(
                *_qmul(mu[57:58][None], mu[58:59][None], mu[59:60][None], mu[60:61][None],
                       mw, mx, my, mz)
            )
            mua_ref[57:58] = nw[0]
            mua_ref[58:59] = nx[0]
            mua_ref[59:60] = ny[0]
            mua_ref[60:61] = nz[0]
            # half-triangle downdate of the augmented covariance (exactly
            # symmetric outer product, lanes convention)
            for nn in range(n):
                t = (
                    w0[0][nn : nn + 1] * w0[0][nn:]
                    + w1[0][nn : nn + 1] * w1[0][nn:]
                )
                a_ref[nn, nn:] = a_ref[nn, nn:] - t

        # marginalize the marker block (PoseUKF.cpp:651-653): top-left 53×53
        for nn in range(TANGENT_DIM):
            covo_ref[nn, nn:] = a_ref[nn, nn:TANGENT_DIM]
        muo_ref[:] = mua_ref[0:STORAGE_DIM]

    return kernel


def _pose_marker_lanes(k, cov_t, mu_t, mk_t, z_t, r_t, scal, *, interpret):
    nb = cov_t.shape[-1]
    n = TANGENT_DIM
    lane_spec = kernels.lane_block_spec
    nscal = 43 + 3 * k
    return pl.pallas_call(
        _make_marker_kernel(k),
        out_shape=(
            jax.ShapeDtypeStruct((n, n, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((STORAGE_DIM, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((k, nb), cov_t.dtype),
            jax.ShapeDtypeStruct((k, 2, nb), cov_t.dtype),
        ),
        grid=(nb // LANE_TILE,),
        in_specs=[
            lane_spec(n, n),
            lane_spec(STORAGE_DIM),
            lane_spec(7),
            lane_spec(k, 3),
            lane_spec(k, 2, 2),
            pl.BlockSpec((nscal, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            lane_spec(n, n),
            lane_spec(STORAGE_DIM),
            lane_spec(k),
            lane_spec(k, 2),
        ),
        scratch_shapes=[
            pltpu.VMEM((AUG_TANGENT, AUG_TANGENT, LANE_TILE), cov_t.dtype),
            pltpu.VMEM((AUG_TANGENT, AUG_TANGENT, LANE_TILE), cov_t.dtype),
            pltpu.VMEM((AUG_STORAGE, LANE_TILE), cov_t.dtype),
        ],
        # two 59×59 f32 slabs + I/O double buffering ≈ 9 MB — inside the
        # default budget, but leave headroom like the whole-step kernel
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(cov_t, mu_t, mk_t, z_t, r_t, scal)


def update_visual_features_lanes(
    lstate,
    marker_features: jax.Array,  # (B, K, 2) or (K, 2) pixels
    feature_covs: jax.Array,  # (B, K, 2, 2) or (K, 2, 2)
    feature_positions: jax.Array,  # (K, 3) marker geometry (shared)
    marker_position: jax.Array,  # (B, 3) or (3,) prior mean
    marker_orientation: jax.Array,  # (B, 4) or (4,)
    cov_marker_pose: jax.Array,  # (6, 6) shared prior covariance
    camera,
    camera_in_imu_position: jax.Array,  # (3,) shared
    camera_in_imu_orientation: jax.Array,  # (4,) shared
    *,
    nb: int,
    interpret: bool = False,
):
    """Fused visual-marker update on kernel-layout state — the fleet path
    for marker ticks (no bank-layout round trip). Pixel→bearing conversion
    happens in XLA (cheap, per corner); augmentation, K chained S² updates
    and marginalization run in ONE launch. Returns
    ``(LanesBankState, UpdateInfo)`` with a leading (B, K) NIS record like
    ``update_visual_features_bank``."""
    dtype = lstate.cov_t.dtype
    nb_pad = lstate.cov_t.shape[-1]
    pad = nb_pad - nb
    feats = jnp.asarray(marker_features, dtype)
    if feats.ndim == 2:
        feats = jnp.broadcast_to(feats[None], (nb, *feats.shape))
    k = feats.shape[1]
    if k == 0:
        # the generic path's loud guard, kept here too — an empty feature
        # array would otherwise reach pallas_call with zero-sized blocks
        raise ValueError("update_visual_features_lanes needs at least one feature")
    if feature_positions.shape[0] != k or jnp.asarray(feature_covs).shape[-3] != k:
        raise ValueError(
            f"{k} marker_features but {feature_positions.shape[0]} "
            "feature_positions / mismatched feature_covs"
        )
    fcovs = jnp.broadcast_to(jnp.asarray(feature_covs, dtype), (nb, k, 2, 2))

    fx, fy, cx, cy = camera.fx, camera.fy, camera.cx, camera.cy
    bear = jnp.stack(
        [(feats[..., 0] - cx) / fx, (feats[..., 1] - cy) / fy, jnp.ones_like(feats[..., 0])],
        axis=-1,
    )
    z = bear / jnp.linalg.norm(bear, axis=-1, keepdims=True)  # (B, K, 3)
    f_scale = jnp.asarray([[fx * fx, fx * fy], [fx * fy, fy * fy]], dtype)
    r = fcovs / f_scale  # (B, K, 2, 2)

    mk = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray(marker_position, dtype), (nb, 3)),
            jnp.broadcast_to(jnp.asarray(marker_orientation, dtype), (nb, 4)),
        ],
        axis=-1,
    )
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
            jnp.asarray(camera_in_imu_position, dtype).reshape(3),
            jnp.asarray(camera_in_imu_orientation, dtype).reshape(4),
            jnp.asarray(cov_marker_pose, dtype).reshape(36),
            jnp.asarray(feature_positions, dtype).reshape(3 * k),
        ]
    )[:, None]
    covo_t, muo_t, m2, nu_t = _pose_marker_lanes(
        k,
        lstate.cov_t,
        lstate.mu_t,
        mk.T,
        jnp.transpose(z, (1, 2, 0)),
        jnp.transpose(r, (1, 2, 3, 0)),
        scal,
        interpret=interpret,
    )
    info = ukf.UpdateInfo(
        mahalanobis2=m2.T[:nb],
        accepted=jnp.ones((nb, k), bool),
        innovation=jnp.transpose(nu_t, (2, 0, 1))[:nb],
    )
    return lstate._replace(cov_t=covo_t, mu_t=muo_t), info
