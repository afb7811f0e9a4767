"""Unscented RTS smoother tests.

1. Linear-Gaussian equivalence: the manifold URTS (ops.ukf.smooth_step) must
   reproduce the classical RTS smoother exactly (same reduction that pins the
   forward UKF to the linear KF).
2. PoseUKF end-to-end: smoothing a sparsely-aided trajectory must not degrade
   — and between position fixes must improve — the position estimate.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_uwv_kalman_filters_tpu.ops import manifolds as mf, ukf

RNG = np.random.default_rng(11)


class Lin(NamedTuple):
    x: jax.Array


def test_smooth_step_equals_linear_rts():
    n = 4
    man = mf.make_manifold(mf.Field("x", "vec", n))
    A = jnp.asarray(RNG.normal(size=(n, n)) * 0.4 + np.eye(n))
    Q = jnp.asarray(np.diag(RNG.uniform(0.1, 0.5, n)))
    f = lambda s: Lin(x=A @ s.x)

    # arbitrary filtered posterior at k and smoothed state at k+1
    mu_f = Lin(x=jnp.asarray(RNG.normal(size=n)))
    a = RNG.normal(size=(n, n))
    P_f = jnp.asarray(a @ a.T + n * np.eye(n))
    mu_s1 = Lin(x=jnp.asarray(RNG.normal(size=n)))
    b = RNG.normal(size=(n, n))
    P_s1 = jnp.asarray(b @ b.T + n * np.eye(n))

    mu_s, P_s = ukf.smooth_step(man, mu_f, P_f, f, Q, mu_s1, P_s1)

    # classical RTS: P⁻ = A P Aᵀ + Q; G = P Aᵀ (P⁻)⁻¹
    P_pred = A @ P_f @ A.T + Q
    G = np.asarray(P_f @ A.T) @ np.linalg.inv(np.asarray(P_pred))
    mu_ref = np.asarray(mu_f.x) + G @ (np.asarray(mu_s1.x) - np.asarray(A @ mu_f.x))
    P_ref = np.asarray(P_f) + G @ (np.asarray(P_s1) - np.asarray(P_pred)) @ G.T
    np.testing.assert_allclose(np.asarray(mu_s.x), mu_ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(P_s), P_ref, rtol=1e-8, atol=1e-8)


def test_pose_smoother_improves_sparse_fix_trajectory():
    """Straight run with XY fixes only at the start and end: the filter drifts
    between fixes, the smoother pulls the interior back (classic survey
    post-processing); smoothed covariance is no larger than filtered."""
    from slam_uwv_kalman_filters_tpu.models import pose_driver, pose_smoother, pose_ukf as pukf
    from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn
    from slam_uwv_kalman_filters_tpu.utils.config import default_pose_ukf_config

    cfg = default_pose_ukf_config()
    model = dyn.default_uwv_parameters()
    state, params = pukf.init_from_pose(
        imu_in_nwu_pos=jnp.zeros(3),
        imu_in_nwu_pos_cov=jnp.eye(3) * 1e-4,
        imu_in_nwu_rot=jnp.array([1.0, 0, 0, 0]),
        imu_in_nwu_rot_cov=jnp.eye(3) * 1e-6,
        config=cfg,
        model_parameters=model,
        imu_delta_t=0.1,
    )
    n, dt, v = 100, 0.1, 0.5
    t = np.arange(n) * dt
    true_xy = np.stack([v * t, 0 * t], axis=1)
    # DVL biased by +2 cm/s (unmodeled) ⇒ dead-reckoning drift between fixes
    dvl = np.tile([v + 0.02, 0.0, 0.0], (n, 1))
    xy_valid = np.zeros(n, bool)
    xy_valid[[1, n - 1]] = True
    inputs = pose_driver.make_inputs(
        n,
        dt,
        rotation_rate=np.zeros((n, 3)),
        dvl=dvl,
        dvl_cov=np.eye(3) * 1e-4,
        xy=true_xy,
        xy_cov=np.eye(2) * 1e-6,
        xy_valid=xy_valid,
    )
    out = jax.jit(pose_smoother.run_trajectory_smoothed)(state, params, inputs)

    filt_err = np.abs(np.asarray(out.filtered_mu.position)[:, 0] - true_xy[:, 0])
    smth_err = np.abs(np.asarray(out.smoothed_mu.position)[:, 0] - true_xy[:, 0])
    mid = slice(n // 4, 3 * n // 4)
    assert smth_err[mid].mean() < 0.5 * filt_err[mid].mean(), (
        f"smoother did not reduce interior drift: {smth_err[mid].mean():.4f} "
        f"vs {filt_err[mid].mean():.4f}"
    )
    # smoothed covariance trace never exceeds filtered (information only added)
    ftr = np.trace(np.asarray(out.filtered_cov), axis1=1, axis2=2)
    str_ = np.trace(np.asarray(out.smoothed_cov), axis1=1, axis2=2)
    assert (str_ <= ftr + 1e-9).all()
    # endpoints agree (last tick is its own smoothed estimate)
    np.testing.assert_allclose(
        np.asarray(out.smoothed_mu.position[-1]), np.asarray(out.filtered_mu.position[-1]), atol=0
    )


def test_smoother_single_instance_f32_survives_condition():
    """Regression: the small-bank/cho_solve fallback of the SPD solve must
    equilibrate — a raw f32 factorization of the ~1e12-condition PoseUKF
    covariance NaNs (the Pallas branch already equilibrated)."""
    import numpy as _np

    from slam_uwv_kalman_filters_tpu.ops import kernels

    rng = _np.random.default_rng(2)
    a = rng.normal(size=(2, 53, 53)).astype(_np.float32)
    base = a @ a.transpose(0, 2, 1) + 53 * _np.eye(53, dtype=_np.float32)
    d = (10.0 ** rng.uniform(-5.5, 0.5, 53)).astype(_np.float32)
    ill = jnp.asarray(base * (d[None, :, None] * d[None, None, :]))
    rhs = jnp.asarray(rng.normal(size=(2, 53, 4)).astype(_np.float32))
    x = kernels.solve_spd_banked(ill, rhs)  # small bank → cho_solve fallback
    assert not bool(jnp.isnan(x).any()), "fallback solve NaN'd on ill-conditioned input"
    ref = _np.linalg.solve(_np.asarray(ill, _np.float64), _np.asarray(rhs, _np.float64))
    resid = _np.max(_np.abs(_np.asarray(x, _np.float64) - ref) / (_np.abs(ref) + 1.0))
    assert resid < 5e-2, resid
