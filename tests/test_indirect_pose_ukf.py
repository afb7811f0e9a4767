"""IndirectPoseUKF tests (SURVEY.md §7 step 6, BASELINE configs[2]):
error-state decay, marker-augmented S² updates recovering a known pose bias,
corrected-pose composition."""

import jax.numpy as jnp
import numpy as np

from slam_uwv_kalman_filters_tpu.models import indirect_pose_ukf as ipu
from slam_uwv_kalman_filters_tpu.ops import manifolds as mf
from slam_uwv_kalman_filters_tpu.utils.config import CameraConfiguration

CAM = CameraConfiguration(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def make_filter(**kw):
    return ipu.init(
        position_error_std=(0.05, 0.05, 0.05),
        orientation_error_std=(0.02, 0.02, 0.02),
        orientation_error_tau=30.0,
        **kw,
    )


def test_init_covariance_layout():
    state, params = make_filter(initial_position_error_std=(0.5, 0.6, 0.7))
    np.testing.assert_allclose(np.diag(state.cov)[:3], [0.25, 0.36, 0.49], atol=1e-12)
    np.testing.assert_allclose(np.diag(state.cov)[3:], [4e-4] * 3, atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.mu.position_error), 0.0, atol=0)


def test_orientation_error_decays():
    """Process model pulls the orientation error toward identity with time
    constant tau (IndirectPoseUKF.cpp:6-20)."""
    state, params = make_filter()
    err0 = mf.quat_exp(jnp.array([0.0, 0.0, 0.3]))
    state = state._replace(mu=state.mu._replace(orientation_error=err0))
    for _ in range(50):
        state = ipu.predict(state, params, 0.5)
    ang = float(jnp.linalg.norm(mf.quat_log(state.mu.orientation_error)))
    # 25 s at tau=30 ⇒ ≈ 0.3·e^(−25/30) ≈ 0.13
    assert 0.05 < ang < 0.2
    # position error is a random walk: mean unchanged
    np.testing.assert_allclose(np.asarray(state.mu.position_error), 0.0, atol=1e-9)


def project_feature(feature_nav, body_q, body_p, cam_q, cam_p):
    """Ground-truth pinhole projection of a nav-frame point to pixels."""
    q, p = mf.affine_mul(body_q, body_p, cam_q, cam_p)
    qi, pi = mf.affine_inv(q, p)
    f_cam = mf.affine_apply(qi, pi, feature_nav)
    u = CAM.fx * f_cam[0] / f_cam[2] + CAM.cx
    v = CAM.fy * f_cam[1] / f_cam[2] + CAM.cy
    return jnp.array([u, v])


def test_marker_update_recovers_position_bias():
    """Reference pose is offset from the true pose; marker corner observations
    must pull position_error toward the true offset."""
    state, params = make_filter(initial_position_error_std=(0.5, 0.5, 0.5))

    true_bias = jnp.array([0.3, -0.2, 0.1])
    # true body pose = ref ∘ bias (identity orientations for clarity)
    ref_p = jnp.array([1.0, 2.0, -5.0])
    ref_q = mf.quat_identity()
    body_p = ref_p + true_bias
    body_q = ref_q

    state = ipu.update_pose_reference(state, ref_p, ref_q)

    # camera looks forward along +z of body, 3 m in front of a marker
    cam_p = jnp.zeros(3)
    cam_q = mf.quat_identity()
    marker_p = body_p + jnp.array([0.0, 0.0, 3.0])
    marker_q = mf.quat_identity()
    half = 0.15
    corners_marker = jnp.array(
        [[-half, -half, 0.0], [half, -half, 0.0], [half, half, 0.0], [-half, half, 0.0]]
    )

    pixels = jnp.stack(
        [
            project_feature(mf.affine_apply(marker_q, marker_p, c), body_q, body_p, cam_q, cam_p)
            for c in corners_marker
        ]
    )
    pixel_covs = jnp.tile(jnp.eye(2)[None] * 0.5, (4, 1, 1))

    for _ in range(10):
        state = ipu.predict(state, params, 0.1)
        state, info = ipu.update_markers(
            state,
            pixels,
            pixel_covs,
            corners_marker,
            marker_p,
            marker_q,
            jnp.eye(6) * 1e-6,
            CAM,
            cam_p,
            cam_q,
        )

    est_bias = np.asarray(state.mu.position_error)
    # bearing-only observations of 4 coplanar corners: x/y components are well
    # constrained; depth (z) less so — accept looser tolerance there
    np.testing.assert_allclose(est_bias[:2], np.asarray(true_bias)[:2], atol=0.05)
    np.testing.assert_allclose(est_bias[2], float(true_bias[2]), atol=0.15)

    # corrected pose == ref ∘ error ≈ true body pose
    q_c, p_c = ipu.corrected_pose(state)
    np.testing.assert_allclose(np.asarray(p_c)[:2], np.asarray(body_p)[:2], atol=0.05)


def test_class_wrapper():
    f = ipu.IndirectPoseUKF((0.05,) * 3, (0.02,) * 3, 30.0)
    f.update_pose_reference(np.zeros(3), np.array([1.0, 0, 0, 0]))
    f.prediction_step(0.1)
    q, p = f.get_corrected_pose()
    np.testing.assert_allclose(np.asarray(p), 0.0, atol=1e-12)
    assert f.sigma.shape == (6, 6)
