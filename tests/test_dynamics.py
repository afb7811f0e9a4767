"""Vehicle-dynamics tests: calc_efforts/calc_acceleration inversion,
hand-computed efforts, xy-yaw embedding (SURVEY.md §4 item 1)."""

import jax.numpy as jnp
import numpy as np

from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn
from slam_uwv_kalman_filters_tpu.ops import manifolds as mf

RNG = np.random.default_rng(3)


def random_quat():
    q = RNG.normal(size=4)
    return jnp.asarray(q / np.linalg.norm(q))


def random_params():
    a = RNG.normal(size=(6, 6))
    return dyn.UWVParameters(
        inertia_matrix=jnp.asarray(a @ a.T + 60 * np.eye(6)),
        damping_linear=jnp.asarray(np.diag(RNG.uniform(5, 50, 6))),
        damping_quadratic=jnp.asarray(np.diag(RNG.uniform(1, 20, 6))),
        weight=jnp.asarray(1000.0),
        buoyancy=jnp.asarray(1010.0),
        cog=jnp.asarray(RNG.normal(size=3) * 0.05),
        cob=jnp.asarray(RNG.normal(size=3) * 0.05),
    )


def test_efforts_acceleration_inverse():
    p = random_params()
    q = random_quat()
    vel = jnp.asarray(RNG.normal(size=6))
    acc = jnp.asarray(RNG.normal(size=6))
    tau = dyn.calc_efforts(p, acc, vel, q)
    np.testing.assert_allclose(dyn.calc_acceleration(p, tau, vel, q), acc, atol=1e-10)


def test_efforts_hand_computed_diagonal():
    """Diagonal M, pure surge, level vehicle, neutral buoyancy:
    τ_x = m·a + d_l·v + d_q·|v|v, all other components zero."""
    p = dyn.default_uwv_parameters()
    q = mf.quat_identity()
    vel = jnp.array([2.0, 0, 0, 0, 0, 0.0])
    acc = jnp.array([0.5, 0, 0, 0, 0, 0.0])
    tau = dyn.calc_efforts(p, acc, vel, q)
    np.testing.assert_allclose(tau[0], 120.0 * 0.5 + 40.0 * 2.0 + 25.0 * 4.0, atol=1e-12)
    np.testing.assert_allclose(tau[1:], np.zeros(5), atol=1e-12)


def test_coriolis_skew_property():
    """νᵀ·C(ν)ν = 0: Coriolis forces do no work."""
    p = random_params()
    for _ in range(5):
        vel = jnp.asarray(RNG.normal(size=6))
        c = dyn.coriolis_effort(p.inertia_matrix, vel)
        np.testing.assert_allclose(float(vel @ c), 0.0, atol=1e-9)


def test_gravity_buoyancy_level_neutral_is_zero():
    p = dyn.default_uwv_parameters()
    np.testing.assert_allclose(
        dyn.gravity_buoyancy_effort(p, mf.quat_identity()), np.zeros(6), atol=1e-12
    )


def test_gravity_buoyancy_signs():
    """Positively buoyant level vehicle: net external force +z ⇒ restoring
    term g(q) has force −(B−W) in z (so that M ν̇ = τ − g floats the vehicle
    upward with zero applied effort)."""
    p = dyn.default_uwv_parameters()._replace(buoyancy=jnp.asarray(1080.7))
    g = dyn.gravity_buoyancy_effort(p, mf.quat_identity())
    np.testing.assert_allclose(g[:3], [0.0, 0.0, -(1080.7 - 980.7)], atol=1e-10)
    acc = dyn.calc_acceleration(p, jnp.zeros(6), jnp.zeros(6), mf.quat_identity())
    assert float(acc[2]) > 0.0  # floats up


def test_simulate_effort_euler_step():
    """One Euler step from rest equals M⁻¹τ·dt in velocity and kinematic
    position/orientation advance with the new velocity."""
    p = dyn.default_uwv_parameters()
    s0 = dyn.PoseVelocityState(
        position=jnp.zeros(3),
        orientation=mf.quat_identity(),
        linear_velocity=jnp.zeros(3),
        angular_velocity=jnp.zeros(3),
    )
    tau = jnp.array([60.0, 0, 0, 0, 0, 3.5])
    dt = 0.01
    s1 = dyn.simulate_effort(p, s0, tau, dt)
    np.testing.assert_allclose(s1.linear_velocity, [60.0 / 120.0 * dt, 0, 0], atol=1e-12)
    np.testing.assert_allclose(s1.angular_velocity, [0, 0, 3.5 / 35.0 * dt], atol=1e-12)
    np.testing.assert_allclose(s1.position, [60.0 / 120.0 * dt * dt, 0, 0], atol=1e-12)
    # velocity-only mode (reference DYNAMIC simulation) freezes the pose
    s1d = dyn.simulate_effort(p, s0, tau, dt, integrate_pose=False)
    np.testing.assert_allclose(s1d.position, s0.position, atol=0)
    np.testing.assert_allclose(s1d.orientation, s0.orientation, atol=0)
    np.testing.assert_allclose(s1d.linear_velocity, s1.linear_velocity, atol=0)


def test_xy_yaw_embedding_roundtrip():
    """3×3 (x,y,ψ) block embedding matches reference index map
    (src/PoseUKF.cpp:159-171)."""
    m6 = jnp.asarray(RNG.normal(size=(6, 6)))
    b3 = jnp.asarray(RNG.normal(size=(3, 3)))
    out = dyn.embed_xy_yaw(m6, b3)
    np.testing.assert_allclose(dyn.extract_xy_yaw(out), b3, atol=0)
    # untouched entries preserved
    np.testing.assert_allclose(out[2:5, 2:5], m6[2:5, 2:5], atol=0)
    np.testing.assert_allclose(out[0, 2], m6[0, 2], atol=0)
    # reference block map: (0:2,0:2)←b[0:2,0:2], (0:2,5)←b[0:2,2], (5,5)←b[2,2]
    np.testing.assert_allclose(out[0:2, 0:2], b3[0:2, 0:2], atol=0)
    np.testing.assert_allclose(out[0:2, 5], b3[0:2, 2], atol=0)
    np.testing.assert_allclose(out[5, 0:2], b3[2, 0:2], atol=0)
    np.testing.assert_allclose(out[5, 5], b3[2, 2], atol=0)
