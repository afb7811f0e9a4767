"""VelocityUKF end-to-end tests (SURVEY.md §7 step 5, BASELINE configs[0]):
synthetic IMU+thruster+DVL sequence, validated against the independent NumPy
oracle, plus jit/scan replay and batch-consistency checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle as orc
from slam_uwv_kalman_filters_tpu.models import velocity_ukf as vukf
from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn
from slam_uwv_kalman_filters_tpu.ops import manifolds as mf

RNG = np.random.default_rng(11)


def make_filter():
    mu = vukf.VelocityState(velocity=jnp.zeros(3), z_position=jnp.zeros(1))
    cov = jnp.eye(4) * 0.1
    model = dyn.default_uwv_parameters()
    return vukf.init(mu, cov, model)


def oracle_filter():
    p = dyn.default_uwv_parameters()
    return orc.OracleVelocityUKF(
        {"velocity": np.zeros(3), "z_position": np.zeros(1)},
        np.eye(4) * 0.1,
        np.asarray(p.inertia_matrix),
        np.asarray(p.damping_linear),
        np.asarray(p.damping_quadratic),
        float(p.weight),
        float(p.buoyancy),
        np.asarray(p.cog),
        np.asarray(p.cob),
    )


def synth_sequence(T=100, dt=0.1):
    """Thruster efforts + gyro + DVL schedule for a surge-and-turn maneuver."""
    seq = []
    for k in range(T):
        tau = np.array([80.0 * np.sin(0.05 * k) + 40.0, 10.0, -5.0, 0.0, 0.0, 2.0])
        gyro = np.array([0.0, 0.0, 0.05])
        dvl = k % 10 == 9  # 1 Hz DVL at 10 Hz prediction
        seq.append((dt, tau, gyro, dvl))
    return seq


def test_velocity_ukf_matches_oracle_trajectory():
    """Full synthetic run: JAX filter == independent NumPy oracle to ~1e-9."""
    state, params = make_filter()
    ofilt = oracle_filter()
    R_dvl = np.eye(3) * 1e-3

    # a fixed fake DVL reading derived from the oracle truth + offset
    for dt, tau, gyro, dvl in synth_sequence(60):
        state = vukf.integrate_body_efforts(state, jnp.asarray(tau))
        state = vukf.integrate_gyro(state, jnp.asarray(gyro))
        ofilt.set_efforts(tau)
        ofilt.set_gyro(gyro)

        state = vukf.predict(state, params, dt)
        ofilt.predict(dt)

        if dvl:
            z = ofilt.mu["velocity"] + np.array([0.01, -0.02, 0.005])
            state, _ = vukf.update_dvl(state, jnp.asarray(z), jnp.asarray(R_dvl))
            ofilt.update_dvl(z, R_dvl)

    np.testing.assert_allclose(np.asarray(state.mu.velocity), ofilt.mu["velocity"], atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(state.mu.z_position), ofilt.mu["z_position"], atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(state.cov), ofilt.cov, atol=1e-9)
    # tracker orientation evolved identically
    np.testing.assert_allclose(
        np.asarray(state.model_state.orientation), ofilt.tracker["orientation"], atol=1e-9
    )
    # sanity: filter actually moved
    assert float(jnp.linalg.norm(state.mu.velocity)) > 0.1


def test_velocity_converges_to_steady_state():
    """Constant surge effort ⇒ velocity converges toward the drag-balance
    speed; pressure updates pin depth."""
    state, params = make_filter()
    tau = jnp.array([65.0, 0, 0, 0, 0, 0.0])
    state = vukf.integrate_body_efforts(state, tau)
    step = jax.jit(lambda s: vukf.predict(s, params, 0.05))
    for _ in range(600):
        state = step(state)
    # steady state: d_l*v + d_q*v² = 65 → v ≈ 1.0 (40v+25v²=65 ⇒ v=1)
    np.testing.assert_allclose(float(state.mu.velocity[0]), 1.0, atol=1e-3)

    s2, info = vukf.update_pressure(state, jnp.array([-4.2]), jnp.eye(1) * 1e-4)
    assert abs(float(s2.mu.z_position[0]) - (-4.2)) < 0.5


def test_prediction_requires_motion_model():
    """Reference throws without setupMotionModel (VelocityUKF.cpp:117-118)."""
    mu = vukf.VelocityState(velocity=jnp.zeros(3), z_position=jnp.zeros(1))
    f = vukf.VelocityUKF(mu, jnp.eye(4) * 0.1)
    with pytest.raises(RuntimeError, match="Motion model"):
        f.prediction_step(0.1)
    f.setup_motion_model(dyn.default_uwv_parameters())
    f.integrate_body_efforts(np.array([50.0, 0, 0, 0, 0, 0]))
    f.prediction_step(0.1)
    assert float(f.mu.velocity[0]) > 0.0


def test_class_wrapper_validates_measurements():
    mu = vukf.VelocityState(velocity=jnp.zeros(3), z_position=jnp.zeros(1))
    f = vukf.VelocityUKF(mu, jnp.eye(4) * 0.1)
    f.setup_motion_model(dyn.default_uwv_parameters())
    with pytest.raises(ValueError, match="NaN"):
        f.integrate_dvl_measurement(np.array([np.nan, 0, 0]), np.eye(3))


def test_scan_replay_matches_python_loop():
    """lax.scan trajectory replay == step-by-step python loop (the offline
    driver pattern, SURVEY.md §3.6)."""
    state0, params = make_filter()
    T = 50
    taus = jnp.asarray(RNG.normal(size=(T, 6)) * 10.0)
    gyros = jnp.asarray(RNG.normal(size=(T, 3)) * 0.02)
    dvl_valid = jnp.asarray(RNG.random(T) < 0.2)
    dvl_z = jnp.asarray(RNG.normal(size=(T, 3)) * 0.5)
    R = jnp.eye(3) * 1e-2
    dt = 0.1

    def step(state, inp):
        tau, gyro, z, valid = inp
        state = vukf.integrate_body_efforts(state, tau)
        state = vukf.integrate_gyro(state, gyro)
        state = vukf.predict(state, params, dt)
        upd, _ = vukf.update_dvl(state, z, R)
        state = jax.tree_util.tree_map(lambda a, b: jnp.where(valid, a, b), upd, state)
        return state, state.mu.velocity

    final_scan, vels = jax.lax.scan(step, state0, (taus, gyros, dvl_z, dvl_valid))

    state = state0
    for k in range(T):
        state, _ = step(state, (taus[k], gyros[k], dvl_z[k], dvl_valid[k]))
    np.testing.assert_allclose(
        np.asarray(final_scan.mu.velocity), np.asarray(state.mu.velocity), atol=1e-11
    )
    np.testing.assert_allclose(np.asarray(final_scan.cov), np.asarray(state.cov), atol=1e-11)
    assert vels.shape == (T, 3)


def test_bank_consistency_vmap_equals_solo():
    """N identical filters vmapped == N solo runs (SURVEY.md §4 item 3),
    with heterogeneous per-instance efforts."""
    state0, params = make_filter()
    N = 4
    taus = jnp.asarray(RNG.normal(size=(N, 6)) * 20.0)

    def run(tau):
        s = vukf.integrate_body_efforts(state0, tau)
        for _ in range(5):
            s = vukf.predict(s, params, 0.1)
        s, _ = vukf.update_dvl(s, jnp.array([0.5, 0.0, 0.0]), jnp.eye(3) * 1e-2)
        return s

    bank = jax.vmap(run)(taus)
    for i in range(N):
        solo = run(taus[i])
        np.testing.assert_allclose(
            np.asarray(bank.mu.velocity[i]), np.asarray(solo.mu.velocity), atol=1e-12
        )
        np.testing.assert_allclose(np.asarray(bank.cov[i]), np.asarray(solo.cov), atol=1e-12)


def test_setup_motion_model_preserves_estimate():
    """Reference semantics: updates are accepted BEFORE setupMotionModel
    (VelocityUKF.cpp:79-112 — only prediction throws), and swapping the
    vehicle model preserves the converged estimate (setupMotionModel seeds
    the tracker from getCurrentState, it does not reset the filter)."""
    mu = vukf.VelocityState(velocity=jnp.zeros(3), z_position=jnp.zeros(1))
    f = vukf.VelocityUKF(mu, jnp.eye(4) * 0.1)
    # DVL update before any motion model: accepted, pulls the velocity
    f.integrate_dvl_measurement(np.array([0.4, 0.0, 0.0]), np.eye(3) * 1e-4)
    assert float(f.mu.velocity[0]) > 0.3
    with pytest.raises(RuntimeError, match="Motion model"):
        f.prediction_step(0.1)

    f.setup_motion_model(dyn.default_uwv_parameters())
    f.integrate_body_efforts(np.array([50.0, 0, 0, 0, 0, 0]))
    f.prediction_step(0.1)
    vel_before = np.asarray(f.mu.velocity)
    cov_before = np.asarray(f.sigma)

    # swapping the model keeps the estimate; the tracker re-seeds from it
    heavier = dyn.default_uwv_parameters()
    heavier = heavier._replace(inertia_matrix=heavier.inertia_matrix * 2.0)
    f.setup_motion_model(heavier)
    np.testing.assert_array_equal(np.asarray(f.mu.velocity), vel_before)
    np.testing.assert_array_equal(np.asarray(f.sigma), cov_before)
    np.testing.assert_array_equal(
        np.asarray(f.state.model_state.linear_velocity), vel_before
    )
    f.prediction_step(0.1)  # still operational with the new model
    assert np.all(np.isfinite(np.asarray(f.sigma)))
