"""BottomUKF tests (SURVEY.md §7 step 6, BASELINE configs[1]): S² state +
measurement, range updates via ray/plane intersection, velocity-driven
prediction."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_uwv_kalman_filters_tpu.models import bottom_ukf as bukf
from slam_uwv_kalman_filters_tpu.ops import manifolds as mf


def make_filter(distance=10.0, normal=(0.0, 0.0, 1.0)):
    mu = bukf.BottomState(
        distance=jnp.array([distance]), normal=mf.s2_normalize(jnp.asarray(normal, jnp.float64))
    )
    cov = jnp.diag(jnp.array([1.0, 0.05, 0.05]))
    return bukf.init(mu, cov)


def test_predict_distance_decreases_with_descent():
    state, params = make_filter(distance=10.0)
    state = bukf.set_velocity(state, jnp.array([1.0, 0.0, -0.5]))  # descending at 0.5 m/s
    for _ in range(10):
        state = bukf.predict(state, params, 0.1)
    # distance to bottom GROWS as the vehicle descends? No: z-velocity −0.5
    # (downward in NWU) ⇒ process adds −v_z·dt = +0.05 per step.
    np.testing.assert_allclose(float(state.mu.distance[0]), 10.5, atol=1e-9)
    # process noise grew with horizontal speed
    assert float(state.cov[0, 0]) > 1.0


def test_predict_no_noise_when_hovering():
    """Process noise scales with horizontal speed² (BottomUKF.cpp:50):
    zero horizontal speed ⇒ covariance unchanged."""
    state, params = make_filter()
    state = bukf.set_velocity(state, jnp.array([0.0, 0.0, -0.2]))
    cov0 = np.asarray(state.cov)
    state = bukf.predict(state, params, 0.1)
    np.testing.assert_allclose(np.asarray(state.cov), cov0, atol=1e-12)


def test_range_update_flat_bottom_vertical_beam():
    """Vertical beam over a flat bottom: expected range == distance, so a
    range reading corrects the distance state directly."""
    state, params = make_filter(distance=10.0)
    z = jnp.array([8.0])
    state, info = bukf.update_range(
        state,
        z,
        jnp.array([[0.01]]),
        unit_direction=jnp.array([0.0, 0.0, -1.0]),
        origin=jnp.zeros(3),
    )
    # h(x) = ((0,0,-d) - 0)·n / (dir·n) = (-d)·1/(-1) = d  → innovation pulls d→8
    assert 8.0 < float(state.mu.distance[0]) < 10.0
    np.testing.assert_allclose(float(state.mu.distance[0]), 8.0, atol=0.1)
    assert float(state.cov[0, 0]) < 1.0


def test_range_update_slanted_beams_recover_normal():
    """Four slanted DVL beams over a tilted bottom: repeated per-beam updates
    converge distance AND normal (the Janus configuration)."""
    true_normal = mf.s2_normalize(jnp.array([0.15, -0.1, 1.0]))
    true_distance = 12.0
    state, params = make_filter(distance=10.0)

    angle = 0.4
    beams = [
        mf.s2_normalize(jnp.array([np.sin(angle), 0.0, -np.cos(angle)])),
        mf.s2_normalize(jnp.array([-np.sin(angle), 0.0, -np.cos(angle)])),
        mf.s2_normalize(jnp.array([0.0, np.sin(angle), -np.cos(angle)])),
        mf.s2_normalize(jnp.array([0.0, -np.sin(angle), -np.cos(angle)])),
    ]
    origin = jnp.zeros(3)
    bottom = jnp.array([0.0, 0.0, -true_distance])

    for _ in range(30):
        state = bukf.predict(state, params, 0.1)
        state = bukf.set_velocity(state, jnp.array([0.1, 0.0, 0.0]))
        for d in beams:
            true_range = float(jnp.dot(bottom - origin, true_normal) / jnp.dot(d, true_normal))
            state, _ = bukf.update_range(state, jnp.array([true_range]), jnp.array([[1e-4]]), d, origin)

    np.testing.assert_allclose(float(state.mu.distance[0]), true_distance, atol=0.05)
    # The range model ((0,0,-d)-o)·n/(dir·n) is invariant under n → −n (same
    # ambiguity as the reference's measurementDistance), so accept either
    # hemisphere — what matters is alignment with the true plane.
    assert abs(float(jnp.dot(state.mu.normal, true_normal))) > 0.999


def test_normal_update_s2_measurement():
    state, params = make_filter(normal=(0.0, 0.0, 1.0))
    z = mf.s2_normalize(jnp.array([0.2, 0.1, 1.0]))
    state, info = bukf.update_normal(state, z, jnp.eye(2) * 1e-4)
    assert float(jnp.dot(state.mu.normal, z)) > 0.999
    np.testing.assert_allclose(float(jnp.linalg.norm(state.mu.normal)), 1.0, atol=1e-12)


def test_class_wrapper_and_jit_bank():
    f = bukf.BottomUKF(
        bukf.BottomState(distance=jnp.array([5.0]), normal=jnp.array([0.0, 0.0, 1.0])),
        jnp.diag(jnp.array([1.0, 0.05, 0.05])),
    )
    f.set_velocity(np.array([0.5, 0.0, -0.1]))
    f.prediction_step(0.1)
    f.integrate_range_measurement(np.array([4.8]), np.array([[0.01]]), np.array([0, 0, -1.0]), np.zeros(3))
    assert 4.5 < float(f.mu.distance[0]) < 5.2

    # vmapped bank with heterogeneous velocities
    state0, params = make_filter()
    vels = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)))

    @jax.jit
    @jax.vmap
    def bank_step(v):
        s = bukf.set_velocity(state0, v)
        return bukf.predict(s, params, 0.1).mu.distance

    d = bank_step(vels)
    assert d.shape == (8, 1)
    np.testing.assert_allclose(
        np.asarray(d[:, 0]), 10.0 - 0.1 * np.asarray(vels[:, 2]), atol=1e-9
    )
