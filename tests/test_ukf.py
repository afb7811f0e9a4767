"""UKF core tests (SURVEY.md §4 items 1-2).

The decisive property: on a linear-Gaussian problem the manifold UKF with
ukfom's conventions (unit-spread ±chol columns, equal-weight mean, ½-factor
covariances) must reproduce the algebraic Kalman filter EXACTLY (up to
floating-point roundoff) — this pins the sigma-point convention against an
independent closed-form oracle.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_uwv_kalman_filters_tpu.ops import manifolds as mf
from slam_uwv_kalman_filters_tpu.ops import ukf

RNG = np.random.default_rng(7)


class LinState(NamedTuple):
    x: jax.Array  # vec 4


LIN = mf.make_manifold(mf.Field("x", "vec", 4))


def random_spd(n, scale=1.0):
    a = RNG.normal(size=(n, n))
    return jnp.asarray(scale * (a @ a.T + n * np.eye(n)))


def test_sigma_point_deltas_shape_and_spread():
    P = random_spd(4)
    d = ukf.sigma_point_deltas(P)
    assert d.shape == (9, 4)
    np.testing.assert_allclose(d[0], 0.0, atol=0)
    # ½ Σ δδᵀ == P  (the covariance-consistency identity behind the ½ factor)
    np.testing.assert_allclose(0.5 * d.T @ d, P, atol=1e-10)
    # interleaved ±pairs
    np.testing.assert_allclose(d[1], -d[2], atol=0)


def test_predict_linear_equals_kalman():
    A = jnp.asarray(RNG.normal(size=(4, 4)))
    P = random_spd(4)
    Q = random_spd(4, 0.1)
    mu = LinState(x=jnp.asarray(RNG.normal(size=4)))

    mu2, P2 = ukf.predict(LIN, mu, P, lambda s: LinState(x=A @ s.x), Q)
    np.testing.assert_allclose(mu2.x, A @ mu.x, atol=1e-10)
    np.testing.assert_allclose(P2, A @ P @ A.T + Q, atol=1e-9)


def test_update_linear_equals_kalman():
    H = jnp.asarray(RNG.normal(size=(2, 4)))
    P = random_spd(4)
    R = random_spd(2, 0.5)
    mu = LinState(x=jnp.asarray(RNG.normal(size=4)))
    z = jnp.asarray(RNG.normal(size=2))

    mu2, P2, info = ukf.update(LIN, mu, P, z, lambda s: H @ s.x, R)

    S = H @ P @ H.T + R
    K = P @ H.T @ jnp.linalg.inv(S)
    nu = z - H @ mu.x
    np.testing.assert_allclose(mu2.x, mu.x + K @ nu, atol=1e-9)
    np.testing.assert_allclose(P2, P - K @ S @ K.T, atol=1e-9)
    np.testing.assert_allclose(info.innovation, nu, atol=1e-10)
    np.testing.assert_allclose(info.mahalanobis2, nu @ jnp.linalg.inv(S) @ nu, atol=1e-9)
    assert bool(info.accepted)


def test_update_gate_rejects():
    P = random_spd(4)
    R = jnp.eye(2) * 1e-4
    mu = LinState(x=jnp.zeros(4))
    H = jnp.eye(2, 4)
    z = jnp.array([100.0, -100.0])  # wildly inconsistent

    mu2, P2, info = ukf.update(LIN, mu, P, z, lambda s: H @ s.x, R, gate_threshold=ukf.D2P95)
    assert not bool(info.accepted)
    np.testing.assert_allclose(mu2.x, mu.x, atol=0)
    np.testing.assert_allclose(P2, P, atol=0)

    # same inputs, accept-any (reference's accept_any_mahalanobis_distance)
    mu3, _, info3 = ukf.update(LIN, mu, P, z, lambda s: H @ s.x, R)
    assert bool(info3.accepted)
    assert float(jnp.linalg.norm(mu3.x - mu.x)) > 1.0


def test_gate_is_masked_under_vmap():
    """One bank instance rejecting while neighbours accept = masked select."""
    P = random_spd(2)
    R = jnp.eye(2) * 1e-4
    H = jnp.eye(2)
    man = mf.make_manifold(mf.Field("x", "vec", 2))

    class S(NamedTuple):
        x: jax.Array

    zs = jnp.stack([jnp.array([0.01, 0.0]), jnp.array([50.0, 50.0])])
    mus = S(x=jnp.zeros((2, 2)))

    def step(mu_x, z):
        return ukf.update(man, S(x=mu_x), P, z, lambda s: H @ s.x, R, gate_threshold=ukf.D2P95)

    mu2, _, info = jax.vmap(step)(mus.x, zs)
    assert bool(info.accepted[0]) and not bool(info.accepted[1])
    assert float(jnp.linalg.norm(mu2.x[1])) == 0.0
    assert float(jnp.linalg.norm(mu2.x[0])) > 0.0


class RotState(NamedTuple):
    rot: jax.Array


ROT = mf.make_manifold(mf.Field("rot", "so3"))


def test_predict_on_so3_consistency():
    """Identity process ⇒ mean unchanged, covariance = P + Q on SO(3)."""
    P = random_spd(3, 0.01)
    Q = 1e-4 * jnp.eye(3)
    q0 = jnp.asarray(RNG.normal(size=4))
    q0 = q0 / jnp.linalg.norm(q0)
    mu = RotState(rot=q0)

    mu2, P2 = ukf.predict(ROT, mu, P, lambda s: s, Q)
    np.testing.assert_allclose(jnp.abs(jnp.dot(mu2.rot, q0)), 1.0, atol=1e-9)
    np.testing.assert_allclose(P2, P + Q, atol=1e-6)


def test_update_s2_measurement():
    """Manifold-valued (S²) measurement pulls an S² state toward the
    measurement — the BottomUKF normal-update pattern (src/BottomUKF.cpp:63-67)."""

    class NS(NamedTuple):
        normal: jax.Array

    man = mf.make_manifold(mf.Field("normal", "s2"))
    mu = NS(normal=jnp.array([0.0, 0.0, 1.0]))
    P = 0.05 * jnp.eye(2)
    R = 1e-3 * jnp.eye(2)
    z = mf.s2_normalize(jnp.array([0.2, -0.1, 1.0]))

    mu2, P2, info = ukf.update(
        man, mu, P, z, lambda s: s.normal, R, meas_manifold=mf.S2_MANIFOLD
    )
    # posterior closer to z than prior
    assert float(jnp.dot(mu2.normal, z)) > float(jnp.dot(mu.normal, z))
    np.testing.assert_allclose(jnp.linalg.norm(mu2.normal), 1.0, atol=1e-12)
    # covariance contracted
    assert float(jnp.trace(P2)) < float(jnp.trace(P))


def test_predict_jit_matches_eager():
    A = jnp.asarray(RNG.normal(size=(4, 4)))
    P = random_spd(4)
    Q = random_spd(4, 0.1)
    mu = LinState(x=jnp.asarray(RNG.normal(size=4)))
    f = lambda s: LinState(x=A @ s.x)
    mu_e, P_e = ukf.predict(LIN, mu, P, f, Q)
    mu_j, P_j = jax.jit(lambda m, p: ukf.predict(LIN, m, p, f, Q))(mu, P)
    np.testing.assert_allclose(mu_j.x, mu_e.x, atol=1e-12)
    np.testing.assert_allclose(P_j, P_e, atol=1e-12)
