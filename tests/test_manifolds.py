"""Manifold axiom tests (SURVEY.md §4 item 1): boxplus/boxminus inverses,
SO(3)/S² edge cases, product-manifold covariance layout."""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_uwv_kalman_filters_tpu.ops import manifolds as mf

RNG = np.random.default_rng(42)


def random_quat(n=None):
    shape = (4,) if n is None else (n, 4)
    q = RNG.normal(size=shape)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


def random_unit3(n=None):
    shape = (3,) if n is None else (n, 3)
    v = RNG.normal(size=shape)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.asarray(v)


# ---------------------------------------------------------------------------
# quaternion / SO(3)
# ---------------------------------------------------------------------------


def test_quat_mul_identity_and_inverse():
    q = random_quat()
    e = mf.quat_identity()
    np.testing.assert_allclose(mf.quat_mul(q, e), q, atol=1e-15)
    np.testing.assert_allclose(mf.quat_mul(e, q), q, atol=1e-15)
    np.testing.assert_allclose(
        mf.quat_mul(q, mf.quat_conj(q)), e, atol=1e-15
    )


def test_quat_rotate_matches_matrix():
    q = random_quat()
    v = jnp.asarray(RNG.normal(size=3))
    np.testing.assert_allclose(mf.quat_rotate(q, v), mf.quat_to_matrix(q) @ v, atol=1e-13)
    np.testing.assert_allclose(
        mf.quat_rotate_inv(q, v), mf.quat_to_matrix(q).T @ v, atol=1e-13
    )


def test_quat_exp_log_roundtrip():
    for scale in [1e-12, 1e-6, 0.1, 1.0, 3.0]:
        v = scale * jnp.asarray(RNG.normal(size=3))
        v = v / max(1.0, float(jnp.linalg.norm(v)) / 3.1)  # keep |v| < π
        np.testing.assert_allclose(mf.quat_log(mf.quat_exp(v)), v, atol=1e-12)


def test_quat_exp_zero():
    np.testing.assert_allclose(mf.quat_exp(jnp.zeros(3)), mf.quat_identity(), atol=1e-16)
    np.testing.assert_allclose(mf.quat_log(mf.quat_identity()), jnp.zeros(3), atol=1e-16)


def test_quat_log_double_cover():
    """log(q) == log(−q): both hemispheres map to the same rotation vector."""
    q = random_quat()
    np.testing.assert_allclose(mf.quat_log(q), mf.quat_log(-q), atol=1e-14)


def test_so3_boxplus_boxminus_inverse():
    q = random_quat()
    d = jnp.asarray(RNG.normal(size=3))
    np.testing.assert_allclose(mf.so3_boxminus(mf.so3_boxplus(q, d), q), d, atol=1e-12)
    # scaled variant used throughout the reference process models
    np.testing.assert_allclose(
        mf.so3_boxminus(mf.so3_boxplus(q, d, 0.01), q), 0.01 * d, atol=1e-13
    )


def test_so3_boxminus_self_is_zero():
    q = random_quat()
    np.testing.assert_allclose(mf.so3_boxminus(q, q), jnp.zeros(3), atol=1e-14)


def test_quat_from_matrix_roundtrip():
    for _ in range(20):
        q = random_quat()
        q = jnp.where(q[0] < 0, -q, q)
        np.testing.assert_allclose(mf.quat_from_matrix(mf.quat_to_matrix(q)), q, atol=1e-16 + 1e-12)
    # near-degenerate: 180° rotations exercise every Shepperd branch
    for axis in np.eye(3):
        R = 2.0 * np.outer(axis, axis) - np.eye(3)
        q = mf.quat_from_matrix(jnp.asarray(R))
        np.testing.assert_allclose(mf.quat_to_matrix(q), R, atol=1e-12)


# ---------------------------------------------------------------------------
# S²
# ---------------------------------------------------------------------------


def test_s2_basis_orthonormal_tangent():
    for x in [random_unit3() for _ in range(10)] + [
        jnp.array([0.0, 0.0, 1.0]),
        jnp.array([0.0, 0.0, -1.0]),
        jnp.array([1.0, 0.0, 0.0]),
    ]:
        b = mf.s2_tangent_basis(x)
        np.testing.assert_allclose(b.T @ b, jnp.eye(2), atol=1e-14)
        np.testing.assert_allclose(b.T @ x, jnp.zeros(2), atol=1e-14)


def test_s2_boxplus_boxminus_inverse():
    for _ in range(20):
        x = random_unit3()
        d = 0.5 * jnp.asarray(RNG.normal(size=2))
        y = mf.s2_boxplus(x, d)
        np.testing.assert_allclose(jnp.linalg.norm(y), 1.0, atol=1e-14)
        np.testing.assert_allclose(mf.s2_boxminus(y, x), d, atol=1e-12)


def test_s2_boxminus_self_zero_and_poles():
    x = jnp.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(mf.s2_boxminus(x, x), jnp.zeros(2), atol=1e-15)
    d = jnp.array([0.3, -0.2])
    np.testing.assert_allclose(mf.s2_boxminus(mf.s2_boxplus(x, d), x), d, atol=1e-13)
    # antipode: magnitude π
    y = -x
    np.testing.assert_allclose(jnp.linalg.norm(mf.s2_boxminus(y, x)), np.pi, atol=1e-12)


# ---------------------------------------------------------------------------
# product manifold
# ---------------------------------------------------------------------------


class Demo(NamedTuple):
    pos: jax.Array  # vec 3
    rot: jax.Array  # so3
    mat: jax.Array  # mat33
    nrm: jax.Array  # s2


DEMO = mf.make_manifold(
    mf.Field("pos", "vec", 3),
    mf.Field("rot", "so3"),
    mf.Field("mat", "mat33"),
    mf.Field("nrm", "s2"),
)


def demo_point():
    return Demo(
        pos=jnp.asarray(RNG.normal(size=3)),
        rot=random_quat(),
        mat=jnp.asarray(RNG.normal(size=(3, 3))),
        nrm=random_unit3(),
    )


def test_product_dof_and_blocks():
    assert DEMO.dof == 3 + 3 + 9 + 2
    assert DEMO.block("pos") == slice(0, 3)
    assert DEMO.block("rot") == slice(3, 6)
    assert DEMO.block("mat") == slice(6, 15)
    assert DEMO.block("nrm") == slice(15, 17)


def test_product_boxplus_boxminus_inverse():
    x = demo_point()
    d = 0.3 * jnp.asarray(RNG.normal(size=DEMO.dof))
    y = DEMO.boxplus(x, d)
    np.testing.assert_allclose(DEMO.boxminus(y, x), d, atol=1e-12)
    np.testing.assert_allclose(DEMO.boxminus(x, x), jnp.zeros(DEMO.dof), atol=1e-14)


def test_mat33_column_major_layout():
    """δ is applied column-major, matching Eigen .data() maps
    (reference src/PoseUKF.cpp:45-55, src/PoseState.hpp:37-39)."""
    x = demo_point()
    d = jnp.zeros(DEMO.dof).at[6 + 1].set(1.0)  # second column-major element = (row 1, col 0)
    y = DEMO.boxplus(x, d)
    np.testing.assert_allclose(y.mat[1, 0] - x.mat[1, 0], 1.0, atol=1e-15)
    np.testing.assert_allclose(y.mat[0, 1], x.mat[0, 1], atol=1e-15)


def test_manifold_mean_euclidean_exact():
    pts = Demo(
        pos=jnp.asarray(RNG.normal(size=(7, 3))),
        rot=jnp.tile(mf.quat_identity(), (7, 1)),
        mat=jnp.asarray(RNG.normal(size=(7, 3, 3))),
        nrm=jnp.tile(jnp.array([0.0, 0.0, 1.0]), (7, 1)),
    )
    m = DEMO.mean(pts)
    np.testing.assert_allclose(m.pos, jnp.mean(pts.pos, axis=0), atol=1e-15)
    np.testing.assert_allclose(m.mat, jnp.mean(pts.mat, axis=0), atol=1e-15)


def test_manifold_mean_so3_symmetric():
    """Mean of q ⊞ δ and q ⊞ −δ is q (geodesic symmetry)."""
    q = random_quat()
    d = jnp.array([0.3, -0.2, 0.4])
    pts_rot = jnp.stack([mf.so3_boxplus(q, d), mf.so3_boxplus(q, -d), q])
    pts = Demo(
        pos=jnp.zeros((3, 3)),
        rot=pts_rot,
        mat=jnp.zeros((3, 3, 3)),
        nrm=jnp.tile(jnp.array([0.0, 0.0, 1.0]), (3, 1)),
    )
    m = DEMO.mean(pts)
    np.testing.assert_allclose(jnp.abs(jnp.dot(m.rot, q)), 1.0, atol=1e-9)


def test_boxplus_jit_vmap():
    x = demo_point()
    ds = jnp.asarray(RNG.normal(size=(5, DEMO.dof))) * 0.1
    batched = jax.jit(jax.vmap(lambda d: DEMO.boxplus(x, d)))(ds)
    single = DEMO.boxplus(x, ds[2])
    np.testing.assert_allclose(batched.rot[2], single.rot, atol=1e-14)
    np.testing.assert_allclose(batched.mat[2], single.mat, atol=1e-14)
