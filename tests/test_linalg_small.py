"""Unrolled small-matrix solver tests: exactness vs LAPACK, batch behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_uwv_kalman_filters_tpu.ops import linalg_small as ls

RNG = np.random.default_rng(17)


def spd(m, scale=1.0):
    a = RNG.normal(size=(m, m))
    return jnp.asarray(scale * (a @ a.T + m * np.eye(m)))


def test_cholesky_unrolled_matches_lapack():
    for m in [1, 2, 3, 6, 8]:
        S = spd(m)
        np.testing.assert_allclose(
            np.asarray(ls.cholesky_unrolled(S)), np.linalg.cholesky(np.asarray(S)), atol=1e-10
        )


def test_solve_spd_matches_lapack():
    for m in [1, 2, 3, 6]:
        S = spd(m)
        B = jnp.asarray(RNG.normal(size=(m, 5)))
        np.testing.assert_allclose(
            np.asarray(ls.solve_spd(S, B)), np.linalg.solve(np.asarray(S), np.asarray(B)), atol=1e-9
        )
        b = jnp.asarray(RNG.normal(size=m))
        np.testing.assert_allclose(
            np.asarray(ls.solve_spd(S, b)), np.linalg.solve(np.asarray(S), np.asarray(b)), atol=1e-9
        )


def test_solve_spd_large_fallback():
    S = spd(12)
    B = jnp.asarray(RNG.normal(size=(12, 3)))
    np.testing.assert_allclose(
        np.asarray(ls.solve_spd(S, B)), np.linalg.solve(np.asarray(S), np.asarray(B)), atol=1e-9
    )


def test_solve_spd_vmap_jit():
    S = jnp.stack([spd(3) for _ in range(7)])
    B = jnp.asarray(RNG.normal(size=(7, 3, 4)))
    out = jax.jit(jax.vmap(ls.solve_spd))(S, B)
    for i in range(7):
        np.testing.assert_allclose(
            np.asarray(out[i]), np.linalg.solve(np.asarray(S[i]), np.asarray(B[i])), atol=1e-9
        )
