"""Pallas kernel tests — run in interpret mode on CPU (same code path that
compiles on TPU) and verified against LAPACK."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_uwv_kalman_filters_tpu.ops import kernels

RNG = np.random.default_rng(31)


def random_spd_batch(nb, n, cond_spread=True):
    out = np.zeros((nb, n, n))
    for i in range(nb):
        a = RNG.normal(size=(n, n))
        out[i] = a @ a.T + n * np.eye(n)
        if cond_spread and i % 3 == 0:
            # wide eigenvalue spread like the real PoseUKF covariance
            d = np.diag(10.0 ** RNG.uniform(-6, 1, n))
            out[i] = d @ out[i] @ d
    return jnp.asarray(out)


def test_cholesky_banked_matches_lapack_53():
    covs = random_spd_batch(8, 53)
    out = kernels.cholesky_banked(covs, force_pallas=True)  # interpret mode on CPU
    ref = np.linalg.cholesky(np.asarray(covs))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10, atol=1e-10)
    # strictly lower triangular zeros
    assert np.allclose(np.triu(np.asarray(out)[0], 1), 0.0)


def test_cholesky_banked_pads_nonmultiple_batch():
    covs = random_spd_batch(5, 53)  # not a lane multiple
    out = kernels.cholesky_banked(covs, force_pallas=True)
    assert out.shape == (5, 53, 53)
    np.testing.assert_allclose(np.asarray(out), np.linalg.cholesky(np.asarray(covs)), atol=1e-10)


def test_cholesky_banked_small_sizes_unrolled():
    for n in [2, 4, 6]:
        covs = random_spd_batch(3, n, cond_spread=False)
        out = kernels.cholesky_banked(covs)
        np.testing.assert_allclose(
            np.asarray(out), np.linalg.cholesky(np.asarray(covs)), atol=1e-10
        )


def test_cholesky_fast_vmap_routes_to_banked():
    covs = random_spd_batch(4, 53)
    out = jax.jit(jax.vmap(kernels.cholesky_fast))(covs)
    np.testing.assert_allclose(np.asarray(out), np.linalg.cholesky(np.asarray(covs)), atol=1e-10)
    # single (unbatched) call works too
    one = kernels.cholesky_fast(covs[0])
    np.testing.assert_allclose(np.asarray(one), np.linalg.cholesky(np.asarray(covs[0])), atol=1e-10)


def test_ukf_predict_unchanged_by_kernel_path():
    """Filter results are bit-comparable with the kernel-backed cholesky."""
    from typing import NamedTuple

    from slam_uwv_kalman_filters_tpu.ops import manifolds as mf
    from slam_uwv_kalman_filters_tpu.ops import ukf

    class S(NamedTuple):
        x: jax.Array

    man = mf.make_manifold(mf.Field("x", "vec", 12))
    P = random_spd_batch(1, 12, cond_spread=False)[0]
    Q = 0.01 * jnp.eye(12)
    mu = S(x=jnp.zeros(12))
    A = jnp.asarray(RNG.normal(size=(12, 12)))
    mu2, P2 = ukf.predict(man, mu, P, lambda s: S(x=A @ s.x), Q)
    np.testing.assert_allclose(np.asarray(P2), np.asarray(A @ P @ A.T + Q), atol=1e-8)


def test_sigma_deltas_banked_matches_composition():
    """The fused Pallas path (interpret mode) must equal chol + ±interleave."""
    covs = random_spd_batch(6, 53)
    fused = kernels.sigma_deltas_banked(covs, force_pallas=True)
    L = np.linalg.cholesky(np.asarray(covs))
    assert fused.shape == (6, 107, 53)
    np.testing.assert_allclose(np.asarray(fused)[:, 0], 0.0, atol=0)
    for j in range(53):
        np.testing.assert_allclose(np.asarray(fused)[:, 2 * j + 1], L[:, :, j], rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(fused)[:, 2 * j + 2], -L[:, :, j], rtol=1e-9, atol=1e-9)
    # covariance-consistency identity: ½ Σ δδᵀ == P
    d = np.asarray(fused)
    recon = 0.5 * np.einsum("bkn,bkm->bnm", d, d)
    np.testing.assert_allclose(recon, np.asarray(covs), rtol=1e-7, atol=1e-8)


def test_solve_spd_banked_matches_numpy():
    """Fused Pallas Cholesky + triangular solves (interpret mode) vs LAPACK,
    including ill-conditioned inputs and a non-lane-multiple bank."""
    for nb in (5, 8):
        spd = random_spd_batch(nb, 53)
        rhs = jnp.asarray(RNG.normal(size=(nb, 53, 7)))
        out = kernels.solve_spd_banked(spd, rhs, force_pallas=True)
        ref = np.linalg.solve(np.asarray(spd), np.asarray(rhs))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-8, atol=1e-8)
    # vmap routing
    out2 = jax.jit(jax.vmap(kernels.solve_spd_fast))(spd, rhs)
    np.testing.assert_allclose(np.asarray(out2), ref, rtol=1e-6, atol=1e-7)


def test_banked_ops_skip_pallas_for_f64(monkeypatch):
    """f64 banks on a TPU-default host must take the library path — Mosaic
    cannot lower f64 (regression: the use_pallas gates checked backend and
    bank size but never dtype, so an x64 oracle run on TPU hardware crashed
    in lowering). Simulated by forcing _on_tpu() True on CPU: with the dtype
    gate the Pallas branch is never entered."""
    from slam_uwv_kalman_filters_tpu.ops import kernels

    monkeypatch.setattr(kernels, "_on_tpu", lambda: True)
    rng = np.random.default_rng(7)
    a = rng.normal(size=(130, 12, 12))
    spd = jnp.asarray(a @ np.transpose(a, (0, 2, 1)) + 10 * np.eye(12))
    assert spd.dtype == jnp.float64

    L = kernels.cholesky_banked(spd)
    np.testing.assert_allclose(
        np.asarray(L @ np.transpose(L, (0, 2, 1))), np.asarray(spd), rtol=1e-9, atol=1e-9
    )
    deltas = kernels.sigma_deltas_banked(spd)
    assert deltas.shape == (130, 25, 12)
    rhs = jnp.asarray(rng.normal(size=(130, 12, 2)))
    x = kernels.solve_spd_banked(spd, rhs)
    np.testing.assert_allclose(np.asarray(spd @ x), np.asarray(rhs), atol=1e-8)
