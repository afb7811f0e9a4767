"""Measurement validation — the ``pose_estimation`` base-class
``checkMeasurment(mu, cov)`` equivalent (called before every update in the
reference, e.g. ``/root/reference/src/PoseUKF.cpp:478``).

Host-side (eager) checks for the object-style filter APIs; the batched/jitted
paths cannot raise on traced values, so there :func:`measurement_valid` returns
a boolean usable as an update mask instead.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["check_measurement", "measurement_valid"]


def check_measurement(mu, cov) -> None:
    """Raise ValueError on NaN/Inf or on a non-PSD-looking covariance.

    Mirrors the reference's fail-fast behavior (std::runtime_error) for the
    single-instance API. Only call with concrete (non-traced) values.
    """
    mu = np.asarray(mu)
    cov = np.asarray(cov)
    if not np.all(np.isfinite(mu)):
        raise ValueError(f"measurement mean contains NaN/Inf: {mu}")
    if not np.all(np.isfinite(cov)):
        raise ValueError(f"measurement covariance contains NaN/Inf: {cov}")
    if cov.ndim == 2:
        if not np.allclose(cov, cov.T, atol=1e-9 * max(1.0, float(np.abs(cov).max()))):
            raise ValueError("measurement covariance is not symmetric")
        if np.any(np.diag(cov) < 0):
            raise ValueError("measurement covariance has negative variance")
    elif np.any(cov < 0):  # variance vector / scalar
        raise ValueError("measurement covariance has negative variance")


def measurement_valid(mu, cov, *, banked: bool | None = None) -> jnp.ndarray:
    """Traced-safe validity mask: finite mean/cov and non-negative variances.

    Use as an additional gate mask in batched update paths (invalid ⇒ the
    masked update leaves the instance untouched, the batch equivalent of the
    reference's exception). A single ``(d,)`` measurement yields a scalar
    mask; a batched ``(B,d)`` bank yields a ``(B,)`` per-instance mask. Only
    the DIAGONAL of a covariance matrix must be non-negative (off-diagonal
    correlations may be negative).

    ``banked`` disambiguates shapes that rank alone cannot: by default the
    MEAN's rank decides (``mu.ndim >= 2`` ⇒ banked), so a ``(B,)`` bank of
    scalar measurements needs an explicit ``banked=True`` or its mask would
    collapse to one bool for the whole bank. A ``(B,d)`` covariance is read
    as per-instance variance vectors whenever its shape equals ``mu``'s —
    including the ``B == d`` case a bare square-shape test would misroute to
    the shared-matrix branch, silently skipping per-instance negativity
    checks."""
    mu = jnp.asarray(mu)
    cov = jnp.asarray(cov)
    if banked is None:
        banked = mu.ndim >= 2
    bank_axes = 1 if banked else 0

    ok_mu = jnp.all(jnp.isfinite(mu), axis=tuple(range(bank_axes, mu.ndim)))

    def matrix_ok(c):
        diag = jnp.diagonal(c, axis1=-2, axis2=-1)
        return jnp.all(jnp.isfinite(c), axis=(-2, -1)) & jnp.all(diag >= 0, axis=-1)

    def variances_ok(c, axes):
        return jnp.all(jnp.isfinite(c) & (c >= 0), axis=axes)

    scalar_meas = mu.ndim <= bank_axes  # measurement dim d absent (scalar z)
    if banked:
        b = mu.shape[0]
        if cov.ndim == 3:  # (B, d, d) per-instance matrices
            ok_cov = matrix_ok(cov)
        elif cov.ndim == 2 and not scalar_meas and cov.shape == mu.shape:
            ok_cov = variances_ok(cov, -1)  # (B, d) per-instance variance vectors
        elif cov.ndim == 2:  # shared (d, d) matrix for the whole bank
            ok_cov = matrix_ok(cov)
        elif cov.ndim == 1 and scalar_meas and cov.shape[0] == b:
            ok_cov = variances_ok(cov, ())  # (B,) per-instance scalar variances
        elif cov.ndim == 1:  # shared (d,) variance vector
            ok_cov = variances_ok(cov, -1)
        else:  # shared scalar variance
            ok_cov = variances_ok(cov, ())
    else:
        if cov.ndim == 2:
            ok_cov = matrix_ok(cov)
        elif cov.ndim == 1:
            ok_cov = variances_ok(cov, -1)
        else:
            ok_cov = variances_ok(cov, ())
    return ok_mu & ok_cov
