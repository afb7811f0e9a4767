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


def measurement_valid(mu, cov) -> jnp.ndarray:
    """Traced-safe validity mask: finite mean/cov and non-negative variances.

    Use as an additional gate mask in batched update paths (invalid ⇒ the
    masked update leaves the instance untouched, the batch equivalent of the
    reference's exception). Rank-aware: a ``(d,)``/``(d,d)`` measurement
    yields a scalar mask; a batched ``(B,d)``/``(B,d,d)`` bank yields a
    ``(B,)`` per-instance mask, and only the DIAGONAL of a covariance matrix
    must be non-negative (off-diagonal correlations may be negative)."""
    mu = jnp.asarray(mu)
    cov = jnp.asarray(cov)
    ok_mu = jnp.all(jnp.isfinite(mu), axis=-1) if mu.ndim else jnp.isfinite(mu)
    if cov.ndim >= 2 and cov.shape[-1] == cov.shape[-2]:
        diag = jnp.diagonal(cov, axis1=-2, axis2=-1)
        ok_cov = jnp.all(jnp.isfinite(cov), axis=(-2, -1)) & jnp.all(diag >= 0, axis=-1)
    elif cov.ndim:  # variance vector
        ok_cov = jnp.all(jnp.isfinite(cov) & (cov >= 0), axis=-1)
    else:
        ok_cov = jnp.isfinite(cov) & (cov >= 0)
    return ok_mu & ok_cov
