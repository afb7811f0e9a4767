"""Unscented RTS smoother for PoseUKF trajectories — offline reprocessing.

The reference library is a pure forward filter; survey post-processing (the
dominant offline workflow for AUV localization data) needs the smoothed
estimate ``p(x_k | z_{1:T})``. This module adds the manifold unscented
Rauch–Tung–Striebel smoother (``ops.ukf.smooth_step``) on top of the existing
replay driver:

* forward: the standard :func:`models.pose_driver.pose_step` scan, storing
  every filtered posterior (μₖ, Pₖ);
* backward: a reverse ``lax.scan`` re-running the tick-(k+1) transition
  (same rotation-rate input, dt and state-dependent Q as the forward pass —
  ``pose_ukf.assemble_process_noise`` is shared) and blending with the
  already-smoothed next state.

Memory: the forward pass stores T × (54-value state + 53×53 covariance)
≈ T · 23 KB in f64 (11.5 KB f32), and :class:`SmoothedTrajectory` holds the
smoothed copies too — budget ~46 KB/tick f64 end to end. Minutes-scale
missions fit comfortably; smooth longer logs in overlapping windows. Both
passes jit-compile once and ``vmap`` over trajectory banks for fleet-scale
reprocessing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import ukf
from . import pose_driver
from . import pose_ukf as pukf

__all__ = ["SmoothedTrajectory", "run_trajectory_smoothed", "smooth_backward"]


class SmoothedTrajectory(NamedTuple):
    """Per-tick filtered and smoothed estimates (leading time axis)."""

    filtered_mu: pukf.PoseState
    filtered_cov: jax.Array  # (T, 53, 53)
    smoothed_mu: pukf.PoseState
    smoothed_cov: jax.Array  # (T, 53, 53)


def smooth_backward(
    filtered_mu: pukf.PoseState,
    filtered_cov: jax.Array,
    params: pukf.PoseUKFParams,
    inputs: pose_driver.PoseInputs,
) -> tuple[pukf.PoseState, jax.Array]:
    """Backward URTS pass over stored filtered posteriors.

    ``filtered_mu``/``filtered_cov`` carry the post-update state of every
    tick (leading time axis T); ``inputs`` is the same schedule the forward
    pass consumed — the k→k+1 transition re-uses ``inputs[k+1]``'s
    rotation rate and dt exactly as :func:`pose_driver.pose_step` did."""
    take = lambda tree, i: jax.tree_util.tree_map(lambda a: a[i], tree)
    last_mu = take(filtered_mu, -1)
    last_cov = filtered_cov[-1]

    def bstep(carry, xs):
        mu_s_next, cov_s_next = carry
        mu_f, cov_f, rr_next, dt_next = xs
        q = pukf.assemble_process_noise(mu_f, params, dt_next)
        mu_s, cov_s = ukf.smooth_step(
            pukf.POSE_MANIFOLD,
            mu_f,
            cov_f,
            lambda chi: pukf._process_model(chi, rr_next, params, dt_next),
            q,
            mu_s_next,
            cov_s_next,
        )
        return (mu_s, cov_s), (mu_s, cov_s)

    xs = (
        jax.tree_util.tree_map(lambda a: a[:-1], filtered_mu),
        filtered_cov[:-1],
        inputs.rotation_rate[1:],
        inputs.dt[1:],
    )
    _, (smus, scovs) = jax.lax.scan(bstep, (last_mu, last_cov), xs, reverse=True)
    # the final tick is its own smoothed estimate
    smoothed_mu = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b[None]], axis=0), smus, last_mu
    )
    smoothed_cov = jnp.concatenate([scovs, last_cov[None]], axis=0)
    return smoothed_mu, smoothed_cov


def run_trajectory_smoothed(
    state: pukf.PoseUKFState,
    params: pukf.PoseUKFParams,
    inputs: pose_driver.PoseInputs,
) -> SmoothedTrajectory:
    """Forward filter + backward smooth over a packed sensor schedule."""

    def fstep(s, inp):
        s, _ = pose_driver.pose_step(s, params, inp)
        return s, (s.mu, s.cov)

    _, (mus, covs) = jax.lax.scan(fstep, state, inputs)
    smus, scovs = smooth_backward(mus, covs, params, inputs)
    return SmoothedTrajectory(
        filtered_mu=mus, filtered_cov=covs, smoothed_mu=smus, smoothed_cov=scovs
    )
