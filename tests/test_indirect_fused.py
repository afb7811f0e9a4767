"""Fused IndirectPoseUKF kernel (models/indirect_fused.py) vs the generic path.

Interpret-mode Pallas on CPU pinned against ``vmap`` of the generic
``indirect_pose_ukf`` functions (oracle-pinned by
tests/test_indirect_pose_ukf.py). The marker update chains K S²-valued
corner updates on a VMEM-resident 12-DOF augmented state; the synthetic
measurements here are deliberately inconsistent (large NIS), so the
corrections are strong and tolerances are RELATIVE."""

import numpy as np
import jax
import jax.numpy as jnp

from slam_uwv_kalman_filters_tpu.models import indirect_fused as ifu
from slam_uwv_kalman_filters_tpu.models import indirect_pose_ukf as ipu
from slam_uwv_kalman_filters_tpu.ops import manifolds as mf
from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod
from slam_uwv_kalman_filters_tpu.utils.config import CameraConfiguration

RNG = np.random.default_rng(21)


def _bank(nb, dtype=jnp.float32):
    state, params = ipu.init((0.05,) * 3, (0.02,) * 3, 30.0, dtype=dtype)
    q = mf.quat_exp(jnp.asarray([0.03, -0.02, 0.05], dtype))
    state = state._replace(
        mu=state.mu._replace(
            position_error=jnp.asarray([0.2, -0.1, 0.05], dtype), orientation_error=q
        ),
        pose_ref_position=jnp.asarray([1.0, 2.0, -3.0], dtype),
        pose_ref_orientation=mf.quat_exp(jnp.asarray([0.1, 0.2, -0.3], dtype)).astype(dtype),
    )
    a = RNG.normal(size=(6, 6)) * 0.02
    state = state._replace(cov=jnp.asarray(a @ a.T + 0.01 * np.eye(6), dtype))
    bstate = bankmod.replicate(state, nb)
    pe = bstate.mu.position_error + jnp.asarray(RNG.normal(scale=0.02, size=(nb, 3)), dtype)
    return bstate._replace(mu=bstate.mu._replace(position_error=pe)), params


def _marker_args(dtype=jnp.float32, k=4):
    cam = CameraConfiguration()
    feats = jnp.asarray(RNG.normal(loc=[320, 240], scale=60, size=(k, 2)), dtype)
    fcovs = jnp.broadcast_to(jnp.eye(2, dtype=dtype) * 4.0, (k, 2, 2))
    fpos = jnp.asarray(
        [[0.1, 0.1, 0], [-0.1, 0.1, 0], [-0.1, -0.1, 0], [0.1, -0.1, 0]][:k], dtype
    )
    mpos = jnp.asarray([2.0, 0.1, 1.0], dtype)
    mq = mf.quat_exp(jnp.asarray([0.0, 0.05, -0.1], dtype)).astype(dtype)
    cmp_ = jnp.eye(6, dtype=dtype) * 1e-4
    cam_p = jnp.asarray([0.1, 0.0, 0.05], dtype)
    cam_q = mf.quat_exp(jnp.asarray([0.01, -0.02, 0.03], dtype)).astype(dtype)
    return (feats, fcovs, fpos, mpos, mq, cmp_, cam, cam_p, cam_q)


def test_lanes_round_trip():
    bstate, _ = _bank(5)
    back = ifu.from_lanes(ifu.to_lanes(bstate), bstate)
    for a, b in zip(jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(bstate)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predict_lanes_matches_generic():
    """Fused predict == vmap(predict): the τ-decay process model through the
    quaternion log/exp, the per-instance error-rotated Q and the SO(3)
    Karcher mean."""
    bstate, params = _bank(6)
    gen = jax.vmap(lambda s: ipu.predict(s, params, 0.1))(bstate)
    fus = ifu.from_lanes(
        ifu.predict_lanes(ifu.to_lanes(bstate), params, 0.1, interpret=True), bstate
    )
    np.testing.assert_allclose(
        np.asarray(fus.mu.position_error), np.asarray(gen.mu.position_error), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(fus.mu.orientation_error), np.asarray(gen.mu.orientation_error), atol=2e-6
    )
    np.testing.assert_allclose(np.asarray(fus.cov), np.asarray(gen.cov), atol=2e-6)


def test_update_markers_matches_generic():
    """Fused marker update == vmap(update_markers): 12-DOF augmentation,
    K chained pinhole-bearing S² updates, marginalization — one launch."""
    nb = 4
    bstate, params = _bank(nb)
    args = _marker_args()
    gen = jax.vmap(lambda s: ipu.predict(s, params, 0.1))(bstate)
    gu, gi = jax.vmap(lambda s: ipu.update_markers(s, *args))(gen)
    ls = ifu.predict_lanes(ifu.to_lanes(bstate), params, 0.1, interpret=True)
    ls2, fi = ifu.update_markers_lanes(ls, *args, nb=nb, interpret=True)
    fu = ifu.from_lanes(ls2, bstate)
    # corrections here are ~2 m (deliberately inconsistent measurements) —
    # relative tolerances
    np.testing.assert_allclose(
        np.asarray(fu.mu.position_error), np.asarray(gu.mu.position_error),
        rtol=2e-4, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fu.mu.orientation_error), np.asarray(gu.mu.orientation_error), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(fu.cov), np.asarray(gu.cov), rtol=2e-3, atol=2e-6)
    assert gi.mahalanobis2.shape == fi.mahalanobis2.shape == (nb, 4)
    np.testing.assert_allclose(
        np.asarray(fi.mahalanobis2), np.asarray(gi.mahalanobis2), rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(fi.innovation), np.asarray(gi.innovation), atol=2e-4
    )


def test_update_markers_per_instance_features():
    """Per-instance (B, K, 2) pixel features route through the same kernel;
    instances with different measurements get different corrections."""
    nb = 3
    bstate, params = _bank(nb)
    feats, fcovs, fpos, mpos, mq, cmp_, cam, cam_p, cam_q = _marker_args()
    featsb = jnp.asarray(
        np.asarray(feats)[None] + RNG.normal(scale=5.0, size=(nb, 4, 2)), jnp.float32
    )
    gen = jax.vmap(lambda s: ipu.predict(s, params, 0.1))(bstate)
    gu, _ = jax.vmap(
        lambda s, f: ipu.update_markers(s, f, fcovs, fpos, mpos, mq, cmp_, cam, cam_p, cam_q)
    )(gen, featsb)
    ls = ifu.predict_lanes(ifu.to_lanes(bstate), params, 0.1, interpret=True)
    ls2, _ = ifu.update_markers_lanes(
        ls, featsb, fcovs, fpos, mpos, mq, cmp_, cam, cam_p, cam_q, nb=nb, interpret=True
    )
    fu = ifu.from_lanes(ls2, bstate)
    np.testing.assert_allclose(
        np.asarray(fu.mu.position_error), np.asarray(gu.mu.position_error),
        rtol=2e-4, atol=5e-4,
    )
    assert not np.allclose(
        np.asarray(fu.mu.position_error[0]), np.asarray(fu.mu.position_error[1])
    )


def test_bank_dispatch_fused_matches_generic():
    """indirect_pose_ukf.predict_bank / update_markers_bank parity between
    their fused (interpret) and generic routes."""
    nb = 4
    bstate, params = _bank(nb)
    args = _marker_args()
    gen = ipu.predict_bank(bstate, params, 0.1, use_fused=False)
    fus = ifu.predict_fused_banked(bstate, params, 0.1, interpret=True)
    np.testing.assert_allclose(np.asarray(fus.cov), np.asarray(gen.cov), atol=2e-6)
    gu, _ = ipu.update_markers_bank(gen, *args, use_fused=False)
    fu, _ = ifu.update_markers_fused_banked(gen, *args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fu.mu.position_error), np.asarray(gu.mu.position_error),
        rtol=2e-4, atol=5e-4,
    )
    np.testing.assert_allclose(np.asarray(fu.cov), np.asarray(gu.cov), rtol=2e-3, atol=2e-6)


def test_update_markers_bank_per_instance_marker_pose_generic_route():
    """The generic (vmap) route of update_markers_bank accepts per-instance
    (B,3)/(B,4) marker poses, same as the fused path (regression: it used to
    close over the full arrays unmapped and broke the manifold algebra)."""
    nb = 2
    bstate, params = _bank(nb)
    feats, fcovs, fpos, mpos, mq, cmp_, cam, cam_p, cam_q = _marker_args()
    mposb = jnp.stack([mpos, mpos + 0.5])
    mqb = jnp.stack([mq, mq])
    gen = ipu.predict_bank(bstate, params, 0.1, use_fused=False)
    out, _ = ipu.update_markers_bank(
        gen, feats, fcovs, fpos, mposb, mqb, cmp_, cam, cam_p, cam_q, use_fused=False
    )
    ref0, _ = ipu.update_markers(
        jax.tree_util.tree_map(lambda a: a[0], gen), feats, fcovs, fpos,
        mpos, mq, cmp_, cam, cam_p, cam_q,
    )
    np.testing.assert_allclose(
        np.asarray(out.mu.position_error[0]), np.asarray(ref0.mu.position_error), atol=1e-6
    )
    assert not np.allclose(
        np.asarray(out.mu.position_error[0]), np.asarray(out.mu.position_error[1])
    )


def test_update_markers_lanes_bank_of_one_nb_inference():
    """Per-instance features with a bank of 1 infer nb=1 (regression: the
    old inference fell back to the padded width and returned 127 pad-lane
    rows in the UpdateInfo)."""
    bstate, params = _bank(1)
    feats, fcovs, fpos, mpos, mq, cmp_, cam, cam_p, cam_q = _marker_args()
    ls = ifu.predict_lanes(ifu.to_lanes(bstate), params, 0.1, interpret=True)
    _, info = ifu.update_markers_lanes(
        ls, feats[None], fcovs[None], fpos, mpos, mq, cmp_, cam, cam_p, cam_q,
        interpret=True,
    )
    assert info.mahalanobis2.shape == (1, 4)


def test_predict_bank_tau_sweep():
    """A per-instance orientation_error_tau sweep (shared Q) routes to the
    per-instance vmap and matches per-instance calls."""
    nb = 3
    bstate, params = _bank(nb)
    taus = jnp.asarray([10.0, 30.0, 90.0], jnp.float32)
    out = ipu.predict_bank(bstate, params._replace(orientation_error_tau=taus), 0.1)
    ref = jax.vmap(
        lambda s, t: ipu.predict(s, params._replace(orientation_error_tau=t), 0.1)
    )(bstate, taus)
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), atol=1e-7)
    assert not np.allclose(np.asarray(out.cov[0]), np.asarray(out.cov[2]))
