"""Fused-predict fast path (models/pose_fused.py) vs the generic predict.

Runs the full two-launch Pallas pipeline in interpret mode on CPU (the same
code path that compiles on TPU) and asserts the predicted mean/covariance
match ``vmap(pose_ukf.predict)`` to f32 accuracy on a heterogeneous bank.
"""

import jax
import jax.numpy as jnp
import numpy as np

from slam_uwv_kalman_filters_tpu.models import pose_fused, pose_ukf as pukf
from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn, manifolds as mf
from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod
from slam_uwv_kalman_filters_tpu.utils.config import default_pose_ukf_config

RNG = np.random.default_rng(77)


def _make_bank(n, dtype=jnp.float32):
    cfg = default_pose_ukf_config()
    model = dyn.default_uwv_parameters(dtype=dtype)
    state, params = pukf.init_from_pose(
        imu_in_nwu_pos=jnp.zeros(3, dtype),
        imu_in_nwu_pos_cov=jnp.eye(3, dtype=dtype) * 0.04,
        imu_in_nwu_rot=jnp.array([1.0, 0, 0, 0], dtype),
        imu_in_nwu_rot_cov=jnp.eye(3, dtype=dtype) * 1e-4,
        config=cfg,
        model_parameters=model,
        imu_delta_t=0.01,
        dtype=dtype,
    )
    bstate = bankmod.replicate(state, n)
    # heterogeneous bank: perturb position/velocity/orientation per instance
    mu = bstate.mu._replace(
        position=bstate.mu.position + jnp.asarray(RNG.normal(scale=1.0, size=(n, 3)), dtype),
        velocity=bstate.mu.velocity + jnp.asarray(RNG.normal(scale=0.3, size=(n, 3)), dtype),
        orientation=jax.vmap(lambda q, v: mf.so3_boxplus(q, v))(
            bstate.mu.orientation, jnp.asarray(RNG.normal(scale=0.2, size=(n, 3)), dtype)
        ),
    )
    rr = jnp.asarray(RNG.normal(scale=0.05, size=(n, 3)), dtype)
    return bstate._replace(mu=mu, rotation_rate=rr), params


def test_fused_predict_matches_generic():
    bstate, params = _make_bank(3)
    dt = 0.1
    ref = jax.vmap(lambda s: pukf.predict(s, params, dt))(bstate)
    out = pose_fused.predict_fused_banked(bstate, params, dt, interpret=True)

    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), rtol=2e-4, atol=3e-6)
    for name in pukf.PoseState._fields:
        a, b = np.asarray(getattr(out.mu, name)), np.asarray(getattr(ref.mu, name))
        if name == "orientation":  # compare up to quaternion sign
            b = np.where(np.sum(a * b, axis=-1, keepdims=True) < 0, -b, b)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5, err_msg=name)
    # exact symmetry by construction (generic path needs an explicit symmetrize)
    c = np.asarray(out.cov)
    np.testing.assert_array_equal(c, np.swapaxes(c, -1, -2))


def test_fused_predict_pads_nonlane_bank():
    bstate, params = _make_bank(2)
    out = pose_fused.predict_fused_banked(bstate, params, 0.05, interpret=True)
    ref = jax.vmap(lambda s: pukf.predict(s, params, 0.05))(bstate)
    assert out.cov.shape == (2, 53, 53)
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), rtol=2e-4, atol=3e-6)


def test_fused_predict_chain_stays_consistent():
    """Several chained fused steps track the generic path (error growth is
    bounded by f32 roundoff, not systematic divergence)."""
    bstate, params = _make_bank(2)
    a, b = bstate, bstate
    for _ in range(5):
        a = pose_fused.predict_fused_banked(a, params, 0.02, interpret=True)
        b = jax.vmap(lambda s: pukf.predict(s, params, 0.02))(b)
    np.testing.assert_allclose(np.asarray(a.mu.position), np.asarray(b.mu.position), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov), rtol=1e-3, atol=1e-5)


def test_fused_update_matches_generic():
    """Fused update tail (models/pose_update_fused.py, interpret mode) equals
    vmap(ukf.update) for the DVL velocity model, including the gate."""
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused
    from slam_uwv_kalman_filters_tpu.ops import ukf

    bstate, params = _make_bank(3)
    n = 3
    z = jnp.asarray(RNG.normal(scale=0.3, size=(n, 3)), jnp.float32)
    r = jnp.eye(3, dtype=jnp.float32) * 1e-3
    h = lambda s: mf.quat_rotate_inv(s.orientation, s.velocity)

    out, info = pose_update_fused.update_fused_banked(
        bstate, params, z, r, h, ("orientation", "velocity"), None, interpret=True
    )
    ref_s, ref_info = pukf.update_velocity(
        jax.tree_util.tree_map(lambda a: a[0], bstate), params, z[0], r
    )
    np.testing.assert_allclose(np.asarray(out.cov[0]), np.asarray(ref_s.cov), rtol=5e-3, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out.mu.velocity[0]), np.asarray(ref_s.mu.velocity), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(info.mahalanobis2[0]), float(ref_info.mahalanobis2), rtol=1e-3
    )
    # gate: absurd measurement must be rejected and leave the state untouched
    z_bad = jnp.full((n, 3), 1e4, jnp.float32)
    out2, info2 = pose_update_fused.update_fused_banked(
        bstate, params, z_bad, r, h, ("orientation", "velocity"), 5.991, interpret=True
    )
    assert not bool(info2.accepted[0])
    np.testing.assert_allclose(np.asarray(out2.cov), np.asarray(bstate.cov), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out2.mu.position), np.asarray(bstate.mu.position), atol=0
    )


def test_update_bank_dispatcher_generic_path():
    bstate, params = _make_bank(2)
    z = jnp.asarray(RNG.normal(scale=0.3, size=(2, 3)), jnp.float32)
    r = jnp.eye(3, dtype=jnp.float32) * 1e-3
    out, info = pukf.update_velocity_bank(bstate, params, z, r, use_fused=False)
    ref = jax.vmap(lambda s, zz: pukf.update_velocity(s, params, zz, r)[0])(bstate, z)
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), atol=1e-7)
