"""Fused VelocityUKF kernel (models/velocity_fused.py) vs the generic path.

Runs the Pallas kernel in interpret mode on CPU (same code path the TPU
executes) and pins it against ``vmap`` of the generic ``velocity_ukf``
functions — the small-filter twin of tests/test_pose_fused.py. The generic
path itself is oracle-pinned by tests/test_velocity_ukf.py, so parity here
transitively pins the kernel to the reference semantics
(``/root/reference/src/VelocityUKF.cpp``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_uwv_kalman_filters_tpu.models import velocity_fused as vf
from slam_uwv_kalman_filters_tpu.models import velocity_ukf as vukf
from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn
from slam_uwv_kalman_filters_tpu.ops import manifolds as mf
from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod

RNG = np.random.default_rng(7)


def _bank(nb, dtype=jnp.float32):
    """A non-trivial f32 bank: random SPD covariance, rotated tracker,
    nonzero effort/gyro caches, per-instance velocity spread."""
    mu = vukf.VelocityState(
        velocity=jnp.asarray(RNG.normal(scale=0.4, size=3), dtype),
        z_position=jnp.asarray([2.0], dtype),
    )
    a = RNG.normal(size=(4, 4)) * 0.1
    cov = jnp.asarray(a @ a.T + 0.05 * np.eye(4), dtype)
    state, params = vukf.init(mu, cov, dyn.default_uwv_parameters(dtype))
    state = vukf.integrate_body_efforts(
        state, jnp.asarray([60.0, 5.0, -3.0, 0.5, 0.0, 1.0], dtype)
    )
    state = vukf.integrate_gyro(state, jnp.asarray([0.02, -0.01, 0.05], dtype))
    q = mf.quat_exp(jnp.asarray([0.2, -0.3, 0.5], dtype))
    state = state._replace(model_state=state.model_state._replace(orientation=q))
    bstate = bankmod.replicate(state, nb)
    vel = bstate.mu.velocity + jnp.asarray(RNG.normal(scale=0.05, size=(nb, 3)), dtype)
    return bstate._replace(mu=bstate.mu._replace(velocity=vel)), params


def test_lanes_round_trip():
    """to_lanes/from_lanes is the identity (incl. non-multiple-of-128 pad)."""
    bstate, _ = _bank(5)
    back = vf.from_lanes(vf.to_lanes(bstate), bstate)
    for a, b in zip(jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(bstate)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predict_lanes_matches_generic():
    """Fused predict == vmap(predict) to f32 accuracy: state mean, covariance
    AND the orientation tracker's full kinematic advance."""
    bstate, params = _bank(6)
    gen = jax.vmap(lambda s: vukf.predict(s, params, 0.05))(bstate)
    fus = vf.from_lanes(vf.predict_lanes(vf.to_lanes(bstate), params, 0.05, interpret=True), bstate)
    np.testing.assert_allclose(np.asarray(fus.mu.velocity), np.asarray(gen.mu.velocity), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(fus.mu.z_position), np.asarray(gen.mu.z_position), atol=2e-6
    )
    np.testing.assert_allclose(np.asarray(fus.cov), np.asarray(gen.cov), atol=2e-6)
    for field in ("position", "orientation", "linear_velocity", "angular_velocity"):
        np.testing.assert_allclose(
            np.asarray(getattr(fus.model_state, field)),
            np.asarray(getattr(gen.model_state, field)),
            atol=2e-6,
        )
    # inputs pass through untouched
    np.testing.assert_array_equal(np.asarray(fus.body_efforts), np.asarray(bstate.body_efforts))
    np.testing.assert_array_equal(
        np.asarray(fus.angular_velocity), np.asarray(bstate.angular_velocity)
    )


@pytest.mark.parametrize(
    "model,dim,field",
    [("dvl", 3, "velocity"), ("pressure", 1, "z_position")],
)
def test_update_lanes_matches_generic(model, dim, field):
    """Fused linear-measurement updates == vmap(ukf.update) to f32 accuracy,
    including the UpdateInfo record (NIS / innovation)."""
    nb = 4
    bstate, params = _bank(nb)
    gen_pred = jax.vmap(lambda s: vukf.predict(s, params, 0.05))(bstate)
    ls = vf.predict_lanes(vf.to_lanes(bstate), params, 0.05, interpret=True)

    z = jnp.asarray(RNG.normal(scale=0.3, size=(nb, dim)), jnp.float32)
    r = jnp.eye(dim, dtype=jnp.float32) * 1e-3
    fn = {"dvl": vukf.update_dvl, "pressure": vukf.update_pressure}[model]
    gstate, ginfo = jax.vmap(lambda s, zz: fn(s, zz, r))(gen_pred, z)
    ls2, finfo = vf.update_model_lanes(model, ls, z, r, interpret=True)
    fstate = vf.from_lanes(ls2, bstate)
    np.testing.assert_allclose(
        np.asarray(getattr(fstate.mu, field)), np.asarray(getattr(gstate.mu, field)), atol=5e-6
    )
    np.testing.assert_allclose(np.asarray(fstate.cov), np.asarray(gstate.cov), atol=5e-6)
    np.testing.assert_allclose(
        np.asarray(finfo.mahalanobis2), np.asarray(ginfo.mahalanobis2), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(finfo.innovation), np.asarray(ginfo.innovation), atol=5e-6
    )
    assert bool(np.all(np.asarray(finfo.accepted)))


def test_step_lanes_matches_two_launch_chain():
    """The single-launch whole step (predict + DVL + pressure) matches
    predict_lanes followed by the matching update_model_lanes calls — same
    kernel phases composed in one launch. Covariances come out bit-identical;
    means may differ by one ulp (the launch boundary is a materialization
    barrier that blocks cross-phase FMA contraction in the two-launch path)."""
    nb = 3
    bstate, params = _bank(nb)
    z = jnp.asarray(RNG.normal(scale=0.3, size=(nb, 3)), jnp.float32)
    r = jnp.eye(3, dtype=jnp.float32) * 1e-3
    zp = jnp.asarray(RNG.normal(loc=2.0, scale=0.2, size=(nb, 1)), jnp.float32)
    rp = jnp.eye(1, dtype=jnp.float32) * 1e-2

    ls0 = vf.to_lanes(bstate)
    a = vf.predict_lanes(ls0, params, 0.05, interpret=True)
    a, ai0 = vf.update_model_lanes("dvl", a, z, r, interpret=True)
    a, ai1 = vf.update_model_lanes("pressure", a, zp, rp, interpret=True)

    b, infos = vf.step_lanes(
        ls0, params, 0.05,
        [vf.StepUpdate("dvl", z, r), vf.StepUpdate("pressure", zp, rp)],
        interpret=True,
    )
    assert len(infos) == 2
    ao, bo = vf.from_lanes(a, bstate), vf.from_lanes(b, bstate)
    np.testing.assert_array_equal(np.asarray(bo.cov), np.asarray(ao.cov))
    np.testing.assert_allclose(
        np.asarray(bo.mu.velocity), np.asarray(ao.mu.velocity), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bo.mu.z_position), np.asarray(ao.mu.z_position), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(bo.model_state.orientation), np.asarray(ao.model_state.orientation)
    )
    for got, want in zip(infos, (ai0, ai1)):
        np.testing.assert_allclose(
            np.asarray(got.mahalanobis2), np.asarray(want.mahalanobis2), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(got.innovation), np.asarray(want.innovation), atol=1e-6
        )


def test_gate_rejection_masks_instances():
    """A χ² gate rejection leaves the rejected instance's state untouched
    while its neighbors update — masked select, no control-flow divergence."""
    nb = 2
    bstate, params = _bank(nb)
    ls = vf.to_lanes(bstate)
    # instance 0: consistent (small-offset) measurement; instance 1: outlier
    z = jnp.asarray(
        np.stack(
            [np.asarray(bstate.mu.velocity[0]) + 0.01, np.asarray(bstate.mu.velocity[1]) + 50.0]
        ),
        jnp.float32,
    )
    r = jnp.eye(3, dtype=jnp.float32) * 1e-3
    ls2, info = vf.update_model_lanes("dvl", ls, z, r, gate_threshold=7.815, interpret=True)
    out = vf.from_lanes(ls2, bstate)
    acc = np.asarray(info.accepted)
    assert acc[0] and not acc[1]
    np.testing.assert_array_equal(np.asarray(out.mu.velocity[1]), np.asarray(bstate.mu.velocity[1]))
    np.testing.assert_array_equal(np.asarray(out.cov[1]), np.asarray(bstate.cov[1]))
    assert not np.allclose(np.asarray(out.mu.velocity[0]), np.asarray(bstate.mu.velocity[0]))


def test_set_inputs_lanes_matches_integrate_fns():
    """set_inputs_lanes == integrate_gyro/integrate_body_efforts on the
    pytree state (incl. the tracker's angular-velocity refresh)."""
    nb = 3
    bstate, _ = _bank(nb)
    eff = jnp.asarray(RNG.normal(size=(nb, 6)), jnp.float32)
    rates = jnp.asarray(RNG.normal(scale=0.1, size=(nb, 3)), jnp.float32)
    gen = jax.vmap(vukf.integrate_gyro)(jax.vmap(vukf.integrate_body_efforts)(bstate, eff), rates)
    ls = vf.set_inputs_lanes(vf.to_lanes(bstate), body_efforts=eff, angular_velocity=rates)
    out = vf.from_lanes(ls, bstate)
    for a, b in zip(jax.tree_util.tree_leaves(out), jax.tree_util.tree_leaves(gen)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bank_dispatch_fused_matches_generic():
    """predict_bank/update_*_bank with use_fused=True (interpret off-TPU is
    exercised via the *_fused_banked entries) match the generic vmap path."""
    nb = 4
    bstate, params = _bank(nb)
    gen = jax.vmap(lambda s: vukf.predict(s, params, 0.1))(bstate)
    fus = vf.predict_fused_banked(bstate, params, 0.1, interpret=True)
    np.testing.assert_allclose(np.asarray(fus.cov), np.asarray(gen.cov), atol=2e-6)
    z = jnp.asarray(RNG.normal(scale=0.3, size=(nb, 3)), jnp.float32)
    r = jnp.eye(3, dtype=jnp.float32) * 1e-3
    gu, _ = jax.vmap(lambda s, zz: vukf.update_dvl(s, zz, r))(gen, z)
    fu, _ = vf.update_model_fused_banked("dvl", fus, z, r, interpret=True)
    np.testing.assert_allclose(np.asarray(fu.mu.velocity), np.asarray(gu.mu.velocity), atol=5e-6)
    np.testing.assert_allclose(np.asarray(fu.cov), np.asarray(gu.cov), atol=5e-6)


def test_fused_step_under_bank_shard_map():
    """The fused whole-step kernel wrapped in parallel.sharding.bank_shard_map
    matches the unsharded result on the 8-device CPU mesh — validates that
    the lanes kernel (which GSPMD cannot partition) runs per-device on local
    shards, the multi-chip deployment pattern of docs/DEPLOYMENT.md."""
    from slam_uwv_kalman_filters_tpu.parallel import sharding as shmod

    nb = 16
    bstate, params = _bank(nb)
    z = jnp.asarray(RNG.normal(scale=0.3, size=(nb, 3)), jnp.float32)
    r = jnp.eye(3, dtype=jnp.float32) * 1e-3
    mesh = shmod.make_mesh()

    def step(bs, zz):
        ls = vf.to_lanes(bs)
        ls, _ = vf.step_lanes(
            ls, params, 0.05, [vf.StepUpdate("dvl", zz, r)], interpret=True
        )
        return vf.from_lanes(ls, bs)

    sharded = shmod.shard_bank(bstate, mesh)
    z_sharded = jax.device_put(z, shmod.bank_sharding(mesh))
    out_sharded = jax.jit(shmod.bank_shard_map(step, mesh))(sharded, z_sharded)
    out_ref = step(bstate, z)
    np.testing.assert_allclose(
        np.asarray(out_sharded.cov), np.asarray(out_ref.cov), atol=2e-7
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.mu.velocity), np.asarray(out_ref.mu.velocity), atol=2e-7
    )
    assert len(out_sharded.cov.sharding.device_set) == len(jax.devices())


def test_step_lanes_accepts_plain_tuples():
    """StepUpdate entries may be passed as plain tuples (the documented
    shorthand); regression: nb inference used to read .z before the
    normalization and crashed."""
    nb = 2
    bstate, params = _bank(nb)
    z = jnp.asarray(RNG.normal(scale=0.3, size=(nb, 3)), jnp.float32)
    r = jnp.eye(3, dtype=jnp.float32) * 1e-3
    a, _ = vf.step_lanes(
        vf.to_lanes(bstate), params, 0.05, [vf.StepUpdate("dvl", z, r)], interpret=True
    )
    b, _ = vf.step_lanes(
        vf.to_lanes(bstate), params, 0.05, [("dvl", z, r)], interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a.cov_t), np.asarray(b.cov_t))


def test_predict_bank_banked_model_sweep():
    """A Monte-Carlo sweep that banks the vehicle MODEL but shares the
    process noise must take the vmap route (regression: the fused dispatch
    keyed only on process_noise.ndim and crashed in _params_scalars), and
    must match per-instance generic predictions."""
    nb = 3
    bstate, params = _bank(nb)
    inertia = jnp.stack(
        [params.model.inertia_matrix * (1.0 + 0.1 * i) for i in range(nb)]
    )
    swept = params._replace(model=params.model._replace(inertia_matrix=inertia))
    out = vukf.predict_bank(bstate, swept, 0.05)  # auto → vmap (banked params)
    ref = jax.vmap(
        lambda s, m: vukf.predict(
            s, params._replace(model=params.model._replace(inertia_matrix=m)), 0.05
        )
    )(bstate, inertia)
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), atol=1e-7)
    assert not np.allclose(
        np.asarray(out.mu.velocity[0]), np.asarray(out.mu.velocity[2])
    )
