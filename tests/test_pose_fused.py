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


def test_fused_update_all_measurement_models():
    """Every bank-level fused wrapper matches its per-instance generic update
    (interpret mode; exercises deps slicing for 1-, 2-, 3- and 6-dim models
    including mat33-dependent body efforts and the gated ADCP blend)."""
    bstate, params = _make_bank(2)
    s0 = jax.tree_util.tree_map(lambda a: a[0], bstate)
    r1 = jnp.eye(1, dtype=jnp.float32) * 1e-2
    r2 = jnp.eye(2, dtype=jnp.float32) * 1e-3
    r3 = jnp.eye(3, dtype=jnp.float32) * 1e-3
    r6 = jnp.eye(6, dtype=jnp.float32) * 1e-1
    rr_body = pukf.get_rotation_rate(s0, params)

    cases = [
        ("acceleration",
         lambda bs, z: pukf.update_acceleration_bank(bs, params, z, r3, use_fused="interpret"),
         lambda s, z: pukf.update_acceleration(s, params, z, r3),
         jnp.asarray(RNG.normal(scale=0.5, size=(2, 3)), jnp.float32)),
        ("z_position",
         lambda bs, z: pukf.update_z_position_bank(bs, params, z, r1, use_fused="interpret"),
         lambda s, z: pukf.update_z_position(s, params, z, r1),
         jnp.asarray(RNG.normal(scale=1.0, size=(2, 1)), jnp.float32)),
        ("xy_position",
         lambda bs, z: pukf.update_xy_position_bank(bs, params, z, r2, use_fused="interpret"),
         lambda s, z: pukf.update_xy_position(s, params, z, r2),
         jnp.asarray(RNG.normal(scale=1.0, size=(2, 2)), jnp.float32)),
        ("pressure",
         lambda bs, z: pukf.update_pressure_bank(bs, params, z, r1 * 1e4, use_fused="interpret"),
         lambda s, z: pukf.update_pressure(s, params, z, r1 * 1e4),
         jnp.asarray(101325.0 + RNG.normal(scale=100.0, size=(2, 1)), jnp.float32)),
        ("water_velocity",
         lambda bs, z: pukf.update_water_velocity_bank(bs, params, z, r2, 0.7, use_fused="interpret"),
         lambda s, z: pukf.update_water_velocity(s, params, z, r2, 0.7),
         jnp.asarray(RNG.normal(scale=0.1, size=(2, 2)), jnp.float32)),
        ("body_efforts",
         lambda bs, z: pukf.update_body_efforts_bank(bs, params, z, r6, rr_body, use_fused="interpret"),
         lambda s, z: (_bef(s, z),),
         jnp.asarray(RNG.normal(scale=1.0, size=(2, 6)), jnp.float32)),
    ]

    def _bef(s, z):
        # generic single-instance body-efforts with the same shared body rate
        from slam_uwv_kalman_filters_tpu.ops import ukf as ukfmod
        h = lambda chi: pukf._efforts_measurement(chi, params, rr_body)
        mu, cov, info = ukfmod.update(pukf.POSE_MANIFOLD, s.mu, s.cov, z, h, r6)
        return s._replace(mu=mu, cov=cov)

    # use_fused="interpret" drives the REAL dispatch branches (generic fused
    # tail and in-kernel-model entry points) in Pallas interpret mode
    for name, bank_fn, one_fn, z in cases:
        out = bank_fn(bstate, z)
        out_s = out[0] if isinstance(out, tuple) else out
        ref = one_fn(s0, z[0])
        ref_s = ref[0] if isinstance(ref, tuple) else ref
        np.testing.assert_allclose(
            np.asarray(out_s.cov[0]), np.asarray(ref_s.cov), rtol=5e-3, atol=5e-5,
            err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(out_s.mu.position[0]), np.asarray(ref_s.mu.position),
            rtol=1e-4, atol=1e-4, err_msg=name,
        )


def test_fused_predict_large_orientation_spread():
    """Near-unknown heading (60° 1σ): the fixed-iteration fused mean must
    still match the tolerance-driven generic mean (the ±symmetric sigma set
    converges in ~2 Karcher iterations regardless of spread)."""
    import math

    cfg = default_pose_ukf_config()
    model = dyn.default_uwv_parameters(dtype=jnp.float32)
    state, params = pukf.init_from_pose(
        imu_in_nwu_pos=jnp.zeros(3, jnp.float32),
        imu_in_nwu_pos_cov=jnp.eye(3, dtype=jnp.float32) * 0.04,
        imu_in_nwu_rot=jnp.array([1.0, 0, 0, 0], jnp.float32),
        imu_in_nwu_rot_cov=jnp.eye(3, dtype=jnp.float32) * math.radians(60.0) ** 2,
        config=cfg,
        model_parameters=model,
        imu_delta_t=0.01,
        dtype=jnp.float32,
    )
    bstate = bankmod.replicate(state, 2)
    bstate = bstate._replace(rotation_rate=jnp.zeros((2, 3), jnp.float32))
    ref = jax.vmap(lambda s: pukf.predict(s, params, 0.1))(bstate)
    out = pose_fused.predict_fused_banked(bstate, params, 0.1, interpret=True)
    a, b = np.asarray(out.mu.orientation[0]), np.asarray(ref.mu.orientation[0])
    b = b if np.dot(a, b) >= 0 else -b
    np.testing.assert_allclose(a, b, atol=3e-6)
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), rtol=1e-3, atol=1e-5)


def test_lanes_chain_matches_banked_path():
    """to_lanes → predict_lanes → update_lanes → from_lanes equals the
    bank-first fused sequence (same kernels, conversions only at the ends)."""
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf

    bstate, params = _make_bank(2)
    z = jnp.asarray(RNG.normal(scale=0.3, size=(2, 3)), jnp.float32)
    r = jnp.eye(3, dtype=jnp.float32) * 1e-3
    h = lambda s: mf.quat_rotate_inv(s.orientation, s.velocity)
    deps = ("orientation", "velocity")

    # reference: bank-first fused path
    ref = pose_fused.predict_fused_banked(bstate, params, 0.05, interpret=True)
    ref, ref_info = puf.update_fused_banked(ref, params, z, r, h, deps, None, interpret=True)

    # lanes path: one conversion in, one out
    ls = pose_fused.to_lanes(bstate)
    ls = pose_fused.predict_lanes(ls, params, 0.05, interpret=True)
    ls, info = puf.update_lanes(ls, params, z, r, h, deps, None, interpret=True)
    out = pose_fused.from_lanes(ls, bstate)

    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out.mu.position), np.asarray(ref.mu.position), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(info.mahalanobis2), np.asarray(ref_info.mahalanobis2), rtol=1e-5
    )
    # rotation-rate caching round-trips through the lanes layout
    rr = jnp.asarray(RNG.normal(scale=0.01, size=(2, 3)), jnp.float32)
    ls2 = pose_fused.set_rotation_rate_lanes(ls, rr)
    out2 = pose_fused.from_lanes(ls2, bstate)
    np.testing.assert_allclose(np.asarray(out2.rotation_rate), np.asarray(rr), atol=0)


def test_fused_parity_fuzz_random_states_and_dt():
    """Randomized parity: random bank states (positions to ±1 km, velocities
    to ±3 m/s, strong rotations, perturbed damping/current/bias states) and
    random dt ∈ [1e-3, 0.5] must track the generic path through a
    predict + gated-update chain."""
    for trial in range(4):
        rng = np.random.default_rng(1000 + trial)
        bstate, params = _make_bank(2)
        n = 2
        mu = bstate.mu._replace(
            position=jnp.asarray(rng.normal(scale=300.0, size=(n, 3)), jnp.float32),
            velocity=jnp.asarray(rng.normal(scale=1.5, size=(n, 3)), jnp.float32),
            acceleration=jnp.asarray(rng.normal(scale=0.5, size=(n, 3)), jnp.float32),
            orientation=jax.vmap(mf.so3_boxplus)(
                bstate.mu.orientation, jnp.asarray(rng.normal(scale=1.0, size=(n, 3)), jnp.float32)
            ),
            bias_gyro=jnp.asarray(rng.normal(scale=1e-3, size=(n, 3)), jnp.float32),
            water_velocity=jnp.asarray(rng.normal(scale=0.2, size=(n, 2)), jnp.float32),
            water_density=jnp.asarray(1025.0 + rng.normal(scale=5.0, size=(n, 1)), jnp.float32),
        )
        bstate = bstate._replace(
            mu=mu, rotation_rate=jnp.asarray(rng.normal(scale=0.1, size=(n, 3)), jnp.float32)
        )
        dt = float(10 ** rng.uniform(-3, np.log10(0.5)))

        ref = jax.vmap(lambda s: pukf.predict(s, params, dt))(bstate)
        out = pose_fused.predict_fused_banked(bstate, params, dt, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out.cov), np.asarray(ref.cov), rtol=5e-3, atol=2e-5,
            err_msg=f"trial {trial} dt={dt:.4f}",
        )
        np.testing.assert_allclose(
            np.asarray(out.mu.position), np.asarray(ref.mu.position), rtol=1e-5, atol=1e-3,
            err_msg=f"trial {trial}",
        )

        z = jnp.asarray(rng.normal(scale=1.0, size=(n, 2)), jnp.float32)
        r = jnp.eye(2, dtype=jnp.float32) * 1e-2
        out2, info = pukf.update_xy_position_bank(
            out, params, out.mu.position[:, :2] + z * 0.01, r, gate_threshold=5.991,
            use_fused=False,
        )
        from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf

        out3, info3 = puf.update_fused_banked(
            out, params, out.mu.position[:, :2] + z * 0.01, r,
            lambda s: s.position[:2], ("position",), 5.991, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out3.cov), np.asarray(out2.cov), rtol=5e-3, atol=2e-5,
            err_msg=f"trial {trial} update",
        )
        np.testing.assert_array_equal(
            np.asarray(info3.accepted), np.asarray(info.accepted), err_msg=f"trial {trial} gate"
        )
        # the in-kernel model route must agree with both on the same fuzz state
        out4, info4 = puf.update_model_fused_banked(
            "xy_position", out, out.mu.position[:, :2] + z * 0.01, r, 5.991,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out4.cov), np.asarray(out2.cov), rtol=5e-3, atol=2e-5,
            err_msg=f"trial {trial} in-kernel model",
        )
        np.testing.assert_array_equal(
            np.asarray(info4.accepted), np.asarray(info.accepted),
            err_msg=f"trial {trial} in-kernel gate",
        )


def test_fused_predict_banked_params_matches_generic():
    """Monte-Carlo parameter banks through the fused kernel: per-instance
    taus/offsets/process noise must match vmap(predict) over (state, params)."""
    bstate, params = _make_bank(3)
    n = 3
    # per-instance parameter bank: perturb taus, offsets and Q per instance
    scales = jnp.asarray([0.5, 1.0, 2.0], jnp.float32)
    params_bank = jax.vmap(
        lambda s: params._replace(
            process_noise=params.process_noise * s,
            gyro_bias_tau=params.gyro_bias_tau * s,
            water_velocity_tau=params.water_velocity_tau / s,
            gyro_bias_offset=params.gyro_bias_offset + (s - 1.0) * 1e-4,
            water_velocity_scale=params.water_velocity_scale * s,
        )
    )(scales)

    ref = jax.vmap(lambda st, pr: pukf.predict(st, pr, 0.05))(bstate, params_bank)
    out = pose_fused.predict_fused_banked(bstate, params_bank, 0.05, interpret=True)
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), rtol=5e-3, atol=3e-6)
    for name in ("position", "velocity", "bias_gyro", "water_velocity"):
        np.testing.assert_allclose(
            np.asarray(getattr(out.mu, name)),
            np.asarray(getattr(ref.mu, name)),
            rtol=1e-4,
            atol=2e-5,
            err_msg=name,
        )


def test_update_bank_rejects_banked_params():
    """The generic ``update_bank`` entry rejects banked parameter sets when
    ``h`` may close over params it cannot re-close per instance. The TYPED
    parameter-dependent entries route banked values per instance instead —
    pinned by test_update_pressure_bank_accepts_banked_params."""
    bstate, params = _make_bank(2)
    params_bank = jax.vmap(lambda s: params._replace(process_noise=params.process_noise * s))(
        jnp.asarray([1.0, 2.0], jnp.float32)
    )
    z = jnp.zeros((2, 1), jnp.float32)
    r = jnp.eye(1, dtype=jnp.float32) * 1e2
    try:
        pukf.update_bank(
            bstate, params_bank, z, r, lambda s: s.position[2:3], ("position",)
        )
        assert False, "expected ValueError for banked params"
    except ValueError as e:
        assert "banked parameter set" in str(e)


def test_update_pressure_bank_accepts_banked_params():
    """Banked ``atmospheric_pressure`` (Monte-Carlo sweep): the fused route
    carries per-instance values on the kernel's banked-aux lanes, the generic
    route vmaps per instance — both match vmap(update_pressure)."""
    bstate, params = _make_bank(3)
    p_atms = params.atmospheric_pressure * jnp.asarray([0.9, 1.0, 1.1], jnp.float32)
    params_bank = jax.vmap(
        lambda s, pa: params._replace(
            process_noise=params.process_noise * s, atmospheric_pressure=pa
        )
    )(jnp.asarray([0.5, 1.0, 2.0], jnp.float32), p_atms)
    lever = jnp.asarray([0.1, -0.2, 0.3], jnp.float32)
    z = p_atms[:, None] * 1.001  # plausible pressures near each instance's p_atm
    r = jnp.eye(1, dtype=jnp.float32) * 1e2

    ref = jax.vmap(lambda st, pr, zz: pukf.update_pressure(st, pr, zz, r, lever))(
        bstate, params_bank, z
    )[0]
    # generic (CPU) banked route: per-instance vmap inside update_pressure_bank
    out, _ = pukf.update_pressure_bank(bstate, params_bank, z, r, lever, use_fused=False)
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out.mu.position), np.asarray(ref.mu.position), atol=1e-6
    )
    # fused banked-aux route through the REAL dispatch branch (interpret mode
    # = the TPU kernel's code path, aux_bank packed by update_pressure_bank
    # itself so the dispatch packing can't drift from what this test pins)
    # tolerances: the streaming kernel sums {0, +cols, −cols} instead of the
    # generic path's interleaved ±ordering — f32 ulp-level shifts only
    out2, _ = pukf.update_pressure_bank(
        bstate, params_bank, z, r, lever, use_fused="interpret"
    )
    np.testing.assert_allclose(np.asarray(out2.cov), np.asarray(ref.cov), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out2.mu.position), np.asarray(ref.mu.position), atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(out2.mu.water_density), np.asarray(ref.mu.water_density), atol=5e-6
    )


def test_update_model_fused_banked_rejects_mixed_aux():
    """Passing both shared aux scalars and a per-instance aux_bank is an
    error: the kernel reads only the banked lanes, so mixed entries would
    silently zero the shared values (ADVICE r1)."""
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf

    bstate, _ = _make_bank(2)
    z = jnp.zeros((2, 1), jnp.float32)
    r = jnp.eye(1, dtype=jnp.float32)
    try:
        puf.update_model_fused_banked(
            "pressure", bstate, z, r,
            aux=(101325.0,), aux_bank=jnp.zeros((2, 4), jnp.float32),
        )
        assert False, "expected ValueError for mixed aux/aux_bank"
    except ValueError as e:
        assert "aux_bank" in str(e)


def test_update_water_velocity_bank_per_instance_cell_weighting():
    """Per-instance ADCP cell weightings (each instance's ADCP cell is its own
    measurement attribute): fused banked-aux route and generic per-instance
    vmap both match vmap(update_water_velocity)."""
    bstate, params = _make_bank(3)
    cw = jnp.asarray([0.0, 0.4, 1.0], jnp.float32)
    z = jnp.asarray(RNG.normal(scale=0.05, size=(3, 2)), jnp.float32)
    r = jnp.eye(2, dtype=jnp.float32) * 1e-2

    ref = jax.vmap(lambda st, zz, c: pukf.update_water_velocity(st, params, zz, r, c))(
        bstate, z, cw
    )[0]
    out, _ = pukf.update_water_velocity_bank(bstate, params, z, r, cw, use_fused=False)
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out.mu.water_velocity), np.asarray(ref.mu.water_velocity), atol=1e-6
    )
    # fused banked-aux route through the REAL dispatch branch (interpret mode)
    out2, info2 = pukf.update_water_velocity_bank(
        bstate, params, z, r, cw, use_fused="interpret"
    )
    np.testing.assert_allclose(np.asarray(out2.cov), np.asarray(ref.cov), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out2.mu.water_velocity), np.asarray(ref.mu.water_velocity), atol=1e-6
    )
    assert bool(np.all(np.asarray(info2.accepted)))


def test_fused_predict_odd_bank_sizes():
    """Lane padding correctness for a non-multiple-of-128 bank (nb=1,
    pad=127), with distinct per-instance states so a padding mix-up would
    show. Grid>1 + padding (nb 127/129/500) is verified on the real chip —
    interpret mode at those sizes costs ~a minute of suite time for no extra
    logic coverage."""
    for nb in (1,):
        bstate, params = _make_bank(2)
        one = jax.tree_util.tree_map(lambda a: a[0], bstate)
        bs = jax.tree_util.tree_map(lambda a: jnp.tile(a[None], (nb, *(1,) * a.ndim)), one)
        bs = bs._replace(
            mu=bs.mu._replace(
                velocity=jnp.arange(nb * 3, dtype=jnp.float32).reshape(nb, 3) * 1e-3
            )
        )
        out = pose_fused.predict_fused_banked(bs, params, 0.02, interpret=True)
        ref = jax.vmap(lambda s: pukf.predict(s, params, 0.02))(bs)
        np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(out.mu.velocity), np.asarray(ref.mu.velocity), atol=1e-6
        )


def test_update_velocity_fused_h_matches_generic():
    """The whole-update DVL kernel (measurement model fused in-kernel,
    update_velocity_lanes / update_velocity_fused_banked) matches the generic
    deltas → XLA-h → tail pipeline to f32 roundoff, including χ² gating."""
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf

    bstate, params = _make_bank(3)
    # de-trivialize: distinct rotations/velocities per instance
    rv = jnp.asarray(RNG.normal(scale=0.4, size=(3, 3)), jnp.float32)
    q = jax.vmap(mf.quat_exp)(rv)
    vel = jnp.asarray(RNG.normal(scale=1.0, size=(3, 3)), jnp.float32)
    bstate = bstate._replace(mu=bstate.mu._replace(orientation=q, velocity=vel))
    z = jnp.asarray(RNG.normal(scale=0.5, size=(3, 3)), jnp.float32)
    r = jnp.eye(3, dtype=jnp.float32) * 1e-3
    h = lambda s: mf.quat_rotate_inv(s.orientation, s.velocity)
    deps = ("orientation", "velocity")

    ls = pose_fused.to_lanes(bstate)
    ls = pose_fused.predict_lanes(ls, params, 0.05, interpret=True)
    for gate in (None, 5.991):
        g, gi = puf.update_lanes(ls, params, z, r, h, deps, gate, interpret=True)
        f, fi = puf.update_velocity_lanes(ls, params, z, r, gate, interpret=True)
        go, fo = pose_fused.from_lanes(g, bstate), pose_fused.from_lanes(f, bstate)
        np.testing.assert_allclose(np.asarray(fo.cov), np.asarray(go.cov), atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(fo.mu.velocity), np.asarray(go.mu.velocity), atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(fi.mahalanobis2), np.asarray(gi.mahalanobis2), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(fi.innovation), np.asarray(gi.innovation), atol=2e-6
        )
        np.testing.assert_array_equal(np.asarray(fi.accepted), np.asarray(gi.accepted))

    # public bank entry agrees with the lanes entry bit-for-bit
    pre = pose_fused.from_lanes(ls, bstate)
    pre = pre._replace(cov=0.5 * (pre.cov + jnp.swapaxes(pre.cov, -1, -2)))
    fb, _ = puf.update_velocity_fused_banked(pre, params, z, r, None, interpret=True)
    fl, _ = puf.update_velocity_lanes(pose_fused.to_lanes(pre), params, z, r, None, interpret=True)
    flo = pose_fused.from_lanes(fl, pre)
    np.testing.assert_allclose(np.asarray(fb.mu.velocity), np.asarray(flo.mu.velocity), atol=0)


def test_step_velocity_lanes_matches_two_launch_chain():
    """The single-launch whole step (predict + DVL update,
    step_velocity_lanes) is bit-identical to predict_lanes followed by
    update_velocity_lanes — same kernels composed in one launch."""
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf

    bstate, params = _make_bank(2)
    rv = jnp.asarray(RNG.normal(scale=0.3, size=(2, 3)), jnp.float32)
    bstate = bstate._replace(
        mu=bstate.mu._replace(
            orientation=jax.vmap(mf.quat_exp)(rv),
            velocity=jnp.asarray(RNG.normal(size=(2, 3)), jnp.float32),
        )
    )
    z = jnp.asarray(RNG.normal(scale=0.5, size=(2, 3)), jnp.float32)
    r = jnp.eye(3, dtype=jnp.float32) * 1e-3

    ls0 = pose_fused.to_lanes(bstate)
    a = pose_fused.predict_lanes(ls0, params, 0.05, interpret=True)
    a, ai = puf.update_velocity_lanes(a, params, z, r, None, interpret=True)
    b, bi = puf.step_velocity_lanes(ls0, params, 0.05, z, r, None, interpret=True)
    ao, bo = pose_fused.from_lanes(a, bstate), pose_fused.from_lanes(b, bstate)
    np.testing.assert_array_equal(np.asarray(bo.cov), np.asarray(ao.cov))
    np.testing.assert_array_equal(np.asarray(bo.mu.velocity), np.asarray(ao.mu.velocity))
    np.testing.assert_array_equal(
        np.asarray(bi.mahalanobis2), np.asarray(ai.mahalanobis2)
    )


def test_update_velocity_bank_accepts_banked_params():
    """The DVL measurement model reads no parameters, so update_velocity_bank
    serves Monte-Carlo parameter banks too (both the fused in-kernel route
    and the generic params_independent fallback) — matching per-instance
    vmap(update_velocity)."""
    bstate, params = _make_bank(3)
    scales = jnp.asarray([0.5, 1.0, 2.0], jnp.float32)
    params_bank = jax.vmap(
        lambda s: params._replace(process_noise=params.process_noise * s)
    )(scales)
    z = jnp.asarray(RNG.normal(scale=0.3, size=(3, 3)), jnp.float32)
    r = jnp.tile((jnp.eye(3, dtype=jnp.float32) * 1e-3)[None], (3, 1, 1))

    ref = jax.vmap(lambda st, pr, zz, rr: pukf.update_velocity(st, pr, zz, rr))(
        bstate, params_bank, z, r
    )[0]
    # generic route (CPU): no longer raises for params-independent h
    out, _ = pukf.update_velocity_bank(bstate, params_bank, z, r, use_fused=False)
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.mu.velocity), np.asarray(ref.mu.velocity), atol=1e-6
    )
    # fused in-kernel route (interpret): same result
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf

    out2, _ = puf.update_velocity_fused_banked(bstate, params_bank, z, r, interpret=True)
    np.testing.assert_allclose(np.asarray(out2.cov), np.asarray(ref.cov), atol=2e-6)


def test_all_in_kernel_measurement_models_match_generic():
    """Every in-kernel measurement model (FUSED_MODELS) matches the generic
    deltas → XLA-h → tail pipeline to f32 roundoff on a de-trivialized bank."""
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf
    from slam_uwv_kalman_filters_tpu.ops import ukf as ukf_ops

    bstate, params = _make_bank(2)
    rv = jnp.asarray(RNG.normal(scale=0.4, size=(2, 3)), jnp.float32)
    bstate = bstate._replace(
        mu=bstate.mu._replace(
            orientation=jax.vmap(mf.quat_exp)(rv),
            position=jnp.asarray(RNG.normal(scale=5.0, size=(2, 3)), jnp.float32),
            velocity=jnp.asarray(RNG.normal(size=(2, 3)), jnp.float32),
            acceleration=jnp.asarray(RNG.normal(scale=0.3, size=(2, 3)), jnp.float32),
            water_velocity=jnp.asarray(RNG.normal(scale=0.2, size=(2, 2)), jnp.float32),
            water_velocity_below=jnp.asarray(RNG.normal(scale=0.2, size=(2, 2)), jnp.float32),
        )
    )
    ls = pose_fused.to_lanes(bstate)
    ls = pose_fused.predict_lanes(ls, params, 0.05, interpret=True)

    p_atm = float(params.atmospheric_pressure)
    lever = (0.1, -0.2, 0.3)
    cw = 0.7
    cases = {
        "velocity": (
            lambda s: mf.quat_rotate_inv(s.orientation, s.velocity),
            ("orientation", "velocity"), (), None,
        ),
        "z_position": (lambda s: s.position[2:3], ("position",), (), None),
        "xy_position": (lambda s: s.position[:2], ("position",), (), ukf_ops.D2P95),
        "acceleration": (
            lambda s: mf.quat_rotate_inv(
                s.orientation,
                s.acceleration + jnp.stack([jnp.zeros((), jnp.float32),
                                            jnp.zeros((), jnp.float32), s.gravity[0]]),
            )
            + s.bias_acc,
            ("orientation", "acceleration", "bias_acc", "gravity"), (), None,
        ),
        "pressure": (
            lambda s: (
                p_atm
                - (s.position + mf.quat_rotate(s.orientation, jnp.asarray(lever, jnp.float32)))[2]
                * s.gravity[0] * s.water_density[0]
            )[None],
            ("position", "orientation", "gravity", "water_density"),
            (p_atm, *lever), None,
        ),
        "water_velocity": (
            lambda s: (
                cw * mf.quat_rotate_inv(
                    s.orientation,
                    s.velocity - jnp.stack([s.water_velocity_below[0],
                                            s.water_velocity_below[1],
                                            jnp.zeros((), jnp.float32)]),
                )[:2]
                + (1.0 - cw) * mf.quat_rotate_inv(
                    s.orientation,
                    s.velocity - jnp.stack([s.water_velocity[0], s.water_velocity[1],
                                            jnp.zeros((), jnp.float32)]),
                )[:2]
                + s.bias_adcp
            ),
            ("orientation", "velocity", "water_velocity", "water_velocity_below", "bias_adcp"),
            (cw,), ukf_ops.D2P95,
        ),
    }
    # body_efforts needs per-instance aux (each instance's body rate), which
    # this simple (h, deps) harness cannot express — its in-kernel-vs-generic
    # parity is pinned by test_body_efforts_in_kernel_model_matches_generic
    assert set(cases) | {"body_efforts"} == set(puf.FUSED_MODELS)
    for model, (h, deps, aux, gate) in cases.items():
        m = puf.FUSED_MODELS[model]
        z = jnp.asarray(RNG.normal(scale=0.5, size=(2, m)), jnp.float32)
        if model == "pressure":
            z = z * 1e3 + p_atm  # plausible pressures, not ~0
        r = jnp.eye(m, dtype=jnp.float32) * (1e2 if model == "pressure" else 1e-3)
        g, gi = puf.update_lanes(ls, params, z, r, h, deps, gate, interpret=True)
        f, fi = puf.update_model_lanes(model, ls, z, r, gate, aux, interpret=True)
        go, fo = pose_fused.from_lanes(g, bstate), pose_fused.from_lanes(f, bstate)
        scale = float(jnp.max(jnp.abs(go.cov)))
        np.testing.assert_allclose(
            np.asarray(fo.cov), np.asarray(go.cov), atol=3e-6 * max(1.0, scale),
            err_msg=model,
        )
        np.testing.assert_allclose(
            np.asarray(fo.mu.position), np.asarray(go.mu.position), atol=5e-5,
            err_msg=model,
        )
        np.testing.assert_allclose(
            np.asarray(fi.mahalanobis2), np.asarray(gi.mahalanobis2),
            rtol=2e-4, atol=1e-5, err_msg=model,
        )
        np.testing.assert_array_equal(
            np.asarray(fi.accepted), np.asarray(gi.accepted), err_msg=model
        )


def test_fused_update_pins_f64_h_output_to_state_dtype():
    """A measurement model that reads float64 parameters must not push f64
    deviations into the f32 kernel (regression: Mosaic cannot lower f64; in
    interpret mode the f64 values were silently written into f32 refs).
    Policy matches ops.ukf.update: the state's dtype governs."""
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf

    bstate, params = _make_bank(2)
    z = jnp.asarray(RNG.normal(scale=0.2, size=(2, 3)), jnp.float32)
    r = jnp.tile((jnp.eye(3, dtype=jnp.float32) * 1e-3)[None], (2, 1, 1))

    f64_scale = jnp.asarray(1.0, jnp.float64)  # a "param" that promotes

    def h(s):
        return mf.quat_rotate_inv(s.orientation, s.velocity) * f64_scale

    out, info = puf.update_fused_banked(
        bstate, params, z, r, h, ("orientation", "velocity"), None, interpret=True
    )
    assert out.cov.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out.cov)))
    # and matches the un-promoted model exactly (scale is 1.0)
    ref, _ = puf.update_fused_banked(
        bstate, params, z, r,
        lambda s: mf.quat_rotate_inv(s.orientation, s.velocity),
        ("orientation", "velocity"), None, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), atol=0)


def test_step_lanes_multi_sensor_matches_chain():
    """The generalized single-launch step (predict + a chain of in-kernel
    updates, step_lanes) is bit-identical to predict_lanes followed by the
    matching update_model_lanes calls — same kernels composed in one launch,
    each update re-drawing sigma points from the then-current covariance.
    The chain covers all six shared-aux in-kernel models (body_efforts, the
    seventh FUSED_MODELS entry, needs per-instance aux and is not
    step-chainable — its parity test stands alone)."""
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf

    nb = 2
    bstate, params = _make_bank(nb)
    z_dvl = jnp.asarray(RNG.normal(scale=0.5, size=(nb, 3)), jnp.float32)
    r_dvl = jnp.eye(3, dtype=jnp.float32) * 1e-3
    z_p = jnp.asarray(RNG.normal(loc=101325.0, scale=2e4, size=(nb, 1)), jnp.float32)
    r_p = jnp.eye(1, dtype=jnp.float32) * 1e2
    z_xy = jnp.asarray(RNG.normal(scale=1.0, size=(nb, 2)), jnp.float32)
    r_xy = jnp.eye(2, dtype=jnp.float32) * 1e-2
    z_z = jnp.asarray(RNG.normal(scale=1.0, size=(nb, 1)), jnp.float32)
    r_z = jnp.eye(1, dtype=jnp.float32) * 1e-2
    z_acc = jnp.asarray(RNG.normal(scale=0.2, size=(nb, 3)), jnp.float32)
    r_acc = jnp.eye(3, dtype=jnp.float32) * 1e-2
    z_wv = jnp.asarray(RNG.normal(scale=0.1, size=(nb, 2)), jnp.float32)
    r_wv = jnp.eye(2, dtype=jnp.float32) * 1e-2
    p_aux = (params.atmospheric_pressure, 0.0, 0.0, 0.0)
    cw = 0.3  # ADCP cell weighting

    ls0 = pose_fused.to_lanes(bstate)
    a = pose_fused.predict_lanes(ls0, params, 0.05, interpret=True)
    a, ai0 = puf.update_model_lanes("velocity", a, z_dvl, r_dvl, None, interpret=True)
    a, ai1 = puf.update_model_lanes("pressure", a, z_p, r_p, None, p_aux, interpret=True)
    a, ai2 = puf.update_model_lanes("xy_position", a, z_xy, r_xy, 5.991, interpret=True)
    a, ai3 = puf.update_model_lanes("z_position", a, z_z, r_z, None, interpret=True)
    a, ai4 = puf.update_model_lanes("acceleration", a, z_acc, r_acc, None, interpret=True)
    a, ai5 = puf.update_model_lanes("water_velocity", a, z_wv, r_wv, 5.991, (cw,), interpret=True)

    b, infos = puf.step_lanes(
        ls0, params, 0.05,
        [
            puf.StepUpdate("velocity", z_dvl, r_dvl),
            puf.StepUpdate("pressure", z_p, r_p, aux=p_aux),
            puf.StepUpdate("xy_position", z_xy, r_xy, gate_threshold=5.991),
            puf.StepUpdate("z_position", z_z, r_z),
            puf.StepUpdate("acceleration", z_acc, r_acc),
            puf.StepUpdate("water_velocity", z_wv, r_wv, gate_threshold=5.991, aux=(cw,)),
        ],
        interpret=True,
    )
    assert len(infos) == 6
    ao, bo = pose_fused.from_lanes(a, bstate), pose_fused.from_lanes(b, bstate)
    np.testing.assert_array_equal(np.asarray(bo.cov), np.asarray(ao.cov))
    np.testing.assert_array_equal(np.asarray(bo.mu.position), np.asarray(ao.mu.position))
    np.testing.assert_array_equal(np.asarray(bo.mu.orientation), np.asarray(ao.mu.orientation))
    for got, want in zip(infos, (ai0, ai1, ai2, ai3, ai4, ai5)):
        np.testing.assert_array_equal(np.asarray(got.mahalanobis2), np.asarray(want.mahalanobis2))
        np.testing.assert_array_equal(np.asarray(got.accepted), np.asarray(want.accepted))
        np.testing.assert_array_equal(np.asarray(got.innovation), np.asarray(want.innovation))


def test_step_lanes_validates_inputs():
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf
    import pytest

    bstate, params = _make_bank(2)
    ls0 = pose_fused.to_lanes(bstate)
    with pytest.raises(ValueError, match="at least one"):
        puf.step_lanes(ls0, params, 0.05, [])
    z3 = jnp.zeros((3, 3), jnp.float32)  # bank of 3 into a bank-of-2 state
    z2 = jnp.zeros((2, 1), jnp.float32)
    with pytest.raises(ValueError, match="inconsistent bank"):
        puf.step_lanes(
            ls0, params, 0.05,
            [
                puf.StepUpdate("velocity", jnp.zeros((2, 3), jnp.float32), jnp.eye(3)),
                puf.StepUpdate("z_position", z3[:, :1], jnp.eye(1)),
            ],
        )


def test_mission_second_lanes_matches_bank_chain():
    """The lanes-persistent full-mission loop (bench.py pose_full default:
    predict + acc every tick, multi-rate DVL/pressure/ADCP/efforts) is
    bit-identical to the public fused bank chain — the layout conversions
    and the deferred lower-triangle mirror drop out of the math entirely."""
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf
    from slam_uwv_kalman_filters_tpu.ops import ukf as ukfops

    nb = 2
    bstate, params = _make_bank(nb)
    dt = 0.01
    acc = jnp.asarray(RNG.normal(scale=0.1, size=(nb, 3)) + [0, 0, 9.81], jnp.float32)
    r_acc = jnp.eye(3, dtype=jnp.float32) * 4e-5
    dvl = jnp.asarray(RNG.normal(scale=0.3, size=(nb, 3)), jnp.float32)
    r_dvl = jnp.eye(3, dtype=jnp.float32) * 1e-3
    press = jnp.full((nb, 1), 101325.0, jnp.float32)
    r_press = jnp.eye(1, dtype=jnp.float32) * 2500.0
    adcp = jnp.asarray(RNG.normal(scale=0.05, size=(nb, 2)), jnp.float32)
    r_adcp = jnp.eye(2, dtype=jnp.float32) * 1e-3
    eff = jnp.asarray(RNG.normal(scale=0.5, size=(nb, 6)), jnp.float32)
    r_eff = jnp.eye(6, dtype=jnp.float32) * 1.0
    p_atm = params.atmospheric_pressure

    # compressed 5-tick schedule: every stream fires at least once
    dvl_at = lambda k: k % 2 == 1
    press_at = lambda k: k == 4
    adcp_at = lambda k: k == 4
    eff_at = lambda k: k % 2 == 0

    # reference: public fused bank chain (mirrors + layout converts per call)
    ref = bstate
    for k in range(5):
        ref = pukf.predict_bank(ref, params, dt, use_fused="interpret")
        ref, _ = pukf.update_acceleration_bank(ref, params, acc, r_acc, use_fused="interpret")
        if dvl_at(k):
            ref, _ = pukf.update_velocity_bank(ref, params, dvl, r_dvl, use_fused="interpret")
        if press_at(k):
            ref, _ = pukf.update_pressure_bank(ref, params, press, r_press, use_fused="interpret")
        if adcp_at(k):
            ref, _ = pukf.update_water_velocity_bank(
                ref, params, adcp, r_adcp, 0.5, use_fused="interpret"
            )
        if eff_at(k):
            rr = pukf.get_rotation_rate_bank(ref, params)
            ref, _ = pukf.update_body_efforts_bank(
                ref, params, eff, r_eff, rr, use_fused="interpret"
            )

    # lanes-persistent loop: one conversion in, one out
    ls = pose_fused.to_lanes(bstate)
    for k in range(5):
        ls = pose_fused.predict_lanes(ls, params, dt, interpret=True)
        ls, _ = puf.update_model_lanes("acceleration", ls, acc, r_acc, interpret=True)
        if dvl_at(k):
            ls, _ = puf.update_velocity_lanes(ls, params, dvl, r_dvl, interpret=True)
        if press_at(k):
            ls, _ = puf.update_model_lanes(
                "pressure", ls, press, r_press, aux=(p_atm, 0.0, 0.0, 0.0), interpret=True
            )
        if adcp_at(k):
            ls, _ = puf.update_model_lanes(
                "water_velocity", ls, adcp, r_adcp, ukfops.D2P95, aux=(0.5,), interpret=True
            )
        if eff_at(k):
            ls, _ = puf.update_body_efforts_lanes(ls, params, eff, r_eff, interpret=True)
    out = pose_fused.from_lanes(ls, bstate)

    np.testing.assert_array_equal(np.asarray(out.cov), np.asarray(ref.cov))
    np.testing.assert_array_equal(np.asarray(out.mu.position), np.asarray(ref.mu.position))
    np.testing.assert_array_equal(
        np.asarray(out.mu.orientation), np.asarray(ref.mu.orientation)
    )
    np.testing.assert_array_equal(np.asarray(out.mu.bias_gyro), np.asarray(ref.mu.bias_gyro))


def test_update_body_efforts_lanes_matches_bank():
    """update_body_efforts_lanes computes each instance's own compensated
    body rate (getRotationRate, PoseUKF.cpp:693-699) — identical to feeding
    get_rotation_rate_bank into the public per-instance efforts update."""
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf

    nb = 3
    bstate, params = _make_bank(nb)
    eff = jnp.asarray(RNG.normal(scale=0.5, size=(nb, 6)), jnp.float32)
    r_eff = jnp.eye(6, dtype=jnp.float32) * 1.0

    rr = pukf.get_rotation_rate_bank(bstate, params)
    ref, ref_info = pukf.update_body_efforts_bank(
        bstate, params, eff, r_eff, rr, use_fused="interpret"
    )

    ls = pose_fused.to_lanes(bstate)
    ls, info = puf.update_body_efforts_lanes(ls, params, eff, r_eff, interpret=True)
    out = pose_fused.from_lanes(ls, bstate)

    np.testing.assert_array_equal(np.asarray(out.cov), np.asarray(ref.cov))
    np.testing.assert_array_equal(np.asarray(out.mu.position), np.asarray(ref.mu.position))
    np.testing.assert_array_equal(
        np.asarray(info.mahalanobis2), np.asarray(ref_info.mahalanobis2)
    )


def test_body_efforts_in_kernel_model_matches_generic():
    """The in-kernel Fossen inverse-dynamics model (FUSED_MODELS
    ["body_efforts"]: per-sigma-point (x,y,psi) inertia/damping substitution,
    coriolis, quadratic damping, restoring term, per-instance body rates on
    the aux lanes) matches the generic deltas -> XLA-h -> fused-tail route at
    f32 roundoff, through both public dispatchers."""
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf

    nb = 3
    bstate, params = _make_bank(nb)
    eff = jnp.asarray(RNG.normal(scale=0.5, size=(nb, 6)), jnp.float32)
    r_eff = jnp.eye(6, dtype=jnp.float32) * 1.0
    rr = pukf.get_rotation_rate_bank(bstate, params)

    ref, ref_info = puf.update_fused_banked(
        bstate, params, eff, r_eff,
        lambda chi, rr_one: pukf._efforts_measurement(chi, params, rr_one),
        pukf._EFFORTS_DEPS, h_aux=rr, interpret=True,
    )

    # public bank dispatcher (per-instance rr + shared params -> in-kernel)
    out, info = pukf.update_body_efforts_bank(
        bstate, params, eff, r_eff, rr, use_fused="interpret"
    )
    np.testing.assert_allclose(
        np.asarray(out.cov), np.asarray(ref.cov), rtol=5e-3, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.mu.position), np.asarray(ref.mu.position), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(info.innovation), np.asarray(ref_info.innovation),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(info.accepted), np.asarray(ref_info.accepted)
    )

    # lanes dispatcher computes its own per-instance getRotationRate and
    # takes the same in-kernel route
    ls = pose_fused.to_lanes(bstate)
    ls, linfo = puf.update_body_efforts_lanes(ls, params, eff, r_eff, interpret=True)
    lout = pose_fused.from_lanes(ls, bstate)
    np.testing.assert_array_equal(np.asarray(lout.cov), np.asarray(out.cov))
    np.testing.assert_array_equal(
        np.asarray(linfo.mahalanobis2), np.asarray(info.mahalanobis2)
    )


def test_body_efforts_model_requires_param_block():
    """The in-kernel body_efforts model validates its shared-parameter SMEM
    block up front (a clear error instead of a kernel-trace failure)."""
    import pytest
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf

    bstate, params = _make_bank(2)
    ls = pose_fused.to_lanes(bstate)
    z = jnp.zeros((2, 6), jnp.float32)
    r = jnp.eye(6, dtype=jnp.float32)
    with pytest.raises(ValueError, match="model-parameter block"):
        puf.update_model_lanes("body_efforts", ls, z, r, interpret=True)
