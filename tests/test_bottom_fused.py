"""Fused BottomUKF kernel (models/bottom_fused.py) vs the generic path.

Interpret-mode Pallas on CPU pinned against ``vmap`` of the generic
``bottom_ukf`` functions (themselves oracle-pinned by tests/test_bottom_ukf.py)
— in particular the in-kernel S² algebra: tangent basis, exp/log maps, the
fixed-iteration Karcher mean, and the S²-valued normal measurement."""

import numpy as np
import jax
import jax.numpy as jnp

from slam_uwv_kalman_filters_tpu.models import bottom_fused as bf
from slam_uwv_kalman_filters_tpu.models import bottom_ukf as bukf
from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod

RNG = np.random.default_rng(11)


def _bank(nb, dtype=jnp.float32, tilt=(0.15, -0.1)):
    n0 = np.asarray([tilt[0], tilt[1], 0.98])
    n0 /= np.linalg.norm(n0)
    mu = bukf.BottomState(
        distance=jnp.asarray([12.0], dtype), normal=jnp.asarray(n0, dtype)
    )
    a = RNG.normal(size=(3, 3)) * 0.08
    cov = jnp.asarray(a @ a.T + np.diag([0.5, 0.02, 0.02]), dtype)
    state, params = bukf.init(mu, cov)
    state = bukf.set_velocity(state, jnp.asarray([0.6, -0.2, -0.15], dtype))
    bstate = bankmod.replicate(state, nb)
    d = bstate.mu.distance + jnp.asarray(RNG.normal(scale=0.5, size=(nb, 1)), dtype)
    return bstate._replace(mu=bstate.mu._replace(distance=d)), params


def test_lanes_round_trip():
    bstate, _ = _bank(5)
    back = bf.from_lanes(bf.to_lanes(bstate), bstate)
    for a, b in zip(jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(bstate)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predict_lanes_matches_generic():
    """Fused predict == vmap(predict): the distance process model, the S²
    Karcher mean over the sigma normals and the speed²·dt²-scaled Q."""
    bstate, params = _bank(6)
    gen = jax.vmap(lambda s: bukf.predict(s, params, 0.1))(bstate)
    fus = bf.from_lanes(bf.predict_lanes(bf.to_lanes(bstate), params, 0.1, interpret=True), bstate)
    np.testing.assert_allclose(np.asarray(fus.mu.distance), np.asarray(gen.mu.distance), atol=2e-6)
    np.testing.assert_allclose(np.asarray(fus.mu.normal), np.asarray(gen.mu.normal), atol=2e-6)
    np.testing.assert_allclose(np.asarray(fus.cov), np.asarray(gen.cov), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(fus.velocity), np.asarray(bstate.velocity))


def test_update_range_matches_generic():
    """Fused ray/plane range update == vmap(update_range), incl. UpdateInfo."""
    nb = 4
    bstate, params = _bank(nb)
    gen = jax.vmap(lambda s: bukf.predict(s, params, 0.1))(bstate)
    ls = bf.predict_lanes(bf.to_lanes(bstate), params, 0.1, interpret=True)
    beam = jnp.asarray([0.1, 0.05, -0.99], jnp.float32)
    beam = beam / jnp.linalg.norm(beam)
    origin = jnp.asarray([0.2, 0.0, -0.1], jnp.float32)
    z = jnp.asarray(RNG.normal(loc=12.0, scale=0.5, size=(nb, 1)), jnp.float32)
    r = jnp.eye(1, dtype=jnp.float32) * 0.04
    gstate, ginfo = jax.vmap(lambda s, zz: bukf.update_range(s, zz, r, beam, origin))(gen, z)
    ls2, finfo = bf.update_model_lanes("range", ls, z, r, beam, origin, interpret=True)
    fstate = bf.from_lanes(ls2, bstate)
    np.testing.assert_allclose(
        np.asarray(fstate.mu.distance), np.asarray(gstate.mu.distance), atol=5e-6
    )
    np.testing.assert_allclose(np.asarray(fstate.mu.normal), np.asarray(gstate.mu.normal), atol=5e-6)
    np.testing.assert_allclose(np.asarray(fstate.cov), np.asarray(gstate.cov), atol=5e-6)
    np.testing.assert_allclose(
        np.asarray(finfo.mahalanobis2), np.asarray(ginfo.mahalanobis2), rtol=2e-5, atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(finfo.innovation), np.asarray(ginfo.innovation), atol=5e-6
    )


def test_update_normal_matches_generic():
    """Fused S²-valued normal observation == vmap(update_normal) — the
    manifold-measurement path (Karcher mean of predicted normals, tangent
    innovation, boxplus correction)."""
    nb = 4
    bstate, params = _bank(nb)
    gen = jax.vmap(lambda s: bukf.predict(s, params, 0.1))(bstate)
    ls = bf.predict_lanes(bf.to_lanes(bstate), params, 0.1, interpret=True)
    zn = np.asarray([0.05, 0.02, 0.998])
    zn /= np.linalg.norm(zn)
    zn = jnp.asarray(np.tile(zn, (nb, 1)), jnp.float32)
    rn = jnp.eye(2, dtype=jnp.float32) * 0.01
    gstate, ginfo = jax.vmap(lambda s, zz: bukf.update_normal(s, zz, rn))(gen, zn)
    ls2, finfo = bf.update_model_lanes("normal", ls, zn, rn, interpret=True)
    fstate = bf.from_lanes(ls2, bstate)
    np.testing.assert_allclose(
        np.asarray(fstate.mu.distance), np.asarray(gstate.mu.distance), atol=5e-6
    )
    np.testing.assert_allclose(np.asarray(fstate.mu.normal), np.asarray(gstate.mu.normal), atol=5e-6)
    np.testing.assert_allclose(np.asarray(fstate.cov), np.asarray(gstate.cov), atol=5e-6)
    np.testing.assert_allclose(
        np.asarray(finfo.mahalanobis2), np.asarray(ginfo.mahalanobis2), rtol=2e-5, atol=5e-6
    )


def test_step_lanes_matches_multi_launch_chain():
    """Single-launch predict + range + normal matches the multi-launch chain
    to one f32 ulp (launch boundaries block cross-phase FMA contraction)."""
    nb = 3
    bstate, params = _bank(nb)
    beam = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
    origin = jnp.zeros(3, jnp.float32)
    z = jnp.asarray(RNG.normal(loc=12.0, scale=0.5, size=(nb, 1)), jnp.float32)
    r = jnp.eye(1, dtype=jnp.float32) * 0.04
    zn = np.asarray([0.1, -0.05, 0.99])
    zn /= np.linalg.norm(zn)
    zn = jnp.asarray(np.tile(zn, (nb, 1)), jnp.float32)
    rn = jnp.eye(2, dtype=jnp.float32) * 0.01

    ls0 = bf.to_lanes(bstate)
    a = bf.predict_lanes(ls0, params, 0.1, interpret=True)
    a, ai0 = bf.update_model_lanes("range", a, z, r, beam, origin, interpret=True)
    a, ai1 = bf.update_model_lanes("normal", a, zn, rn, interpret=True)
    b, infos = bf.step_lanes(
        ls0, params, 0.1,
        [bf.StepUpdate("range", z, r, beam, origin), bf.StepUpdate("normal", zn, rn)],
        interpret=True,
    )
    assert len(infos) == 2
    ao, bo = bf.from_lanes(a, bstate), bf.from_lanes(b, bstate)
    np.testing.assert_allclose(np.asarray(bo.cov), np.asarray(ao.cov), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bo.mu.distance), np.asarray(ao.mu.distance), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bo.mu.normal), np.asarray(ao.mu.normal), atol=1e-6)
    for got, want in zip(infos, (ai0, ai1)):
        np.testing.assert_allclose(
            np.asarray(got.mahalanobis2), np.asarray(want.mahalanobis2), rtol=1e-5, atol=1e-6
        )


def test_gate_rejection_masks_instances():
    nb = 2
    bstate, params = _bank(nb)
    ls = bf.to_lanes(bstate)
    beam = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
    origin = jnp.zeros(3, jnp.float32)
    # instance 0: near the prior distance; instance 1: wild outlier
    z = jnp.asarray(
        np.stack([np.asarray(bstate.mu.distance[0]) + 0.1, np.asarray(bstate.mu.distance[1]) + 500.0]),
        jnp.float32,
    )
    r = jnp.eye(1, dtype=jnp.float32) * 0.04
    ls2, info = bf.update_model_lanes(
        "range", ls, z, r, beam, origin, gate_threshold=3.841, interpret=True
    )
    out = bf.from_lanes(ls2, bstate)
    acc = np.asarray(info.accepted)
    assert acc[0] and not acc[1]
    np.testing.assert_array_equal(np.asarray(out.mu.distance[1]), np.asarray(bstate.mu.distance[1]))
    np.testing.assert_array_equal(np.asarray(out.cov[1]), np.asarray(bstate.cov[1]))


def test_bank_dispatch_fused_matches_generic():
    """bottom_ukf.predict_bank/update_*_bank route to the fused entries."""
    nb = 4
    bstate, params = _bank(nb)
    gen = jax.vmap(lambda s: bukf.predict(s, params, 0.1))(bstate)
    fus = bf.predict_fused_banked(bstate, params, 0.1, interpret=True)
    np.testing.assert_allclose(np.asarray(fus.cov), np.asarray(gen.cov), atol=2e-6)
    beam = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
    origin = jnp.zeros(3, jnp.float32)
    z = jnp.asarray(RNG.normal(loc=12.0, scale=0.5, size=(nb, 1)), jnp.float32)
    r = jnp.eye(1, dtype=jnp.float32) * 0.04
    gu, _ = jax.vmap(lambda s, zz: bukf.update_range(s, zz, r, beam, origin))(gen, z)
    fu, _ = bf.update_model_fused_banked("range", fus, z, r, beam, origin, interpret=True)
    np.testing.assert_allclose(np.asarray(fu.mu.distance), np.asarray(gu.mu.distance), atol=5e-6)
    np.testing.assert_allclose(np.asarray(fu.cov), np.asarray(gu.cov), atol=5e-6)


def test_near_pole_normal():
    """The Householder basis is built sign-stabilized; a normal at the exact
    +z pole (the common flat-seafloor case) must factor and update cleanly."""
    nb = 2
    mu = bukf.BottomState(
        distance=jnp.asarray([8.0], jnp.float32),
        normal=jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
    )
    state, params = bukf.init(mu, jnp.diag(jnp.asarray([0.4, 0.01, 0.01], jnp.float32)))
    state = bukf.set_velocity(state, jnp.asarray([0.5, 0.0, -0.1], jnp.float32))
    bstate = bankmod.replicate(state, nb)
    gen = jax.vmap(lambda s: bukf.predict(s, params, 0.1))(bstate)
    fus = bf.from_lanes(bf.predict_lanes(bf.to_lanes(bstate), params, 0.1, interpret=True), bstate)
    np.testing.assert_allclose(np.asarray(fus.mu.normal), np.asarray(gen.mu.normal), atol=2e-6)
    np.testing.assert_allclose(np.asarray(fus.cov), np.asarray(gen.cov), atol=2e-6)
    assert bool(np.all(np.isfinite(np.asarray(fus.cov))))


def test_predict_bank_banked_process_noise_sweep():
    """A banked (B,3,3) process-noise sweep routes to the per-instance vmap
    (the fused kernel takes one shared set) and matches per-instance calls."""
    nb = 3
    bstate, params = _bank(nb)
    qb = jnp.stack([params.process_noise * (1.0 + i) for i in range(nb)])
    out = bukf.predict_bank(bstate, bukf.BottomUKFParams(process_noise=qb), 0.1)
    ref = jax.vmap(
        lambda s, q: bukf.predict(s, bukf.BottomUKFParams(process_noise=q), 0.1)
    )(bstate, qb)
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), atol=1e-7)
    assert not np.allclose(np.asarray(out.cov[0]), np.asarray(out.cov[2]))
