"""Geodesy tests: WGS-84 gravity, earth rate, NWU projection round-trips."""

import jax.numpy as jnp
import numpy as np

from slam_uwv_kalman_filters_tpu.ops import geodesy as geo


def test_gravity_known_values():
    # WGS-84 normal gravity: equator ≈ 9.7803, poles ≈ 9.8322
    np.testing.assert_allclose(float(geo.wgs84_gravity(0.0)), 9.7803253359, atol=1e-9)
    np.testing.assert_allclose(float(geo.wgs84_gravity(np.pi / 2)), 9.8321849379, atol=1e-6)
    # 45° ≈ 9.8062
    np.testing.assert_allclose(float(geo.wgs84_gravity(np.pi / 4)), 9.806, atol=1e-3)
    # free-air: ~3.1 mm/s² per km of altitude, decreasing upward
    g0 = float(geo.wgs84_gravity(0.7))
    g1k = float(geo.wgs84_gravity(0.7, 1000.0))
    np.testing.assert_allclose(g0 - g1k, 3.0877e-3, rtol=1e-2)


def test_earth_rotation_vector():
    w = geo.earth_rotation_nav(jnp.asarray(0.9))
    np.testing.assert_allclose(w[0], geo.EARTHW * np.cos(0.9), atol=1e-18)
    np.testing.assert_allclose(w[1], 0.0, atol=0)
    np.testing.assert_allclose(w[2], geo.EARTHW * np.sin(0.9), atol=1e-18)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(w)), geo.EARTHW, atol=1e-18)


def test_projection_roundtrip():
    proj = geo.make_projection(0.82, 0.15)  # ~47°N
    for x, y in [(0.0, 0.0), (1234.5, -678.9), (-5000.0, 3000.0)]:
        lat, lon = geo.nav_to_world(proj, jnp.asarray(x), jnp.asarray(y))
        x2, y2 = geo.world_to_nav(proj, lat, lon)
        np.testing.assert_allclose(float(x2), x, atol=1e-9)
        np.testing.assert_allclose(float(y2), y, atol=1e-9)


def test_projection_nwu_orientation():
    """+x (north) increases latitude; +y (west) decreases longitude."""
    proj = geo.make_projection(0.82, 0.15)
    lat, lon = geo.nav_to_world(proj, jnp.asarray(1000.0), jnp.asarray(1000.0))
    assert float(lat) > 0.82
    assert float(lon) < 0.15
    # 1000 m north ≈ 1000/6.37e6 rad of latitude
    np.testing.assert_allclose(float(lat) - 0.82, 1000.0 / 6.37e6, rtol=0.01)


def test_projection_anchor_identity():
    proj = geo.make_projection(0.82, 0.15)
    lat, lon = geo.nav_to_world(proj, jnp.asarray(0.0), jnp.asarray(0.0))
    np.testing.assert_allclose(float(lat), 0.82, atol=0)
    np.testing.assert_allclose(float(lon), 0.15, atol=0)
