"""Preset scene tests: structure, units, orbital sanity."""

import math

import numpy as np
import pytest

from spacetpu.constants import AU, G, M0
from spacetpu.models import kepler, presets


def test_earth_sun_basic():
    s = presets.earth_sun_basic()
    assert s.names == ["sun", "earth"]
    assert s.mass[0] == 333000.0 and s.mass[1] == 1.0
    np.testing.assert_allclose(s.pos[1], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(s.vel[1, 1], (29.8e3 + 1e3) / AU)


def test_fixed_cloud_shapes_and_center():
    s = presets.fixed_cloud(100)
    assert s.n == 101
    assert s.names[0] == "Center"
    np.testing.assert_allclose(s.pos[0], [-15.0, 0.0, 0.0])
    assert s.mass[0] == 1e7
    assert np.all(s.mass[1:] == 1e4)
    # grid positions within [-10, 10]
    assert s.pos[1:].min() >= -10.0 - 1e-9
    assert s.pos[1:].max() <= 10.0 + 1e-9


def test_fixed_cloud_circular_speed():
    """Grid bodies get |v| = sqrt(G M / r) * |axis x r_hat| about the center
    (presets.rs:169-176, cross product not normalized)."""
    s = presets.fixed_cloud(64)
    rel = s.pos[1:] - s.pos[0]
    r = np.linalg.norm(rel, axis=-1)
    axis = np.array([0.0, 1.0, 1.0]) / math.sqrt(2)
    cross = np.cross(np.broadcast_to(axis, rel.shape), rel / r[:, None])
    expected = np.linalg.norm(cross, axis=-1) * np.sqrt(G * 1e7 / r)
    np.testing.assert_allclose(np.linalg.norm(s.vel[1:], axis=-1), expected, rtol=1e-12)


def test_fixed_shell_massless():
    s = presets.fixed_shell(50)
    assert s.n == 51
    assert s.mass[0] == 1e7
    np.testing.assert_array_equal(s.mass[1:], 0.0)
    r = np.linalg.norm(s.pos[1:], axis=-1)
    np.testing.assert_allclose(r, 10.0, rtol=1e-12)
    # velocities tangential: v . r = 0
    dots = np.abs(np.sum(s.vel[1:] * s.pos[1:], axis=-1))
    np.testing.assert_allclose(dots, 0.0, atol=1e-12)


def test_earth_sun_mars_structure():
    s = presets.earth_sun_mars()
    assert s.names == ["sun", "earth", "moon", "mars"]
    # Earth ~1 AU from the sun, moon ~0.0026 AU from earth, mars ~1.5 AU.
    d_earth = np.linalg.norm(s.pos[1] - s.pos[0])
    d_moon = np.linalg.norm(s.pos[2] - s.pos[1])
    d_mars = np.linalg.norm(s.pos[3] - s.pos[0])
    assert 0.95 < d_earth < 1.05
    assert 0.002 < d_moon < 0.003
    assert 1.3 < d_mars < 1.6


def test_earth_orbital_speed():
    """Earth's speed relative to the sun should be ~29.8 km/s."""
    s = presets.earth_sun_mars()
    v_rel = np.linalg.norm(s.vel[1] - s.vel[0]) * AU  # m/s
    assert 28e3 < v_rel < 31e3


def test_barycenter_momentum_correction():
    """After convert_params the total momentum of the system must vanish
    when the root is at rest (the point of parameters.rs:186-224)."""
    s = presets.earth_sun_mars()
    p_total = (s.mass[:, None] * s.vel).sum(0)
    p_scale = np.abs(s.mass[:, None] * s.vel).sum()
    assert np.abs(p_total).max() < 1e-10 * p_scale


def test_asteroid_belt_deterministic_seed():
    a = presets.earth_sun_mars_ast(50, seed=42)
    b = presets.earth_sun_mars_ast(50, seed=42)
    np.testing.assert_array_equal(a.pos, b.pos)
    assert a.n == 54


def test_kepler_circular_orbit_velocity():
    """e=0, i=0 orbit: speed must equal sqrt(mu/a) at every true anomaly."""
    a_m = 1.0 * AU
    parent_mass = 333000.0
    for nu in [0.0, 45.0, 133.7, 270.0]:
        pos, vel = kepler.elements_to_state(
            kepler.RelativeCoords(
                parent="x", semi_major_axis=a_m, eccentricity=0.0,
                inclination=0.0, arg_periapsis=0.0, long_asc_node=0.0,
                true_an=nu,
            ),
            np.zeros(3), np.zeros(3), parent_mass, 0.0,
        )
        mu = 6.674e-11 * parent_mass * M0
        np.testing.assert_allclose(np.linalg.norm(pos), a_m, rtol=1e-12)
        np.testing.assert_allclose(
            np.linalg.norm(vel), math.sqrt(mu / a_m), rtol=1e-12
        )
        # velocity perpendicular to radius for a circular orbit
        scale = np.linalg.norm(pos) * np.linalg.norm(vel)
        np.testing.assert_allclose((pos @ vel) / scale, 0.0, atol=1e-12)


def test_kepler_vis_viva():
    """Eccentric orbit: v^2 = mu (2/r - 1/a) (vis-viva) at any anomaly."""
    a_m = 2.3 * AU
    e = 0.4
    parent_mass = 333000.0
    mu = 6.674e-11 * (parent_mass + 1.0) * M0
    for nu in [0.0, 60.0, 200.0]:
        pos, vel = kepler.elements_to_state(
            kepler.RelativeCoords(
                parent="x", semi_major_axis=a_m, eccentricity=e,
                inclination=20.0, arg_periapsis=30.0, long_asc_node=40.0,
                true_an=nu,
            ),
            np.zeros(3), np.zeros(3), parent_mass, 1.0,
        )
        r = np.linalg.norm(pos)
        v2 = vel @ vel
        np.testing.assert_allclose(v2, mu * (2.0 / r - 1.0 / a_m), rtol=1e-10)


def test_kepler_reference_quirk_mode():
    """reference_quirks=True reproduces the reference's exact formula
    (parameters.rs:76-133), including its z = r sin(i) cos(u) position bug;
    the two modes agree for equatorial orbits and differ for inclined ones."""
    coords = dict(
        parent="x", semi_major_axis=2.0 * AU, eccentricity=0.3,
        arg_periapsis=30.0, long_asc_node=40.0, true_an=60.0,
    )
    # i = 0: identical
    flat = kepler.RelativeCoords(inclination=0.0, **coords)
    p0, v0 = kepler.elements_to_state(flat, np.zeros(3), np.zeros(3), 1e5, 1.0)
    p1, v1 = kepler.elements_to_state(
        flat, np.zeros(3), np.zeros(3), 1e5, 1.0, reference_quirks=True
    )
    np.testing.assert_allclose(p0, p1)
    np.testing.assert_allclose(v0, v1)
    # inclined: z position differs by the cos(u) vs sin(u) quirk
    inc = kepler.RelativeCoords(inclination=25.0, **coords)
    pq, _ = kepler.elements_to_state(
        inc, np.zeros(3), np.zeros(3), 1e5, 1.0, reference_quirks=True
    )
    ps, _ = kepler.elements_to_state(inc, np.zeros(3), np.zeros(3), 1e5, 1.0)
    r = np.linalg.norm(ps)
    u = math.radians(30.0 + 60.0)
    si = math.sin(math.radians(25.0))
    np.testing.assert_allclose(pq[2], r * si * math.cos(u), rtol=1e-10)
    np.testing.assert_allclose(ps[2], r * si * math.sin(u), rtol=1e-10)


def test_random_cluster_and_plummer():
    rc = presets.random_cluster(256, seed=1)
    assert rc.n == 256
    np.testing.assert_allclose(rc.mass.sum(), 1.0, rtol=1e-12)
    assert np.linalg.norm(rc.pos, axis=-1).max() <= 1.0 + 1e-9

    pl = presets.plummer_sphere(512, seed=2)
    assert pl.n == 512
    np.testing.assert_allclose(pl.mass.sum(), 1.0, rtol=1e-12)
    # centered
    np.testing.assert_allclose(pl.pos.mean(0), 0.0, atol=1e-12)
    np.testing.assert_allclose(pl.vel.mean(0), 0.0, atol=1e-12)


def test_registry():
    for name in ["fixed_cloud", "fixed_shell", "random_cluster"]:
        assert name in presets.PRESETS

def test_colliding_plummers():
    sc = presets.colliding_plummers(600, seed=3)
    assert sc.n == 600
    np.testing.assert_allclose(sc.mass.sum(), 1.0, rtol=1e-12)
    # two clumps approaching each other along x, net momentum zero
    np.testing.assert_allclose((sc.mass[:, None] * sc.vel).sum(0), 0.0,
                               atol=1e-12)
    a, b = sc.pos[:300], sc.pos[300:]
    assert a[:, 0].mean() < -1.0 and b[:, 0].mean() > 1.0
    assert sc.vel[:300, 0].mean() > 0.1 and sc.vel[300:, 0].mean() < -0.1
