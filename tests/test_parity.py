"""End-to-end behavioral parity with the reference, via the native oracle.

These tests chain the full reference pipeline — Keplerian scene assembly
(with reference_quirks so even the reference's formula bug is reproduced),
the additive-eps force law, and semi-implicit Euler — and compare the JAX
engine's trajectories against the independent C++ implementation of the
same semantics.
"""

import jax.numpy as jnp
import numpy as np

from spacetpu import native, reference_compatible
from spacetpu.constants import COLLISION_EPSILON, DELTA, G
from spacetpu.models import presets
from spacetpu.models.kepler import convert_params


def test_hierarchical_scene_trajectory_parity():
    """earth/sun/moon/mars assembled with reference quirks, stepped 500
    ticks with the reference integrator: JAX f64 must track the C++ oracle
    to f64 roundoff."""
    scene = convert_params(presets.earth_sun_mars_params(),
                           reference_quirks=True)
    sim = reference_compatible(scene.n)
    state = sim.run(scene.state(dtype=jnp.float64), DELTA, 500)
    p_ref, v_ref = native.rollout(
        scene.pos, scene.vel, scene.mass, dt=DELTA, steps=500,
        g=G, eps=COLLISION_EPSILON, softening="ref",
    )
    np.testing.assert_allclose(np.asarray(state.pos), p_ref, rtol=1e-9,
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(state.vel), v_ref, rtol=1e-9,
                               atol=1e-16)


def test_fixed_cloud_direct_rollout_parity():
    """The default interactive workload shape (fixed_cloud) rolled out with
    the reference-compatible DIRECT solver on both sides: JAX f64 euler must
    track the C++ oracle to f64 roundoff over a short horizon."""
    scene = presets.fixed_cloud(600)
    sim = reference_compatible(scene.n)
    state = sim.run(scene.state(dtype=jnp.float64), DELTA, 50)
    p_ref, _ = native.rollout(
        scene.pos, scene.vel, scene.mass, dt=DELTA, steps=50,
        g=G, eps=COLLISION_EPSILON, softening="ref", algorithm="direct",
    )
    np.testing.assert_allclose(np.asarray(state.pos), p_ref, rtol=1e-10,
                               atol=1e-13)


def test_fixed_cloud_tree_vs_native_tree_rollout():
    """Both TREE implementations (clustered TPU treecode vs quirk-faithful
    octree), rolled out with euler/plummer at matched theta, stay
    statistically consistent with each other over a short horizon — the
    tolerance is the theta-truncation scale, not roundoff."""
    from spacetpu.sim import make_simulation

    scene = presets.fixed_cloud(600)
    sim = make_simulation(scene.n, algorithm="tree", backend="xla",
                          integrator="euler", softening="plummer",
                          eps=1e-4, theta=0.4, g=G)
    state = sim.run(scene.state(dtype=jnp.float64), DELTA, 25)
    p_tree, _ = native.rollout(
        scene.pos, scene.vel, scene.mass, dt=DELTA, steps=25,
        g=G, eps=1e-4, softening="plummer", algorithm="barnes_hut",
        theta=0.4,
    )
    # Compare displacement errors against the typical displacement scale:
    # both trees approximate the same dynamics to theta accuracy.
    moved = np.linalg.norm(p_tree - scene.pos, axis=-1)
    err = np.linalg.norm(np.asarray(state.pos) - p_tree, axis=-1)
    scale = np.median(moved) + 1e-30
    assert np.median(err) / scale < 0.05, (np.median(err), scale)


def test_earth_orbit_period():
    """Physics sanity: with the corrected (non-quirk) converter, Earth
    returns near its starting position after one year of simulated time."""
    scene = presets.earth_sun_mars()
    sim = reference_compatible(scene.n)
    year_s = 365.25 * 86400
    dt = 3600.0  # 1 hour
    steps = int(year_s / dt)
    state = sim.run(scene.state(dtype=jnp.float64), dt, steps)
    start_rel = scene.pos[1] - scene.pos[0]
    end_rel = np.asarray(state.pos[1] - state.pos[0])
    # |r| preserved to ~1%, and the phase has come back around
    np.testing.assert_allclose(
        np.linalg.norm(end_rel), np.linalg.norm(start_rel), rtol=0.02
    )
    cos_angle = (start_rel @ end_rel) / (
        np.linalg.norm(start_rel) * np.linalg.norm(end_rel)
    )
    assert cos_angle > 0.99, f"earth did not return: cos={cos_angle}"
