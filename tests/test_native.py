"""Native (C++) golden engine tests: build, parity with the numpy oracle,
and large-N golden checks of the JAX solvers against it."""

import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu import native
from spacetpu.constants import COLLISION_EPSILON, G
from spacetpu.ops import direct, tree
from tests import reference_impl


def _bodies(n, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-5, 5, size=(n, 3))
    mass = rng.uniform(0.1, 10.0, size=n)
    return pos, mass


def test_native_builds_and_loads():
    assert native.lib() is not None


def test_native_matches_numpy_oracle():
    pos, mass = _bodies(80)
    a = native.acc_direct(pos, mass, g=G, eps=COLLISION_EPSILON, softening="ref")
    b = reference_impl.acc_reference(pos, mass)
    np.testing.assert_allclose(a, b, rtol=1e-13, atol=1e-300)


def test_native_rollout_matches_numpy_oracle():
    pos, mass = _bodies(40, seed=1)
    vel = np.zeros_like(pos)
    p1, v1 = native.rollout(pos, vel, mass, dt=10.0, steps=20, g=G,
                            eps=COLLISION_EPSILON, softening="ref")
    p2, v2 = reference_impl.rollout_reference(pos, vel, mass, 10.0, 20)
    np.testing.assert_allclose(p1, p2, rtol=1e-12)
    np.testing.assert_allclose(v1, v2, rtol=1e-12)


def test_jax_direct_matches_native_large_n():
    """Golden check at N=3000 — far beyond what the Python-loop oracle can
    do in reasonable time."""
    pos, mass = _bodies(3000, seed=2)
    want = native.acc_direct(pos, mass, g=1.0, eps=1e-2, softening="plummer")
    got = direct.acc_direct(
        jnp.asarray(pos), jnp.asarray(mass), softening="plummer", eps=1e-2,
        g=1.0,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-14)


def test_native_barnes_hut_accuracy():
    """The quirk-faithful octree's force error vs direct is theta-bounded."""
    pos, mass = _bodies(2000, seed=3)
    exact = native.acc_direct(pos, mass, g=1.0, eps=0.0, softening="plummer")
    for theta, bound in [(0.3, 2e-3), (0.5, 1e-2)]:
        approx = native.acc_barnes_hut(pos, mass, theta=theta, g=1.0, eps=0.0,
                                       softening="plummer")
        scale = np.linalg.norm(exact, axis=-1).mean()
        err = np.linalg.norm(approx - exact, axis=-1) / scale
        assert np.median(err) < bound, (theta, np.median(err))


def test_native_barnes_hut_massless_excluded():
    pos, _ = _bodies(500, seed=4)
    mass = np.zeros(500)
    mass[0] = 50.0
    a = native.acc_barnes_hut(pos, mass, theta=0.5, g=1.0, eps=1e-3,
                              softening="plummer")
    exact = native.acc_direct(pos, mass, g=1.0, eps=1e-3, softening="plummer")
    np.testing.assert_allclose(a, exact, atol=1e-10 * np.abs(exact).max())
    # all-massless: zero forces (empty-tree early-out)
    z = native.acc_barnes_hut(pos, np.zeros(500), theta=0.5, g=1.0, eps=1e-3,
                              softening="plummer")
    np.testing.assert_array_equal(z, 0.0)


def test_jax_tree_vs_native_tree():
    """Two independent tree implementations (clustered TPU treecode vs
    quirk-faithful octree) agree with each other to theta-accuracy."""
    pos, mass = _bodies(4000, seed=5)
    a = native.acc_barnes_hut(pos, mass, theta=0.4, g=1.0, eps=1e-2,
                              softening="plummer")
    b = np.asarray(
        tree.acc_tree(jnp.asarray(pos), jnp.asarray(mass), theta=0.4,
                      softening="plummer", eps=1e-2, g=1.0, backend="xla")
    )
    exact = native.acc_direct(pos, mass, g=1.0, eps=1e-2, softening="plummer")
    scale = np.linalg.norm(exact, axis=-1).mean()
    for approx in (a, b):
        err = np.linalg.norm(approx - exact, axis=-1) / scale
        assert np.median(err) < 5e-3


def test_native_energy():
    pos, mass = _bodies(300, seed=6)
    vel = np.zeros_like(pos)
    e = native.total_energy(pos, vel, mass, g=1.0, eps=1e-2)
    from spacetpu.ops import energy

    e_jax = float(
        energy.total_energy(jnp.asarray(pos), jnp.asarray(vel),
                            jnp.asarray(mass), eps=1e-2, g=1.0)
    )
    np.testing.assert_allclose(e, e_jax, rtol=1e-10)
