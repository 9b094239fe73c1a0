"""Golden tests: XLA all-pairs force vs the numpy f64 reference oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu.constants import COLLISION_EPSILON, G
from spacetpu.ops import direct
from tests import reference_impl


def _random_bodies(n, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-10, 10, size=(n, 3))
    mass = rng.uniform(0.1, 100.0, size=n)
    return pos, mass


@pytest.mark.parametrize("n", [2, 7, 64])
def test_acc_direct_matches_reference_softening(n):
    pos, mass = _random_bodies(n)
    expected = reference_impl.acc_reference(pos, mass)
    got = direct.acc_direct(
        jnp.asarray(pos, jnp.float64), jnp.asarray(mass, jnp.float64),
        softening="ref",
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12, atol=1e-20)


@pytest.mark.parametrize("eps", [0.0, 0.05])
def test_acc_direct_matches_reference_plummer(eps):
    pos, mass = _random_bodies(33, seed=3)
    expected = reference_impl.acc_plummer(pos, mass, eps=eps)
    got = direct.acc_direct(
        jnp.asarray(pos, jnp.float64), jnp.asarray(mass, jnp.float64),
        softening="plummer", eps=eps,
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12, atol=1e-20)


def test_self_interaction_is_zero():
    # A single body must feel zero force in both softening modes.
    pos = jnp.zeros((1, 3), jnp.float64)
    mass = jnp.ones((1,), jnp.float64)
    for softening, eps in [("ref", COLLISION_EPSILON), ("plummer", 0.0)]:
        acc = direct.acc_direct(pos, mass, softening=softening, eps=eps)
        assert np.all(np.isfinite(np.asarray(acc)))
        np.testing.assert_array_equal(np.asarray(acc), 0.0)


def test_coincident_bodies_finite():
    # Two distinct bodies at the same position: additive-eps mode gives 0
    # force (0/eps); plummer with eps=0 is guarded to 0 rather than NaN.
    pos = jnp.zeros((2, 3), jnp.float64)
    mass = jnp.ones((2,), jnp.float64)
    for softening in ("ref", "plummer"):
        acc = direct.acc_direct(pos, mass, softening=softening)
        assert np.all(np.isfinite(np.asarray(acc))), softening


def test_chunked_matches_dense():
    pos, mass = _random_bodies(128, seed=7)
    dense = direct.acc_direct(
        jnp.asarray(pos), jnp.asarray(mass), softening="plummer", eps=0.01
    )
    chunked = direct.acc_direct_chunked(
        jnp.asarray(pos), jnp.asarray(mass), softening="plummer", eps=0.01, chunk=32
    )
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense), rtol=1e-12)


def test_massless_bodies_exert_no_force():
    # fixed_shell-style: massless bodies feel gravity but exert none
    # (the case the reference handles at tree.rs:124-131).
    pos = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]], jnp.float64)
    mass = jnp.asarray([100.0, 0.0], jnp.float64)
    acc = direct.acc_direct(pos, mass, softening="ref")
    np.testing.assert_array_equal(np.asarray(acc)[0], 0.0)  # heavy feels nothing
    assert np.asarray(acc)[1, 0] < 0  # massless pulled toward the heavy body


def test_momentum_conserving_pair_force():
    # Newton's third law: total momentum change is zero for equal softening.
    pos, mass = _random_bodies(16, seed=11)
    acc = direct.acc_direct(
        jnp.asarray(pos), jnp.asarray(mass), softening="plummer", eps=0.1
    )
    total = np.asarray(acc * np.asarray(mass)[:, None]).sum(0)
    np.testing.assert_allclose(total, 0.0, atol=1e-12)


def test_two_body_circular_orbit_analytic():
    # Massive central body + test particle on a circular orbit:
    # |a| = G M / r^2.
    pos = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]], jnp.float64)
    mass = jnp.asarray([1e7, 0.0], jnp.float64)
    acc = direct.acc_direct(pos, mass, softening="plummer", eps=0.0)
    expected = G * 1e7 / 4.0
    np.testing.assert_allclose(-np.asarray(acc)[1, 0], expected, rtol=1e-12)
