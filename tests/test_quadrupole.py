"""Quadrupole far-field tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu.ops import direct, tree
from spacetpu.ops.pallas_direct import acc_cross_quad, acc_cross_quad_xla


def _cluster(n, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    pos = jnp.asarray(u * rng.uniform(0, 1, (n, 1)) ** (1 / 3), dtype)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, n) / n, dtype)
    return pos, mass


def test_quad_eval_matches_brute_force_multipole():
    """Monopole+quadrupole of a compact source blob evaluated far away
    must match the exact force to ~(r_blob/d)^3."""
    rng = np.random.default_rng(1)
    blob = jnp.asarray(rng.uniform(-0.1, 0.1, (50, 3)), jnp.float64)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, 50), jnp.float64)
    targets = jnp.asarray(rng.uniform(1.5, 3.0, (20, 3)), jnp.float64)

    exact = np.asarray(
        direct.acc_cross(targets, blob, mass, softening="plummer", eps=0.0,
                         g=1.0)
    )
    # build the summary by hand
    m_tot = jnp.sum(mass)
    com = jnp.sum(blob * mass[:, None], axis=0) / m_tot
    pos_g = blob[None]
    mass_g = mass[None]
    summ = tree._cluster_summaries(
        pos_g, mass_g, com[None], m_tot[None], jnp.float64(1.0)
    )
    quad = np.asarray(acc_cross_quad_xla(targets, summ[:, :1], eps=0.0))
    mono = np.asarray(
        direct.acc_cross(targets, com[None], m_tot[None],
                         softening="plummer", eps=0.0, g=1.0)
    )
    err_mono = np.linalg.norm(mono - exact, axis=-1)
    err_quad = np.linalg.norm(quad - exact, axis=-1)
    # quadrupole must beat monopole by a large factor on every target
    assert np.max(err_quad / np.maximum(err_mono, 1e-300)) < 0.2
    scale = np.linalg.norm(exact, axis=-1)
    assert np.max(err_quad / scale) < 2e-3


def test_quad_pallas_interpret_matches_xla():
    rng = np.random.default_rng(2)
    targets = jnp.asarray(rng.uniform(-1, 1, (100, 3)), jnp.float32)
    summ = jnp.asarray(rng.uniform(-0.5, 0.5, (16, 40)), jnp.float32)
    summ = summ.at[10:].set(0.0)
    a = np.asarray(acc_cross_quad_xla(targets, summ, eps=0.1))
    b = np.asarray(
        acc_cross_quad(targets, summ, eps=0.1, tile_i=64, tile_j=128,
                       interpret=True)
    )
    np.testing.assert_allclose(b, a, rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_tree_order2_beats_order1(backend):
    """At the same theta, the quadrupole tree is far more accurate.
    k_near is capped below the full cluster count so a genuine far field
    exists (otherwise every pair is corrected exactly and both orders are
    trivially exact)."""
    pos, mass = _cluster(8000, seed=3, dtype=jnp.float32)
    kw = dict(theta=0.6, softening="plummer", eps=1e-3, g=1.0, k_near=8,
              backend=backend, interpret=True if backend == "pallas" else None)
    exact = np.asarray(
        direct.acc_direct(pos, mass, softening="plummer", eps=1e-3, g=1.0)
    )
    scale = np.linalg.norm(exact, axis=-1).mean()

    def med_err(order):
        got = np.asarray(tree.acc_tree(pos, mass, multipole_order=order, **kw))
        return np.median(np.linalg.norm(got - exact, axis=-1) / scale)

    e1 = med_err(1)
    e2 = med_err(2)
    assert e2 < e1 / 3, (e1, e2)


def test_tree_order2_grid_com_coincidence_f32():
    """Regression: on regular grids a cluster COM can coincide exactly with
    a body; with eps=0 in f32 the quad kernel's rsqrt overflow produced
    inf*0=NaN (clamping alone is insufficient — the contribution must be
    masked)."""
    from spacetpu.models import presets

    scene = presets.fixed_cloud(2000)
    pos = jnp.asarray(scene.pos, jnp.float32)
    mass = jnp.asarray(scene.mass, jnp.float32)
    for backend in ("xla", "pallas"):
        got = np.asarray(
            tree.acc_tree(pos, mass, theta=0.3, softening="plummer", eps=0.0,
                          g=float(scene.g), backend=backend,
                          multipole_order=2,
                          interpret=True if backend == "pallas" else None)
        )
        assert np.isfinite(got).all(), backend


def test_tree_order2_close_pair_f32_no_overflow():
    """Regression: the Kepler asteroid-belt scene (earth-moon pair 0.0026 AU
    apart, AU units) overflowed the quad kernel's inv^7 intermediates in
    f32 (finite contributions became inf, and the exact far/near
    cancellation died as inf - inf = NaN). The unit-vector formulation must
    stay finite and accurate."""
    from spacetpu.constants import G
    from spacetpu.models import presets

    scene = presets.earth_sun_mars_ast(1500, seed=1)
    pos = jnp.asarray(scene.pos, jnp.float32)
    mass = jnp.asarray(scene.mass, jnp.float32)
    got = np.asarray(
        tree.acc_tree(pos, mass, theta=0.3, softening="plummer", eps=0.0,
                      g=G, backend="xla", multipole_order=2)
    )
    assert np.isfinite(got).all()
    exact = np.asarray(
        direct.acc_direct(pos, mass, softening="plummer", eps=0.0, g=G)
    )
    scale = np.linalg.norm(exact, axis=-1).mean()
    err = np.linalg.norm(got - exact, axis=-1) / scale
    assert np.median(err) < 1e-3


def test_tree_order2_requires_plummer():
    pos, mass = _cluster(300, seed=4)
    with pytest.raises(ValueError, match="plummer"):
        tree.acc_tree(pos, mass, softening="ref", multipole_order=2,
                      backend="xla")


def test_tree_order2_massless_safe():
    pos, _ = _cluster(600, seed=5)
    mass = jnp.zeros((600,), jnp.float64).at[0].set(10.0)
    got = np.asarray(
        tree.acc_tree(pos, mass, theta=0.5, softening="plummer", eps=1e-2,
                      g=1.0, backend="xla", multipole_order=2)
    )
    assert np.isfinite(got).all()
