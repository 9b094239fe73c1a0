"""Pallas all-pairs kernel tests (interpret mode on CPU; the same kernel
compiles natively on TPU — see bench_kernels.py for on-chip validation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu.ops import direct, pallas_direct


def _bodies(n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)), dtype)
    mass = jnp.asarray(rng.uniform(0.1, 1.0, size=n), dtype)
    return pos, mass


@pytest.mark.parametrize("softening,eps", [("plummer", 1e-2), ("ref", 1e-9)])
def test_pallas_matches_xla(softening, eps):
    pos, mass = _bodies(256)
    want = direct.acc_direct(pos, mass, softening=softening, eps=eps, g=1.0)
    got = pallas_direct.acc_direct_pallas(
        pos, mass, softening=softening, eps=eps, g=1.0,
        tile_i=64, tile_j=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_pallas_ragged_n_padding():
    # N not a multiple of the tiles: wrapper pads with zero-mass bodies.
    pos, mass = _bodies(100, seed=1)
    want = direct.acc_direct(pos, mass, softening="plummer", eps=1e-2, g=1.0)
    got = pallas_direct.acc_direct_pallas(
        pos, mass, softening="plummer", eps=1e-2, g=1.0,
        tile_i=64, tile_j=128, interpret=True,
    )
    assert got.shape == (100, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_pallas_cross():
    pos_i, _ = _bodies(64, seed=2)
    pos_j, mass_j = _bodies(192, seed=3)
    want = direct.acc_cross(pos_i, pos_j, mass_j, softening="plummer", eps=1e-2, g=1.0)
    got = pallas_direct.acc_cross_pallas(
        pos_i, pos_j, mass_j, softening="plummer", eps=1e-2, g=1.0,
        tile_i=64, tile_j=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_pallas_ref_softening_zero_eps_finite():
    """Regression: 'ref' softening with eps=0 must not NaN on the diagonal
    (denom = r^3 + 0 = 0 for self-pairs)."""
    pos, mass = _bodies(64, seed=5)
    want = direct.acc_direct(pos, mass, softening="ref", eps=0.0, g=1.0)
    got = pallas_direct.acc_direct_pallas(
        pos, mass, softening="ref", eps=0.0, g=1.0,
        tile_i=64, tile_j=128, interpret=True,
    )
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=1e-6)


def test_sim_pallas_method_mxu():
    """make_simulation(pallas_method='mxu') wires the MXU kernel into the
    direct solver; forces stay within the expanded-form error band of the
    exact vpu path at production softening."""
    from spacetpu import make_simulation

    pos, mass = _bodies(256, seed=7)
    kw = dict(algorithm="direct", backend="pallas", softening="plummer",
              eps=1e-2, g=1.0)
    a_vpu = make_simulation(256, pallas_method="vpu", **kw).acc_fn(pos, mass)
    a_mxu = make_simulation(256, pallas_method="mxu", **kw).acc_fn(pos, mass)
    scale = np.linalg.norm(np.asarray(a_vpu), axis=1).max()
    err = np.linalg.norm(np.asarray(a_mxu) - np.asarray(a_vpu), axis=1)
    assert err.max() / scale < 2e-3


def test_sim_pallas_method_mxu_validation():
    from spacetpu import make_simulation

    with pytest.raises(ValueError, match="mxu"):
        make_simulation(128, algorithm="direct", backend="pallas",
                        softening="ref", pallas_method="mxu")
    with pytest.raises(ValueError, match="mxu"):
        make_simulation(128, algorithm="direct", backend="pallas",
                        softening="plummer", eps=0.0, pallas_method="mxu")
    with pytest.raises(ValueError, match="pallas_method"):
        make_simulation(128, pallas_method="tensor")


def test_mxu_requires_positive_eps():
    pos, mass = _bodies(64, seed=6)
    with pytest.raises(ValueError, match="eps > 0"):
        pallas_direct.acc_direct_pallas(
            pos, mass, softening="plummer", eps=0.0, method="mxu",
            interpret=True,
        )


def test_pallas_zero_eps_diagonal_guard():
    # eps=0 plummer: the diagonal would be 0 * inf = NaN without the guard.
    pos, mass = _bodies(64, seed=4)
    got = pallas_direct.acc_direct_pallas(
        pos, mass, softening="plummer", eps=0.0, g=1.0,
        tile_i=64, tile_j=128, interpret=True,
    )
    assert np.all(np.isfinite(np.asarray(got)))
