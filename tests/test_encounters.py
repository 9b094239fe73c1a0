"""Close-encounter telemetry (ops/encounters.py)."""

import jax.numpy as jnp
import numpy as np

from spacetpu.ops import encounters


def _brute_nn(pos):
    d = np.linalg.norm(pos[None] - pos[:, None], axis=-1)
    np.fill_diagonal(d, np.inf)
    return d.min(axis=1), d.argmin(axis=1)


def test_nearest_neighbor_matches_brute_force():
    rng = np.random.default_rng(7)
    pos = rng.normal(size=(300, 3))
    dist, idx = encounters.nearest_neighbor(jnp.asarray(pos))
    bd, bi = _brute_nn(pos)
    np.testing.assert_allclose(np.asarray(dist), bd, rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(idx), bi)


def test_nearest_neighbor_chunked_parity():
    rng = np.random.default_rng(8)
    pos = rng.normal(size=(1000, 3))
    d1, i1 = encounters.nearest_neighbor(jnp.asarray(pos), chunk=4096)
    d2, i2 = encounters.nearest_neighbor(jnp.asarray(pos), chunk=128)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_min_separation_finds_planted_pair():
    rng = np.random.default_rng(9)
    pos = rng.normal(size=(500, 3)) * 10
    pos[123] = pos[77] + np.array([1e-4, 0, 0])
    d, i, j = encounters.min_separation(jnp.asarray(pos), chunk=256)
    assert {int(i), int(j)} == {123, 77}
    np.testing.assert_allclose(float(d), 1e-4, rtol=1e-6)


def test_mask_excludes_dead_rows():
    rng = np.random.default_rng(11)
    pos = rng.normal(size=(400, 3)) * 10
    pos[50] = pos[10]  # dead tracer riding body 10 at d=0
    mask = np.ones(400, bool)
    mask[50] = False
    d, i, j = encounters.min_separation(jnp.asarray(pos),
                                        mask=jnp.asarray(mask))
    assert 50 not in (int(i), int(j))
    assert float(d) > 0
    # chunked path agrees
    d2, i2, j2 = encounters.min_separation(jnp.asarray(pos),
                                           mask=jnp.asarray(mask), chunk=128)
    np.testing.assert_allclose(float(d), float(d2), rtol=1e-12)
    assert (int(i), int(j)) == (int(i2), int(j2))


def test_cli_report_encounters(capsys):
    from spacetpu.main import main

    main(["--platform", "cpu", "--preset", "fixed_cloud", "--n", "200",
          "--frontend", "none", "--steps", "2", "--dt", "1",
          "--report-encounters"])
    out = capsys.readouterr().out
    assert out.count("min separation") == 2
