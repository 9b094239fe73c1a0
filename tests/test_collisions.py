"""Perfectly inelastic collision merging (ops/collisions.py)."""

import jax.numpy as jnp
import numpy as np

from spacetpu import make_simulation, make_state
from spacetpu.ops import collisions, energy


def _state(pos, vel, mass):
    st = make_state(np.asarray(pos, float), np.asarray(vel, float),
                    np.asarray(mass, float), dtype=jnp.float64)
    return st._replace(acc=jnp.ones_like(st.pos))  # nonzero cache to check


def test_merge_overlapping_pair_conserves_momentum():
    st = _state([[0.0, 0, 0], [0.05, 0, 0], [10, 0, 0]],
                [[1.0, 0, 0], [-1, 0, 0], [0, 1, 0]],
                [2.0, 1.0, 5.0])
    radii = jnp.asarray([0.04, 0.04, 0.01], jnp.float64)
    p0 = np.asarray(energy.momentum(st.vel, st.mass))
    out, r2, merged, i, j, de = collisions.merge_closest(st, radii)
    assert bool(merged) and {int(i), int(j)} == {0, 1}
    p1 = np.asarray(energy.momentum(out.vel, out.mass))
    np.testing.assert_allclose(p1, p0, atol=1e-14)
    k = int(i)
    assert float(out.mass[k]) == 3.0
    # barycenter of (2 @ 0) and (1 @ 0.05)
    np.testing.assert_allclose(np.asarray(out.pos[k]),
                               [0.05 / 3, 0, 0], atol=1e-15)
    np.testing.assert_allclose(float(r2[k]), (2 * 0.04 ** 3) ** (1 / 3))
    other = int(j)
    assert float(out.mass[other]) == 0.0
    assert float(r2[other]) == 0.0
    # both rows ride at the barycenter; acc cache zeroed for re-prime
    np.testing.assert_allclose(np.asarray(out.pos[other]),
                               np.asarray(out.pos[k]))
    assert float(jnp.sum(jnp.abs(out.acc[k]))) == 0.0
    # inelastic loss: 0.5 * mi*mj/mtot * |dv|^2 = 0.5 * (2/3) * 4
    np.testing.assert_allclose(float(de), 4.0 / 3.0, rtol=1e-12)


def test_no_merge_when_separated():
    st = _state([[0.0, 0, 0], [1.0, 0, 0]], [[0.0, 0, 0], [0, 0, 0]],
                [1.0, 1.0])
    radii = jnp.asarray([0.1, 0.1], jnp.float64)
    out, r2, merged, _, _, de = collisions.merge_closest(st, radii)
    assert not bool(merged)
    np.testing.assert_array_equal(np.asarray(out.mass), [1.0, 1.0])
    np.testing.assert_array_equal(np.asarray(r2), [0.1, 0.1])


def test_absorbed_bodies_never_remerge():
    st = _state([[0.0, 0, 0], [0.05, 0, 0]], [[0.0, 0, 0], [0, 0, 0]],
                [1.0, 1.0])
    radii = jnp.asarray([0.1, 0.1], jnp.float64)
    st, radii, n, _ = collisions.merge_all_overlapping(st, radii)
    assert n == 1
    # the tracer sits at the merged body (d=0) but has radius 0: no merge
    _, _, merged, _, _, _ = collisions.merge_closest(st, radii)
    assert not bool(merged)


def test_dead_tracer_does_not_shadow_other_encounters():
    """Regression: after a merge, the absorbed tracer sits at d=0 on its
    host — it must be excluded from the pair search so OTHER overlapping
    pairs still merge (two independent overlapping pairs here)."""
    st = _state([[0.0, 0, 0], [0.05, 0, 0], [10.0, 0, 0], [10.06, 0, 0]],
                [[0.0, 0, 0]] * 4, [1.0, 1.0, 1.0, 1.0])
    radii = jnp.asarray([0.04, 0.04, 0.04, 0.04], jnp.float64)
    st, radii, n, _ = collisions.merge_all_overlapping(st, radii)
    assert n == 2
    masses = sorted(float(m) for m in np.asarray(st.mass))
    assert masses == [0.0, 0.0, 2.0, 2.0]


def test_collision_course_rollout_merges():
    """Two heavy bodies launched at each other inside a simulation: after
    the merge check, one body carries the summed mass and the system keeps
    integrating cleanly."""
    st = make_state(
        np.array([[-1.0, 0, 0], [1.0, 0, 0]]),
        np.array([[0.5, 0, 0], [-0.5, 0, 0]]),
        np.array([1.0, 1.0]), dtype=jnp.float64)
    radii = jnp.asarray([0.05, 0.05], jnp.float64)
    sim = make_simulation(2, algorithm="direct", backend="xla",
                          softening="plummer", eps=1e-3, g=1.0)
    st = sim.prime(st)
    merged_at = None
    for step in range(200):
        st = sim.step(st, 2e-2)
        st, radii, merged, _, _, _ = collisions.merge_closest(st, radii)
        if bool(merged):
            merged_at = step
            st = sim.prime(st)
            break
    assert merged_at is not None
    masses = sorted(float(m) for m in np.asarray(st.mass))
    assert masses == [0.0, 2.0]
    st = sim.run(st, 2e-2, 10)
    assert np.isfinite(np.asarray(st.pos)).all()
    # merged momentum ~ 0 (head-on, equal masses)
    p = np.asarray(energy.momentum(st.vel, st.mass))
    np.testing.assert_allclose(p, 0.0, atol=1e-10)


def test_engine_loop_merges_and_publishes_radii():
    """The interactive sim loop merges at batch cadence and hands the
    post-merge radii to the frontend via on_merge/radii_snapshot."""
    import threading
    import time

    from spacetpu.engine import Exchange, SimEngine

    st = make_state(
        np.array([[-0.5, 0, 0], [0.5, 0, 0]]),
        np.array([[0.25, 0, 0], [-0.25, 0, 0]]),
        np.array([1.0, 1.0]), dtype=jnp.float64)
    sim = make_simulation(2, algorithm="direct", backend="xla",
                          softening="plummer", eps=1e-3, g=1.0)
    radii = np.array([0.05, 0.05])
    eng = SimEngine(sim, st, delta=2e-2, merge_every=2, radii=radii)
    with eng:
        deadline = time.time() + 60
        while time.time() < deadline:
            eng.check_health()
            if float(eng.radii_snapshot.max()) > 0.055:  # volume-additive
                break
            time.sleep(0.05)
    assert eng.final_state is not None
    masses = sorted(float(m) for m in np.asarray(eng.final_state.mass))
    assert masses == [0.0, 2.0]
    r = sorted(float(x) for x in eng.radii_snapshot)
    np.testing.assert_allclose(r[1], (2 * 0.05 ** 3) ** (1 / 3), rtol=1e-5)
    assert r[0] == 0.0


def test_cli_merge_collisions_flag():
    from spacetpu.main import main

    main(["--platform", "cpu", "--preset", "fixed_cloud", "--n", "100",
          "--frontend", "none", "--steps", "4", "--dt", "1",
          "--merge-collisions", "2"])
