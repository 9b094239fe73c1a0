"""Integrator tests: reference-compat Euler trajectories, leapfrog energy
behaviour, Kahan compensation."""

import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu import make_simulation, make_state, reference_compatible
from spacetpu.constants import DELTA, G
from spacetpu.models import presets
from spacetpu.ops import energy
from tests import reference_impl


def _cloud_state(n=60, dtype=jnp.float64):
    scene = presets.fixed_cloud(n)
    return scene, scene.state(dtype=dtype)


def test_euler_matches_reference_rollout():
    """Golden trajectory: our euler+ref-softening path must track the f64
    numpy oracle (which mirrors direct.rs:8-24) to float64 tolerance."""
    scene, state = _cloud_state(40)
    sim = reference_compatible(state.n)
    steps = 25
    out = sim.run(state, DELTA, steps)
    exp_pos, exp_vel = reference_impl.rollout_reference(
        scene.pos, scene.vel, scene.mass, DELTA, steps
    )
    np.testing.assert_allclose(np.asarray(out.pos), exp_pos, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(out.vel), exp_vel, rtol=1e-10, atol=1e-14)


def test_step_equals_run():
    _, state = _cloud_state(30)
    sim = reference_compatible(state.n)
    s1 = state
    for _ in range(5):
        s1 = sim.step(s1, DELTA)
    _, state2 = _cloud_state(30)
    s2 = sim.run(state2, DELTA, 5)
    np.testing.assert_allclose(np.asarray(s1.pos), np.asarray(s2.pos), rtol=1e-12)


def test_leapfrog_two_body_energy():
    """Leapfrog on an eccentric two-body orbit: energy drift bounded and
    far better than euler at the same dt."""
    # Central mass with a light orbiter, natural units g=1.
    pos = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float64)
    vel = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.8, 0.0]], jnp.float64)
    mass = jnp.asarray([1.0, 1e-9], jnp.float64)
    dt = 1e-3
    steps = 2000

    def drift(integrator):
        sim = make_simulation(
            2, algorithm="direct", backend="xla", integrator=integrator,
            softening="plummer", eps=0.0, g=1.0,
        )
        st = make_state(pos, vel, mass, dtype=jnp.float64)
        st = sim.prime(st)
        e0 = float(energy.total_energy(st.pos, st.vel, st.mass, g=1.0))
        st = sim.run(st, dt, steps)
        e1 = float(energy.total_energy(st.pos, st.vel, st.mass, g=1.0))
        return abs((e1 - e0) / e0)

    lf = drift("leapfrog")
    eu = drift("euler")
    assert lf < 1e-5
    assert lf < eu / 10


def _two_body_drift(integrator, dt, steps):
    """|E(t_end)-E0|/|E0| for the eccentric (e=0.36) two-body orbit."""
    pos = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float64)
    vel = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.8, 0.0]], jnp.float64)
    mass = jnp.asarray([1.0, 1e-9], jnp.float64)
    sim = make_simulation(
        2, algorithm="direct", backend="xla", integrator=integrator,
        softening="plummer", eps=0.0, g=1.0,
    )
    st = make_state(pos, vel, mass, dtype=jnp.float64)
    st = sim.prime(st)
    e0 = float(energy.total_energy(st.pos, st.vel, st.mass, g=1.0))
    st = sim.run(st, dt, steps)
    e1 = float(energy.total_energy(st.pos, st.vel, st.mass, g=1.0))
    return abs((e1 - e0) / e0)


def test_yoshida4_beats_leapfrog():
    """At the same dt, the 4th-order composition's energy error must be
    orders of magnitude below leapfrog's (dt^4 vs dt^2)."""
    y4 = _two_body_drift("yoshida4", 4e-3, 1000)
    lf = _two_body_drift("leapfrog", 4e-3, 1000)
    assert y4 < lf / 100
    assert y4 < 1e-9


def test_yoshida4_convergence_order():
    """Halving dt (same total time) must shrink the energy error ~16x;
    accept anything clearly beyond leapfrog's 4x."""
    coarse = _two_body_drift("yoshida4", 8e-3, 500)
    fine = _two_body_drift("yoshida4", 4e-3, 1000)
    assert coarse / max(fine, 1e-15) > 8


def test_yoshida4_time_reversible_and_time_exact():
    """The (w1, w0, w1) composition is symmetric, hence time-reversible,
    and each step must advance state.time by exactly dt (not the rounded
    substep-weight sum)."""
    _, state = _cloud_state(20)
    sim = make_simulation(
        state.n, algorithm="direct", backend="xla", integrator="yoshida4",
        softening="plummer", eps=0.01,
    )
    state = sim.prime(state)
    start = np.asarray(state.pos).copy()
    fwd = sim.run(state, 50.0, 20)
    assert float(fwd.time) == pytest.approx(20 * 50.0, rel=0, abs=0)
    rev = sim.prime(fwd._replace(vel=-fwd.vel))
    back = sim.run(rev, 50.0, 20)
    np.testing.assert_allclose(np.asarray(back.pos), start, rtol=0, atol=1e-8)


def test_leapfrog_time_reversible():
    """Leapfrog is time-reversible: forward k steps, negate velocities,
    forward k steps -> back at the start (up to roundoff)."""
    _, state = _cloud_state(20)
    sim = make_simulation(
        state.n, algorithm="direct", backend="xla", integrator="leapfrog",
        softening="plummer", eps=0.01,
    )
    state = sim.prime(state)
    start = np.asarray(state.pos).copy()  # snapshot: run() donates its input
    fwd = sim.run(state, 50.0, 50)
    rev = fwd._replace(vel=-fwd.vel)
    rev = sim.prime(rev)
    back = sim.run(rev, 50.0, 50)
    np.testing.assert_allclose(np.asarray(back.pos), start, rtol=0, atol=1e-8)


def test_kahan_compensation_improves_f32():
    """f32 with Kahan compensation should track the f64 trajectory much
    more closely than plain f32 when displacements are ~ulp(pos)."""
    scene = presets.fixed_cloud(50)

    def run(dtype, compensated):
        st = scene.state(dtype=dtype, compensated=compensated)
        sim = make_simulation(
            st.n, algorithm="direct", backend="xla", integrator="leapfrog",
            softening="plummer", eps=0.0,
        )
        st = sim.prime(st)
        st = sim.run(st, DELTA, 400)
        return np.asarray(st.pos, np.float64)

    exact = run(jnp.float64, False)
    plain = run(jnp.float32, False)
    comp = run(jnp.float32, True)
    err_plain = np.abs(plain - exact).max()
    err_comp = np.abs(comp - exact).max()
    # At AU scale with dt=10s the per-step displacement is ~ulp; compensation
    # must recover at least an order of magnitude.
    assert err_comp < err_plain / 10


def test_time_accumulates():
    _, state = _cloud_state(8)
    sim = reference_compatible(state.n)
    out = sim.run(state, DELTA, 7)
    assert float(out.time) == pytest.approx(7 * DELTA)
