"""Two-level multirate leapfrog (ops/multirate.py).

The machinery has two exact limiting cases — fast_cap=N reduces to plain
fine-stepped leapfrog, substeps=1 reduces to plain leapfrog at dt — and the
useful regime (F < N) is pinned by accuracy/conservation measurements on a
scene with a genuine timescale split.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu import make_simulation, make_state
from spacetpu.models import presets
from spacetpu.ops import energy


def _binary_in_cloud(n_cloud=96, seed=3):
    """A tight, eccentric binary embedded in a slow far-out cloud: the
    binary needs ~30x the cloud's time resolution — the multirate target."""
    rng = np.random.default_rng(seed)
    # binary: total mass 2, separation 0.02, eccentric
    pos = [[0.01, 0.0, 0.0], [-0.01, 0.0, 0.0]]
    v = 0.8 * np.sqrt(1.0 / 0.02)  # sub-circular -> eccentric
    vel = [[0.0, 0.5 * v, 0.0], [0.0, -0.5 * v, 0.0]]
    mass = [1.0, 1.0]
    # cloud: light bodies on a far shell, near-circular speeds
    u = rng.normal(size=(n_cloud, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    r = 4.0 + rng.uniform(0, 1, n_cloud)
    cp = u * r[:, None]
    axis = np.array([0.0, 0.0, 1.0])
    tang = np.cross(axis, u)
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    cv = tang * np.sqrt(2.0 / r)[:, None]
    pos = np.concatenate([pos, cp])
    vel = np.concatenate([vel, cv])
    mass = np.concatenate([mass, np.full(n_cloud, 1e-6)])
    return pos, vel, mass


def _sim(n, *, substeps=1, fast_cap="auto", integrator="leapfrog",
         compensated=False, dtype=jnp.float64, pos=None, vel=None, mass=None):
    sim = make_simulation(
        n, algorithm="direct", backend="xla", integrator=integrator,
        softening="plummer", eps=1e-3, g=1.0, substeps=substeps,
        fast_cap=fast_cap,
    )
    st = make_state(pos, vel, mass, dtype=dtype, compensated=compensated)
    return sim, sim.prime(st)


def test_fast_cap_n_equals_fine_stepping():
    """fast_cap = N: every body substeps, so m outer steps of dt must match
    m*substeps plain leapfrog steps of dt/substeps to roundoff (the
    composition merges each pair of adjacent half-kicks into one full kick,
    so agreement is at the rounding level, not bitwise)."""
    pos, vel, mass = _binary_in_cloud(30)
    n, m, dt = len(mass), 4, 2e-3
    multi, s_m = _sim(n, substeps=m, fast_cap=n, pos=pos, vel=vel, mass=mass)
    plain, s_p = _sim(n, pos=pos, vel=vel, mass=mass)
    s_m = multi.run(s_m, dt, 10)
    s_p = plain.run(s_p, dt / m, 10 * m)
    np.testing.assert_allclose(
        np.asarray(s_m.pos), np.asarray(s_p.pos), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s_m.vel), np.asarray(s_p.vel), rtol=1e-10, atol=1e-12
    )


def test_substeps_1_equals_plain_leapfrog():
    pos, vel, mass = _binary_in_cloud(30)
    n = len(mass)
    multi, s_m = _sim(n, substeps=1, pos=pos, vel=vel, mass=mass)
    plain, s_p = _sim(n, pos=pos, vel=vel, mass=mass)
    s_m = multi.run(s_m, 1e-3, 12)
    s_p = plain.run(s_p, 1e-3, 12)
    np.testing.assert_allclose(
        np.asarray(s_m.pos), np.asarray(s_p.pos), rtol=1e-13, atol=1e-15
    )


def test_multirate_recovers_fine_accuracy_on_binary():
    """The binary-in-cloud scene at a dt the binary cannot survive: plain
    leapfrog at dt blows the energy up; multirate with a small fast set
    (the binary + margin) recovers nearly the fine-stepped accuracy at a
    fraction of the pair evaluations."""
    pos, vel, mass = _binary_in_cloud(96)
    n, dt, steps, m = len(mass), 2e-3, 200, 16

    def drift(sim, st, d, k):
        e0 = float(energy.total_energy(st.pos, st.vel, st.mass, eps=1e-3,
                                       g=1.0))
        st = sim.run(st, d, k)
        e1 = float(energy.total_energy(st.pos, st.vel, st.mass, eps=1e-3,
                                       g=1.0))
        return abs((e1 - e0) / e0)

    coarse = drift(*_sim(n, pos=pos, vel=vel, mass=mass), dt, steps)
    multi = drift(*_sim(n, substeps=m, fast_cap=8, pos=pos, vel=vel,
                        mass=mass), dt, steps)
    fine = drift(*_sim(n, pos=pos, vel=vel, mass=mass), dt / m, steps * m)
    # the fast set must rescue the binary: orders of magnitude under coarse,
    # within a small factor of full fine stepping
    assert multi < coarse / 50
    assert multi < max(10 * fine, 1e-8)


def test_multirate_selects_the_binary():
    from spacetpu.ops import multirate

    pos, vel, mass = _binary_in_cloud(96)
    n = len(mass)
    sim, st = _sim(n, substeps=4, fast_cap=8, pos=pos, vel=vel, mass=mass)
    idx = np.asarray(multirate.select_fast(st, 2))
    assert set(idx.tolist()) == {0, 1}


def test_multirate_compensated_f32_runs():
    pos, vel, mass = _binary_in_cloud(30)
    n = len(mass)
    sim, st = _sim(n, substeps=4, fast_cap=8, compensated=True,
                   dtype=jnp.float32, pos=pos, vel=vel, mass=mass)
    st = sim.run(st, 1e-3, 5)
    assert st.pos_c is not None
    assert np.isfinite(np.asarray(st.pos)).all()
    assert float(st.time) == pytest.approx(5e-3, rel=1e-6)


def test_multirate_momentum_error_bounded():
    """F < N breaks exact momentum conservation (the slow bodies feel the
    fast set's intra-step motion only at the endpoint kicks). Measure it:
    the error must stay orders of magnitude below the system's momentum
    scale (sum |m v|), while plain leapfrog stays at roundoff."""
    pos, vel, mass = _binary_in_cloud(96)
    n = len(mass)

    def dp(substeps, fast_cap):
        sim, st = _sim(n, substeps=substeps, fast_cap=fast_cap,
                       pos=pos, vel=vel, mass=mass)
        p0 = np.asarray(energy.momentum(st.vel, st.mass))
        st = sim.run(st, 2e-3, 100)
        p1 = np.asarray(energy.momentum(st.vel, st.mass))
        scale = float(np.sum(np.asarray(st.mass)[:, None]
                             * np.abs(np.asarray(st.vel))))
        return float(np.max(np.abs(p1 - p0))) / scale

    plain = dp(1, "auto")
    multi = dp(16, 8)
    assert plain < 1e-13
    assert multi < 1e-6


def test_suggest_substeps_regimes():
    """suggest_substeps: a timescale-split scene at a dt only the binary
    outgrows -> multirate; tiny dt -> uniform; huge dt (whole scene
    under-resolved) -> lower-dt fallback."""
    pos, vel, mass = _binary_in_cloud(96)
    n = len(mass)
    sim, st = _sim(n, pos=pos, vel=vel, mass=mass)
    m, f, reason = sim.suggest_substeps(st, 2e-3)
    assert reason == "multirate" and m > 1 and 0 < f <= n
    m1, _, r1 = sim.suggest_substeps(st, 1e-7)
    assert (m1, r1) == (1, "uniform")
    m2, _, r2 = sim.suggest_substeps(st, 10.0)
    assert (m2, r2) == (1, "lower-dt")


def test_suggest_substeps_sees_a_tiny_tail():
    """The under-resolved set must be detected by its WORST member, not a
    quantile: 2 binary bodies among 4096 are 0.05% of the scene — the
    old 99.9th-percentile form said "uniform" here (and on the chip at
    N=256k, logs/r4w2_r4_multirate.log, where coarse then drifted by
    1.06), while the fast set stays tiny and cheap."""
    pos, vel, mass = _binary_in_cloud(4094)
    n = len(mass)
    sim, st = _sim(n, pos=pos, vel=vel, mass=mass)
    m, f, reason = sim.suggest_substeps(st, 2e-3)
    assert reason == "multirate" and m > 1
    assert 0 < f <= max(256, n // 8)  # tiny tail -> tiny fast set


def test_multirate_through_the_engine():
    """The interactive sim thread steps a multirate Simulation like any
    other (SimEngine -> run_sim_loop -> sim.step)."""
    import threading
    import time

    from spacetpu.engine import Exchange, run_sim_loop

    pos, vel, mass = _binary_in_cloud(30)
    sim, st = _sim(len(mass), substeps=4, fast_cap=8, dtype=jnp.float32,
                   pos=pos, vel=vel, mass=mass)
    ex = Exchange(len(mass), delta=1e-3)
    stop = threading.Event()
    out = {}
    t = threading.Thread(
        target=lambda: out.setdefault("s", run_sim_loop(sim, st, ex, stop)))
    t.start()
    deadline = time.time() + 30
    while ex.current_ticks() < 3 and time.time() < deadline:
        ex.sample()
        time.sleep(0.01)
    stop.set()
    t.join(30)
    assert not t.is_alive()
    assert ex.current_ticks() >= 3
    assert np.isfinite(np.asarray(out["s"].pos)).all()


def test_multirate_rejects_non_leapfrog():
    with pytest.raises(ValueError, match="leapfrog"):
        make_simulation(64, algorithm="direct", integrator="euler",
                        substeps=2)


def test_multirate_with_tree_outer_pass():
    """Tree solver + substeps: the outer pass is multipole-approximate,
    the fast substeps are exact rectangular rows. On the binary-in-cloud
    scene the combination must rescue the binary just like the direct
    variant (coarse tree stepping destroys it)."""
    pos, vel, mass = _binary_in_cloud(96)
    n, dt, steps, m = len(mass), 2e-3, 150, 16

    def drift(substeps):
        sim = make_simulation(
            n, algorithm="tree", backend="xla", integrator="leapfrog",
            softening="plummer", eps=1e-3, g=1.0, theta=0.4,
            substeps=substeps, fast_cap=8, k_near="auto",
        )
        st = make_state(pos, vel, mass, dtype=jnp.float64)
        st = sim.prime(st)
        e0 = float(energy.total_energy(st.pos, st.vel, st.mass, eps=1e-3,
                                       g=1.0))
        st = sim.run(st, dt, steps)
        e1 = float(energy.total_energy(st.pos, st.vel, st.mass, eps=1e-3,
                                       g=1.0))
        return abs((e1 - e0) / e0)

    assert drift(m) < drift(1) / 50
