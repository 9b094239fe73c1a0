"""TreePM hybrid solver tests (ops/treepm.py).

The invariants: the erf force split is algebraically exact (short + long
== softened pair law), the mesh+pair total tracks the exact direct force
to mesh accuracy, momentum is conserved to roundoff (antisymmetric pair
pass + momentum-conserving PM), the Pallas kernel agrees with the XLA
fallback, cap overflow is counted not silent, and the Simulation facade
(calibrate/run/health/cached structure) works end to end.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spacetpu.ops import direct, energy, pm as pm_ops, treepm
from spacetpu.ops import tree as tree_ops
from spacetpu.sim import make_simulation
from spacetpu.state import make_state


def _cloud(n, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(-1, 1, (n, 3)), dtype)
    mass = jnp.asarray(rng.uniform(0.5, 1.0, (n,)), dtype)
    return pos, mass


def _calibrated(pos, mass, *, grid=32, gg, leaf=255, g=1.0,
                dtype=jnp.float64, split="gauss"):
    box_min, h = pm_ops.measure_box(pos, grid=grid, margin=1.1)
    rs, rcut = treepm.split_params(h)
    khat = treepm.make_kernel_hat(split, grid, h, rs, rcut, g=g,
                                  dtype=dtype)
    m = treepm.measure_near_rcut(pos, mass, rcut=rcut, gg=gg, leaf=leaf)
    return dict(kernel_hat=khat, box_min=box_min, h=h, grid=grid, rs=rs,
                rcut=rcut, split=split, g=g, k_near=m["k_near"], gg=gg,
                leaf=leaf, near_tiles=m["near_tiles"])


def test_split_exact():
    """w_short + w_long == the softened pair weight (the split is an
    algebraic identity, independent of rs)."""
    r2 = jnp.asarray(np.geomspace(1e-6, 1e2, 64), jnp.float64)
    for softening, eps in (("plummer", 0.05), ("plummer", 0.0),
                           ("ref", 1e-3)):
        w_pair = direct._pair_weight(r2, jnp.float64, softening,
                                     jnp.float64(eps))
        rs = jnp.float64(0.3)
        w_sum = treepm.w_short(r2, jnp.float64, softening,
                               jnp.float64(eps), rs,
                               fast=False) + treepm._w_long(
            r2, rs, jnp.float64)
        np.testing.assert_allclose(np.asarray(w_sum), np.asarray(w_pair),
                                   rtol=1e-12)


def test_w_long_fast_accuracy():
    """The production Chebyshev form of the long-range weight stays
    within ~2e-6 of the exact-erf form RELATIVE TO THE NEWTONIAN weight
    at that r (the scale force errors are measured against), across the
    fitted range, the beyond-range branch, and both dtypes."""
    rs = 0.37
    r = np.geomspace(1e-3 * rs, 40.0 * rs, 4001)  # spans both branches
    r2_64 = jnp.asarray(r * r, jnp.float64)
    exact = np.asarray(treepm._w_long(r2_64, jnp.float64(rs), jnp.float64))
    newton = 1.0 / r**3
    for dtype in (jnp.float32, jnp.float64):
        r2 = jnp.asarray(r * r, dtype)
        fast = np.asarray(
            treepm._w_long_fast(r2, jnp.asarray(rs, dtype), dtype),
            np.float64)
        rel = np.abs(fast - exact) / newton
        assert rel.max() < 2.5e-5, (dtype, rel.max())
    # f64 keeps the fit's own accuracy
    fast64 = np.asarray(
        treepm._w_long_fast(r2_64, jnp.float64(rs), jnp.float64))
    assert (np.abs(fast64 - exact) / newton).max() < 2.5e-5


def test_erf_approx_accuracy():
    """The kernel-safe A&S 7.1.26 erf stays within f32 roundoff of the
    exact erf over the full short-range argument span."""
    from scipy.special import erf as ref_erf

    x = jnp.asarray(np.linspace(0.0, 6.0, 2001), jnp.float64)
    approx = np.asarray(treepm._erf_as(x))
    assert np.max(np.abs(approx - ref_erf(np.asarray(x)))) < 2e-7


def test_poly_split_identity():
    """Inside the cutoff the poly split is algebraically exact
    (w_short + G(y)/r^3 == the softened pair law); at and beyond the
    cutoff the short weight is EXACTLY zero (no erfc tail — the pair
    forces stay antisymmetric under positional cap drops)."""
    rcut = 0.9
    r2 = jnp.asarray(np.geomspace(1e-6, 16.0, 257), jnp.float64)
    inside = np.asarray(r2) < rcut * rcut
    for softening, eps in (("plummer", 0.05), ("plummer", 0.0),
                           ("ref", 1e-3)):
        w_pair = direct._pair_weight(r2, jnp.float64, softening,
                                     jnp.float64(eps))
        ws = treepm.w_short(r2, jnp.float64, softening, jnp.float64(eps),
                            jnp.float64(0.3), rcut=jnp.float64(rcut),
                            split="poly")
        wl = treepm._w_long_poly(r2, jnp.float64(rcut), jnp.float64)
        np.testing.assert_allclose(np.asarray(ws + wl)[inside],
                                   np.asarray(w_pair)[inside], rtol=1e-12)
        assert np.all(np.asarray(ws)[~inside] == 0.0)


def test_poly_kernel_potential_consistency():
    """The closed-form poly-split potential (pm_kernel_hat_poly's
    real-space table) has d(phi)/dr == G(y)/r^2 == _w_long_poly * r —
    checked numerically — and is C^1 at the cutoff."""
    rc = 1.3
    r = np.linspace(1e-3, 3.0, 2_000_001)
    inside = (
        (-32.0 / 21.0) / rc + 2.0 * r ** 5 / rc ** 6
        - (15.0 / 7.0) * r ** 7 / rc ** 8 + (2.0 / 3.0) * r ** 9 / rc ** 10
    )
    phi = np.where(r < rc, inside, -1.0 / r)
    dphi = np.gradient(phi, r)
    w = np.asarray(
        treepm._w_long_poly(jnp.asarray(r * r), jnp.float64(rc),
                            jnp.float64))
    # dphi/dr = w_long * r (both are the attractive force magnitude)
    err = np.abs(dphi[2:-2] - (w * r)[2:-2])
    assert err.max() < 1e-6, err.max()


def test_acc_treepm_poly_matches_direct():
    """Total poly-split TreePM force tracks the exact softened direct
    force to mesh accuracy — at least as well as the erf split."""
    pos, mass = _cloud(4096, seed=0)
    kw = _calibrated(pos, mass, grid=32, gg=17, split="poly")
    acc = treepm.acc_treepm(pos, mass, softening="plummer", eps=1e-3,
                            backend="xla", **kw)
    ref = direct.acc_direct(pos, mass, softening="plummer", eps=1e-3, g=1.0)
    err = np.linalg.norm(np.asarray(acc - ref), axis=1) / np.linalg.norm(
        np.asarray(ref), axis=1)
    assert np.median(err) < 1.5e-2, np.median(err)
    assert np.percentile(err, 99) < 6e-2, np.percentile(err, 99)


def test_momentum_conserved_poly():
    pos, mass = _cloud(2048, seed=1)
    kw = _calibrated(pos, mass, grid=32, gg=9, split="poly")
    acc = treepm.acc_treepm(pos, mass, softening="plummer", eps=1e-3,
                            backend="xla", **kw)
    p = np.asarray(jnp.sum(mass[:, None] * acc, axis=0))
    scale = float(jnp.sum(mass[:, None] * jnp.abs(acc)))
    assert np.max(np.abs(p)) < 1e-12 * scale


def test_pallas_interpret_matches_xla_poly(monkeypatch):
    monkeypatch.setattr(tree_ops, "NEAR_PAIRS_CHUNK", 16)
    pos, mass = _cloud(1024, seed=2, dtype=jnp.float32)
    kw = _calibrated(pos, mass, grid=32, gg=5, dtype=jnp.float32,
                     split="poly")
    common = dict(softening="plummer", eps=np.float32(1e-2), **kw)
    a_x = treepm.acc_treepm(pos, mass, backend="xla", **common)
    a_p = treepm.acc_treepm(pos, mass, backend="pallas", interpret=True,
                            **common)
    scale = float(jnp.max(jnp.abs(a_x)))
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x),
                               atol=5e-5 * scale)


def test_acc_treepm_matches_direct():
    """Total TreePM force tracks the exact softened direct force to mesh
    accuracy on a uniform cloud."""
    pos, mass = _cloud(4096, seed=0)
    kw = _calibrated(pos, mass, grid=32, gg=17)
    acc = treepm.acc_treepm(pos, mass, softening="plummer", eps=1e-3,
                            backend="xla", **kw)
    ref = direct.acc_direct(pos, mass, softening="plummer", eps=1e-3, g=1.0)
    err = np.linalg.norm(np.asarray(acc - ref), axis=1) / np.linalg.norm(
        np.asarray(ref), axis=1)
    assert np.median(err) < 1.5e-2, np.median(err)
    assert np.percentile(err, 99) < 6e-2, np.percentile(err, 99)


def test_momentum_conserved():
    """Antisymmetric pair pass + momentum-conserving PM: sum(m*a) is
    roundoff-zero (the property the matched CIC deposit/gather buys)."""
    pos, mass = _cloud(2048, seed=1)
    kw = _calibrated(pos, mass, grid=32, gg=9)
    acc = treepm.acc_treepm(pos, mass, softening="plummer", eps=1e-3,
                            backend="xla", **kw)
    p = np.asarray(jnp.sum(mass[:, None] * acc, axis=0))
    scale = float(jnp.sum(mass[:, None] * jnp.abs(acc)))
    assert np.max(np.abs(p)) < 1e-12 * scale


def test_pallas_interpret_matches_xla(monkeypatch):
    """The short-range Pallas pair kernel agrees with the XLA fallback
    (small launch chunk: interpret mode runs the grid as a host loop)."""
    monkeypatch.setattr(tree_ops, "NEAR_PAIRS_CHUNK", 16)
    pos, mass = _cloud(1024, seed=2, dtype=jnp.float32)
    kw = _calibrated(pos, mass, grid=32, gg=5, dtype=jnp.float32)
    common = dict(softening="plummer", eps=np.float32(1e-2), **kw)
    a_x = treepm.acc_treepm(pos, mass, backend="xla", **common)
    a_p = treepm.acc_treepm(pos, mass, backend="pallas", interpret=True,
                            **common)
    scale = float(jnp.max(jnp.abs(a_x)))
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x),
                               atol=5e-5 * scale)


def test_overflow_counted_and_finite():
    """A too-small pinned k_near truncates near lists: counted by the
    prep telemetry, and the forces stay finite (dropped clusters degrade
    to PM-only accuracy — never a hole)."""
    pos, mass = _cloud(2048, seed=3)
    kw = _calibrated(pos, mass, grid=32, gg=9)
    kw["k_near"] = 2  # everything is near at this scene scale
    prep = treepm.treepm_prep(pos, mass, rcut=kw["rcut"], k_near=2,
                              gg=9, leaf=255)
    assert int(prep["near_overflow"]) > 0
    acc = treepm.acc_treepm(pos, mass, softening="plummer", eps=1e-3,
                            backend="xla", **kw)
    assert np.isfinite(np.asarray(acc)).all()


def test_simulation_end_to_end():
    """Simulation facade: calibrate at prime, leapfrog rollout with
    bounded energy drift, health telemetry, maybe_recalibrate no-op on a
    healthy scene."""
    rng = np.random.default_rng(4)
    n = 2048
    pos = rng.uniform(-1, 1, (n, 3))
    vel = rng.normal(0, 0.05, (n, 3))
    mass = rng.uniform(0.5, 1.0, n)
    sim = make_simulation(n, algorithm="treepm", backend="xla", eps=1e-2,
                          g=1.0, pm_grid=32)
    st = sim.prime(make_state(pos, vel, mass, dtype=jnp.float64))
    h = sim.health(st)
    assert h["near_overflow"] == 0 and h["out_of_box"] == 0
    e0 = float(energy.total_energy(st.pos, st.vel, st.mass,
                                   softening="plummer", eps=1e-2, g=1.0))
    st = sim.run(st, 1e-4, 20)
    e1 = float(energy.total_energy(st.pos, st.vel, st.mass,
                                   softening="plummer", eps=1e-2, g=1.0))
    assert abs(e1 - e0) / abs(e0) < 1e-3
    assert sim.maybe_recalibrate(st) is False


def test_cached_structure_rollout_matches():
    """tree_refresh_every reuses the sort + cutoff pair tiles between
    rebuilds; the trajectory must track the fresh-build rollout closely
    (bodies move a tiny fraction of a cluster radius per step)."""
    rng = np.random.default_rng(5)
    n = 1024
    pos = rng.uniform(-1, 1, (n, 3))
    vel = rng.normal(0, 0.05, (n, 3))
    mass = rng.uniform(0.5, 1.0, n)

    def run(refresh):
        sim = make_simulation(n, algorithm="treepm", backend="xla",
                              eps=1e-2, g=1.0, pm_grid=32,
                              tree_refresh_every=refresh)
        st = sim.prime(make_state(pos, vel, mass, dtype=jnp.float64))
        st = sim.run(st, 1e-4, 16)
        return np.asarray(st.pos)

    np.testing.assert_allclose(run(4), run(1), atol=1e-9)


def test_sharded_matches_single_device():
    """ShardedTreePMSimulation (psum'd erf mesh + halo-exchanged short
    range) reproduces the single-device treepm trajectory on the virtual
    8-device mesh, with zero truncation telemetry."""
    import jax

    from spacetpu.parallel import ring, treepmshard

    d = 8
    n_real = 3000
    n = treepmshard.required_n(n_real, d)
    rng = np.random.default_rng(7)
    pos = rng.uniform(-1, 1, (n_real, 3))
    vel = rng.normal(0, 0.05, (n_real, 3))
    mass = rng.uniform(0.5, 1.0, n_real)
    mesh = ring.make_mesh(d)
    sim = treepmshard.ShardedTreePMSimulation(mesh, n, grid=32, eps=1e-2,
                                              g=1.0)
    ts = sim.prime(sim.shard_state(
        make_state(pos, vel, mass, dtype=jnp.float64, pad_to=n)))
    diag = sim.diagnose(ts)
    assert diag["near_overflow"] == 0 and diag["halo_overflow"] == 0
    assert diag["tile_overflow"] == 0 and diag["out_of_box"] == 0
    ts = sim.run(ts, 1e-4, 8)
    out = sim.user_order(ts)

    sim1 = make_simulation(n, algorithm="treepm", backend="xla", eps=1e-2,
                           g=1.0, pm_grid=32)
    st1 = sim1.prime(make_state(pos, vel, mass, dtype=jnp.float64,
                                pad_to=n))
    st1 = sim1.run(st1, 1e-4, 8)
    np.testing.assert_allclose(
        np.asarray(out.pos[:n_real]), np.asarray(st1.pos[:n_real]),
        atol=1e-12,
    )
    assert sim.maybe_recalibrate(ts) is False
    jax.block_until_ready(ts.state.pos)


def test_sharded_halo_cap_counted():
    """A starved halo cap drops remote near clusters: counted by
    diagnose, forces stay finite (those clusters degrade to long-range-
    only accuracy — never a hole or a crash)."""
    from spacetpu.parallel import ring, treepmshard

    d = 4
    n = treepmshard.required_n(2000, d)
    rng = np.random.default_rng(8)
    pos = rng.uniform(-1, 1, (n, 3))
    mass = rng.uniform(0.5, 1.0, n)
    mesh = ring.make_mesh(d)
    sim = treepmshard.ShardedTreePMSimulation(mesh, n, grid=32, eps=1e-2,
                                              g=1.0, halo_cap=1)
    ts = sim.prime(sim.shard_state(
        make_state(pos, np.zeros((n, 3)), mass, dtype=jnp.float64)))
    assert sim.diagnose(ts)["halo_overflow"] > 0
    assert np.isfinite(np.asarray(ts.state.acc)).all()


def test_out_of_box_recalibration():
    """Bodies expanding past the calibrated box trigger a re-measured
    mesh through maybe_recalibrate (the PM-style degradation loop)."""
    rng = np.random.default_rng(6)
    n = 1024
    pos = rng.uniform(-1, 1, (n, 3))
    mass = rng.uniform(0.5, 1.0, n)
    sim = make_simulation(n, algorithm="treepm", backend="xla", eps=1e-2,
                          g=1.0, pm_grid=32, pm_margin=1.05)
    st = sim.prime(make_state(pos, np.zeros((n, 3)), mass,
                              dtype=jnp.float64))
    # teleport the cloud outward: half the bodies leave the box
    st2 = make_state(np.asarray(st.pos) * 3.0, np.zeros((n, 3)), mass,
                     dtype=jnp.float64)
    assert sim.health(st2)["out_of_box"] > 0
    assert sim.maybe_recalibrate(st2) is True
    assert sim.health(st2)["out_of_box"] == 0


def test_saturated_cutoff_warns():
    """A mass distribution concentrated well inside r_cut saturates the
    short-range near lists (k_near ~ gg) — the pair pass degenerates to
    all-pairs cost (16.5 s/step at N=1M on chip, r4w2 scorecard) and
    calibrate must say so."""
    import warnings

    from spacetpu.models import presets

    n = 64 * 256  # gg = 64, the warning's scale gate
    scene = presets.plummer_sphere(n, seed=1)
    sim = make_simulation(n, algorithm="treepm", backend="xla", eps=1e-2,
                          g=1.0, pm_grid=32)
    with pytest.warns(UserWarning, match="saturates"):
        sim.prime(scene.state(dtype=jnp.float32))


def test_pairs_accum_mxu_matches_vpu_poly(monkeypatch):
    """Hybrid MXU accumulation in the short-range pair pass: same
    weights (shared `_w_short_tile`), restructured summation — must
    agree with the vpu kernel to accumulation roundoff."""
    monkeypatch.setattr(tree_ops, "NEAR_PAIRS_CHUNK", 16)
    pos, mass = _cloud(1024, seed=5, dtype=jnp.float32)
    kw = _calibrated(pos, mass, grid=32, gg=5, dtype=jnp.float32,
                     split="poly")
    common = dict(softening="plummer", eps=np.float32(1e-2),
                  backend="pallas", interpret=True, **kw)
    a_vpu = treepm.acc_treepm(pos, mass, pairs_accum="vpu", **common)
    a_mxu = treepm.acc_treepm(pos, mass, pairs_accum="mxu", **common)
    scale = float(jnp.max(jnp.abs(a_vpu)))
    np.testing.assert_allclose(np.asarray(a_mxu), np.asarray(a_vpu),
                               atol=2e-5 * scale)


def test_device_kernel_forces_match_host_kernel(monkeypatch):
    """TreePM forces with the device-built poly kernel spectrum (f32
    cosine fold) track the host-f64-rfftn kernel to well below the
    solver's own error band."""
    pos, mass = _cloud(2048, seed=9, dtype=jnp.float32)
    kw_host = _calibrated(pos, mass, grid=32, gg=9, dtype=jnp.float32,
                          split="poly")
    monkeypatch.setattr(treepm, "KERNEL_DEVICE_MIN_GRID", 32)
    kw_dev = _calibrated(pos, mass, grid=32, gg=9, dtype=jnp.float32,
                         split="poly")
    common = dict(softening="plummer", eps=np.float32(1e-2), backend="xla")
    a_h = np.asarray(treepm.acc_treepm(pos, mass, **common, **kw_host))
    a_d = np.asarray(treepm.acc_treepm(pos, mass, **common, **kw_dev))
    scale = np.linalg.norm(a_h, axis=1).max()
    err = np.linalg.norm(a_d - a_h, axis=1) / scale
    assert err.max() < 5e-6, err.max()


def test_default_grid_large_n_policy():
    """Auto grid: 256 cap below 8M bodies (r4w5 sweep), 512 at and above
    (chip-measured 1.67x at 8M / 1.79x at 16M, r5w3 finegrid ladder)."""
    assert treepm.default_grid(1_000_000) == 256
    assert treepm.default_grid(4_000_000) == 256
    assert treepm.default_grid(treepm.TREEPM_GRID_LARGE_N) == 512
    assert treepm.default_grid(16_000_000) == 512
    assert treepm.default_grid(1000) == 32  # min clamp unchanged
