"""Particle-mesh solver tests: kernel physics, PM discretization
invariants (momentum conservation, zero self-force), accuracy vs the
direct solver at matched softening, and the Simulation pm pipeline
(calibrate/step/run/health/recalibrate)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu import sim as sim_mod
from spacetpu.ops import direct, energy, pm
from spacetpu.state import make_state


def _grid_setup(pos, grid=32, margin=2.0, eps=0.0, g=1.0, dtype=jnp.float64):
    box_min, h = pm.measure_box(pos, grid=grid, margin=margin)
    kern = pm.pm_kernel_hat(grid, h, eps=eps, g=g, dtype=dtype)
    return dict(kernel_hat=kern, box_min=box_min, h=h, grid=grid)


def _plummer_cloud(n, seed=0, scale=1.0, trunc=0.9):
    """Truncated Plummer sphere (m_enc <= trunc caps the radius tail):
    PM is a smooth-field solver, so its accuracy tests need the mass
    within the mesh's resolvable dynamic range — an untruncated Plummer
    puts lone bodies at ~50 scale radii, inflating the box until the
    core spans one cell."""
    rng = np.random.default_rng(seed)
    # Plummer-sphere positions via inverse-CDF radius sampling
    m_enc = rng.uniform(0.0, trunc, n)
    r = scale / np.sqrt(m_enc ** (-2.0 / 3.0) - 1.0)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pos = r[:, None] * u
    mass = rng.uniform(0.5, 1.5, n)
    return pos, mass


def test_two_body_force_matches_newton():
    # Separation >> cell size: the PM force must track -G m / r^2 closely.
    pos = np.array([[-5.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    mass = np.array([1.0, 1.0])
    p = _grid_setup(pos, grid=64, margin=2.0, g=1.0)
    acc = np.asarray(pm.acc_pm(jnp.asarray(pos), jnp.asarray(mass), **p))
    # eps_eff = h ~ 0.32 at this box; compare against the matched
    # softened pair force, not bare Newton
    eps_eff = max(0.0, pm.PM_SOFT_CELLS * p["h"])
    expected = 10.0 / (100.0 + eps_eff ** 2) ** 1.5  # G m r / (r^2+e^2)^1.5
    got = acc[0, 0]
    assert got == pytest.approx(expected, rel=0.05)
    # antisymmetry + no transverse leakage
    assert acc[1, 0] == pytest.approx(-got, rel=1e-10)
    assert abs(acc[0, 1]) < 1e-3 * abs(got)
    assert abs(acc[0, 2]) < 1e-3 * abs(got)


def test_momentum_conservation_and_self_force():
    # Matched CIC deposit/gather + central differences makes inter-particle
    # forces exactly antisymmetric: sum_i m_i a_i ~ roundoff; and a single
    # particle exerts zero force on itself by kernel symmetry.
    pos, mass = _plummer_cloud(257, seed=4)
    p = _grid_setup(pos, grid=32, g=1.0)
    acc = np.asarray(pm.acc_pm(jnp.asarray(pos), jnp.asarray(mass), **p))
    net = np.abs((mass[:, None] * acc).sum(axis=0)).max()
    scale = np.abs(mass[:, None] * acc).sum(axis=0).max()
    assert net < 1e-9 * max(scale, 1e-300)

    one = np.asarray(pm.acc_pm(jnp.asarray(pos[:1]), jnp.asarray(mass[:1]),
                               **p))
    assert np.abs(one).max() < 1e-12


def test_accuracy_vs_direct_on_cloud():
    # Far-field dominated cloud: PM vs direct at the PM's own softening.
    pos, mass = _plummer_cloud(2048, seed=7)
    p = _grid_setup(pos, grid=64, g=1.0)
    eps_eff = pm.PM_SOFT_CELLS * p["h"]
    a_pm = np.asarray(pm.acc_pm(jnp.asarray(pos), jnp.asarray(mass), **p))
    a_ref = np.asarray(direct.acc_direct(
        jnp.asarray(pos), jnp.asarray(mass), softening="plummer",
        eps=eps_eff, g=1.0,
    ))
    rel = np.linalg.norm(a_pm - a_ref, axis=1) / np.linalg.norm(a_ref, axis=1)
    assert np.median(rel) < 0.05
    assert np.quantile(rel, 0.9) < 0.25


def test_compact_deposit_matches_full_oracle():
    # The compact (G+1)^3 deposit IS the occupied corner of the doubled
    # mesh; everything outside it is structural zero.
    pos, mass = _plummer_cloud(513, seed=7)
    p = _grid_setup(pos, grid=16)
    box_min = jnp.asarray(p["box_min"], jnp.float64)
    inv_h = 1.0 / p["h"]
    full = np.asarray(pm.deposit_cic(
        jnp.asarray(pos), jnp.asarray(mass), box_min=box_min, inv_h=inv_h,
        grid=16))
    comp = np.asarray(pm.deposit_cic_compact(
        jnp.asarray(pos), jnp.asarray(mass), box_min=box_min, inv_h=inv_h,
        grid=16))
    np.testing.assert_array_equal(comp, full[:17, :17, :17])
    occupied = full[:17, :17, :17].sum()
    np.testing.assert_allclose(full.sum(), occupied)  # nothing outside


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_compact_acc_matches_full_oracle(method):
    # The production compact pipeline (compact deposit -> sliced-table
    # transform -> windowed gradient/gather) must reproduce the full
    # doubled-mesh pipeline: identical math, structural zeros skipped.
    pos, mass = _plummer_cloud(513, seed=8)
    p = _grid_setup(pos, grid=16)
    box_min = jnp.asarray(p["box_min"], jnp.float64)
    inv_h = 1.0 / p["h"]
    pj, mj = jnp.asarray(pos), jnp.asarray(mass)
    full_mesh = pm.deposit_cic(pj, mj, box_min=box_min, inv_h=inv_h, grid=16)
    # full-mesh oracle path, forced through the requested transform
    old = pm.PM_FFT_METHOD
    try:
        pm.PM_FFT_METHOD = method
        ref = np.asarray(pm.acc_from_mesh(
            pj, full_mesh, kernel_hat=p["kernel_hat"], box_min=box_min,
            inv_h=inv_h, grid=16))
        comp_mesh = pm.deposit_cic_compact(pj, mj, box_min=box_min,
                                           inv_h=inv_h, grid=16)
        got = np.asarray(pm.acc_from_mesh_compact(
            pj, comp_mesh, kernel_hat=p["kernel_hat"], box_min=box_min,
            inv_h=inv_h, grid=16))
    finally:
        pm.PM_FFT_METHOD = old
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12 * scale)


def test_potential_ext_window_matches_full():
    # phi on the extended window [-1..G+1]^3 equals the full doubled-mesh
    # solve sampled at those (min-image wrapped) nodes, for both methods.
    rng = np.random.default_rng(11)
    grid = 8
    mesh_c = jnp.asarray(rng.uniform(size=(grid + 1,) * 3))
    kern = pm.pm_kernel_hat(grid, h=0.5, eps=0.0, g=1.0, dtype=jnp.float64)
    g2 = 2 * grid
    full = jnp.zeros((g2, g2, g2), jnp.float64)
    full = full.at[:grid + 1, :grid + 1, :grid + 1].set(mesh_c)
    rows = pm.ext_rows(grid)
    for method in ("fft", "matmul"):
        phi_full = np.asarray(pm.potential_mesh(full, kern, grid,
                                                method=method))
        ref = phi_full[rows][:, rows][:, :, rows]
        got = np.asarray(pm.potential_ext(mesh_c, kern, grid,
                                          method=method))
        np.testing.assert_allclose(got, ref, rtol=0,
                                   atol=1e-10 * np.abs(ref).max())


def test_out_of_box_count():
    pos, mass = _plummer_cloud(64, seed=1)
    p = _grid_setup(pos, grid=32, margin=1.5)
    assert int(pm.count_out_of_box(jnp.asarray(pos), p["box_min"], p["h"],
                                   p["grid"])) == 0
    moved = pos.copy()
    moved[0] = [1e6, 0, 0]
    moved[5] = [0, -1e6, 0]
    assert int(pm.count_out_of_box(jnp.asarray(moved), p["box_min"], p["h"],
                                   p["grid"])) == 2


def test_potential_energy_tracks_exact():
    pos, mass = _plummer_cloud(512, seed=9)
    p = _grid_setup(pos, grid=64, g=1.0)
    eps_eff = pm.PM_SOFT_CELLS * p["h"]
    pe_pm = float(pm.potential_energy_pm(
        jnp.asarray(pos), jnp.asarray(mass), **p,
        k0=pm.pm_self_kernel(p["h"], eps=0.0, g=1.0),
    ))
    pe_ref = float(energy.potential_energy(
        jnp.asarray(pos), jnp.asarray(mass), softening="plummer",
        eps=eps_eff, g=1.0,
    ))
    assert pe_pm == pytest.approx(pe_ref, rel=0.05)


def test_simulation_pm_pipeline():
    pos, mass = _plummer_cloud(1024, seed=2, scale=2.0)
    # virialized-ish velocities keep the cloud bound for the short rollout
    vel = np.zeros_like(pos)
    s = make_state(pos, vel, mass, dtype=jnp.float64)
    sim = sim_mod.make_simulation(
        n=1024, algorithm="pm", backend="xla", g=1.0, pm_grid=32,
    )
    s = sim.prime(s)
    h = sim.health(s)
    assert h["out_of_box"] == 0 and h["grid"] == 32
    e0 = float(energy.total_energy(s.pos, s.vel, s.mass, softening="plummer",
                                   eps=pm.PM_SOFT_CELLS * sim._pm["h"],
                                   g=1.0))
    s = sim.run(s, 1e-3, 20)
    e1 = float(energy.total_energy(s.pos, s.vel, s.mass, softening="plummer",
                                   eps=pm.PM_SOFT_CELLS * sim._pm["h"],
                                   g=1.0))
    assert np.isfinite(np.asarray(s.pos)).all()
    # PM forces are mesh-approximate; the drift bound is loose but real
    assert abs(e1 - e0) / abs(e0) < 5e-2


def test_simulation_pm_step_before_prime_raises():
    pos, mass = _plummer_cloud(128, seed=3)
    s = make_state(pos, np.zeros_like(pos), mass, dtype=jnp.float64)
    sim = sim_mod.make_simulation(n=128, algorithm="pm", backend="xla",
                                  g=1.0)
    with pytest.raises(RuntimeError, match="uncalibrated"):
        sim.step(s, 1e-3)


def test_simulation_pm_recalibrate_on_escape():
    pos, mass = _plummer_cloud(256, seed=5)
    s = make_state(pos, np.zeros_like(pos), mass, dtype=jnp.float64)
    sim = sim_mod.make_simulation(n=256, algorithm="pm", backend="xla",
                                  g=1.0, pm_grid=32, pm_margin=1.2)
    s = sim.prime(s)
    assert not sim.maybe_recalibrate(s)  # healthy: no rebuild
    # teleport 10% of the bodies outside the calibrated box
    moved = np.asarray(s.pos).copy()
    moved[:26] *= 50.0
    s2 = s._replace(pos=jnp.asarray(moved))
    old_h = sim._pm["h"]
    assert sim.maybe_recalibrate(s2)
    assert sim._pm["h"] > old_h
    assert sim.health(s2)["out_of_box"] == 0


def test_pm_multirate_rejected():
    with pytest.raises(ValueError, match="pm"):
        sim_mod.make_simulation(n=128, algorithm="pm", substeps=4)


def test_sharded_pm_matches_single_device():
    from spacetpu.parallel import pmshard, ring

    pos, mass = _plummer_cloud(512, seed=11)
    vel = np.zeros_like(pos)
    single = sim_mod.make_simulation(n=512, algorithm="pm", backend="xla",
                                     g=1.0, pm_grid=32)
    s1 = single.prime(make_state(pos, vel, mass, dtype=jnp.float64))
    s1 = single.run(s1, 1e-3, 10)

    mesh = ring.make_mesh(8)
    sh = pmshard.ShardedPMSimulation(mesh, 512, grid=32, g=1.0)
    ts = sh.shard_state(make_state(pos, vel, mass, dtype=jnp.float64))
    ts = sh.prime(ts)
    assert sh._pm["h"] == pytest.approx(single._pm["h"], rel=1e-12)
    ts = sh.run(ts, 1e-3, 10)

    np.testing.assert_allclose(np.asarray(ts.pos), np.asarray(s1.pos),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ts.vel), np.asarray(s1.vel),
                               rtol=1e-8, atol=1e-12)
    assert sh.health(ts)["out_of_box"] == 0


def test_sharded_pm_recalibrate():
    from spacetpu.parallel import pmshard, ring

    pos, mass = _plummer_cloud(256, seed=12)
    mesh = ring.make_mesh(8)
    sh = pmshard.ShardedPMSimulation(mesh, 256, grid=32, g=1.0, margin=1.2)
    ts = sh.prime(sh.shard_state(
        make_state(pos, np.zeros_like(pos), mass, dtype=jnp.float64)))
    assert not sh.maybe_recalibrate(ts)
    moved = np.asarray(ts.pos).copy()
    moved[:30] *= 80.0
    ts2 = ts._replace(pos=jnp.asarray(moved))
    old_h = sh._pm["h"]
    assert sh.maybe_recalibrate(ts2)
    assert sh._pm["h"] > old_h
    # the rebuilt jits must still run on the mesh
    ts2 = sh.shard_state(make_state(moved, np.zeros_like(moved),
                                    np.asarray(ts.mass), dtype=jnp.float64))
    ts2 = sh.prime(ts2)
    assert sh.health(ts2)["out_of_box"] == 0


def test_default_grid_bounds():
    assert pm.default_grid(10) == pm.PM_GRID_MIN
    assert pm.default_grid(10 ** 9) == pm.PM_GRID_MAX
    assert pm.default_grid(1_000_000) == 128


def test_cli_pm_fft_flag_sets_module_switch():
    # --pm-fft matmul flows to pm.PM_FFT_METHOD before the engine builds
    from spacetpu.main import main
    from spacetpu.ops import pm as pm_mod

    old = pm_mod.PM_FFT_METHOD
    try:
        main(["--preset", "random_cluster", "--n", "64", "--frontend",
              "none", "--steps", "1", "--algorithm", "pm", "--pm-grid",
              "16", "--pm-fft", "matmul", "--platform", "cpu"])
        assert pm_mod.PM_FFT_METHOD == "matmul"
    finally:
        pm_mod.PM_FFT_METHOD = old
