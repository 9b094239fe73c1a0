"""Sharded tree v2 (parallel/tree2.py): O(N/D) memory, halo exchange.

Runs on the 8-virtual-device CPU mesh (conftest)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu.ops import direct, tree
from spacetpu.parallel import ring, tree2
from spacetpu.state import make_state

LEAF = tree.LEAF


def _scene(n, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    r = rng.uniform(0, 1, size=(n, 1)) ** (1 / 3)
    pos = (u * r).astype(np.float64)
    vel = rng.normal(size=(n, 3)) * 1e-3
    mass = rng.uniform(0.5, 1.5, size=n) / n
    return make_state(pos, vel, mass, dtype=dtype)


def test_tree2_acc_matches_single_chip():
    """With N a multiple of D*LEAF the sharded sort produces the same
    clustering as the single-chip tree, so the primed accelerations must
    match to f64 roundoff (identical kernels, identical near lists)."""
    d = 4
    n = d * LEAF * 2  # 2040 bodies, 8 clusters
    state = _scene(n, seed=1)
    mesh = ring.make_mesh(d)
    sim = tree2.ShardedTreeSimulation(
        mesh, n, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
        backend="xla", multipole_order=2, far_levels=2,
    )
    ts = sim.prime(sim.shard_state(state))
    got = sim.user_order(ts)

    ref = tree.acc_tree(
        jnp.asarray(state.pos), jnp.asarray(state.mass), theta=0.5,
        softening="plummer", eps=1e-3, g=1.0, backend="xla",
        multipole_order=2, k_near=sim._k_near, far_levels=2,
    )
    np.testing.assert_allclose(np.asarray(got.acc), np.asarray(ref),
                               rtol=1e-9, atol=1e-12)


def test_tree2_rollout_matches_single_chip():
    """A short rollout tracks the single-chip tree simulation closely."""
    from spacetpu.sim import make_simulation

    d = 4
    n = d * LEAF * 2
    state = _scene(n, seed=2)
    mesh = ring.make_mesh(d)
    sim = tree2.ShardedTreeSimulation(
        mesh, n, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
        backend="xla", multipole_order=2, far_levels=2, resort_every=4,
    )
    ts = sim.prime(sim.shard_state(state))
    ts = sim.run(ts, 1e-3, 12)
    got = sim.user_order(ts)

    ref_sim = make_simulation(n, algorithm="tree", backend="xla",
                              softening="plummer", eps=1e-3, g=1.0,
                              theta=0.5, k_near=sim._k_near)
    ref_state = ref_sim.prime(_scene(n, seed=2))
    ref_state = ref_sim.run(ref_state, 1e-3, 12)
    np.testing.assert_allclose(np.asarray(got.pos),
                               np.asarray(ref_state.pos),
                               rtol=1e-7, atol=1e-10)


def test_tree2_force_error_vs_direct():
    """8-device run, far error bounded by theta like the single-chip tree."""
    d = 8
    n = d * LEAF * 2
    state = _scene(n, seed=3)
    mesh = ring.make_mesh(d)
    sim = tree2.ShardedTreeSimulation(
        mesh, n, theta=0.4, softening="plummer", eps=1e-3, g=1.0,
        backend="xla", multipole_order=2,
    )
    ts = sim.prime(sim.shard_state(state))
    got = sim.user_order(ts)
    exact = np.asarray(direct.acc_direct(
        jnp.asarray(state.pos), jnp.asarray(state.mass),
        softening="plummer", eps=1e-3, g=1.0,
    ))
    scale = np.linalg.norm(exact, axis=-1).mean()
    err = np.linalg.norm(np.asarray(got.acc) - exact, axis=-1) / scale
    assert np.median(err) < 5e-3, np.median(err)


def test_tree2_far3_path():
    """The 3-level far field composes with the sharded evaluation
    (SUPER shrunk so several superclusters exist at test size)."""
    d = 4
    old = tree.SUPER
    tree.SUPER = 4
    try:
        n = d * LEAF * tree.SUPER  # 4 supers of 4 clusters
        state = _scene(n, seed=4)
        mesh = ring.make_mesh(d)
        sim = tree2.ShardedTreeSimulation(
            mesh, n, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
            backend="xla", multipole_order=2, far_levels=3,
        )
        ts = sim.prime(sim.shard_state(state))
        got = sim.user_order(ts)
        exact = np.asarray(direct.acc_direct(
            jnp.asarray(state.pos), jnp.asarray(state.mass),
            softening="plummer", eps=1e-3, g=1.0,
        ))
        scale = np.linalg.norm(exact, axis=-1).mean()
        err = np.linalg.norm(np.asarray(got.acc) - exact, axis=-1) / scale
        assert np.median(err) < 5e-3, np.median(err)
    finally:
        tree.SUPER = old


def test_tree2_halo_cap_degrades_gracefully():
    """A tiny halo cap must not crash or corrupt: dropped remote clusters
    fall back to far-field accuracy and are counted by diagnose()."""
    d = 4
    n = d * LEAF * 2
    state = _scene(n, seed=5)
    mesh = ring.make_mesh(d)
    full = tree2.ShardedTreeSimulation(
        mesh, n, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
        backend="xla", multipole_order=2, far_levels=2,
    )
    tiny = tree2.ShardedTreeSimulation(
        mesh, n, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
        backend="xla", multipole_order=2, far_levels=2, halo_cap=1,
    )
    ts_full = full.prime(full.shard_state(state))
    ts_tiny = tiny.prime(tiny.shard_state(_scene(n, seed=5)))
    diag_full = full.diagnose(ts_full)
    diag_tiny = tiny.diagnose(ts_tiny)
    assert diag_full["halo_overflow"] == 0
    assert diag_tiny["halo_overflow"] > 0
    a_full = np.asarray(full.user_order(ts_full).acc)
    a_tiny = np.asarray(tiny.user_order(ts_tiny).acc)
    # degraded but not corrupted: dropped clusters revert to their
    # multipole (everything is mutually near in this tiny scene, so the
    # error is the full quadrupole-truncation scale — bounded O(1), not
    # garbage)
    scale = np.linalg.norm(a_full, axis=-1).mean()
    err = np.linalg.norm(a_tiny - a_full, axis=-1) / scale
    assert np.all(np.isfinite(a_tiny))
    assert np.median(err) < 1.0


def test_tree2_required_n():
    assert tree2.required_n(1000, 8, far_levels=2) == 8 * LEAF
    assert tree2.required_n(8 * LEAF, 8, far_levels=2) == 8 * LEAF
    n3 = tree2.required_n(100_000, 8, far_levels=3)
    assert n3 % (8 * LEAF * tree.SUPER) == 0


def test_tree2_energy_conservation():
    """Leapfrog + sharded tree conserves energy over a short rollout."""
    from spacetpu.ops import energy

    d = 8
    n = d * LEAF
    state = _scene(n, seed=7)
    mesh = ring.make_mesh(d)
    sim = tree2.ShardedTreeSimulation(
        mesh, n, theta=0.4, softening="plummer", eps=1e-2, g=1.0,
        backend="xla", multipole_order=2, resort_every=8,
    )
    ts = sim.prime(sim.shard_state(state))
    s0 = sim.user_order(ts)
    e0 = float(energy.total_energy(s0.pos, s0.vel, s0.mass, eps=1e-2, g=1.0))
    ts = sim.run(ts, 1e-3, 24)
    s1 = sim.user_order(ts)
    e1 = float(energy.total_energy(s1.pos, s1.vel, s1.mass, eps=1e-2, g=1.0))
    assert abs((e1 - e0) / e0) < 1e-4


def test_tree2_pairs_measured_caps_match_strip():
    """near_mode="pairs" with measured worst-shard tile caps
    (measure_near(n_shards=D)) reproduces the strip near phase exactly and
    reports zero tile overflow; an absurdly small cap is counted, not
    silent."""
    d = 4
    n = d * LEAF * 2
    state = _scene(n, seed=7)
    mesh = ring.make_mesh(d)
    gg = n // LEAF
    m = tree.measure_near(
        jnp.asarray(state.pos), jnp.asarray(state.mass), theta=0.5, gg=gg,
        n_shards=d,
    )
    kw = dict(theta=0.5, softening="plummer", eps=1e-3, g=1.0,
              backend="xla", multipole_order=2, far_levels=2,
              k_near=m["k_near"])
    sims = {
        "strip": tree2.ShardedTreeSimulation(mesh, n, near_mode="strip", **kw),
        "pairs": tree2.ShardedTreeSimulation(
            mesh, n, near_mode="pairs",
            near_tiles=m["near_tiles_shard"],
            near_tiles_q=m["near_tiles_q_shard"], **kw,
        ),
    }
    acc = {}
    for name, sim in sims.items():
        ts = sim.prime(sim.shard_state(state))
        acc[name] = np.asarray(sim.user_order(ts).acc)
        diag = sim.diagnose(ts)
        assert int(diag["tile_overflow"]) == 0
        assert int(diag["near_overflow"]) == 0
    np.testing.assert_allclose(acc["pairs"], acc["strip"],
                               rtol=1e-9, atol=1e-12)

    tiny = tree2.ShardedTreeSimulation(
        mesh, n, near_mode="pairs", near_tiles=1, near_tiles_q=1, **kw
    )
    ts = tiny.prime(tiny.shard_state(state))
    assert int(tiny.diagnose(ts)["tile_overflow"]) > 0


def test_tree2_far3_pairs_measured_caps():
    """The production large-N configuration — far_levels=3 + pairs near
    phase + measured caps — reports zero overflow and stays inside the
    theta error budget. The pairs path evaluates the far field through
    the MID decomposition (near supers -> mid multipoles + near mids ->
    cluster multipoles, mirroring the single-chip tree_prep MID path),
    so it is compared against the direct oracle rather than bit-matched
    to the strip refine."""
    d = 2
    n = d * tree.SUPER * LEAF  # g_l=64 per device: far_levels=3 eligible
    state = _scene(n, seed=9)
    mesh = ring.make_mesh(d)
    gg = n // LEAF
    m = tree.measure_near(
        jnp.asarray(state.pos), jnp.asarray(state.mass), theta=0.5, gg=gg,
        n_shards=d,
    )
    kw = dict(theta=0.5, softening="plummer", eps=1e-3, g=1.0,
              backend="xla", multipole_order=2, far_levels=3,
              k_near=m["k_near"], k_super=m["k_super"])
    exact = np.asarray(direct.acc_direct(
        jnp.asarray(state.pos), jnp.asarray(state.mass),
        softening="plummer", eps=1e-3, g=1.0,
    ))
    scale = np.linalg.norm(exact, axis=-1).mean()
    acc = {}
    for nm, extra in (
        ("strip", {}),
        ("pairs", dict(near_tiles=m["near_tiles_shard"],
                       near_tiles_q=m["near_tiles_q_shard"],
                       k_mid=m.get("k_mid"),
                       m1_src_tiles=m.get("m1_src_tiles_shard"),
                       m2_src_tiles=m.get("m2_src_tiles_shard"))),
    ):
        sim = tree2.ShardedTreeSimulation(mesh, n, near_mode=nm, **kw, **extra)
        ts = sim.prime(sim.shard_state(state))
        diag = sim.diagnose(ts)
        assert int(diag["near_overflow"]) == 0, (nm, diag)
        assert int(diag["tile_overflow"]) == 0, (nm, diag)
        acc[nm] = np.asarray(sim.user_order(ts).acc)
        err = np.linalg.norm(acc[nm] - exact, axis=-1) / scale
        assert np.median(err) < 5e-3, (nm, np.median(err))
    # the two refinements agree to far-field (theta) accuracy
    rel = (np.linalg.norm(acc["pairs"] - acc["strip"], axis=-1) / scale)
    assert np.median(rel) < 5e-3, np.median(rel)


def test_tree2_auto_calibration_on_clustered_scene():
    """prime() with no manual caps measures the scene (calibrate()) and
    reports zero overflow even on a high-density-contrast distribution —
    the geometric default cap would overflow here (VERDICT r2 weak #4)."""
    from spacetpu.models import presets

    d = 8
    n = d * LEAF * 2
    scene = presets.plummer_sphere(n, seed=11)
    state = scene.state(dtype=jnp.float64)
    mesh = ring.make_mesh(d)
    sim = tree2.ShardedTreeSimulation(
        mesh, n, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
        backend="xla", multipole_order=2, far_levels=2,
    )
    assert sim._needs_calibration
    ts = sim.prime(sim.shard_state(state))
    assert not sim._needs_calibration
    # the calibrated cap is the measured one, not the geometric default
    assert sim._k_near >= tree.default_k_near(0.5, n // LEAF)
    diag = sim.diagnose(ts)
    assert diag["near_overflow"] == 0
    assert diag["tile_overflow"] == 0
    # and the calibrated forces match the single-chip tree at matched caps
    got = sim.user_order(ts)
    ref = tree.acc_tree(
        jnp.asarray(state.pos), jnp.asarray(state.mass), theta=0.5,
        softening="plummer", eps=1e-3, g=1.0, backend="xla",
        multipole_order=2, k_near=sim._k_near, far_levels=2,
    )
    np.testing.assert_allclose(np.asarray(got.acc), np.asarray(ref),
                               rtol=1e-9, atol=1e-12)


def test_tree2_checkpoint_roundtrip(tmp_path):
    """Checkpoint/resume across the sharded tree: user_order() -> npz
    save -> load -> shard_state() rebuilds the SFC placement (ids/tick
    are derived, not stored) and the state round-trips exactly; the
    resumed rollout stays on the continuous run's trajectory (re-sorting
    at restore can pick a different-but-valid clustering, so parity is
    theta-level, not bit-exact). Reference contract: the reference has
    no checkpointing at all (SURVEY.md aux-subsystems gap)."""
    from spacetpu.io import checkpoint

    d = 4
    n = d * LEAF * 2
    state = _scene(n, seed=13)
    mesh = ring.make_mesh(d)
    kw = dict(theta=0.5, softening="plummer", eps=1e-3, g=1.0,
              backend="xla", multipole_order=2, far_levels=2)
    sim = tree2.ShardedTreeSimulation(mesh, n, **kw)
    ts = sim.prime(sim.shard_state(state))
    for _ in range(3):
        ts = sim.step(ts, jnp.float64(1e-3))

    snap = sim.user_order(ts)
    path = tmp_path / "tree2_ckpt.npz"
    checkpoint.save(str(path), snap)
    loaded, _, _ = checkpoint.load(str(path))
    for f in ("pos", "vel", "mass"):
        np.testing.assert_array_equal(np.asarray(getattr(loaded, f)),
                                      np.asarray(getattr(snap, f)))

    sim2 = tree2.ShardedTreeSimulation(mesh, n, k_near=sim._k_near,
                                       k_super=sim.k_super, **kw)
    ts2 = sim2.prime(sim2.shard_state(loaded))
    # the restored placement reproduces the checkpointed bodies exactly
    np.testing.assert_allclose(
        np.asarray(sim2.user_order(ts2).pos), np.asarray(snap.pos),
        rtol=0, atol=0)
    # resumed vs continuous rollout agree to clustering (theta) accuracy
    for _ in range(3):
        ts = sim.step(ts, jnp.float64(1e-3))
        ts2 = sim2.step(ts2, jnp.float64(1e-3))
    a = np.asarray(sim.user_order(ts).pos)
    b = np.asarray(sim2.user_order(ts2).pos)
    np.testing.assert_allclose(b, a, rtol=5e-5, atol=1e-7)


def test_tree2_scan_chunk_policy():
    """ShardedTreeSimulation mirrors Simulation's fence tiers exactly —
    including the single-step tier for extreme per-device near work (the
    scan x dense-near-list TPU fault, sim.py "Known issue"): above
    DENSE_TILES_SINGLE_STEP even 16-step scans crash, so run() must fall
    back to plain step() dispatches."""
    from spacetpu import sim as sim_mod

    d = 4
    n = d * LEAF * 8
    mesh = ring.make_mesh(d)
    kw = dict(theta=0.5, softening="plummer", eps=1e-3, g=1.0,
              multipole_order=2, far_levels=2)
    # XLA backend: unlimited scans (the fault is TPU-specific)
    s = tree2.ShardedTreeSimulation(mesh, n, backend="xla", k_near=64, **kw)
    assert s.scan_chunk() is None
    # explicit run_chunk always wins
    s = tree2.ShardedTreeSimulation(mesh, n, backend="xla", k_near=64,
                                    run_chunk=4, **kw)
    assert s.scan_chunk() == 4
    # pallas, sparse cap: default chunk
    s = tree2.ShardedTreeSimulation(mesh, n, backend="pallas", k_near=64,
                                    **kw)
    assert s.scan_chunk() == sim_mod.DEFAULT_RUN_CHUNK
    # pallas, dense cap, moderate tiles: the safe scan length
    s = tree2.ShardedTreeSimulation(mesh, n, backend="pallas", k_near=2048,
                                    near_tiles=10_000, near_tiles_q=1_000,
                                    **kw)
    assert s.scan_chunk() == sim_mod.SAFE_DENSE_SCAN
    # pallas, dense cap + extreme per-device near work: single-step tier
    s = tree2.ShardedTreeSimulation(mesh, n, backend="pallas", k_near=2048,
                                    near_tiles=2_000_000,
                                    near_tiles_q=1_000, **kw)
    assert s.scan_chunk() == 1


def test_tree2_run_chunk_forms_equal():
    """run() produces identical trajectories whether it scans in one
    program, in chunks, or (run_chunk=1, the fence's single-step tier)
    as plain step() dispatches."""
    d = 4
    n = d * LEAF * 2
    mesh = ring.make_mesh(d)
    kw = dict(theta=0.5, softening="plummer", eps=1e-3, g=1.0,
              backend="xla", multipole_order=2, far_levels=2,
              resort_every=4)
    sims = [tree2.ShardedTreeSimulation(mesh, n, run_chunk=rc, **kw)
            for rc in (None, 3, 1)]
    outs = []
    for sim in sims:
        ts = sim.prime(sim.shard_state(_scene(n, seed=7)))
        ts = sim.run(ts, 1e-3, 7)  # None: one scan; 3: 3+3+1; 1: 7x step
        outs.append(np.asarray(sim.user_order(ts).pos))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_tree2_maybe_recalibrate_after_scene_restructures():
    """Multi-chip cap-degradation recovery: collapsing most of the ball
    into a dense core outgrows the prime-time caps; maybe_recalibrate
    must detect it through the sharded telemetry, re-measure, and bring
    the overflow back to zero through the rebuilt closures."""
    d = 4
    n = d * LEAF * 30
    rng = np.random.default_rng(13)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    r = rng.uniform(0, 1, size=(n, 1))
    pos = u * r ** (1 / 3)  # uniform ball: moderate tile totals
    vel = np.zeros((n, 3))
    mass = np.full(n, 1.0 / n)
    mesh = ring.make_mesh(d)
    # pairs mode: the statically-capped near-tile totals are the caps an
    # evolving scene outgrows first (at this small G the k_near cap is
    # already the full cluster count and cannot be exceeded)
    sim = tree2.ShardedTreeSimulation(
        mesh, n, theta=0.5, softening="plummer", eps=1e-2, g=1.0,
        backend="xla", near_mode="pairs", multipole_order=2, far_levels=2,
    )
    ts = sim.prime(sim.shard_state(make_state(pos, vel, mass,
                                              dtype=jnp.float32)))
    assert sim.maybe_recalibrate(ts) is False  # healthy scene: no-op
    t0 = sim.near_tiles

    # heavy core + sparse tail: a density-contrast restructuring (the
    # self-similar "collapse everything" case does NOT bust equal-count
    # caps — cluster sizes adapt; the long tail is what does)
    pos2 = u * r ** 3 * 4.0
    ts2 = sim.prime(sim.shard_state(make_state(pos2, vel, mass,
                                               dtype=jnp.float32)))
    assert sim.diagnose(ts2)["tile_overflow"] > 0
    assert sim.maybe_recalibrate(ts2) is True
    assert sim.near_tiles > t0
    d2 = sim.diagnose(ts2)
    assert d2["near_overflow"] == 0 and d2["tile_overflow"] == 0
    ts2 = sim.step(ts2, jnp.float32(1e-4))
    assert bool(jnp.all(jnp.isfinite(ts2.state.pos)))
