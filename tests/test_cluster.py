"""Adaptive clustering + pair-list near phase (round-2 tree overhaul).

The reference octree adapts cell size to density by recursive splitting
(`/root/reference/space/src/sim/barnes_hut/tree.rs:143-174`) and walks per
body so its work tracks the visited-node count
(`barnes_hut/mod.rs:46-76`). These tests cover the TPU analogues:
`ops/cluster.py` (density-bounded static-shape partitions) and
`ops/tree.py` near_mode="pairs" (near cost proportional to the actual
near-pair total).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu.models import presets
from spacetpu.ops import cluster, direct, morton, tree


def _check_partition(cl, n, leaf):
    slot = np.asarray(cl.slot)
    mask = np.asarray(cl.mask)
    bs = np.asarray(cl.body_slot)
    flat = slot.ravel()[mask.ravel()]
    assert len(flat) == n
    assert len(np.unique(flat)) == n, "a body appears in two clusters"
    g, j = bs // leaf, bs % leaf
    assert (slot[g, j] == np.arange(n)).all()
    assert mask[g, j].all()
    counts = mask.sum(1)
    assert counts.max() <= leaf
    gcnt = int(cl.n_clusters)
    assert (counts[gcnt:] == 0).all()
    return counts


@pytest.mark.parametrize("leaf", [31, 255])
@pytest.mark.parametrize(
    "scene_fn",
    [
        lambda: presets.plummer_sphere(20_000, seed=1),
        lambda: presets.fixed_cloud(20_000),
        lambda: presets.fixed_shell(5_000),
    ],
)
def test_adaptive_partition_invariants(scene_fn, leaf):
    st = scene_fn().state(dtype=jnp.float32)
    n = st.pos.shape[0]
    perm, inv, hi_s, lo_s = morton.sfc_sort_2w(st.pos)
    g_cap = cluster.g_cap_for(n, leaf)
    cl = cluster.adaptive_clusters(hi_s, lo_s, n, leaf, g_cap)
    assert int(cl.overflow) == 0
    _check_partition(cl, n, leaf)


def test_near_pair_cost_landscape_on_plummer():
    """The round-2 tree overhaul's payoff on a high-density-contrast
    scene: small adaptive leaves cut the near-phase pair count severalfold
    vs the round-1 configuration (equal-count 255-body clusters), and
    adaptive beats equal at the same small leaf (bounded cluster radii in
    the rho ~ r^-5 tail)."""
    st = presets.plummer_sphere(60_000, seed=0).state(dtype=jnp.float32)
    n = st.pos.shape[0]

    def pairs_per_body(cmode, leaf):
        gg = tree._gg_for(n, 2, 2, leaf, cmode)
        m = tree.measure_near(st.pos, st.mass, theta=0.5, gg=gg, leaf=leaf,
                              cluster_mode=cmode, headroom=1.0)
        block = leaf + 1
        pj = tree.NEAR_TILE_J // block
        return m["near_tiles"] * pj * block * block / n

    round1 = pairs_per_body("equal", 255)
    assert pairs_per_body("adaptive", 31) < 0.35 * round1
    assert pairs_per_body("adaptive", 31) < 0.75 * pairs_per_body("equal", 31)


def test_adaptive_overflow_falls_back_to_equal():
    st = presets.plummer_sphere(5_000, seed=2).state(dtype=jnp.float32)
    n = st.pos.shape[0]
    leaf = 63
    perm, inv, hi_s, lo_s = morton.sfc_sort_2w(st.pos)
    g_cap = -(-n // leaf) + 2  # far below the adaptive partition's count
    cl = cluster.adaptive_clusters(hi_s, lo_s, n, leaf, g_cap)
    assert int(cl.overflow) == 1
    counts = _check_partition(cl, n, leaf)
    # equal-count fallback: all but the last cluster full
    gcnt = int(cl.n_clusters)
    assert (counts[: gcnt - 1] == leaf).all()


def test_equal_clusters_match_round1_layout():
    n, leaf = 1000, 255
    gg = -(-n // leaf)
    cl = cluster.equal_clusters(n, leaf, gg)
    _check_partition(cl, n, leaf)
    assert (np.asarray(cl.body_slot) == np.arange(n)).all()


@pytest.mark.parametrize("cmode", ["equal", "adaptive"])
@pytest.mark.parametrize("leaf", [63, 255])
def test_tree_accuracy_modes(cmode, leaf):
    """Force error vs the exact direct sum for every (cluster, near) mode;
    pairs and strip must agree bit-for-bit (same near sets)."""
    st = presets.plummer_sphere(8_000, seed=3).state(dtype=jnp.float64)
    pos, mass = st.pos, st.mass
    exact = np.asarray(
        direct.acc_direct(pos, mass, softening="plummer", eps=1e-3, g=1.0)
    )
    en = np.linalg.norm(exact, axis=1)
    gg = tree._gg_for(8_000, 2, 2, leaf, cmode)
    m = tree.measure_near(pos, mass, theta=0.5, gg=gg, leaf=leaf,
                          cluster_mode=cmode)
    kw = dict(theta=0.5, softening="plummer", eps=1e-3, g=1.0,
              backend="xla", multipole_order=2, leaf=leaf,
              cluster_mode=cmode, k_near=m["k_near"], gg=gg, far_levels=2)
    a_strip = np.asarray(tree.acc_tree(pos, mass, near_mode="strip", **kw))
    a_pairs = np.asarray(
        tree.acc_tree(pos, mass, near_mode="pairs",
                      near_tiles=m["near_tiles"],
                      near_tiles_q=m["near_tiles_q"], **kw)
    )
    # identical near sets; differences are pure f64 summation-order noise
    # (pairs sums 8-cluster tiles, strip one 2048-lane pass)
    np.testing.assert_allclose(a_pairs, a_strip, rtol=1e-6, atol=1e-8)
    err = np.linalg.norm(a_strip - exact, axis=1) / np.maximum(en, 1e-300)
    assert np.percentile(err, 99) < 2e-3
    assert np.percentile(err, 50) < 2e-4


def test_pairs_capacity_overflow_degrades_gracefully():
    """Undersized tile capacity drops the farthest near entries (their
    far-field term still applies) and reports the count."""
    st = presets.fixed_cloud(8_000).state(dtype=jnp.float32)
    pos, mass = st.pos, st.mass
    gg = tree._gg_for(8_000, 2, 1, 255, "equal")
    k = tree.default_k_near(0.5, gg)
    prep = tree.tree_prep(pos, mass, theta=0.5, k_near=k, gg=gg,
                          far_levels=2, near_mode="pairs", near_tiles=4)
    assert int(prep["near_overflow"]) > 0
    acc = tree.tree_eval(prep, 0, gg, softening="plummer", eps=0.0, g=1.0,
                         backend="xla", interpret=True, multipole_order=1,
                         near_mode="pairs")
    assert bool(jnp.all(jnp.isfinite(acc)))


def test_near_pair_segments_layout():
    idx = jnp.asarray([
        [0, 2, 5, 5, 5],   # 2 valid -> 1 tile (pj=2)
        [1, 2, 3, 4, 5],   # 4 valid -> 2 tiles
        [5, 5, 5, 5, 5],   # 0 valid -> 1 tile (always >= 1)
    ], jnp.int32)
    flat, ttgt, n_tiles, dropped = tree.near_pair_segments(idx, 5, 2, 6)
    assert int(n_tiles) == 4
    assert int(dropped) == 0
    np.testing.assert_array_equal(np.asarray(ttgt), [0, 1, 1, 2, 3, 3])
    np.testing.assert_array_equal(
        np.asarray(flat), [0, 2, 1, 2, 3, 4, 5, 5, 5, 5, 5, 5]
    )


def test_near_pair_segments_consistent_shared_sort():
    """The consistent builder packs two id spaces with ONE shared sort
    (the validity patterns are identical by construction); its output
    must be bit-identical to two independent near_pair_segments calls
    on the fit-masked tables."""
    rng = np.random.default_rng(7)
    g, k = 13, 9
    n_src_d, n_src_q = 21, 17  # pool vs global id spaces
    k_i = rng.integers(0, k + 1, size=g)
    idx_d = np.full((g, k), n_src_d, np.int32)
    idx_q = np.full((g, k), n_src_q, np.int32)
    for r in range(g):
        # interior nulls allowed: scatter the valid slots randomly
        slots = rng.choice(k, size=k_i[r], replace=False)
        idx_d[r, slots] = rng.integers(0, n_src_d, size=k_i[r])
        idx_q[r, slots] = rng.integers(0, n_src_q, size=k_i[r])
    args = (jnp.asarray(idx_d), n_src_d, 2, 14,
            jnp.asarray(idx_q), n_src_q, 3, 11)
    out = tree.near_pair_segments_consistent(*args)
    # reference: mask to the same fit set, then two independent builds
    valid = idx_d < n_src_d
    ki = valid.sum(axis=1)
    t_d = np.maximum(-(-ki // 2), 1)
    t_q = np.maximum(-(-ki // 3), 1)
    fit = (np.cumsum(t_d) <= 14) & (np.cumsum(t_q) <= 11)
    md = jnp.asarray(np.where(fit[:, None], idx_d, n_src_d))
    mq = jnp.asarray(np.where(fit[:, None], idx_q, n_src_q))
    fd, td, nd, _ = tree.near_pair_segments(md, n_src_d, 2, 14)
    fq, tq, nq, _ = tree.near_pair_segments(mq, n_src_q, 3, 11)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(fd))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(td))
    assert int(out[2]) == int(nd)
    np.testing.assert_array_equal(np.asarray(out[3]), np.asarray(fq))
    np.testing.assert_array_equal(np.asarray(out[4]), np.asarray(tq))
    assert int(out[5]) == int(nq)
    assert int(out[6]) == int(np.where(fit, 0, ki).sum())


@pytest.mark.parametrize("cmode", ["equal", "adaptive"])
def test_simulation_modes_run_and_conserve(cmode):
    """End-to-end Simulation with the new modes: calibrated caps, finite
    rollout, and parity between pairs and strip stepping."""
    from spacetpu import make_simulation
    from spacetpu.models import presets as p

    scene = p.plummer_sphere(4_000, seed=5)
    kw = dict(algorithm="tree", backend="xla", integrator="leapfrog",
              softening="plummer", eps=1e-2, g=1.0, theta=0.5,
              cluster_mode=cmode)
    sims = {
        nm: make_simulation(4_000, near_mode=nm, k_near="auto", **kw)
        for nm in ("strip", "pairs")
    }
    outs = {}
    for nm, sim in sims.items():
        state = sim.prime(scene.state(dtype=jnp.float32))
        state = sim.run(state, jnp.float32(1e-3), 3)
        assert bool(jnp.all(jnp.isfinite(state.pos)))
        outs[nm] = np.asarray(state.pos)
    np.testing.assert_allclose(outs["pairs"], outs["strip"],
                               rtol=5e-5, atol=1e-6)


def test_simulation_cached_structure_with_modes():
    """tree_refresh_every>1 with adaptive clustering + pairs mode."""
    from spacetpu import make_simulation
    from spacetpu.models import presets as p

    scene = p.plummer_sphere(3_000, seed=6)
    sim = make_simulation(
        3_000, algorithm="tree", backend="xla", integrator="leapfrog",
        softening="plummer", eps=1e-2, g=1.0, theta=0.5,
        cluster_mode="adaptive", near_mode="pairs", k_near="auto",
        tree_refresh_every=2,
    )
    state = sim.prime(scene.state(dtype=jnp.float32))
    state = sim.run(state, jnp.float32(1e-3), 5)
    assert bool(jnp.all(jnp.isfinite(state.pos)))


def _fake_measures(equal: dict, adaptive: dict):
    def fake(pos, mass, *, theta, gg, leaf=tree.LEAF, cluster_mode="equal",
             **kw):
        return dict(equal) if cluster_mode == "equal" else dict(adaptive)

    return fake


def test_auto_cluster_mode_upgrades_on_heavy_tail(monkeypatch):
    """cluster_mode="auto": calibrate() measures the equal partition and,
    when its near lists are heavy-tailed AND the adaptive partition
    measurably shrinks the tile count, switches the force closure to
    adaptive clustering (the TPU-measured policy: plummer_sphere(300k)
    519 -> 387 ms/step)."""
    from spacetpu import make_simulation

    n = 4_000
    # gg_equal = 16 -> trigger = min(4*k_geom, gg/2) = 8; canned equal
    # measurement has mean near = 32 * 8 / 16 = 16 > 8, and the canned
    # adaptive tiles are well under 0.8x -> upgrade.
    eq = dict(k_near=16, near_tiles=32, near_tiles_q=8, n_clusters=16)
    ad = dict(k_near=24, near_tiles=16, near_tiles_q=6, n_clusters=20)
    monkeypatch.setattr(tree, "measure_near", _fake_measures(eq, ad))
    sim = make_simulation(n, algorithm="tree", backend="xla", g=1.0,
                          theta=0.5, cluster_mode="auto", near_mode="pairs",
                          k_near="auto")
    sim.calibrate(presets.fixed_cloud(n).state(dtype=jnp.float32))
    assert sim._cluster_mode == "adaptive"
    assert sim._k_near == 24
    assert sim._near_tiles == 16
    assert sim._gg is not None and sim._gg % tree.SUPER == 0


def test_adaptive_calibrate_remeasures_at_shrunk_gg():
    """Adaptive calibrate() measures once at the worst-case cluster cap
    to learn the real cluster count, shrinks gg, then re-measures at the
    shrunk cap: the first pass's tile capacities are counted on the
    gg-padded partition, where every padding cluster claims >= 1 pair
    tile per list (35% dead near-phase grid measured at fixed_cloud
    120k/leaf=127), and k_super/k_mid see the padded super geometry."""
    from spacetpu import make_simulation

    n = 20_000
    state = presets.plummer_sphere(n, seed=3).state(dtype=jnp.float32)
    sim = make_simulation(n, algorithm="tree", backend="xla", g=1.0,
                          theta=0.5, cluster_mode="adaptive",
                          near_mode="pairs", k_near="auto")
    sim.calibrate(state)
    gg_worst = tree._gg_for(n, sim.config.far_levels, 2, tree.LEAF,
                            "adaptive")
    assert sim._gg is not None and sim._gg < gg_worst
    m_run = tree.measure_near(jnp.asarray(state.pos),
                              jnp.asarray(state.mass), theta=0.5,
                              gg=sim._gg, cluster_mode="adaptive")
    assert sim._near_tiles == m_run["near_tiles"]
    assert sim._near_tiles_q == m_run["near_tiles_q"]
    assert sim._k_super == m_run["k_super"]
    # and the run partition reports zero overflow at these caps
    st = sim.prime(state)
    assert int(sim.health(st)["near_overflow"]) == 0


def test_auto_cluster_mode_stays_equal_without_win(monkeypatch):
    """Heavy-tailed trigger alone is not enough: if the measured adaptive
    partition does not cut near tiles below 0.8x, auto keeps the equal
    split (uniform clouds: equal was 405 vs adaptive 490 ms/step at N=1M)."""
    from spacetpu import make_simulation

    n = 4_000
    eq = dict(k_near=16, near_tiles=32, near_tiles_q=8, n_clusters=16)
    ad = dict(k_near=24, near_tiles=30, near_tiles_q=8, n_clusters=20)
    monkeypatch.setattr(tree, "measure_near", _fake_measures(eq, ad))
    sim = make_simulation(n, algorithm="tree", backend="xla", g=1.0,
                          theta=0.5, cluster_mode="auto", near_mode="pairs",
                          k_near="auto")
    sim.calibrate(presets.fixed_cloud(n).state(dtype=jnp.float32))
    assert sim._cluster_mode == "equal"
    assert sim._k_near == 16
    assert sim._gg is None


def test_auto_modes_end_to_end():
    """Default tree configuration (near_mode auto -> pairs, cluster_mode
    auto) primes, calibrates and rolls out finitely."""
    from spacetpu import make_simulation

    scene = presets.plummer_sphere(3_000, seed=7)
    sim = make_simulation(3_000, algorithm="tree", backend="xla", g=1.0,
                          theta=0.5, softening="plummer", eps=1e-2,
                          near_mode="pairs")
    assert sim.config.resolved_near_mode() == "pairs"
    # backend-aware auto: pairs only on the Pallas/TPU path (the XLA
    # tile-list fallback's lax.map compile degenerates at large G)
    from spacetpu.sim import SimConfig
    assert SimConfig(n=3_000, algorithm="tree",
                     backend="xla").resolved_near_mode() == "strip"
    state = sim.prime(scene.state(dtype=jnp.float32))
    assert sim._cluster_mode in ("equal", "adaptive")
    assert sim._near_tiles is not None
    state = sim.run(state, jnp.float32(1e-3), 3)
    assert bool(jnp.all(jnp.isfinite(state.pos)))


def test_simulation_health_uses_calibrated_partition():
    """sim.health() reports overflow with the sim's OWN calibrated
    partition/caps (a generic equal/LEAF rebuild mis-reported overflow
    for adaptive or calibrated sims)."""
    from spacetpu import make_simulation

    scene = presets.plummer_sphere(3_000, seed=11)
    sim = make_simulation(3_000, algorithm="tree", backend="xla", g=1.0,
                          theta=0.5, near_mode="pairs", k_near="auto")
    state = sim.prime(scene.state(dtype=jnp.float32))
    h = sim.health(state)
    assert h["near_overflow"] == 0
    assert h["k_near"] == sim.caps["k_near"]
    # non-tree sims report only the resolved algorithm (telemetry for the
    # interactive auto-select tier, round-4)
    dsim = make_simulation(100, algorithm="direct", backend="xla")
    assert dsim.health(scene.state(dtype=jnp.float32)) == {
        "algorithm": "direct"}


def test_maybe_recalibrate_after_scene_restructures():
    """Caps are measured from one snapshot; a scene that restructures
    (here: half the ball collapses into a dense core) can outgrow them,
    and overflow then degrades near accuracy cluster by cluster.
    maybe_recalibrate must detect the degradation through the telemetry,
    re-measure, REBUILD the jitted closures (a stale jit cache would
    silently keep the old caps), and bring overflow back to zero."""
    from spacetpu import make_simulation
    from spacetpu.state import make_state

    n = 30_000
    rng = np.random.default_rng(11)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    pos = u * rng.uniform(0, 1, size=(n, 1)) ** (1 / 3)
    vel = np.zeros((n, 3))
    mass = np.full(n, 1.0 / n)

    sim = make_simulation(n, algorithm="tree", backend="xla",
                          integrator="leapfrog", softening="plummer",
                          eps=1e-2, g=1.0, theta=0.5, k_near="auto",
                          near_mode="pairs")
    sim.calibrate(make_state(pos, vel, mass, dtype=jnp.float32))
    k0 = sim._k_near

    # the scene restructures: most of the ball collapses into a core
    # 50x denser than anything the calibration snapshot saw, so nearly
    # every cluster ends up mutually near
    pos2 = pos.copy()
    pos2[: int(n * 0.9)] *= 0.02
    evolved = make_state(pos2, vel, mass, dtype=jnp.float32)
    assert sim.health(evolved)["near_overflow"] > 0

    # an un-degraded scene must NOT trigger (no useless re-compiles)
    ok = make_state(pos, vel, mass, dtype=jnp.float32)
    assert sim.maybe_recalibrate(ok) is False
    assert sim._k_near == k0

    assert sim.maybe_recalibrate(evolved) is True
    assert sim.health(evolved)["near_overflow"] == 0
    # the rebuilt closures must actually run with the new caps
    st = sim.step(make_state(pos2, vel, mass, dtype=jnp.float32),
                  jnp.float32(1e-4))
    assert bool(jnp.all(jnp.isfinite(st.pos)))
    # direct sims have no caps to recalibrate
    d = make_simulation(64, algorithm="direct", backend="xla")
    assert d.maybe_recalibrate(ok) is False


def test_recalibrate_adaptive_to_equal_resets_gg(monkeypatch):
    """A RE-calibration that resolves cluster_mode auto back to "equal"
    after a prior adaptive pass must drop the shrunk adaptive cluster
    cap: a stale _gg would make the equal rebuild overflow a too-small
    cap and silently degrade forces."""
    from spacetpu import make_simulation

    n = 4_000
    eq_heavy = dict(k_near=16, near_tiles=32, near_tiles_q=8, n_clusters=16)
    ad = dict(k_near=24, near_tiles=16, near_tiles_q=6, n_clusters=20)
    monkeypatch.setattr(tree, "measure_near", _fake_measures(eq_heavy, ad))
    sim = make_simulation(n, algorithm="tree", backend="xla", g=1.0,
                          theta=0.5, cluster_mode="auto", near_mode="pairs",
                          k_near="auto")
    st = presets.fixed_cloud(n).state(dtype=jnp.float32)
    sim.calibrate(st)
    assert sim._cluster_mode == "adaptive" and sim._gg is not None

    # the evolved scene measures equal-friendly (no heavy tail)
    eq_light = dict(k_near=12, near_tiles=8, near_tiles_q=4, n_clusters=16)
    monkeypatch.setattr(tree, "measure_near",
                        _fake_measures(eq_light, eq_light))
    sim.calibrate(st)
    assert sim._cluster_mode == "equal"
    assert sim._gg is None  # the adaptive cap must not leak


def test_maybe_recalibrate_pinned_k_near_disables(monkeypatch):
    """With an explicit (pinned) k_near, recalibration cannot widen the
    cap, so an uncleared overflow must disable further auto checks
    (warning once) instead of paying a re-measure + re-compile at every
    boundary forever."""
    import warnings

    from spacetpu import make_simulation
    from spacetpu.state import make_state

    n = 30_000
    rng = np.random.default_rng(17)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    r = rng.uniform(0, 1, size=(n, 1))
    pos = u * r ** 3 * 4.0  # heavy core + sparse tail: dense near lists
    st = make_state(pos, np.zeros((n, 3)), np.full(n, 1.0 / n),
                    dtype=jnp.float32)
    sim = make_simulation(n, algorithm="tree", backend="xla",
                          softening="plummer", eps=1e-2, g=1.0, theta=0.5,
                          k_near=8, near_mode="pairs")
    assert sim.health(st)["near_overflow"] > 0
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert sim.maybe_recalibrate(st) is True  # ran, couldn't clear
        assert any("pinned" in str(x.message) for x in w)
    assert sim.maybe_recalibrate(st) is False  # disabled, no more churn


def test_pack_rows_flat_matches_scatter_reference():
    """The gather-based _pack_rows_flat must reproduce the rank-packing
    scatter semantics bit-for-bit: interspersed nulls rank-pack in
    original order, overflow drops tail entries per row and counts them."""
    rng = np.random.default_rng(42)
    for trial in range(6):
        g = int(rng.integers(1, 12))
        k = int(rng.integers(1, 40))
        pj = int(rng.integers(1, 9))
        n_src = 50
        # dense/sparse mixes incl. all-null rows and interior nulls
        idx = rng.integers(0, n_src + 1, size=(g, k)).astype(np.int32)
        if trial % 3 == 0:
            idx[rng.integers(0, g)] = n_src  # an all-null row
        valid = idx < n_src
        k_i = valid.sum(axis=1)
        tiles_i = np.maximum(-(-k_i // pj), 1)
        exact = int(tiles_i.sum())
        for cap in (exact, max(exact - int(tiles_i[-1]), 1), exact + 3):
            # numpy reference: the original scatter formulation
            offs = np.concatenate([[0], np.cumsum(tiles_i)[:-1]])
            rank = np.cumsum(valid, axis=1) - 1
            pos = offs[:, None] * pj + rank
            ok = valid & (pos < cap * pj)
            ref = np.full(cap * pj, n_src, np.int32)
            ref[pos[ok]] = idx[ok]
            ref_dropped = int(valid.sum() - ok.sum())

            flat, ttgt, n_tiles, dropped = tree.near_pair_segments(
                jnp.asarray(idx), n_src, pj, cap)
            np.testing.assert_array_equal(np.asarray(flat), ref,
                                          err_msg=f"trial={trial} cap={cap}")
            assert int(dropped) == ref_dropped
            assert int(n_tiles) == exact
            # tile_tgt: row of each live tile, g past the end
            t = np.arange(cap)
            ref_tt = np.searchsorted(offs, t, side="right") - 1
            ref_tt = np.where(t < exact, ref_tt, g)
            np.testing.assert_array_equal(np.asarray(ttgt), ref_tt)
