"""Clustered Barnes-Hut tests: force error vs direct, exactness limits,
massless handling."""

import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu.ops import direct, morton, tree


def _cluster(n, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    r = rng.uniform(0, 1, size=(n, 1)) ** (1 / 3)
    pos = jnp.asarray(u * r, dtype)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, size=n) / n, dtype)
    return pos, mass


def test_morton_keys_locality():
    # Points in the same octant share high key bits; keys are deterministic.
    pos = jnp.asarray(
        [[0.1, 0.1, 0.1], [0.11, 0.1, 0.1], [0.9, 0.9, 0.9]], jnp.float64
    )
    k = np.asarray(morton.morton_keys(pos))
    assert k[0] != k[2]
    # close points have closer keys than far points
    assert abs(int(k[0]) - int(k[1])) < abs(int(k[0]) - int(k[2]))


def test_morton_order_is_permutation():
    pos, _ = _cluster(500, seed=1)
    for curve in ("morton", "hilbert"):
        perm, inv = morton.morton_order(pos, curve=curve)
        perm = np.asarray(perm)
        assert sorted(perm.tolist()) == list(range(500)), curve
        np.testing.assert_array_equal(
            np.asarray(perm)[np.asarray(inv)], np.arange(500)
        )


def test_hilbert_locality_beats_morton():
    """Consecutive bodies along the Hilbert curve are closer on average
    than along the Z-order curve (the reason it is the default)."""
    pos, _ = _cluster(5000, seed=11)
    p = np.asarray(pos)

    def mean_jump(curve):
        perm, _ = morton.morton_order(pos, curve=curve)
        q = p[np.asarray(perm)]
        return np.linalg.norm(np.diff(q, axis=0), axis=-1).mean()

    assert mean_jump("hilbert") < mean_jump("morton")


def test_hilbert_keys_deterministic_and_distinct():
    pos, _ = _cluster(256, seed=12)
    k1 = np.asarray(morton.hilbert_keys(pos))
    k2 = np.asarray(morton.hilbert_keys(pos))
    np.testing.assert_array_equal(k1, k2)
    # 256 well-separated points in a 2^30 grid: keys should mostly differ
    assert len(np.unique(k1)) > 250


@pytest.mark.parametrize("theta,bound", [(0.3, 2e-3), (0.5, 8e-3), (0.8, 4e-2)])
def test_tree_force_error_vs_theta(theta, bound):
    """Force error decreases with theta, staying within BH-typical bounds
    (the validation SURVEY.md SS7 step 4 calls for)."""
    pos, mass = _cluster(2000, seed=2)
    exact = np.asarray(
        direct.acc_direct(pos, mass, softening="plummer", eps=1e-3, g=1.0)
    )
    got = np.asarray(
        tree.acc_tree(
            pos, mass, theta=theta, softening="plummer", eps=1e-3, g=1.0,
            backend="xla",
        )
    )
    scale = np.linalg.norm(exact, axis=-1).mean()
    err = np.linalg.norm(got - exact, axis=-1) / scale
    assert np.median(err) < bound, f"median err {np.median(err)} at theta={theta}"


def test_tree_exact_when_everything_near():
    """theta -> 0 opens every cluster: with an uncapped near list the
    correction replaces every monopole and the result is exact."""
    pos, mass = _cluster(700, seed=3)
    exact = np.asarray(
        direct.acc_direct(pos, mass, softening="plummer", eps=1e-3, g=1.0)
    )
    got = np.asarray(
        tree.acc_tree(
            pos, mass, theta=1e-9, softening="plummer", eps=1e-3, g=1.0,
            backend="xla", k_near=3,  # 700 bodies -> 3 clusters
        )
    )
    np.testing.assert_allclose(got, exact, rtol=1e-9, atol=1e-12)


def test_tree_ref_softening():
    pos, mass = _cluster(1000, seed=4)
    exact = np.asarray(direct.acc_direct(pos, mass, softening="ref", g=1.0))
    got = np.asarray(
        tree.acc_tree(pos, mass, theta=0.4, softening="ref", g=1.0, backend="xla")
    )
    scale = np.linalg.norm(exact, axis=-1).mean()
    err = np.linalg.norm(got - exact, axis=-1) / scale
    assert np.median(err) < 5e-3


def test_tree_massless_bodies():
    """Massless bodies feel forces but exert none (tree.rs:124-131 parity)."""
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(-1, 1, (600, 3)), jnp.float64)
    mass = jnp.zeros((600,), jnp.float64).at[0].set(100.0)
    exact = np.asarray(direct.acc_direct(pos, mass, softening="plummer", eps=1e-2, g=1.0))
    got = np.asarray(
        tree.acc_tree(pos, mass, theta=0.5, softening="plummer", eps=1e-2,
                      g=1.0, backend="xla")
    )
    scale = np.abs(exact).max()
    np.testing.assert_allclose(got, exact, atol=2e-2 * scale)


def test_tree_massless_clusters_offset_system():
    """Regression: a system far from the origin with entire clusters of
    massless tracers. Pure-massless clusters must keep geometrically
    meaningful centroids (not collapse to the origin), so massless targets
    still get near-field corrections."""
    rng = np.random.default_rng(8)
    center = np.array([50.0, 50.0, 50.0])
    massive = center + rng.uniform(-0.5, 0.5, (300, 3))
    tracers = center + rng.normal(size=(2000, 3)) * 1.2
    pos = jnp.asarray(np.concatenate([massive, tracers]), jnp.float64)
    mass = jnp.asarray(
        np.concatenate([np.full(300, 1.0 / 300), np.zeros(2000)]), jnp.float64
    )
    exact = np.asarray(
        direct.acc_direct(pos, mass, softening="plummer", eps=1e-2, g=1.0)
    )
    got = np.asarray(
        tree.acc_tree(pos, mass, theta=0.3, softening="plummer", eps=1e-2,
                      g=1.0, backend="xla")
    )
    scale = np.linalg.norm(exact[300:], axis=-1).mean()
    err = np.linalg.norm(got[300:] - exact[300:], axis=-1) / scale
    assert np.median(err) < 2e-3, np.median(err)
    assert np.percentile(err, 99) < 5e-2, np.percentile(err, 99)


def test_tree_all_massless():
    """No massive bodies at all: zero forces (the empty-tree early-out,
    barnes_hut/mod.rs:19-21)."""
    pos, _ = _cluster(300, seed=6)
    mass = jnp.zeros((300,), jnp.float64)
    got = np.asarray(
        tree.acc_tree(pos, mass, theta=0.5, softening="plummer", eps=1e-3,
                      g=1.0, backend="xla")
    )
    np.testing.assert_array_equal(got, 0.0)


def test_tree_simulation_e2e():
    """algorithm='tree' through the Simulation facade (the auto-selected
    path for N > BARNES_HUT_CUTOFF, event_loop.rs:334-340 parity)."""
    from spacetpu import make_simulation
    from spacetpu.models import presets
    from spacetpu.ops import energy

    scene = presets.plummer_sphere(1500, seed=9)
    sim = make_simulation(
        1500, algorithm="auto", backend="xla", integrator="leapfrog",
        softening="plummer", eps=1e-2, g=1.0, theta=0.4,
    )
    assert sim.config.resolved_algorithm() == "tree"
    st = sim.prime(scene.state(dtype=jnp.float64))
    e0 = float(energy.total_energy(st.pos, st.vel, st.mass, eps=1e-2, g=1.0))
    st = sim.run(st, 1e-3, 100)
    e1 = float(energy.total_energy(st.pos, st.vel, st.mass, eps=1e-2, g=1.0))
    assert np.all(np.isfinite(np.asarray(st.pos)))
    assert abs((e1 - e0) / e0) < 1e-3


def test_tree_cached_structure_rollout():
    """tree_refresh_every > 1 reuses the sort/near lists across steps; a
    short rollout must track the rebuild-every-step rollout closely (bodies
    move a tiny fraction of a cluster radius per step)."""
    from spacetpu import make_simulation
    from spacetpu.models import presets

    scene = presets.plummer_sphere(1500, seed=13)

    def run(refresh):
        sim = make_simulation(
            1500, algorithm="tree", backend="xla", integrator="leapfrog",
            softening="plummer", eps=1e-2, g=1.0, theta=0.4,
            tree_refresh_every=refresh,
        )
        st = sim.prime(scene.state(dtype=jnp.float64))
        st = sim.run(st, 1e-3, 24)
        return np.asarray(st.pos)

    exact = run(1)
    cached = run(8)
    # displacement over 24 steps ~ v*dt*24 ~ 0.02; positions must agree to
    # a small fraction of that
    np.testing.assert_allclose(cached, exact, atol=2e-4)


def test_tree_pallas_interpret_matches_xla():
    pos, mass = _cluster(1200, seed=7, dtype=jnp.float32)
    a = np.asarray(
        tree.acc_tree(pos, mass, theta=0.5, softening="plummer", eps=1e-2,
                      g=1.0, backend="xla")
    )
    b = np.asarray(
        tree.acc_tree(pos, mass, theta=0.5, softening="plummer", eps=1e-2,
                      g=1.0, backend="pallas", interpret=True)
    )
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, atol=5e-5 * scale)


def _prep_stats(n, seed=0, clustered=False):
    """Cluster summaries for a random scene (optionally heavily clustered)."""
    import math

    rng = np.random.default_rng(seed)
    if clustered:
        # two dense blobs + sparse background: stresses nonuniform density
        a = rng.normal(size=(n // 3, 3)) * 0.02
        b = rng.normal(size=(n // 3, 3)) * 0.02 + np.array([2.0, 0, 0])
        c = rng.uniform(-4, 4, size=(n - 2 * (n // 3), 3))
        pos = np.concatenate([a, b, c])
    else:
        pos = rng.normal(size=(n, 3))
    mass = rng.uniform(0.1, 1.0, size=n)
    gg = max(1, math.ceil(n / tree.LEAF))
    perm, _ = morton.morton_order(jnp.asarray(pos))
    stats = tree.tree_sorted_stats(
        jnp.asarray(pos, jnp.float32), jnp.asarray(mass, jnp.float32),
        perm, gg,
    )
    return stats


@pytest.mark.parametrize("clustered", [False, True])
def test_hier_near_lists_match_dense(clustered):
    """The two-level near-list build accepts exactly the dense build's
    cluster sets (the supercluster screen must have no false negatives)."""
    stats = _prep_stats(40_000, seed=3, clustered=clustered)
    theta = 0.5
    gg = stats["com"].shape[0]
    # size the cap to the scene's true maximum so both builders keep the
    # full accepted set and must agree exactly
    dist = np.linalg.norm(
        np.asarray(stats["com"])[:, None] - np.asarray(stats["com"])[None],
        axis=-1,
    )
    near_ct = (
        (np.asarray(stats["r_src"])[None, :]
         >= theta * (dist - np.asarray(stats["r_tgt"])[:, None]))
        & (np.asarray(stats["m_tot"])[None, :] > 0)
    ).sum(1)
    k = int(near_ct.max())
    dense, over_d = tree._near_lists(
        stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
        theta, k,
    )
    hier, over_h = tree._near_lists_hier(
        stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
        theta, k,
    )
    assert int(over_d) == 0
    assert int(over_h) == 0
    dense = np.asarray(dense)
    hier = np.asarray(hier)
    for t in range(gg):
        assert set(dense[t]) == set(hier[t]), f"target cluster {t}"


def test_hier_near_lists_k_exceeds_candidate_pool():
    """k_near larger than the K2*SUPER refine candidate pool (dense scenes
    at small leaf measure k_near ~ G) must pad with null ids, not crash
    top_k, and still return the exact near sets."""
    stats = _prep_stats(40_000, seed=5)
    theta = 0.5
    gg = stats["com"].shape[0]
    k = gg + 37  # beyond any candidate pool
    dense, _ = tree._near_lists(
        stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
        theta, min(k, gg),
    )
    hier, over = tree._near_lists_hier(
        stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
        theta, k,
    )
    assert int(over) == 0
    assert hier.shape == (gg, k)
    dense = np.asarray(dense)
    hier = np.asarray(hier)
    for t in range(gg):
        assert set(dense[t]) - {gg} == set(hier[t]) - {gg}


def test_near_overflow_counter():
    """An artificially tiny cap must be detected by the overflow counter."""
    stats = _prep_stats(40_000, seed=4)
    theta = 0.5
    _, over = tree._near_lists_hier(
        stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
        theta, 4,  # absurdly small cap
    )
    assert int(over) > 0


def test_benchmark_scenes_zero_overflow_with_measured_cap():
    """The measured (auto) k_near cap never overflows on the benchmark
    scenes — silent overflow cost 6x force error in round 1 and median
    2.8e-2 on plummer_sphere with the geometric default (VERDICT weak #4)."""
    from spacetpu.models import presets
    from spacetpu.utils.metrics import tree_health

    for name, scene in [
        ("fixed_cloud", presets.fixed_cloud(30_000)),
        ("plummer_sphere", presets.plummer_sphere(30_000, seed=1)),
    ]:
        for theta in (0.5, 0.8):
            import math

            pos = jnp.asarray(scene.pos, jnp.float32)
            mass = jnp.asarray(scene.mass, jnp.float32)
            gg = max(1, math.ceil(scene.n / tree.LEAF))
            k = tree.measure_k_near(pos, mass, theta=theta, gg=gg)
            h = tree_health(pos, mass, theta=theta, k_near=k)
            assert h["near_overflow"] == 0, (name, theta, h)


def test_overflow_telemetry_detects_plummer_default_cap():
    """The geometric default cap DOES overflow on a Plummer sphere (huge
    sparse halo clusters are near everything); the telemetry must see it
    rather than silently degrading."""
    from spacetpu.models import presets
    from spacetpu.utils.metrics import tree_health

    scene = presets.plummer_sphere(30_000, seed=1)
    h = tree_health(scene.pos.astype(np.float32),
                    scene.mass.astype(np.float32), theta=0.5)
    assert h["near_overflow"] > 0


def test_plummer_auto_cap_accuracy():
    """k_near="auto" restores tree accuracy on the Plummer sphere (median
    relative force error was 2.8e-2 with the default cap)."""
    from spacetpu.models import presets
    from spacetpu.sim import make_simulation

    scene = presets.plummer_sphere(8_000, seed=2)
    pos = jnp.asarray(scene.pos, jnp.float64)
    mass = jnp.asarray(scene.mass, jnp.float64)
    sim = make_simulation(scene.n, algorithm="tree", backend="xla",
                          softening="plummer", eps=1e-4, g=scene.g,
                          theta=0.5, k_near="auto")
    state = sim.prime(scene.state(dtype=jnp.float64))
    assert sim._k_near is not None and sim._k_near > 0
    approx = np.asarray(state.acc)
    exact = np.asarray(direct.acc_direct(pos, mass, softening="plummer",
                                         eps=1e-4, g=scene.g))
    scale = np.linalg.norm(exact, axis=-1)
    scale = np.maximum(scale, np.percentile(scale, 5))
    err = np.linalg.norm(approx - exact, axis=-1) / scale
    assert np.median(err) < 5e-4, np.median(err)


def test_tree_force_matches_with_hier_cutoff(monkeypatch):
    """acc_tree is invariant to which near-list builder ran."""
    pos, mass = _cluster(20_000, seed=7, dtype=jnp.float32)
    kw = dict(theta=0.5, softening="plummer", eps=1e-2, g=1.0, backend="xla")
    monkeypatch.setattr(tree, "HIER_NEAR_CUTOFF", 10**9)
    a_dense = np.asarray(tree.acc_tree(pos, mass, **kw))
    monkeypatch.setattr(tree, "HIER_NEAR_CUTOFF", 0)
    a_hier = np.asarray(tree.acc_tree(pos, mass, **kw))
    np.testing.assert_allclose(a_dense, a_hier, rtol=1e-5, atol=1e-7)


def test_far3_matches_far2_and_direct(monkeypatch):
    """3-level far field (supercluster multipoles + refinement strips)
    stays within the theta error budget and close to the 2-level result.
    SUPER is shrunk to 8 so several superclusters exist at a test-friendly
    N (the production value 64 only becomes multi-super at N >= ~70k)."""
    monkeypatch.setattr(tree, "SUPER", 8)
    pos, mass = _cluster(8_000, seed=11, dtype=jnp.float64)
    kw = dict(theta=0.5, softening="plummer", eps=1e-2, g=1.0,
              backend="xla", multipole_order=2)
    a2 = np.asarray(tree.acc_tree(pos, mass, far_levels=2, **kw))
    a3 = np.asarray(tree.acc_tree(pos, mass, far_levels=3, **kw))
    exact = np.asarray(direct.acc_direct(pos, mass, softening="plummer",
                                         eps=1e-2, g=1.0))
    scale = np.linalg.norm(exact, axis=-1).mean()
    for name, a in (("far2", a2), ("far3", a3)):
        err = np.linalg.norm(a - exact, axis=-1) / scale
        assert np.median(err) < 1e-3, (name, np.median(err))
    # the extra level adds only theta-bounded error on top of far2
    d23 = np.linalg.norm(a3 - a2, axis=-1) / scale
    assert np.median(d23) < 1e-3, np.median(d23)


def test_far3_simulation_energy(monkeypatch):
    """A short 3-level rollout conserves energy like the 2-level one."""
    from spacetpu.ops import energy
    from spacetpu.sim import make_simulation
    from spacetpu.state import make_state

    monkeypatch.setattr(tree, "SUPER", 8)
    monkeypatch.setattr(tree, "FAR3_CUTOFF", 1)
    pos, mass = _cluster(3000, seed=13, dtype=jnp.float64)
    sim = make_simulation(3000, algorithm="tree", backend="xla",
                          softening="plummer", eps=1e-2, g=1.0,
                          theta=0.5, tree_refresh_every=4)
    vel = jnp.zeros_like(pos)
    state = sim.prime(make_state(pos, vel, mass, dtype=jnp.float64))
    e0 = float(energy.total_energy(state.pos, state.vel, state.mass,
                                   eps=1e-2, g=1.0))
    state = sim.run(state, 1e-3, 12)
    e1 = float(energy.total_energy(state.pos, state.vel, state.mass,
                                   eps=1e-2, g=1.0))
    assert abs((e1 - e0) / e0) < 1e-5


def test_superfar_refine_pallas_matches_xla(monkeypatch):
    """The pallas refine kernel must agree with the XLA fallback when the
    strips span MULTIPLE tiles (s_blocks > 1). Regression for the
    far_levels=3 energy blowup (r3_bisect): `_kernel_quad`'s output
    zero-init keyed on program_id(1), but the refine grid is 3D
    (g2, SUPER, s_blocks) with the accumulation axis at dim 2 — in-super
    clusters i>0 accumulated into uninitialized blocks and i==0 was
    re-zeroed every strip tile. Production far3 paths always tile
    (K2*SUPER > 512); earlier tests never did."""
    monkeypatch.setattr(tree, "SUPER", 8)
    rng = np.random.default_rng(21)
    g2, block = 2, 8
    gg, leaf = g2 * 8, block - 1
    s_pad = 2 * tree._SUPERFAR_TILE_J  # 2 strip tiles per super
    pos_g = jnp.asarray(rng.normal(size=(gg, leaf, 3)), jnp.float32)
    strips = np.zeros((16, g2 * s_pad), np.float32)
    live = s_pad // 2  # half the columns live, half null (exact no-ops)
    for a2 in range(g2):
        lo = a2 * s_pad
        strips[0:3, lo:lo + live] = rng.normal(size=(3, live)) * 4.0
        strips[3, lo:lo + live] = rng.uniform(0.5, 1.5, size=live)
        strips[4:10, lo:lo + live] = rng.normal(size=(6, live)) * 0.1
    strips = jnp.asarray(strips)
    a_pl = np.asarray(tree._superfar_refine_pallas(
        tree._pack_targets(pos_g), strips, eps=0.05, interpret=True,
        block=block))
    a_xla = np.asarray(tree._superfar_refine_xla(pos_g, strips, eps=0.05))
    np.testing.assert_allclose(a_pl, a_xla, rtol=2e-5, atol=2e-5)


def test_super_screen_cap_measured_vs_truncated():
    """The supercluster screen must never silently truncate: a too-small
    k_super under-covers the refinement pool (so near lists drop TRUE near
    clusters — seen as all-62-supers-near at N=1M uniform vs the geometric
    default of 28). measure_near's k_super covers the scene exactly;
    a forced k_super=1 is counted by the overflow telemetry."""
    stats = _prep_stats(40_000, seed=6, clustered=True)
    theta = 0.5
    com, m_tot = stats["com"], stats["m_tot"]
    r_src, r_tgt = stats["r_src"], stats["r_tgt"]
    _, over_tiny = tree._super_screen(com, m_tot, r_src, r_tgt, theta, 1)
    assert int(over_tiny) > 0

    # measured cap: zero overflow, and the hier near lists with it match
    # the dense build exactly
    g2 = -(-com.shape[0] // tree.SUPER)
    com2, spread, rs_max, rt_max = tree._super_stats(com, m_tot, r_src, r_tgt)
    d2m = np.linalg.norm(
        np.asarray(com2)[:, None] - np.asarray(com2)[None], axis=-1
    )
    acc2 = (np.asarray(rs_max)[None, :] + np.asarray(spread)[None, :]) >= (
        theta * (d2m - np.asarray(spread)[:, None]
                 - np.asarray(rt_max)[:, None])
    )
    k_meas = int(acc2.sum(1).max())
    _, over_meas = tree._super_screen(com, m_tot, r_src, r_tgt, theta, k_meas)
    assert int(over_meas) == 0


def test_far3_pairs_mid_hierarchy_accuracy():
    """The pairs-mode 3-level far field decomposes near supers through a
    MID level (tree.MID): mid multipoles (M1) plus cluster multipoles of
    near mids (M2) — per-body far cost K2*(SUPER/MID) + k_mid*MID instead
    of the strip refine's K2*SUPER (the measured N>=4M superlinearity).
    It must stay inside the theta error budget and close to the strip
    far3 / far2 results."""
    rng = np.random.default_rng(3)
    leaf, gg = 15, 256  # 4 supers at the production SUPER=64
    n = gg * leaf - 7
    pos = jnp.asarray(rng.standard_normal((n, 3)) * 2.0, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, n) / n, jnp.float32)
    kw = dict(theta=0.5, softening="plummer", eps=1e-2, g=1.0,
              backend="xla", multipole_order=2, leaf=leaf, gg=gg, k_near=64)
    a_strip = np.asarray(tree.acc_tree(pos, mass, far_levels=3,
                                       near_mode="strip", **kw))
    a_pairs = np.asarray(tree.acc_tree(pos, mass, far_levels=3,
                                       near_mode="pairs", **kw))
    exact = np.asarray(direct.acc_direct(pos, mass, softening="plummer",
                                         eps=1e-2, g=1.0))
    scale = np.linalg.norm(exact, axis=-1).mean()
    err = np.linalg.norm(a_pairs - exact, axis=-1) / scale
    err_strip = np.linalg.norm(a_strip - exact, axis=-1) / scale
    assert np.median(err) < 2e-3, np.median(err)
    # the mid decomposition may not exceed ~2x the strip refine's error
    assert np.median(err) < 2 * np.median(err_strip) + 1e-4, (
        np.median(err), np.median(err_strip))


def test_far3_pairs_mass_partition_exact():
    """Every cluster's monopole must appear EXACTLY ONCE across the three
    far passes (dense supers minus masked + M1 mids + M2 clusters): with
    point-like sources (quadrupoles vanish, huge separations) the far
    field equals the direct monopole sum, which catches double counts and
    holes exactly."""
    rng = np.random.default_rng(8)
    leaf, gg = 15, 256
    g2 = gg // tree.SUPER
    n = gg * leaf
    # supers placed far apart so everything is far-field; clusters inside
    # jittered so mids/clusters are distinct point masses
    centers = rng.standard_normal((g2, 3)) * 1e4
    pos = np.repeat(centers, n // g2, axis=0) + rng.standard_normal(
        (n, 3)) * 1e-3
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, n) / n, jnp.float32)
    kw = dict(theta=0.5, softening="plummer", eps=1e-2, g=1.0,
              backend="xla", multipole_order=2, leaf=leaf, gg=gg, k_near=64)
    a_pairs = np.asarray(tree.acc_tree(pos, mass, far_levels=3,
                                       near_mode="pairs", **kw))
    exact = np.asarray(direct.acc_direct(pos, mass, softening="plummer",
                                         eps=1e-2, g=1.0))
    scale = np.linalg.norm(exact, axis=-1).mean() + 1e-30
    err = np.linalg.norm(a_pairs - exact, axis=-1) / scale
    assert np.max(err) < 1e-2, np.max(err)


def test_far3_pairs_truncation_counted():
    """k_mid too small for the scene: the overflow telemetry counts it
    and forces stay finite (cut mids revert to their mid multipole in
    the M1 pass — never a hole)."""
    rng = np.random.default_rng(4)
    leaf, gg = 15, 256  # 4 supers
    n = gg * leaf - 5
    pos = jnp.asarray(rng.standard_normal((n, 3)) * 2.0, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
    prep = tree.tree_prep(pos, mass, theta=0.5, k_near=96, gg=gg,
                          far_levels=3, leaf=leaf, near_mode="pairs",
                          k_mid=16)
    assert int(prep["near_overflow"]) > 0
    acc = np.asarray(tree.tree_eval(
        prep, 0, gg, softening="plummer", eps=1e-2, g=1.0, backend="xla",
        interpret=True, multipole_order=2, far_levels=3, near_mode="pairs"))
    assert np.isfinite(acc).all()


def test_far3_pairs_cached_structure():
    """The M1/M2 tile lists ride STRUCTURE_KEYS: acc_tree_cached with a
    far3+pairs structure matches the fresh build exactly."""
    rng = np.random.default_rng(5)
    leaf, gg = 15, 128
    n = gg * leaf - 3
    pos = jnp.asarray(rng.standard_normal((n, 3)) * 2.0, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
    kw = dict(theta=0.5, k_near=64, gg=gg, far_levels=3, leaf=leaf,
              near_mode="pairs")
    st = tree.tree_structure(pos, mass, **kw)
    for key in ("m1_flat", "m1_tgt", "m1_src", "m1_ntiles",
                "m2_flat", "m2_tgt", "m2_src", "m2_ntiles"):
        assert key in st, key
    fresh = np.asarray(tree.acc_tree(
        pos, mass, softening="plummer", eps=1e-2, g=1.0, backend="xla",
        multipole_order=2, **kw))
    cached = np.asarray(tree.acc_tree_cached(
        pos, mass, st, softening="plummer", eps=1e-2, g=1.0, backend="xla",
        multipole_order=2, far_levels=3, near_mode="pairs"))
    np.testing.assert_array_equal(cached, fresh)


def test_measure_near_mid_caps_cover_scene():
    """measure_near's k_mid (the per-super UNION near-mid cap) and the
    measured M1/M2 strip-tile capacities hold the scene's actual demand:
    tree_prep with the measured caps reports zero overflow."""
    pos, mass = _cluster(40_000, seed=9, dtype=jnp.float32)
    gg = tree._gg_for(40_000, 3, 2)
    m = tree.measure_near(pos, mass, theta=0.5, gg=gg)
    assert "m1_src_tiles" in m and "m2_src_tiles" in m
    prep = tree.tree_prep(pos, mass, theta=0.5, k_near=m["k_near"], gg=gg,
                          far_levels=3, near_mode="pairs",
                          k_super=m["k_super"], k_mid=m["k_mid"],
                          m1_src_tiles=m["m1_src_tiles"],
                          m2_src_tiles=m["m2_src_tiles"])
    assert int(prep["near_overflow"]) == 0
    assert m["k_mid"] <= gg // tree.MID
    # the measured caps track the actual strip totals (headroom-scaled),
    # not the static worst case (G2 * ceil(K2*spm/pj) strips — what OOMs
    # the TPU compile at N=8M); at this toy scale just sanity-bound them
    g2 = gg // tree.SUPER
    worst1 = g2 * max(
        -(-(m["k_super"] * tree.SUPER // tree.MID) // tree.NEAR_QUAD_PJ), 1
    )
    assert g2 <= m["m1_src_tiles"] <= int(worst1 * 1.25) + 8


def test_shared_pair_segments_capped():
    """cap_src at the exact strip total reproduces the uncapped tiles;
    a smaller cap drops tail entries, counts them, and keeps every
    tile_src index inside the capped flat table."""
    rng = np.random.default_rng(11)
    g2, w, n_src = 3, 300, 96
    ids = rng.integers(0, n_src + 1, size=(g2, w)).astype(np.int32)
    ids_j = jnp.asarray(ids)
    f0, t0, s0, n0, d0 = tree.shared_pair_segments(ids_j, n_src)
    assert int(d0) == 0
    # exact-size cap: identical live tiles
    c = (ids < n_src).sum(axis=1)
    st = np.maximum(-(-c // tree.NEAR_QUAD_PJ), 1)
    exact = int(st.sum())
    f1, t1, s1, n1, d1 = tree.shared_pair_segments(ids_j, n_src,
                                                   cap_src=exact)
    assert int(d1) == 0 and int(n1) == int(n0)
    live = int(n1) * 1
    np.testing.assert_array_equal(np.asarray(t1)[:live],
                                  np.asarray(t0)[:live])
    np.testing.assert_array_equal(np.asarray(s1)[:live],
                                  np.asarray(s0)[:live])
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f0)[:exact * tree.NEAR_QUAD_PJ])
    # undersized cap: drops counted, tile_src stays in range
    cap = max(exact - st[-1], 1)
    f2, t2, s2, n2, d2 = tree.shared_pair_segments(ids_j, n_src,
                                                   cap_src=cap)
    assert int(d2) > 0
    live2 = np.asarray(t2) < g2 * tree.SUPER
    assert np.asarray(s2)[live2].max() < cap
    # every kept flat entry is a valid id; drops only shorten the table
    kept = np.asarray(f2)
    assert ((kept <= n_src)).all()


def test_near_lists_t0_alignment_gate(monkeypatch):
    """Public near_lists may engage the hierarchical build only when BOTH
    ends of the target slice are SUPER-aligned: it slices supercluster
    rows at t0//SUPER, so an unaligned t0 would build near lists against
    the wrong candidate pool (silently wrong forces). Unaligned slices
    must take the exact flat build and still match ground truth."""
    stats = _prep_stats(40_000, seed=5, clustered=True)
    theta = 0.5
    com = np.asarray(stats["com"])
    gg = com.shape[0]
    assert gg >= 2 * tree.SUPER
    # force the gate decision to be live for this small G
    monkeypatch.setattr(tree, "HIER_NEAR_CUTOFF", 8)
    dist = np.linalg.norm(com[:, None] - com[None], axis=-1)
    accept = (
        (np.asarray(stats["r_src"])[None, :]
         >= theta * (dist - np.asarray(stats["r_tgt"])[:, None]))
        & (np.asarray(stats["m_tot"])[None, :] > 0)
    )
    for t0 in (tree.SUPER // 2, tree.SUPER):  # unaligned, aligned
        n_t = tree.SUPER
        k = int(accept[t0:t0 + n_t].sum(1).max())
        idx, over = tree.near_lists(
            stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
            theta, k, t0=t0, n_t=n_t,
        )
        assert int(over) == 0
        idx = np.asarray(idx)
        for i in range(n_t):
            want = set(np.nonzero(accept[t0 + i])[0])
            got = set(int(j) for j in idx[i] if j < gg)
            assert got == want, f"t0={t0} target {t0 + i}"


def test_pairs_accum_mxu_matches_vpu(monkeypatch):
    """The hybrid (MXU-accumulation) near-pair kernel computes the same
    weights from the same exact differences; only the summation is
    restructured (tile-centered rank-1 split), so forces must agree with
    the vpu kernel to accumulation roundoff."""
    monkeypatch.setattr(tree, "NEAR_PAIRS_CHUNK", 16)
    rng = np.random.default_rng(11)
    leaf, gg = 15, 16
    n = gg * leaf - 5
    pos = jnp.asarray(rng.standard_normal((n, 3)) * 2.0, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, n) / n, jnp.float32)
    # multipole_order=1: the hybrid kernel only replaces the DIRECT pair
    # pass, and the monopole config routes the NEGATIVE-mass pseudo slot
    # through it (the -M direct-minus-monopole trick) — the interesting
    # sign edge; order=2's separate quad subtraction is untouched code.
    kw = dict(theta=0.5, softening="plummer", eps=1e-2, g=1.0,
              backend="pallas", interpret=True, multipole_order=1,
              leaf=leaf, gg=gg, k_near=16, near_mode="pairs")
    a_vpu = np.asarray(tree.acc_tree(pos, mass, pairs_accum="vpu", **kw))
    a_mxu = np.asarray(tree.acc_tree(pos, mass, pairs_accum="mxu", **kw))
    scale = np.linalg.norm(a_vpu, axis=-1).mean()
    np.testing.assert_allclose(a_mxu, a_vpu, atol=2e-5 * scale)
