"""TPU-native Barnes-Hut: Morton-sorted clustered treecode.

The reference's Barnes-Hut (`/root/reference/space/src/sim/barnes_hut/`)
rebuilds a recursive octree every tick (tree.rs:111-174) and walks it per
body with an explicit stack (mod.rs:46-76) under a theta-opening criterion
(mod.rs:64-67). Pointer-chasing stack walks are hostile to the TPU's dense
vector model, so this module re-derives the same O(N * crit) physics as a
fully dense, statically-shaped three-phase algorithm:

1. **Sort**: Morton-order the bodies (`spacetpu.ops.morton`), partition the
   sorted order into leaf clusters of LEAF bodies. Clusters inherit the
   octree's role of spatial cells; COM/mass/radius per cluster are segment
   reductions (the analogue of tree.rs:176-188's aggregation).
2. **Far field**: every body interacts with every cluster's monopole
   (COM, total mass) — a dense (N x G) pass through the same tiled kernel
   as the direct solver. No opening tests on this path at all.
3. **Near correction**: for cluster pairs failing the theta criterion
   (r_src >= theta * (d - r_tgt), the group-wise analogue of mod.rs:64-67),
   replace the monopole by exact pairwise forces. Each source cluster is
   augmented with a pseudo-body at its COM carrying mass -M, so a single
   direct pass over the augmented cluster computes (direct - monopole) in
   one sweep, and simply *adding* it to the far-field result performs the
   replacement. Near lists are top-k nearest accepted clusters with a
   static cap; overflow degrades gracefully to monopole accuracy (never to
   unbounded error).

Massless bodies exert no force in any phase (zero-mass monopoles and zero
pair weights), matching the reference's exclusion of massless particles
from its tree (tree.rs:124-131).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spacetpu import constants
from spacetpu.ops import cluster as cluster_ops
from spacetpu.ops import direct, morton

#: default real bodies per leaf cluster; +1 slot for the -M pseudo-body
#: => 256-lane block. Smaller leaves cut the near-phase pair count roughly
#: in half per halving (near lists cover a fixed *cluster* neighborhood;
#: fewer bodies per cluster pair) at the price of more far-field columns —
#: the sweet spot is scene- and backend-dependent (see BENCH_NOTES); every
#: entry point below takes `leaf` (block = leaf + 1 must divide
#: NEAR_TILE_J, i.e. leaf in {31, 63, 127, 255, ...}).
LEAF = 255
BLOCK = LEAF + 1


def default_k_near(theta: float, n_groups: int) -> int:
    """Static near-list cap: clusters within d <= r*(1 + 1/theta) of each
    other are near. Hilbert-ordered clusters of a uniform cloud have radius
    ~1.7x the ideal sphere-packing radius (measured), so the geometric
    (1 + 1/theta)^3 estimate needs a ~2.5x factor to cover the measured
    near counts (overflowed clusters silently degrade to far-field
    accuracy, which dominated the force error before this was sized
    correctly)."""
    k = int(2.5 * (1.0 + 1.0 / theta) ** 3) + 16
    return max(2, min(n_groups, k))
    # (the pallas near path pads the list to a multiple of 8 null slots)


def _group_stats(pos_g, mass_g):
    """Per-cluster COM, total mass, and two radii. pos_g: (G, LEAF, 3).

    Pure-massless clusters (fixed_shell tracers) get the geometric centroid
    as their "COM" so near-list distances stay meaningful — without this,
    their COM collapses to the world origin and massless *targets* lose
    their near corrections entirely.

    r_src bounds only force-exerting (massive) bodies: it drives the
    source-side opening error. r_tgt bounds ALL bodies: any body, massless
    included, is a force target whose distance to a source can undershoot
    the COM distance by up to r_tgt.
    """
    m_tot = jnp.sum(mass_g, axis=1)  # (G,)
    com_mass = jnp.sum(pos_g * mass_g[..., None], axis=1) / jnp.maximum(
        m_tot, 1e-30
    )[..., None]
    centroid = jnp.mean(pos_g, axis=1)
    com = jnp.where(m_tot[..., None] > 0, com_mass, centroid)
    d = jnp.linalg.norm(pos_g - com[:, None, :], axis=-1)
    r_src = jnp.max(jnp.where(mass_g > 0, d, 0.0), axis=1)
    r_tgt = jnp.max(d, axis=1)
    return com, m_tot, r_src, r_tgt


def _smallest_k(masked, cand, k: int, null_id):
    """Indices of the k smallest entries per row of `masked` (jnp.inf =
    invalid -> null_id). Uses top_k for small k and a full row sort for
    large k: TPU top_k at k in the thousands (dense near lists measure
    k ~ G on Plummer scenes) faults the runtime, while a full sort is
    well-behaved and asymptotically no worse once k ~ columns."""
    if k <= 256:
        neg_d, j = jax.lax.top_k(-masked, k)
        idx = jnp.where(neg_d > -jnp.inf, jnp.take_along_axis(cand, j, 1),
                        null_id)
        return idx.astype(jnp.int32)
    d_sorted, c_sorted = jax.lax.sort_key_val(masked, cand, dimension=1)
    d_sorted = d_sorted[:, :k]
    idx = jnp.where(d_sorted < jnp.inf, c_sorted[:, :k], null_id)
    return idx.astype(jnp.int32)


def _near_lists(com, m_tot, r_src, r_tgt, theta: float, k_near: int,
                t0=None, n_t: int | None = None):
    """(G_t, K) indices of the nearest clusters failing the opening test.

    Invalid slots point to the null cluster (index G) whose bodies are all
    zero-mass. Sources with zero total mass are never near (their monopole
    and their direct forces are both exactly zero).

    t0/n_t (traced start, static count) restrict the TARGET rows to a
    slice — the sharded tree builds lists only for its own clusters
    (sources stay global). Default: all G targets.

    Dense O(G_t*G) build — exact, used for small G; `_near_lists_hier` is
    the O(G_t*K2*SUPER) two-level build for large G. Returns
    (idx, overflow) where overflow counts targets whose accepted set
    exceeded k_near (those targets silently degrade to far-field accuracy
    for the dropped clusters — the telemetry VERDICT r1 asked for)."""
    g = com.shape[0]
    com_t, r_tgt_t = com, r_tgt
    if t0 is not None:
        com_t = jax.lax.dynamic_slice_in_dim(com, t0, n_t, 0)
        r_tgt_t = jax.lax.dynamic_slice_in_dim(r_tgt, t0, n_t, 0)
    rel = com_t[:, None, :] - com[None, :, :]
    dist = jnp.linalg.norm(rel, axis=-1)  # (G_t, G) target x source
    near = r_src[None, :] >= theta * (dist - r_tgt_t[:, None])
    near = jnp.logical_and(near, m_tot[None, :] > 0)
    overflow = jnp.sum(jnp.sum(near, axis=1) > k_near)
    masked = jnp.where(near, dist, jnp.inf)
    cand = jnp.broadcast_to(jnp.arange(g, dtype=jnp.int32)[None, :],
                            masked.shape)
    return _smallest_k(masked, cand, k_near, g), overflow


#: clusters per supercluster in the two-level near-list build
SUPER = 64


def default_k_super(theta: float, n_super: int) -> int:
    """Static cap on near superclusters per target supercluster. A
    supercluster spans ~SUPER^(1/3) = 4x a cluster's linear size, so the
    near-neighborhood measured in superclusters shrinks accordingly; the
    2.5x slack matches default_k_near's measured Hilbert-cluster fudge."""
    k = int(2.5 * (1.0 + 1.0 / (2.0 * theta)) ** 3) + 8
    return max(4, min(n_super, k))


def _super_stats(com, m_tot, r_src, r_tgt, group: int = None):
    """Aggregate cluster summaries into bounds for `group`-cluster nodes
    (default SUPER; the 3-level pairs far field also uses MID).

    Returns (com2, c_spread, rs_max, rt_max) per node, where c_spread
    bounds member-COM distance from the node centroid."""
    if group is None:
        group = SUPER
    g = com.shape[0]
    g2 = -(-g // group)
    pad = g2 * group - g
    if pad:
        # padding members collapse onto the last real COM with zero radii
        com = jnp.concatenate([com, jnp.broadcast_to(com[-1], (pad, 3))])
        m_tot = jnp.concatenate([m_tot, jnp.zeros((pad,), m_tot.dtype)])
        r_src = jnp.concatenate([r_src, jnp.zeros((pad,), r_src.dtype)])
        r_tgt = jnp.concatenate([r_tgt, jnp.zeros((pad,), r_tgt.dtype)])
    com_g = com.reshape(g2, group, 3)
    com2 = jnp.mean(com_g, axis=1)
    c_spread = jnp.max(
        jnp.linalg.norm(com_g - com2[:, None, :], axis=-1), axis=1
    )
    rs_max = jnp.max(r_src.reshape(g2, group), axis=1)
    rt_max = jnp.max(r_tgt.reshape(g2, group), axis=1)
    return com2, c_spread, rs_max, rt_max


def _super_accept(com2, spread, rs_max, rt_max, theta: float):
    """(G2, G2) target x source conservative supercluster accept matrix
    (+ pair distances). The single source of truth shared by the runtime
    screen and measure_near's k_super sizing — a divergence between the
    two would silently re-introduce screen truncation."""
    d2 = jnp.linalg.norm(com2[:, None, :] - com2[None, :, :], axis=-1)
    possible = (rs_max[None, :] + spread[None, :]) >= theta * (
        d2 - spread[:, None] - rt_max[:, None]
    )
    return possible, d2


def _super_screen(com, m_tot, r_src, r_tgt, theta: float, k_super: int,
                  s0=None, n2: int | None = None):
    """Supercluster-level near lists: (G2_t, K2) super indices + overflow.
    s0/n2 (traced start, static count) restrict the TARGET super rows
    (sources stay global); default all G2.

    The acceptance test is conservative on BOTH levels it serves:
    - as a screen for the cluster near-list refinement (no false
      negatives): for target t in super A and source s in super B,
      d(t,s) >= D_AB - spread_A - spread_B, so accept whenever
      rs_max_B + spread_B >= theta * (D_AB - spread_A - rt_max_A)
      (a superset of the per-pair test since theta <= 1);
    - as the far-field refinement set (far_levels=3): the same condition
      with rs_max_B + spread_B read as the supercluster source radius is
      exactly the theta-opening test for B's super multipole, so every
      super whose multipole could violate theta for a body in A is
      refined to cluster multipoles."""
    g2 = -(-com.shape[0] // SUPER)
    com2, spread, rs_max, rt_max = _super_stats(com, m_tot, r_src, r_tgt)
    possible, d2 = _super_accept(com2, spread, rs_max, rt_max, theta)
    if s0 is not None:
        possible = jax.lax.dynamic_slice_in_dim(possible, s0, n2, 0)
        d2 = jax.lax.dynamic_slice_in_dim(d2, s0, n2, 0)
    over2 = jnp.sum(jnp.sum(possible, axis=1) > k_super)
    masked2 = jnp.where(possible, d2, jnp.inf)
    # _smallest_k switches from top_k to a full sort at large k: measured
    # k_super reaches the hundreds on dense scenes (adaptive leaf<=127
    # measures k_super ~ G2), where TPU top_k is the runtime-fault suspect
    cand2 = jnp.broadcast_to(jnp.arange(g2, dtype=jnp.int32)[None, :],
                             masked2.shape)
    idx2 = _smallest_k(masked2, cand2, min(k_super, g2), g2)  # (G2_t, K2)
    return idx2, over2


def _near_lists_hier(com, m_tot, r_src, r_tgt, theta: float, k_near: int,
                     k_super: int | None = None, idx2=None,
                     t0=None, n_t: int | None = None):
    """Two-level near-list build: O(G2^2) supercluster screen + exact
    refinement over K2*SUPER candidates per target — replaces the (G, G)
    distance matrix (986 MB at N=4M) with O(G * K2 * SUPER) work.

    idx2: optionally a precomputed supercluster near list (the 3-level far
    field shares it so its refinement set provably contains every near
    cluster). t0/n_t (traced start, static count; t0 SUPER-aligned)
    restrict the TARGET clusters to a slice, the sharded tree's local
    block — idx2, when given alongside, must already be the matching
    target-super rows (n_t/SUPER, K2). Returns (idx, overflow) like
    _near_lists; overflow also counts supercluster-level truncations
    (scaled by SUPER so one unit ~ one potentially-lost cluster)."""
    g = com.shape[0]
    g2 = -(-g // SUPER)
    if k_super is None:
        k_super = default_k_super(theta, g2)
    full_range = t0 is None
    if full_range:
        t0, n_t = 0, g2 * SUPER
    elif n_t % SUPER:
        raise ValueError(f"target slice n_t={n_t} not SUPER-aligned")
    n2 = n_t // SUPER
    s0 = t0 // SUPER
    over2 = jnp.zeros((), jnp.int32)
    if idx2 is None:
        idx2, over2 = _super_screen(com, m_tot, r_src, r_tgt, theta,
                                    k_super, s0=s0, n2=n2)

    # Candidate cluster ids per target supercluster: members of its K2
    # near superclusters; invalid supers map to the null cluster id G.
    members = idx2[:, :, None] * SUPER + jnp.arange(SUPER)[None, None, :]
    cand = jnp.minimum(members.reshape(n2, -1), g)  # (n2, K2*SUPER)

    # Pad cluster summaries with the null row (far-away is unnecessary:
    # zero mass already excludes it from the near test).
    com_p = jnp.concatenate([com, jnp.zeros((1, 3), com.dtype)])
    m_p = jnp.concatenate([m_tot, jnp.zeros((1,), m_tot.dtype)])
    rs_p = jnp.concatenate([r_src, jnp.zeros((1,), r_src.dtype)])

    def refine(args):
        """Exact near test for one supercluster's member targets."""
        com_t, r_tgt_t, cand_b = args  # (SUPER,3), (SUPER,), (K2*SUPER,)
        c_com = com_p[cand_b]  # (C, 3)
        c_m = m_p[cand_b]
        c_rs = rs_p[cand_b]
        dist = jnp.linalg.norm(
            com_t[:, None, :] - c_com[None, :, :], axis=-1
        )  # (SUPER, C)
        near = (c_rs[None, :] >= theta * (dist - r_tgt_t[:, None])) & (
            c_m[None, :] > 0
        )
        over = jnp.sum(jnp.sum(near, axis=1) > k_near)
        masked = jnp.where(near, dist, jnp.inf)
        # k_near can exceed the candidate-pool size (dense scenes at small
        # leaf measure k_near ~ G while the pool is K2*SUPER): the true
        # near set is still inside the pool, so take the whole pool and
        # pad the list with null ids up to k_near.
        k_eff = min(k_near, masked.shape[1])
        cand_rows = jnp.broadcast_to(cand_b[None, :].astype(jnp.int32),
                                     masked.shape)
        idx = _smallest_k(masked, cand_rows, k_eff, g)
        if k_eff < k_near:
            idx = jnp.concatenate(
                [idx, jnp.full((idx.shape[0], k_near - k_eff), g, idx.dtype)],
                axis=1,
            )
        return idx.astype(jnp.int32), over

    pad = g2 * SUPER - g
    com_p, rt_p = com, r_tgt
    if pad:
        com_p = jnp.concatenate([com, jnp.broadcast_to(com[-1], (pad, 3))])
        rt_p = jnp.concatenate([r_tgt, jnp.zeros((pad,), r_tgt.dtype)])
    com_t = jax.lax.dynamic_slice_in_dim(com_p, t0, n_t, 0).reshape(
        n2, SUPER, 3
    )
    rt_t = jax.lax.dynamic_slice_in_dim(rt_p, t0, n_t, 0).reshape(n2, SUPER)
    idx, over = jax.lax.map(refine, (com_t, rt_t, cand))
    idx = idx.reshape(n_t, k_near)
    if full_range:
        idx = idx[:g]
    return idx, jnp.sum(over) + over2 * SUPER


#: use the hierarchical near-list build above this many clusters (the
#: dense (G, G) matrix at the cutoff is 16 MB — negligible below it)
HIER_NEAR_CUTOFF = 2048


def measure_near(pos, mass, *, theta: float, gg: int, leaf: int = LEAF,
                 cluster_mode: str = "equal", headroom: float = 1.25,
                 chunk: int = 2048, n_shards: int | None = None,
                 measure_mid: bool = True) -> dict:
    """Measure the scene's near-list shape for static sizing (host-side,
    prime-time): per-cluster near counts -> the k_near cap, the pair-mode
    tile capacities, and the actual adaptive cluster count.

    Equal-count Hilbert clusters give huge radii in sparse regions of
    high-density-contrast scenes (e.g. a Plummer sphere), where the
    geometric default_k_near underestimates badly: measured on
    plummer_sphere(30k) at theta=0.5 the default cap of 83 left every
    cluster overflowed and cost median force error 2.8e-2; the measured
    cap recovers 1e-14. Runs chunked on device — O(chunk * G) memory.

    Returns dict(k_near, near_tiles, near_tiles_q, n_clusters): all
    headroom-scaled; near_tiles are capacities for tree_prep's
    near_mode="pairs" lists (pj = NEAR_TILE_J/block and NEAR_QUAD_PJ).
    With n_shards (the sharded tree: gg split into n_shards contiguous
    per-device blocks) also near_tiles_shard / near_tiles_q_shard — the
    worst single shard's tile totals, the static caps every device must
    use under SPMD."""
    _, _, clusters, stats = _build_clustering(pos, mass, gg, leaf,
                                              cluster_mode)
    com, m_tot = stats["com"], stats["m_tot"]
    r_src, r_tgt = stats["r_src"], stats["r_tgt"]

    def count_chunk(c0):
        com_t = jax.lax.dynamic_slice_in_dim(com, c0, chunk_n, 0)
        rt_t = jax.lax.dynamic_slice_in_dim(r_tgt, c0, chunk_n, 0)
        dist = jnp.linalg.norm(com_t[:, None, :] - com[None, :, :], axis=-1)
        near = (r_src[None, :] >= theta * (dist - rt_t[:, None])) & (
            m_tot[None, :] > 0
        )
        return jnp.sum(near, axis=1)

    chunk_n = min(chunk, gg)
    starts = jnp.arange(0, gg, chunk_n)  # tail chunk re-reads rows; harmless
    starts = jnp.minimum(starts, gg - chunk_n)
    counts = jax.lax.map(count_chunk, starts).reshape(-1)
    # drop tail re-reads: rebuild the exact per-cluster counts
    import numpy as _np

    counts = _np.asarray(counts)
    rows = _np.concatenate(
        [_np.arange(int(c0), int(c0) + chunk_n) for c0 in _np.asarray(starts)]
    )
    exact = _np.zeros(gg, _np.int64)
    exact[rows] = counts
    k = int(int(exact.max()) * headroom) + 8
    k = max(8, min(gg, -(-k // 8) * 8))
    pj = NEAR_TILE_J // (leaf + 1)
    tiles_i = _np.maximum(-(-exact // pj), 1)
    tiles_q_i = _np.maximum(-(-exact // NEAR_QUAD_PJ), 1)
    out = dict(
        k_near=k,
        near_tiles=int(tiles_i.sum() * headroom) + 8,
        near_tiles_q=int(tiles_q_i.sum() * headroom) + 8,
        n_clusters=int(clusters.n_clusters),
    )
    # Supercluster-screen cap. The geometric default_k_super silently
    # truncates once G2 outgrows it (uniform ball at N=1M: all 62 supers
    # mutually near vs the default 28) — and a truncated screen UNDER-
    # covers the refinement pool, so near lists drop true near clusters.
    # Measure the conservative accept counts exactly (G2 x G2 is small).
    g2 = -(-gg // SUPER)
    com2, spread, rs_max, rt_max = _super_stats(com, m_tot, r_src, r_tgt)
    possible, _ = _super_accept(com2, spread, rs_max, rt_max, theta)
    cnt2_rows = _np.asarray(jnp.sum(possible, axis=1))
    cnt2 = int(cnt2_rows.max())
    out["k_super"] = max(4, min(g2, int(cnt2 * headroom) + 4))
    # MID-level cap for the pairs-mode 3-level far field: the per-SUPER
    # UNION near-MID count (dense over all mids — a superset of the
    # runtime near-super-restricted pool, so the cap is conservative).
    # measure_mid=False skips this block (it builds the actual mid/M1/M2
    # lists — the most expensive part of calibration) for callers that
    # will never consume the caps: strip-mode or far_levels<3 sims, and
    # exploratory passes whose result may be discarded.
    if measure_mid and gg % SUPER == 0:
        g_m = gg // MID
        g2s = gg // SUPER
        com_m, spread_m, rs_max_m, _ = _super_stats(
            com, m_tot, r_src, r_tgt, group=MID
        )
        reach_m = rs_max_m + spread_m
        m_tot_m = jnp.sum(jnp.reshape(m_tot, (-1, MID)), axis=1)
        com_s = jnp.reshape(com, (g2s, SUPER, 3))
        rt_s = jnp.reshape(r_tgt, (g2s, SUPER))

        def count_umid(a):
            dist = jnp.linalg.norm(
                com_s[a][:, None, :] - com_m[None, :, :], axis=-1
            )  # (SUPER, G_m)
            margin = jnp.min(dist - rt_s[a][:, None], axis=0)
            near = (reach_m >= theta * margin) & (m_tot_m > 0)
            return jnp.sum(near)

        cu = _np.asarray(
            jax.lax.map(count_umid, jnp.arange(g2s, dtype=jnp.int32))
        )
        out["k_mid"] = max(
            16, min(g_m, int(int(cu.max()) * headroom) + 8)
        )
        # Measured M1/M2 shared-strip SOURCE-tile capacities. The static
        # worst case is G2 * ceil(K2*spm / pj) strips; with the measured
        # k_super ~ G2 (genuine for uniform scenes at theta=0.5 until G2
        # reaches the thousands) that is ~3.6M pair tiles at N=8M
        # adaptive, whose TPU buffers (the 16-float summary rows get
        # lane-padded 8x by the (8,128) tiling) reach 29 GB and OOM the
        # compile. Build the actual lists once here and size to their
        # strip totals instead.
        idx2_m, _ = _super_screen(com, m_tot, r_src, r_tgt, theta,
                                 out["k_super"])
        idx_mid2_m, _ = _mid_near_lists(
            com, m_tot, r_src, r_tgt, com_m, spread_m, rs_max_m, m_tot_m,
            idx2_m, theta, out["k_mid"],
        )
        m1_ids = _m1_lists(idx2_m, idx_mid2_m, gg)
        c1 = _np.asarray(jnp.sum(m1_ids < g_m, axis=1))
        st1 = _np.maximum(-(-c1 // NEAR_QUAD_PJ), 1)
        out["m1_src_tiles"] = int(st1.sum() * headroom) + 8
        c2 = _np.asarray(jnp.sum(idx_mid2_m < g_m, axis=1)) * MID
        st2 = _np.maximum(-(-c2 // NEAR_QUAD_PJ), 1)
        out["m2_src_tiles"] = int(st2.sum() * headroom) + 8
    if n_shards:
        if gg % n_shards:
            raise ValueError(f"gg={gg} not divisible by n_shards={n_shards}")
        out["near_tiles_shard"] = (
            int(tiles_i.reshape(n_shards, -1).sum(1).max() * headroom) + 8
        )
        out["near_tiles_q_shard"] = (
            int(tiles_q_i.reshape(n_shards, -1).sum(1).max() * headroom) + 8
        )
        if "m1_src_tiles" in out and (gg // SUPER) % n_shards == 0:
            # worst single shard's M1/M2 strip totals — the static caps
            # every device must use under SPMD (sharded MID far field)
            out["m1_src_tiles_shard"] = (
                int(st1.reshape(n_shards, -1).sum(1).max() * headroom) + 8
            )
            out["m2_src_tiles_shard"] = (
                int(st2.reshape(n_shards, -1).sum(1).max() * headroom) + 8
            )
    return out


def measure_k_near(pos, mass, *, theta: float, gg: int, headroom: float = 1.25,
                   chunk: int = 2048) -> int:
    """Back-compat wrapper: the measured k_near cap only."""
    return measure_near(
        pos, mass, theta=theta, gg=gg, headroom=headroom, chunk=chunk
    )["k_near"]


def near_lists(com, m_tot, r_src, r_tgt, theta: float, k_near: int,
               k_super: int | None = None, t0=None, n_t: int | None = None):
    """(G_t, K) near-cluster lists + on-device overflow count. t0/n_t
    restrict the target rows (see _near_lists); the hierarchical build
    engages only for SUPER-aligned slices."""
    k_near = min(k_near, com.shape[0])
    if t0 is None:
        aligned = True
    else:
        # the hierarchical build slices supercluster rows at t0//SUPER, so
        # BOTH ends of the target slice must be SUPER-aligned; a traced t0
        # cannot be validated here, so it takes the exact flat build
        # (aligned traced callers use _near_lists_hier directly, tree2.py)
        try:
            aligned = (int(t0) % SUPER == 0) and (n_t % SUPER == 0)
        except (TypeError, jax.errors.ConcretizationTypeError):
            aligned = False
    if com.shape[0] > HIER_NEAR_CUTOFF and aligned:
        return _near_lists_hier(com, m_tot, r_src, r_tgt, theta, k_near,
                                k_super=k_super, t0=t0, n_t=n_t)
    return _near_lists(com, m_tot, r_src, r_tgt, theta, k_near,
                       t0=t0, n_t=n_t)


def _pack_augmented(pos_g, mass_g, com, m_tot, g_const, *,
                    monopole_pseudo: bool = True):
    """Source operand (8, (G+1)*block): per cluster `leaf` bodies followed
    by a pseudo-body slot at the COM carrying -M (so a direct pass computes
    direct-minus-monopole in one sweep), plus a trailing all-zero null
    cluster. With monopole_pseudo=False the pseudo slot is massless (the
    quadrupole path subtracts the full multipole in a separate eval).
    block = pos_g.shape[1] + 1."""
    gg, leaf = pos_g.shape[:2]
    block = leaf + 1
    dtype = pos_g.dtype
    aug_pos = jnp.concatenate([pos_g, com[:, None, :]], axis=1)  # (G, block, 3)
    pseudo_gm = (-m_tot[:, None] * g_const if monopole_pseudo
                 else jnp.zeros((gg, 1), dtype))
    aug_gm = jnp.concatenate([mass_g * g_const, pseudo_gm], axis=1)
    rows = jnp.zeros((8, (gg + 1) * block), dtype)
    rows = rows.at[:3, : gg * block].set(
        aug_pos.reshape(gg * block, 3).T
    )
    rows = rows.at[3, : gg * block].set(aug_gm.reshape(gg * block))
    return rows


def _cluster_summaries(pos_g, mass_g, com, m_tot, g_const):
    """(16, G+1) multipole summaries: COM, g*M and the traceless g*Q
    quadrupole per cluster (rows per pallas_direct._kernel_quad), plus a
    null column."""
    gg = pos_g.shape[0]
    dtype = pos_g.dtype
    x = pos_g - com[:, None, :]  # (G, LEAF, 3) COM-centred
    m = mass_g  # (G, LEAF)
    r2 = jnp.sum(x * x, axis=-1)
    qxx = jnp.sum(m * (3 * x[..., 0] * x[..., 0] - r2), axis=1)
    qyy = jnp.sum(m * (3 * x[..., 1] * x[..., 1] - r2), axis=1)
    qzz = jnp.sum(m * (3 * x[..., 2] * x[..., 2] - r2), axis=1)
    qxy = jnp.sum(m * 3 * x[..., 0] * x[..., 1], axis=1)
    qxz = jnp.sum(m * 3 * x[..., 0] * x[..., 2], axis=1)
    qyz = jnp.sum(m * 3 * x[..., 1] * x[..., 2], axis=1)
    s = jnp.zeros((16, gg + 1), dtype)
    s = s.at[:3, :gg].set(com.T)
    s = s.at[3, :gg].set(g_const * m_tot)
    for row, q in zip(range(4, 10), (qxx, qyy, qzz, qxy, qxz, qyz)):
        s = s.at[row, :gg].set(g_const * q)
    return s


def _super_multipoles(summaries, group: int = None):
    """Aggregate cluster multipole summaries (16, G) into `group`-cluster
    node summaries (16, G/group) about the mass-weighted node COM
    (default SUPER; the 3-level pairs far field also aggregates MID
    nodes), using the parallel-axis theorem for the traceless quadrupole:
        Q2 = sum_i [Q_i + m_i * (3 d_i d_i^T - |d_i|^2 I)],
    d_i = com_i - com2. G must be a multiple of `group` (callers pad with
    null clusters)."""
    if group is None:
        group = SUPER
    g = summaries.shape[1]
    if g % group:
        raise ValueError(f"G={g} not a multiple of group={group}")
    g2 = g // group
    s = summaries.reshape(16, g2, group)
    com = s[0:3]  # (3, G2, SUPER)
    gm = s[3]     # (G2, SUPER)
    gm2 = jnp.sum(gm, axis=-1)  # (G2,)
    com2 = jnp.sum(com * gm[None], axis=-1) / jnp.maximum(gm2, 1e-30)[None]
    d = com - com2[:, :, None]  # (3, G2, SUPER)
    d2 = jnp.sum(d * d, axis=0)
    out = jnp.zeros((16, g2), summaries.dtype)
    out = out.at[0:3].set(com2)
    out = out.at[3].set(gm2)
    # rows 4-9: xx yy zz xy xz yz
    for row, (a, b) in zip(range(4, 7), ((0, 0), (1, 1), (2, 2))):
        out = out.at[row].set(jnp.sum(
            s[row] + gm * (3 * d[a] * d[b] - d2), axis=-1))
    for row, (a, b) in zip(range(7, 10), ((0, 1), (0, 2), (1, 2))):
        out = out.at[row].set(jnp.sum(s[row] + gm * 3 * d[a] * d[b], axis=-1))
    return out


def _superfar_refine_table(summaries, super_summaries, idx2):
    """Gathered per-supercluster refinement strips for the 3-level far
    field: for target super A, columns = the cluster summaries of A's K2
    near supers. Together with `_superfar_dense_masked` (which EXCLUDES
    those supers from the dense pass) this replaces near supers by their
    member clusters without ever summing a near super's own multipole.

    The original scheme instead appended the near supers' NEGATED super
    summaries here and ran the dense pass over ALL supers — relying on
    f32 cancellation of the two copies. On heavy-tail scenes a sparse
    super's COM can land next to dense-core bodies with |Q|/d^4 ~ 1e10,
    and the cancellation residue destroyed the force field (measured
    plummer 1M: median relative force error 5e3 vs far2's 4e-5).

    Returns (16, G2 * S_pad) with S_pad = K2 * SUPER rounded up to a
    multiple of the strip tile (zero columns are exact no-ops in the quad
    kernel)."""
    g = summaries.shape[1]
    g2, k2 = idx2.shape
    table = jnp.concatenate(
        [summaries, jnp.zeros((16, 1), summaries.dtype)], axis=1
    )
    null_cluster = g
    cols = jnp.minimum(
        idx2[:, :, None] * SUPER + jnp.arange(SUPER)[None, None, :],
        null_cluster,
    ).reshape(g2, k2 * SUPER)
    del super_summaries  # near supers are MASKED out of the dense pass
    # (not cancelled here) — see _superfar_dense_masked
    s = cols.shape[1]
    # pad to the pallas strip tile (the quad kernel's live temporaries are
    # (BLOCK, tile) sized — wider tiles blow the 16 MB scoped-VMEM limit)
    s_pad = -(-s // _SUPERFAR_TILE_J) * _SUPERFAR_TILE_J
    if s_pad != s:
        cols = jnp.concatenate(
            [cols, jnp.full((g2, s_pad - s), null_cluster, cols.dtype)],
            axis=1,
        )
    return jnp.take(table, cols.reshape(-1), axis=1).reshape(16, g2 * s_pad)


#: lane width of the superfar refinement strip tiles (the quad kernel
#: holds ~9 (BLOCK, tile) temporaries live; 512 keeps that ~4.7 MB)
_SUPERFAR_TILE_J = 512


def _superfar_dense_masked(targets, super_summaries, idx2_t, *, eps,
                           backend, interpret):
    """Dense supercluster far field with each target super's near supers
    masked out (gm and Q zeroed per target super — exact no-ops in the
    quad kernel). Their contribution comes solely from the refinement
    strips, so no giant near-super multipole term is ever summed and then
    cancelled in f32 (see _superfar_refine_table).

    targets: (n2 * SUPER * leaf, 3) slot-order bodies of the n2 target
    supers; idx2_t: (n2, K2) near-super ids (null = G2). Evaluates one
    target super per lax.map step against its own masked summary table
    (tables are (n2, 16, G2) — 60 MB at the 16M-body scale)."""
    from spacetpu.ops import pallas_direct

    n2, _ = idx2_t.shape
    g2 = super_summaries.shape[1]
    rows = targets.shape[0] // n2
    hit = jnp.zeros((n2, g2 + 1), super_summaries.dtype)
    hit = hit.at[
        jnp.arange(n2)[:, None], jnp.minimum(idx2_t, g2)
    ].set(1.0)
    keep = 1.0 - hit[:, :g2]  # (n2, G2)
    tbl = jnp.concatenate([
        jnp.broadcast_to(super_summaries[None, :3], (n2, 3, g2)),
        super_summaries[None, 3:10] * keep[:, None, :],
        jnp.broadcast_to(super_summaries[None, 10:], (n2, 6, g2)),
    ], axis=1)

    # The map carries its stacked input/output as flat (n2, rows*3): a
    # 3D (n2, rows, 3) carry gets the row-major (8, 128) tiled layout,
    # whose 3-wide minor dim pads 42.7x — at 8M/adaptive (n2=964,
    # rows=16320) that was TWO 7.5 GB HLO temps and a compile OOM
    # (logs/r3_tlayout2.log); flat rows tile with negligible padding.
    def one(args):
        tgt, t = args
        tgt = tgt.reshape(rows, 3)
        if backend == "pallas":
            acc = pallas_direct.acc_cross_quad(
                tgt, t, eps=eps, interpret=interpret
            )
        else:
            acc = pallas_direct.acc_cross_quad_xla(tgt, t, eps=eps)
        return acc.reshape(rows * 3)

    out = jax.lax.map(one, (targets.reshape(n2, rows * 3), tbl))
    return out.reshape(n2 * rows, 3)


def _superfar_refine_pallas(tcols, strips, *, eps, interpret,
                            block: int = BLOCK):
    """Evaluate the per-super refinement strips against their own target
    clusters. tcols: (G*block, 8) packed targets with G a multiple of
    SUPER; strips: (16, G2*S_pad). -> (G*leaf, 3).

    Grid is (supers, clusters-in-super, strip tiles) so every index map is
    affine in the grid coordinates."""
    from spacetpu.ops.pallas_direct import _kernel_quad

    leaf = block - 1
    gg = tcols.shape[0] // block
    g2 = gg // SUPER
    s_pad = strips.shape[1] // g2
    s_blocks = s_pad // _SUPERFAR_TILE_J
    out = pl.pallas_call(
        # init_pid=2: the accumulation dim of THIS grid is the strip-tile
        # axis j, not dim 1 as in the 2D grids. With the default init_pid=1
        # every cluster with in-super index i>0 accumulated into an
        # uninitialized output block (and i==0 was re-zeroed per tile) —
        # the far_levels=3 energy blowup / TPU kernel faults of r3_bisect.
        functools.partial(_kernel_quad, eps=float(eps), init_pid=2),
        grid=(g2, SUPER, s_blocks),
        in_specs=[
            pl.BlockSpec((block, 8), lambda a2, i, j: (a2 * SUPER + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (16, _SUPERFAR_TILE_J),
                lambda a2, i, j, s_blocks=s_blocks: (0, a2 * s_blocks + j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((block, 8), lambda a2, i, j: (a2 * SUPER + i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gg * block, 8), tcols.dtype),
        interpret=interpret,
    )(tcols, strips)
    return out.reshape(gg, block, 8)[:, :leaf, :3].reshape(gg * leaf, 3)


def _superfar_refine_xla(pos_g, strips, *, eps):
    """XLA fallback: per-super strip evaluation via lax.map."""
    from spacetpu.ops.pallas_direct import acc_cross_quad_xla

    gg, leaf = pos_g.shape[:2]
    g2 = gg // SUPER
    s_pad = strips.shape[1] // g2
    strips = strips.reshape(16, g2, s_pad)
    targets = pos_g.reshape(g2, SUPER * leaf, 3)

    def one_super(args):
        tgt, strip = args
        return acc_cross_quad_xla(tgt, strip, eps=eps)

    out = jax.lax.map(one_super, (targets, strips.transpose(1, 0, 2)))
    return out.reshape(gg * leaf, 3)


def _pack_targets(pos_g):
    """Target operand (G*block, 8): leaf bodies + one dummy row per cluster
    (keeps target blocks congruent with source blocks)."""
    gg, leaf = pos_g.shape[:2]
    block = leaf + 1
    dtype = pos_g.dtype
    tg = jnp.zeros((gg, block, 8), dtype)
    tg = tg.at[:, :leaf, :3].set(pos_g)
    return tg.reshape(gg * block, 8)


def _pack_targets_t(pos_g):
    """TRANSPOSED target operand (8, G*block) — the pair-tile path's
    layout. An (N, 8) f32 pallas operand is materialized in the (8, 128)
    tiled layout, padding the 8-lane minor dim 16x (measured: the
    (15.8M, 8) targets + aliased accumulator at fixed_cloud(8M)/adaptive
    cost 7.53 GB EACH and OOM'd the chip at compile); rows-major (8, N)
    pads only the last partial lane tile. The kernels transpose the
    (8, block) tile in VMEM (2k elements against a ~500k-FLOP tile)."""
    gg, leaf = pos_g.shape[:2]
    block = leaf + 1
    dtype = pos_g.dtype
    tg = jnp.zeros((gg, block, 8), dtype)
    tg = tg.at[:, :leaf, :3].set(pos_g)
    return tg.reshape(gg * block, 8).T


#: lane width of the near-correction source tiles; K*BLOCK is padded to a
#: multiple of this so each target cluster's gathered sources tile evenly.
NEAR_TILE_J = 2048


#: HBM budget for one gathered source strip (bytes). The strip for a chunk
#: of C target clusters is C * K * BLOCK * 32 B — XLA holds the gather AND
#: its masked copy live at once, so the peak is ~2x this budget. Measured
#: k_near caps can be large (fixed_cloud(1M) theta=0.5: K=496; Plummer
#: equal-clusters: near-dense), so the chunk size must scale with 1/K —
#: a fixed cluster count OOMed at exactly those caps.
NEAR_STRIP_BYTES = 1 << 31


def _near_correction_pallas(tcols, srows, idx, *, softening, eps, interpret,
                            block: int = BLOCK):
    """Chunked wrapper: see _near_correction_chunk."""
    gg_t = tcols.shape[0] // block
    k_near = max(idx.shape[1], 1)
    chunk = max(NEAR_STRIP_BYTES // (k_near * block * 32), 1)
    if gg_t <= chunk:
        return _near_correction_chunk(
            tcols, srows, idx, softening=softening, eps=eps,
            interpret=interpret, block=block,
        )
    outs = []
    for c0 in range(0, gg_t, chunk):
        c1 = min(c0 + chunk, gg_t)
        outs.append(
            _near_correction_chunk(
                tcols[c0 * block : c1 * block], srows, idx[c0:c1],
                softening=softening, eps=eps, interpret=interpret,
                block=block,
            )
        )
    return jnp.concatenate(outs, axis=0)


@functools.partial(
    jax.jit, static_argnames=("softening", "eps", "interpret", "block")
)
def _near_correction_chunk(tcols, srows, idx, *, softening, eps, interpret,
                           block: int = BLOCK):
    """Near-field correction with wide tiles.

    The naive formulation — one (256-target, 256-source) block per
    (cluster, near-slot) grid step — leaves the VPU underutilized (measured
    2.3x off the all-pairs kernel's pair rate at N=1M). Instead, gather
    every cluster's K near-clusters into one contiguous source strip with a
    single XLA gather (sequential HBM traffic, a few ms), then sweep it
    with the all-pairs kernel itself (`pallas_direct._kernel` — identical
    interaction math, sources here merely embed their -M monopoles) at wide
    (BLOCK x NEAR_TILE_J) tiles. idx: (G, K) with invalid slots pointing at
    the all-zero null cluster.
    """
    from spacetpu.ops.pallas_direct import _kernel as _near_kernel
    gg = tcols.shape[0] // block
    k_near = idx.shape[1]
    strip = k_near * block  # source columns per target cluster
    if strip % NEAR_TILE_J != 0:
        raise ValueError(f"k_near*block={strip} not a multiple of {NEAR_TILE_J}")
    s_blocks = strip // NEAR_TILE_J

    # Gather whole clusters (contiguous (8, block) chunks) — a blocked
    # gather is orders faster than per-column gathers on TPU.
    n_src = srows.shape[1] // block
    gathered = jnp.take(
        srows.reshape(8, n_src, block), idx.astype(jnp.int32), axis=1
    )  # (8, G, K, block)
    gathered = gathered.reshape(8, gg * strip)

    out = pl.pallas_call(
        functools.partial(_near_kernel, softening=softening, eps=float(eps)),
        grid=(gg, s_blocks),
        in_specs=[
            pl.BlockSpec((block, 8), lambda a, j: (a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, NEAR_TILE_J),
                lambda a, j, s_blocks=s_blocks: (0, a * s_blocks + j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((block, 8), lambda a, j: (a, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gg * block, 8), tcols.dtype),
        interpret=interpret,
    )(tcols, gathered)
    return out.reshape(gg, block, 8)[:, : block - 1, :3]


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "block"))
def _near_multipole_sub_pallas(tcols, summaries_neg, idx, *, eps, interpret,
                               block: int = BLOCK):
    """Subtract the far-field multipole of each target cluster's K near
    clusters (their exact forces are added by the direct correction).
    summaries_neg: (16, G+1) with gm/gQ negated. Returns (G*leaf, 3)."""
    from spacetpu.ops.pallas_direct import _kernel_quad

    gg_t = tcols.shape[0] // block
    k = idx.shape[1]
    k_pad = ((k + 127) // 128) * 128
    if k_pad != k:
        null = summaries_neg.shape[1] - 1
        idx = jnp.concatenate(
            [idx, jnp.full((gg_t, k_pad - k), null, jnp.int32)], axis=1
        )
    gathered = jnp.take(summaries_neg, idx.reshape(-1), axis=1)
    gathered = gathered.reshape(16, gg_t * k_pad)

    out = pl.pallas_call(
        functools.partial(_kernel_quad, eps=float(eps)),
        grid=(gg_t, 1),
        in_specs=[
            pl.BlockSpec((block, 8), lambda a, j: (a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, k_pad), lambda a, j: (0, a),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 8), lambda a, j: (a, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gg_t * block, 8), tcols.dtype),
        interpret=interpret,
    )(tcols, gathered)
    leaf = block - 1
    return out.reshape(gg_t, block, 8)[:, :leaf, :3].reshape(gg_t * leaf, 3)


def _near_multipole_sub_xla(pos_g, summaries_neg, idx, *, eps):
    from spacetpu.ops.pallas_direct import acc_cross_quad_xla

    def one_group(args):
        tgt, near_idx = args  # (LEAF, 3), (K,)
        return acc_cross_quad_xla(tgt, summaries_neg[:, near_idx], eps=eps)

    out = jax.lax.map(one_group, (pos_g, idx))  # (G, LEAF, 3)
    return out.reshape(-1, 3)


def _near_correction_xla(pos_g, aug_pos, aug_gm, idx, *, softening, eps):
    """XLA fallback (CPU tests, virtual meshes): gather the near clusters
    and run the broadcast pair kernel per target cluster via lax.map."""
    gg = pos_g.shape[0]
    # Append the null cluster.
    aug_pos = jnp.concatenate(
        [aug_pos, jnp.zeros((1,) + aug_pos.shape[1:], aug_pos.dtype)], axis=0
    )
    aug_gm = jnp.concatenate(
        [aug_gm, jnp.zeros((1,) + aug_gm.shape[1:], aug_gm.dtype)], axis=0
    )

    def one_group(args):
        tgt, near_idx = args  # (LEAF, 3), (K,)
        src_pos = aug_pos[near_idx].reshape(-1, 3)  # (K*BLOCK, 3)
        src_gm = aug_gm[near_idx].reshape(-1)
        return direct.acc_cross(
            tgt, src_pos, src_gm, softening=softening, eps=eps, g=1.0
        )

    return jax.lax.map(one_group, (pos_g, idx))


# --- pair-list near phase -------------------------------------------------
#
# The strip-mode near correction above pays G * k_cap * block^2 pairs: the
# static cap must cover the WORST cluster, so scenes with skewed near-count
# distributions (any clustered mass distribution; measured 2.4x waste on
# fixed_cloud(300k), more on Plummer spheres) burn most of the near phase
# on null-cluster padding. Pairs mode flattens the near lists into a tile
# list — ceil(k_i/pj) tiles per target, ordered by target — so the kernel's
# grid (and therefore its cost) is proportional to the actual near-pair
# total, like the reference's per-body walk whose work is the visited-node
# count (`/root/reference/space/src/sim/barnes_hut/mod.rs:46-76`). The
# output block index is data-driven via scalar prefetch; tiles of one
# target are contiguous, so each output block accumulates in VMEM across
# its visits and is flushed exactly once.


def _pack_rows_flat(ids, n_src: int, pj: int, cap: int, offs, k_i):
    """Fill the (cap*pj,) flat source table for ragged row lists packed
    at per-row tile offsets `offs` (strictly increasing, offs[0] = 0,
    in TILES of width pj) — the shared core of near_pair_segments and
    shared_pair_segments.

    GATHER formulation: the naive fill is a G*W-element scatter at
    computed positions, which XLA:TPU executes orders of magnitude
    slower than the equivalent gather (measured 363 ms inside the
    sharded tree's shard_map at N=1M, logs/r3_tree2_prof2.log). Instead
    (a) compact each row's valid entries to a prefix with one
    order-preserving key sort (key = column if valid else W + column —
    bit-identical output to the scatter's rank packing, and rows may
    contain interior nulls: halo-starved pool entries, M1 exclusion
    holes), then (b) compute each output slot's (row, rank) analytically
    and gather — cap*pj lookups instead of G*W scattered stores.

    Returns (flat (cap*pj,), row_of_tile (cap,), dropped); row_of_tile
    is clamped to row g-1 past the live tiles (callers mask it with
    their own n_tiles)."""
    g, w = ids.shape
    col = jnp.arange(w, dtype=jnp.int32)[None, :]
    key = jnp.where(ids < n_src, col, w + col)
    _, ids_c = jax.lax.sort_key_val(
        jnp.broadcast_to(key, ids.shape), ids, dimension=1
    )
    return _flat_from_compact(ids_c, n_src, pj, cap, offs, k_i)


def _flat_from_compact(ids_c, n_src: int, pj: int, cap: int, offs, k_i):
    """The gather half of _pack_rows_flat, for callers that already hold
    the prefix-compacted rows `ids_c` (near_pair_segments_consistent
    packs two id spaces whose validity patterns are identical by
    construction, so one sort carries both payloads)."""
    g, w = ids_c.shape
    t_range = jnp.arange(cap, dtype=jnp.int32)
    row = jnp.searchsorted(offs, t_range, side="right").astype(jnp.int32) - 1
    j = (t_range - offs[row])[:, None] * pj + jnp.arange(pj, dtype=jnp.int32)
    ok = j < k_i[row][:, None]
    j_safe = jnp.minimum(j, w - 1)
    vals = jnp.take(ids_c.reshape(-1), (row[:, None] * w + j_safe).reshape(-1))
    flat = jnp.where(ok.reshape(-1), vals, n_src).astype(jnp.int32)
    kept = jnp.clip(cap * pj - offs * pj, 0, k_i)
    dropped = (jnp.sum(k_i) - jnp.sum(kept)).astype(jnp.int32)
    return flat, row, dropped


def near_pair_segments(idx, n_src: int, pj: int, cap_tiles: int,
                       ids_c=None):
    """Flatten (G, K) near lists into the pair-kernel tile list.

    idx: invalid slots = n_src (the null source). Every target gets
    max(ceil(k_i/pj), 1) tiles (>= 1 so its output block is always
    initialized). Returns (flat_src (cap_tiles*pj,), tile_tgt (cap_tiles,),
    n_tiles, dropped): flat_src pads with n_src, tile_tgt pads with G (a
    dummy target block the callers append), dropped counts valid entries
    beyond cap_tiles (those targets degrade to far-field accuracy for the
    dropped sources — surfaced through prep["near_overflow"])."""
    g, k = idx.shape
    valid = idx < n_src
    k_i = jnp.sum(valid, axis=1).astype(jnp.int32)
    tiles_i = jnp.maximum(-(-k_i // pj), 1)
    csum = jnp.cumsum(tiles_i).astype(jnp.int32)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), csum[:-1]])
    n_tiles = csum[-1]
    if ids_c is None:
        flat, row, dropped = _pack_rows_flat(
            idx, n_src, pj, cap_tiles, offs, k_i)
    else:
        flat, row, dropped = _flat_from_compact(
            ids_c, n_src, pj, cap_tiles, offs, k_i)
    t_range = jnp.arange(cap_tiles, dtype=jnp.int32)
    tile_tgt = jnp.where(t_range < n_tiles, row, g)
    return flat, tile_tgt, n_tiles, dropped


def near_pair_segments_consistent(idx_d, n_src_d: int, pj_d: int, cap_d: int,
                                  idx_q, n_src_q: int, pj_q: int, cap_q: int):
    """Build the direct and quad-subtraction tile lists CONSISTENTLY.

    The quad pass subtracts each near cluster's multipole on the premise
    that the direct pass adds its exact force: a cluster present in only
    one list leaves a force hole (multipole subtracted, nothing added)
    or a double count — both strictly worse than the far-field fallback.
    The two tile lists have different tile widths (pj) and caps, so their
    positional overflow drops would hit different clusters. Instead,
    targets whose tiles do not fit BOTH caps are dropped from BOTH lists
    entirely (those targets cleanly degrade to far-field accuracy for all
    their near clusters); `dropped` counts their valid entries.

    idx_d/idx_q must mark the same slots invalid (>= their n_src) — e.g.
    the same near list in two index spaces (global vs halo pool)."""
    valid = idx_d < n_src_d
    k_i = jnp.sum(valid, axis=1).astype(jnp.int32)
    t_d = jnp.maximum(-(-k_i // pj_d), 1)
    t_q = jnp.maximum(-(-k_i // pj_q), 1)
    fit = (jnp.cumsum(t_d) <= cap_d) & (jnp.cumsum(t_q) <= cap_q)
    dropped = jnp.sum(jnp.where(fit, 0, k_i)).astype(jnp.int32)
    idx_d = jnp.where(fit[:, None], idx_d, n_src_d)
    idx_q = jnp.where(fit[:, None], idx_q, n_src_q)
    # The two tables mark the same slots invalid, so the rank-packing
    # permutation is identical: one sort carries both payloads (the
    # second per-row sort was a measurable slice of the sharded tree's
    # segment-build prefix, logs/r4w1_r3_tree2_prof.log).
    w = idx_d.shape[1]
    col = jnp.arange(w, dtype=jnp.int32)[None, :]
    key = jnp.where(idx_d < n_src_d, col, w + col)
    _, ids_cd, ids_cq = jax.lax.sort(
        (jnp.broadcast_to(key, idx_d.shape), idx_d, idx_q),
        dimension=1, num_keys=1)
    flat_d, ttgt_d, nt_d, d1 = near_pair_segments(
        idx_d, n_src_d, pj_d, cap_d, ids_c=ids_cd)
    flat_q, ttgt_q, nt_q, d2 = near_pair_segments(
        idx_q, n_src_q, pj_q, cap_q, ids_c=ids_cq)
    # d1/d2 are zero by construction (masking only shrinks prefix sums);
    # counted anyway as belt and braces
    return (flat_d, ttgt_d, nt_d, flat_q, ttgt_q, nt_q,
            dropped + d1 + d2)


#: clusters per MID node — the intermediate level of the pairs-mode
#: 3-level far field (SUPER must be a multiple). A near SUPER decomposes
#: into its MID multipoles, and only near MIDs decompose further into
#: cluster multipoles: per-body far cost drops from K2*SUPER cluster
#: evals (~7900 measured on fixed_cloud(4M), half of the dense far2 pass
#: -- the N>=4M superlinearity) to K2*(SUPER/MID) mid evals + k_mid*MID
#: cluster evals (~1600).
MID = 8


def _mid_near_lists(com, m_tot, r_src, r_tgt, com_m, spread_m, rs_max_m,
                    m_tot_m, idx2, theta: float, k_mid: int,
                    t0=None, n_t: int | None = None):
    """Per-target-SUPER union near-MID lists (G2_t, k_mid) + overflow.

    t0/n_t (traced start, static count; t0 SUPER-aligned) restrict the
    TARGET clusters to a slice — the sharded tree's local block; idx2
    must then be the matching target-super rows (n_t/SUPER, K2). MID
    stats (com_m etc.) stay global.

    Candidates are the MID nodes of the super's near supers (idx2 rows;
    null super = G2 maps to the null mid G_m). A mid M is near the super
    iff it is near ANY member cluster t: (rs_max_M + spread_M) >= theta *
    (d(t, M) - rt_t) -- conservative for every member cluster c of M
    (d(t,c) >= d(t,M) - spread_M and rs_c <= rs_max_M, so with theta <= 1
    the cluster-level accept implies this one): the cluster near lists
    built from the kept mids' members provably contain every theta-
    failing cluster. The union (super granularity, not per cluster)
    keeps every downstream structure G2-rows — the per-cluster variant
    cost 3.4 s/step of structure build at fixed_cloud(4M).

    Rows are ascending in the worst-member margin min_t(d - rt_t); row
    overflow (counted) cuts the FARTHEST mids, which revert to their mid
    multipole in the M1 pass (M1 excludes exactly the kept rows)."""
    g = com.shape[0]
    g2, k2 = idx2.shape
    if g % SUPER:
        raise ValueError(f"G={g} not SUPER-aligned")
    if t0 is None:
        t0, n_t = 0, g
    elif n_t % SUPER or n_t // SUPER != g2:
        raise ValueError(f"target slice n_t={n_t} does not match idx2 "
                         f"rows {g2}")
    spm = SUPER // MID
    g_m = g // MID
    cand = jnp.minimum(
        idx2[:, :, None] * spm
        + jnp.arange(spm, dtype=jnp.int32)[None, None, :],
        g_m,
    ).reshape(g2, k2 * spm)
    cm = jnp.concatenate([com_m, jnp.zeros((1, 3), com_m.dtype)])
    reach = jnp.concatenate(
        [rs_max_m + spread_m, jnp.zeros((1,), rs_max_m.dtype)]
    )
    mm = jnp.concatenate([m_tot_m, jnp.zeros((1,), m_tot_m.dtype)])
    com_t_all = jax.lax.dynamic_slice_in_dim(com, t0, n_t, 0)
    rt_t_all = jax.lax.dynamic_slice_in_dim(r_tgt, t0, n_t, 0)

    def refine(args):
        com_t, rt_t, cand_b = args  # (SUPER,3), (SUPER,), (C,)
        dist = jnp.linalg.norm(
            com_t[:, None, :] - cm[cand_b][None, :, :], axis=-1
        )  # (SUPER, C)
        margin = jnp.min(dist - rt_t[:, None], axis=0)  # (C,)
        near = (reach[cand_b] >= theta * margin) & (mm[cand_b] > 0)
        over = jnp.sum(near) > k_mid
        masked = jnp.where(near, margin, jnp.inf)[None, :]
        k_eff = min(k_mid, masked.shape[1])
        idx = _smallest_k(masked, cand_b[None, :].astype(jnp.int32),
                          k_eff, g_m)
        if k_eff < k_mid:
            idx = jnp.concatenate(
                [idx, jnp.full((1, k_mid - k_eff), g_m, idx.dtype)], axis=1
            )
        return idx[0].astype(jnp.int32), over

    idx_mid2, over = jax.lax.map(
        refine,
        (com_t_all.reshape(g2, SUPER, 3), rt_t_all.reshape(g2, SUPER), cand),
    )
    return idx_mid2, jnp.sum(over)


def _near_lists_from_mids(com, m_tot, r_src, r_tgt, idx_mid2,
                          theta: float, k_near: int,
                          t0=None, n_t: int | None = None):
    """Exact per-cluster near lists from the per-super near-MID pool
    (idx_mid2 members: k_mid*MID SHARED candidates per target super --
    one summary gather per super instead of per cluster, and a pool ~6x
    smaller than _near_lists_hier's K2*SUPER at N=8M). Containment: every
    theta-failing cluster's mid is in its super's union near-mid list
    (see _mid_near_lists), so the pool covers it.

    t0/n_t (traced start, static count; t0 SUPER-aligned) restrict the
    TARGET clusters to a slice; idx_mid2 must be the matching target-super
    rows (n_t/SUPER, k_mid). Candidate stats stay global."""
    g = com.shape[0]
    g2 = idx_mid2.shape[0]
    g_m = g // MID
    if t0 is None:
        t0, n_t = 0, g2 * SUPER
    elif n_t % SUPER or n_t // SUPER != g2:
        raise ValueError(f"target slice n_t={n_t} does not match idx_mid2 "
                         f"rows {g2}")
    cand = jnp.minimum(
        idx_mid2[:, :, None] * MID
        + jnp.arange(MID, dtype=jnp.int32)[None, None, :],
        g,
    ).reshape(g2, -1)  # (G2, k_mid*MID), null = G
    com_p = jnp.concatenate([com, jnp.zeros((1, 3), com.dtype)])
    m_p = jnp.concatenate([m_tot, jnp.zeros((1,), m_tot.dtype)])
    rs_p = jnp.concatenate([r_src, jnp.zeros((1,), r_src.dtype)])

    def refine(args):
        com_t, rt_t, cand_b = args  # (SUPER,3), (SUPER,), (C,) shared
        c_com = com_p[cand_b]  # (C, 3) -- ONE gather per super
        dist = jnp.linalg.norm(com_t[:, None, :] - c_com[None, :, :],
                               axis=-1)  # (SUPER, C)
        near = (rs_p[cand_b][None, :] >= theta * (dist - rt_t[:, None])) & (
            m_p[cand_b][None, :] > 0
        )
        over = jnp.sum(jnp.sum(near, axis=1) > k_near)
        masked = jnp.where(near, dist, jnp.inf)
        k_eff = min(k_near, masked.shape[1])
        cand_rows = jnp.broadcast_to(cand_b[None, :].astype(jnp.int32),
                                     masked.shape)
        idx = _smallest_k(masked, cand_rows, k_eff, g)
        if k_eff < k_near:
            idx = jnp.concatenate(
                [idx,
                 jnp.full((idx.shape[0], k_near - k_eff), g, idx.dtype)],
                axis=1,
            )
        return idx.astype(jnp.int32), over

    com_t_all = jax.lax.dynamic_slice_in_dim(com, t0, n_t, 0)
    rt_t_all = jax.lax.dynamic_slice_in_dim(r_tgt, t0, n_t, 0)
    idx, over = jax.lax.map(
        refine,
        (com_t_all.reshape(g2, SUPER, 3), rt_t_all.reshape(g2, SUPER), cand),
    )
    return idx.reshape(n_t, k_near), jnp.sum(over)


def _m1_lists(idx2, idx_mid2, gg: int):
    """Per-SUPER M1 source lists (G2, K2*spm): the MID nodes of the
    super's near supers MINUS the super's near mids (those are covered at
    cluster resolution by M2). The exclusion uses exactly the kept
    idx_mid2 entries -- a mid present in both passes would double-count,
    one in neither leaves a hole. Null = G_m."""
    g2, k2 = idx2.shape
    spm = SUPER // MID
    g_m = gg // MID
    mids_sup = jnp.minimum(
        idx2[:, :, None] * spm
        + jnp.arange(spm, dtype=jnp.int32)[None, None, :],
        g_m,
    ).reshape(g2, k2 * spm)
    mask = jnp.zeros((g2, g_m + 1), jnp.bool_)
    mask = mask.at[
        jnp.arange(g2, dtype=jnp.int32)[:, None], jnp.minimum(idx_mid2, g_m)
    ].set(True)
    mask = mask.at[:, g_m].set(False)  # null mid is never "near"
    hit = jnp.take_along_axis(mask, mids_sup, axis=1)
    return jnp.where(hit, g_m, mids_sup).astype(jnp.int32)


def shared_pair_segments(ids, n_src: int, cap_src: int | None = None):
    """Flatten per-SUPER source lists (G2, W) into shared-strip pair
    tiles for `_near_pairs_call(tile_src=...)`: each super's valid ids
    pack into ceil/NEAR_QUAD_PJ source tiles (>= 1 so every member
    cluster's output block initializes), and each of its SUPER member
    clusters gets one pair tile per source tile, sharing the strip
    through the tile_src indirection. ids rows may contain interior
    nulls (>= n_src, e.g. M1's exclusion holes) -- entries are
    rank-packed.

    cap_src bounds the SOURCE strip tiles (default: the static worst
    case G2 * ceil(W/pj)). The worst case explodes when the super screen
    barely screens (k_super ~ G2 is GENUINE for uniform scenes at
    theta=0.5 until G2 reaches the thousands): at N=8M adaptive it is
    3.6M pair tiles, whose TPU-side buffers (layout-padded) reach tens
    of GB and OOM the compile. Production callers pass the measured
    totals (measure_near m1_src_tiles / m2_src_tiles, +25%% headroom);
    source entries beyond the cap are dropped tail-first per super and
    counted (each drop loses one source node's far contribution for the
    super's SUPER member target clusters).

    Returns (flat_src, tile_tgt, tile_src, n_tiles, dropped); tile_tgt
    pads with the dummy block G2*SUPER."""
    g2, w = ids.shape
    pj = NEAR_QUAD_PJ
    gg = g2 * SUPER
    st_max = max(-(-w // pj), 1)
    if cap_src is None:
        cap_src = g2 * st_max
    valid = ids < n_src
    c = jnp.sum(valid, axis=1).astype(jnp.int32)
    st = jnp.maximum(-(-c // pj), 1)
    csum_s = jnp.cumsum(st).astype(jnp.int32)
    src_offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), csum_s[:-1]])
    flat, _, dropped = _pack_rows_flat(ids, n_src, pj, cap_src, src_offs, c)
    # per-super KEPT source tiles (partial strips keep their prefix)
    st_k = jnp.clip(cap_src - src_offs, 0, st)
    csum_t = jnp.cumsum(SUPER * st_k).astype(jnp.int32)
    toffs = jnp.concatenate([jnp.zeros((1,), jnp.int32), csum_t[:-1]])
    n_tiles = csum_t[-1]
    cap_tiles = cap_src * SUPER
    t_range = jnp.arange(cap_tiles, dtype=jnp.int32)
    a = jnp.searchsorted(toffs, t_range, side="right").astype(jnp.int32) - 1
    w_in = t_range - toffs[a]
    st_a = jnp.maximum(st_k[a], 1)
    i = w_in // st_a
    t = w_in - i * st_a
    live = t_range < n_tiles
    tile_tgt = jnp.where(live, a * SUPER + i, gg).astype(jnp.int32)
    tile_src = jnp.where(live, src_offs[a] + t, 0).astype(jnp.int32)
    return flat, tile_tgt, tile_src, n_tiles, dropped


def mid_pair_segments(idx2, idx_mid2, gg: int, *, m1_src_tiles=None,
                      m2_src_tiles=None):
    """M1/M2 shared-strip pair segments for the pairs-mode MID far
    field, shared by the single-chip build (tree_prep) and the sharded
    tree (parallel/tree2.py) so the two paths cannot drift: M1 evaluates
    mid multipoles (near supers' mids minus near mids), M2 evaluates
    cluster multipoles of the near mids.

    Returns (segs, dropped): segs is the dict of m1_/m2_ flat/tgt/src/
    ntiles arrays consumed by mid_far_eval; dropped is the overflow
    count, already scaled by SUPER (a dropped source entry loses one
    node's far contribution for all SUPER member target clusters of its
    super)."""
    g_m = gg // MID
    m1_ids = _m1_lists(idx2, idx_mid2, gg)
    f1, t1, s1, n1, d1 = shared_pair_segments(
        m1_ids, g_m, cap_src=m1_src_tiles
    )
    m2_ids = jnp.minimum(
        idx_mid2[:, :, None] * MID
        + jnp.arange(MID, dtype=jnp.int32)[None, None, :],
        gg,
    ).reshape(idx_mid2.shape[0], -1)
    f2, t2, s2, n2, d2 = shared_pair_segments(
        m2_ids, gg, cap_src=m2_src_tiles
    )
    segs = dict(m1_flat=f1, m1_tgt=t1, m1_src=s1, m1_ntiles=n1,
                m2_flat=f2, m2_tgt=t2, m2_src=s2, m2_ntiles=n2)
    return segs, (d1 + d2) * SUPER


def mid_far_eval(pos_g, summaries_null, segs, *, eps, backend: str,
                 interpret: bool = False):
    """Evaluate the M1 + M2 MID far-field contributions for
    mid_pair_segments' segs. summaries_null: (16, gg+1) cluster
    multipole summaries with a trailing null column (the layout of both
    _cluster_summaries and tree2's summ_all + null)."""
    gg = summaries_null.shape[1] - 1
    mid_summ = _super_multipoles(summaries_null[:, :gg], group=MID)
    mid_summ_ext = jnp.concatenate(
        [mid_summ, jnp.zeros((16, 1), summaries_null.dtype)], axis=1
    )
    if backend == "pallas":
        return _near_pairs_quad_pallas(
            pos_g, mid_summ_ext, segs["m1_flat"], segs["m1_tgt"],
            eps=float(eps), interpret=bool(interpret),
            n_tiles=segs.get("m1_ntiles"), tile_src=segs["m1_src"],
        ) + _near_pairs_quad_pallas(
            pos_g, summaries_null, segs["m2_flat"], segs["m2_tgt"],
            eps=float(eps), interpret=bool(interpret),
            n_tiles=segs.get("m2_ntiles"), tile_src=segs["m2_src"],
        )
    return _near_pairs_quad_xla(
        pos_g, mid_summ_ext, segs["m1_flat"], segs["m1_tgt"],
        eps=eps, tile_src=segs["m1_src"],
    ) + _near_pairs_quad_xla(
        pos_g, summaries_null, segs["m2_flat"], segs["m2_tgt"],
        eps=eps, tile_src=segs["m2_src"],
    )


def default_k_mid(theta: float, g_m: int) -> int:
    """Static cap on the per-SUPER UNION of near MID nodes. The union
    neighborhood spans the super hull plus the mid-level accept radius
    (measured fixed_cloud(4M): per-cluster mean 124 / max 397, so the
    union cap must sit in the hundreds). Production callers measure the
    scene (measure_near k_mid) instead; overflow is counted."""
    k = int(24.0 * (1.0 + 1.0 / (2.0 * theta)) ** 3) + 16
    return max(16, min(g_m, k))


def _pairs_prologue(vfirst_ref, accin_ref, out_ref, tile):
    """Shared accumulation tail of the pair kernels: at a target's first
    tile in this call, seed from the running total (aliased accin — zeros
    before the first chunk); otherwise accumulate in VMEM."""
    t = pl.program_id(0)

    @pl.when(vfirst_ref[t] != 0)
    def _():
        out_ref[:, :] = accin_ref[:, :] + tile

    @pl.when(vfirst_ref[t] == 0)
    def _():
        out_ref[:, :] += tile


def _kernel_pairs(tgt_ref, vfirst_ref, tcols_ref, strip_ref, accin_ref,
                  out_ref, *, softening: str, eps: float):
    """Pair-list analogue of `pallas_direct._kernel` (direct-minus-monopole
    sources; see _pack_augmented). tcols/accin/out ride the transposed
    (8, block) layout (_pack_targets_t); one VMEM transpose each way per
    tile."""
    del tgt_ref  # consumed by the index maps
    tc = tcols_ref[:, :].T  # (block, 8)
    xi = tc[:, 0:1]
    yi = tc[:, 1:2]
    zi = tc[:, 2:3]
    xj = strip_ref[0:1, :]
    yj = strip_ref[1:2, :]
    zj = strip_ref[2:3, :]
    gmj = strip_ref[3:4, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz
    if softening == "plummer":
        d2 = r2 + eps * eps
        inv = jax.lax.rsqrt(d2)
        w = gmj * (inv * inv * inv)
        if eps == 0.0:
            w = jnp.where(d2 > 0.0, w, 0.0)
    elif softening == "ref":
        denom = r2 * jnp.sqrt(r2) + eps
        w = gmj / denom
        if eps == 0.0:
            w = jnp.where(denom > 0.0, w, 0.0)
    else:
        raise ValueError(f"unknown softening {softening!r}")
    ax = jnp.sum(w * dx, axis=1, keepdims=True)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    zero = jnp.zeros_like(ax)
    tile = jnp.concatenate([ax, ay, az, zero, zero, zero, zero, zero], axis=1)
    _pairs_prologue(vfirst_ref, accin_ref, out_ref, tile.T)


def _kernel_pairs_hybrid(tgt_ref, vfirst_ref, tcols_ref, strip_ref,
                         accin_ref, out_ref, *, softening: str, eps: float):
    """`_kernel_pairs` with the accumulation routed through the MXU.

    The pair weights are computed from EXACT pairwise differences (same
    arithmetic, same accuracy as the vpu kernel — this is NOT the
    expanded-distance form of `pallas_direct._kernel_mxu`); only the
    O(TI*TJ) force accumulation moves to the systolic array:

        sum_j w_j d_j = W @ [x_j - c | 1] - (sum_j w_j) * (x_i - c)

    which replaces 12 of the 22 per-pair VPU ops with two small matmuls
    the otherwise-idle MXU absorbs. Sources and targets are centered on
    the tile's first target ``c`` before the rank-1 split: near tiles are
    spatially local, so |x - c| ~ cluster radius and the cancellation
    between the two matmul terms stays ~eps_f32 * r_cluster^2 / d^2 —
    negligible where the uncentered form (|x| ~ scene size) would eat
    the tree's error budget on close pairs."""
    del tgt_ref  # consumed by the index maps
    tc = tcols_ref[:, :].T  # (block, 8)
    xi = tc[:, 0:1]
    yi = tc[:, 1:2]
    zi = tc[:, 2:3]
    xj = strip_ref[0:1, :]
    yj = strip_ref[1:2, :]
    zj = strip_ref[2:3, :]
    gmj = strip_ref[3:4, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz
    if softening == "plummer":
        d2 = r2 + eps * eps
        inv = jax.lax.rsqrt(d2)
        w = gmj * (inv * inv * inv)
        if eps == 0.0:
            w = jnp.where(d2 > 0.0, w, 0.0)
    elif softening == "ref":
        denom = r2 * jnp.sqrt(r2) + eps
        w = gmj / denom
        if eps == 0.0:
            w = jnp.where(denom > 0.0, w, 0.0)
    else:
        raise ValueError(f"unknown softening {softening!r}")
    # Self/coincident pairs contribute w * 0 = 0 exactly in the scalar
    # kernel; in the rank-1 matmul split the huge self weight (1/eps^3)
    # would instead ride BOTH terms and cancel at f32 (the dominant error
    # term measured in /tmp-scale tests: ~3e-3 relative). Masking it is
    # exactly equivalent: any r2 == 0 pair has zero contribution.
    w = jnp.where(r2 > 0.0, w, 0.0)
    cx = tc[0:1, 0:1]  # (1, 1) — the tile's first target
    cy = tc[0:1, 1:2]
    cz = tc[0:1, 2:3]
    jc = jnp.concatenate([
        (xj - cx).T, (yj - cy).T, (zj - cz).T, jnp.ones_like(xj).T,
    ], axis=1)  # (TJ, 4) [x_j - c | 1]
    acc4 = jnp.dot(w, jc, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (block, 4)
    s = acc4[:, 3:4]
    ax = acc4[:, 0:1] - s * (xi - cx)
    ay = acc4[:, 1:2] - s * (yi - cy)
    az = acc4[:, 2:3] - s * (zi - cz)
    zero = jnp.zeros_like(ax)
    tile = jnp.concatenate([ax, ay, az, zero, zero, zero, zero, zero], axis=1)
    _pairs_prologue(vfirst_ref, accin_ref, out_ref, tile.T)


#: near-pair accumulation variants (thread via acc_tree(pairs_accum=...)):
#: "vpu" = scalar accumulation (default), "mxu" = `_kernel_pairs_hybrid`.
PAIRS_ACCUMS = ("vpu", "mxu")


def _kernel_quad_pairs(tgt_ref, vfirst_ref, tcols_ref, strip_ref, accin_ref,
                       out_ref, *, eps: float):
    """Pair-list analogue of `pallas_direct._kernel_quad` (used with
    negated summaries to subtract the near clusters' far-field term).
    Transposed (8, block) target/accumulator layout (_pack_targets_t)."""
    del tgt_ref
    tc = tcols_ref[:, :].T  # (block, 8)
    xi = tc[:, 0:1]
    yi = tc[:, 1:2]
    zi = tc[:, 2:3]
    xj = strip_ref[0:1, :]
    yj = strip_ref[1:2, :]
    zj = strip_ref[2:3, :]
    gm = strip_ref[3:4, :]
    qxx = strip_ref[4:5, :]
    qyy = strip_ref[5:6, :]
    qzz = strip_ref[6:7, :]
    qxy = strip_ref[7:8, :]
    qxz = strip_ref[8:9, :]
    qyz = strip_ref[9:10, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    d2 = dx * dx + dy * dy + dz * dz + eps * eps
    inv = jnp.where(d2 > 1e-18, jax.lax.rsqrt(jnp.maximum(d2, 1e-30)), 0.0)
    inv2 = inv * inv
    inv3 = inv2 * inv
    inv4 = inv2 * inv2
    nx = dx * inv
    ny = dy * inv
    nz = dz * inv
    qn_x = qxx * nx + qxy * ny + qxz * nz
    qn_y = qxy * nx + qyy * ny + qyz * nz
    qn_z = qxz * nx + qyz * ny + qzz * nz
    s = nx * qn_x + ny * qn_y + nz * qn_z
    wm = gm * inv3
    t2 = 2.5 * s * inv4
    ax = jnp.sum(wm * dx + t2 * nx - qn_x * inv4, axis=1, keepdims=True)
    ay = jnp.sum(wm * dy + t2 * ny - qn_y * inv4, axis=1, keepdims=True)
    az = jnp.sum(wm * dz + t2 * nz - qn_z * inv4, axis=1, keepdims=True)
    zero = jnp.zeros_like(ax)
    tile = jnp.concatenate([ax, ay, az, zero, zero, zero, zero, zero], axis=1)
    _pairs_prologue(vfirst_ref, accin_ref, out_ref, tile.T)


#: tiles per pair-kernel launch: bounds the gathered strip to
#: chunk * NEAR_TILE_J * 8 * 4 B (= 256 MB at 4096).
NEAR_PAIRS_CHUNK = 4096
#: summary columns per quad-pair tile (f32 lane tile)
NEAR_QUAD_PJ = 128
#: tiles per quad-pair launch (strips are (16, 128) — 8 KB/tile)
NEAR_QUAD_CHUNK = 32768


def _near_pairs_call(kernel, tcols_ext, strips_blocks, flat_src, tile_tgt,
                     *, block, rows, interpret, chunk, n_tiles=None,
                     tile_src=None):
    """Run a pair kernel over the tile list in gather-bounded chunks,
    accumulating into one aliased (G+1 blocks) output buffer.

    strips_blocks: (rows, n_src+1, width) source table gathered per chunk;
    tcols_ext: (8, (G+1)*block) TRANSPOSED targets with the dummy block
    appended (_pack_targets_t layout — an (N, 8) pallas operand pads its
    8-lane minor dim 16x in the tiled layout; see _pack_targets_t). The
    aliased accumulator uses the same (8, N) orientation for the same
    reason.

    tile_src (optional, (cap_tiles,)): indirection mapping each tile to a
    SOURCE tile in flat_src — several tiles may share one source strip
    without duplicating it (the 3-level far field's M1/M2 passes build
    one strip set per SUPER, shared by its 64 member target clusters;
    materializing per-cluster lists instead costs O(G*W) structure-build
    time, the measured 4M prep regression). Without it tile t reads
    flat_src[t*pj:(t+1)*pj].

    The chunks iterate in a device-side lax.scan with ONE pallas launch
    site — an unrolled python loop emitted one launch per chunk, and a
    generously-measured cap (near-dense scenes measure ~0.3*G^2/pj tiles)
    produced hundreds of launches per pass / tens of thousands per rollout
    scan, which crashed the TPU runtime outright. n_tiles (traced) lets
    the scan SKIP chunks past the live tile count, so a cap overshoot
    costs nothing but memory."""
    cap_tiles = tile_tgt.shape[0]
    if tile_src is None:
        pj = flat_src.shape[0] // cap_tiles
    else:
        pj = NEAR_QUAD_PJ  # shared-strip tiles use the quad tile width
    width = strips_blocks.shape[2]
    n_chunks = -(-cap_tiles // chunk)
    pad = n_chunks * chunk - cap_tiles
    if pad:
        # pad with null-source tiles aimed at the dummy target block
        g_dummy = (tcols_ext.shape[1] // block) - 1
        n_src = strips_blocks.shape[1] - 1
        if tile_src is None:
            flat_src = jnp.concatenate(
                [flat_src, jnp.full((pad * pj,), n_src, flat_src.dtype)]
            )
        else:
            # indirected tiles: point padding at source tile 0 (its columns
            # are read but the dummy target discards the contribution)
            tile_src = jnp.concatenate(
                [tile_src, jnp.zeros((pad,), tile_src.dtype)]
            )
        tile_tgt = jnp.concatenate(
            [tile_tgt, jnp.full((pad,), g_dummy, tile_tgt.dtype)]
        )
    if n_tiles is None:
        n_tiles = jnp.asarray(cap_tiles, jnp.int32)

    acc0 = jnp.zeros((8, tcols_ext.shape[1]), tcols_ext.dtype)
    flat2d = None if tile_src is None else flat_src.reshape(-1, pj)

    def run_chunk(acc, c0):
        if tile_src is None:
            fl = jax.lax.dynamic_slice_in_dim(flat_src, c0 * pj,
                                              chunk * pj, 0)
        else:
            ts_c = jax.lax.dynamic_slice_in_dim(tile_src, c0, chunk, 0)
            fl = jnp.take(flat2d, ts_c, axis=0).reshape(-1)
        tgt_c = jax.lax.dynamic_slice_in_dim(tile_tgt, c0, chunk, 0)
        gathered = jnp.take(strips_blocks, fl, axis=1).reshape(
            rows, chunk * pj * width
        )
        vfirst = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            (tgt_c[1:] != tgt_c[:-1]).astype(jnp.int32),
        ])
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(chunk,),
                in_specs=[
                    pl.BlockSpec((8, block), lambda t, tgt, vf: (0, tgt[t]),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows, pj * width),
                                 lambda t, tgt, vf: (0, t),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, block), lambda t, tgt, vf: (0, tgt[t]),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, block),
                                       lambda t, tgt, vf: (0, tgt[t]),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
            input_output_aliases={4: 0},
            interpret=interpret,
        )(tgt_c, vfirst, tcols_ext, gathered, acc)

    def body(acc, c0):
        acc = jax.lax.cond(
            c0 < n_tiles, run_chunk, lambda a, _: a, acc, c0
        )
        return acc, None

    starts = jnp.arange(0, n_chunks * chunk, chunk, dtype=jnp.int32)
    acc, _ = jax.lax.scan(body, acc0, starts)
    return acc


def _append_dummy_block(tcols, block):
    return jnp.concatenate(
        [tcols, jnp.zeros((block, 8), tcols.dtype)], axis=0
    )


def _append_dummy_block_t(tcols_t, block):
    """Transposed-layout variant: (8, G*block) -> (8, (G+1)*block)."""
    return jnp.concatenate(
        [tcols_t, jnp.zeros((8, block), tcols_t.dtype)], axis=1
    )


def _near_pairs_direct_pallas(pos_g, srows, flat_src, tile_tgt, *,
                              softening, eps, interpret, n_tiles=None,
                              accum="vpu"):
    """Pair-list direct(-minus-monopole) correction. srows from
    _pack_augmented (null cluster included). Returns (G, leaf, 3)."""
    gg, leaf = pos_g.shape[:2]
    block = leaf + 1
    tcols_ext = _append_dummy_block_t(_pack_targets_t(pos_g), block)
    srows3 = srows.reshape(8, srows.shape[1] // block, block)
    kern = _kernel_pairs_hybrid if accum == "mxu" else _kernel_pairs
    acc = _near_pairs_call(
        functools.partial(kern, softening=softening, eps=float(eps)),
        tcols_ext, srows3, flat_src, tile_tgt,
        block=block, rows=8, interpret=bool(interpret),
        chunk=NEAR_PAIRS_CHUNK, n_tiles=n_tiles,
    )
    return jnp.moveaxis(
        acc[:3, : gg * block].reshape(3, gg, block), 0, -1
    )[:, :leaf, :]


def _near_pairs_quad_pallas(pos_g, summaries_signed, flat_src, tile_tgt, *,
                            eps, interpret, n_tiles=None, tile_src=None):
    """Pair-list multipole evaluation. summaries_signed: (n_src+1 cols) —
    the caller chooses the table (negated cluster summaries for the near
    subtraction; positive mid/cluster summaries for the 3-level far
    field's M1/M2 passes, with tile_src sharing the per-super strips).
    Returns (G * leaf, 3)."""
    gg, leaf = pos_g.shape[:2]
    block = leaf + 1
    tcols_ext = _append_dummy_block_t(_pack_targets_t(pos_g), block)
    strips = summaries_signed[:, :, None]  # width-1 "blocks"
    acc = _near_pairs_call(
        functools.partial(_kernel_quad_pairs, eps=float(eps)),
        tcols_ext, strips, flat_src, tile_tgt,
        block=block, rows=16, interpret=bool(interpret),
        chunk=NEAR_QUAD_CHUNK, n_tiles=n_tiles, tile_src=tile_src,
    )
    return jnp.moveaxis(
        acc[:3, : gg * block].reshape(3, gg, block), 0, -1
    )[:, :leaf, :].reshape(gg * leaf, 3)


def _near_pairs_direct_xla(pos_g, aug_pos, aug_gm, flat_src, tile_tgt, *,
                           softening, eps):
    """XLA fallback for the pair-list direct correction (CPU tests)."""
    gg, leaf = pos_g.shape[:2]
    pj = flat_src.shape[0] // tile_tgt.shape[0]
    pos_ext = jnp.concatenate(
        [pos_g, jnp.zeros((1, leaf, 3), pos_g.dtype)], axis=0
    )
    aug_pos = jnp.concatenate(
        [aug_pos, jnp.zeros((1,) + aug_pos.shape[1:], aug_pos.dtype)], axis=0
    )
    aug_gm = jnp.concatenate(
        [aug_gm, jnp.zeros((1,) + aug_gm.shape[1:], aug_gm.dtype)], axis=0
    )

    def one_tile(args):
        tgt_id, src_ids = args
        tgt = pos_ext[tgt_id]
        sp = aug_pos[src_ids].reshape(-1, 3)
        sm = aug_gm[src_ids].reshape(-1)
        return direct.acc_cross(
            tgt, sp, sm, softening=softening, eps=eps, g=1.0
        )

    contrib = jax.lax.map(
        one_tile, (tile_tgt, flat_src.reshape(-1, pj))
    )  # (T, leaf, 3)
    acc = jax.ops.segment_sum(contrib, tile_tgt, num_segments=gg + 1)
    return acc[:gg]


def _near_pairs_quad_xla(pos_g, summaries_signed, flat_src, tile_tgt, *,
                         eps, tile_src=None):
    """XLA fallback for the pair-list multipole evaluation (table chosen
    by the caller, see _near_pairs_quad_pallas). tile_src: optional
    source-tile indirection, same contract as _near_pairs_call."""
    from spacetpu.ops.pallas_direct import acc_cross_quad_xla

    gg, leaf = pos_g.shape[:2]
    if tile_src is None:
        pj = flat_src.shape[0] // tile_tgt.shape[0]
        srcs = flat_src.reshape(-1, pj)
    else:
        srcs = flat_src.reshape(-1, NEAR_QUAD_PJ)[tile_src]
    pos_ext = jnp.concatenate(
        [pos_g, jnp.zeros((1, leaf, 3), pos_g.dtype)], axis=0
    )

    def one_tile(args):
        tgt_id, src_ids = args
        return acc_cross_quad_xla(
            pos_ext[tgt_id], summaries_signed[:, src_ids], eps=eps
        )

    contrib = jax.lax.map(one_tile, (tile_tgt, srcs))
    acc = jax.ops.segment_sum(contrib, tile_tgt, num_segments=gg + 1)
    return acc[:gg].reshape(gg * leaf, 3)


def tree_sorted_stats(pos, mass, perm, gg: int, leaf: int = LEAF):
    """Gather bodies into the (cached or fresh) sorted order and compute
    cluster statistics from the CURRENT positions for the EQUAL-count
    partition. O(N) — cheap enough to run every step even when the
    sort/near-lists are cached."""
    n = pos.shape[0]
    dtype = pos.dtype
    n_pad = gg * leaf
    pos_sorted = pos[perm]
    # zero-mass padding parked at the last body's position (not the origin,
    # which would corrupt the last cluster's centroid/target radius)
    pos_s = jnp.concatenate(
        [pos_sorted,
         jnp.broadcast_to(pos_sorted[-1], (n_pad - n, 3)).astype(dtype)],
        axis=0,
    )
    mass_s = jnp.concatenate(
        [mass[perm], jnp.zeros((n_pad - n,), dtype)], axis=0
    )
    pos_g = pos_s.reshape(gg, leaf, 3)
    mass_g = mass_s.reshape(gg, leaf)
    com, m_tot, r_src, r_tgt = _group_stats(pos_g, mass_g)
    return dict(
        pos_s=pos_s, mass_s=mass_s, pos_g=pos_g, mass_g=mass_g,
        com=com, m_tot=m_tot, r_src=r_src, r_tgt=r_tgt,
    )


def cluster_stats(pos, mass, perm, clusters):
    """Cluster statistics from the current positions through an arbitrary
    `cluster.Clusters` gather plan (adaptive partitions; also valid for
    equal ones). Padded slots repeat the cluster's last real body with zero
    mass, so centroids/radii see no foreign positions; trailing empty
    clusters park at the last sorted body."""
    pos_sorted = pos[perm]
    mass_sorted = mass[perm]
    pos_g, mass_g = cluster_ops.gather_clusters(
        pos_sorted, mass_sorted, clusters
    )
    com, m_tot, r_src, r_tgt = _group_stats(pos_g, mass_g)
    return dict(
        pos_s=pos_sorted, mass_s=mass_sorted, pos_g=pos_g, mass_g=mass_g,
        com=com, m_tot=m_tot, r_src=r_src, r_tgt=r_tgt,
    )


def _build_clustering(pos, mass, gg: int, leaf: int, cluster_mode: str):
    """(perm, inv, clusters, stats) for either partition mode."""
    n = pos.shape[0]
    if cluster_mode == "adaptive":
        perm, inv, hi_s, lo_s = morton.sfc_sort_2w(pos)
        clusters = cluster_ops.adaptive_clusters(hi_s, lo_s, n, leaf, gg)
        stats = cluster_stats(pos, mass, perm, clusters)
    elif cluster_mode == "equal":
        perm, inv = morton.morton_order(pos)
        clusters = cluster_ops.equal_clusters(n, leaf, gg)
        stats = tree_sorted_stats(pos, mass, perm, gg, leaf)
    else:
        raise ValueError(f"unknown cluster_mode {cluster_mode!r}")
    return perm, inv, clusters, stats


def tree_prep(pos, mass, *, theta: float, k_near: int, gg: int,
              far_levels: int = 2, leaf: int = LEAF,
              cluster_mode: str = "equal", near_mode: str = "strip",
              near_tiles: int | None = None,
              near_tiles_q: int | None = None,
              k_super: int | None = None,
              k_mid: int | None = None,
              m1_src_tiles: int | None = None,
              m2_src_tiles: int | None = None):
    """Phase 1: sort, clustering, statistics, near lists.

    Deterministic given (pos, mass) — in the sharded tree every device runs
    this redundantly on the gathered arrays and gets identical results.
    Returns a dict of sorted/packed arrays plus perm/inv/clusters/idx
    (+idx2 when far_levels=3: the supercluster near list shared by the
    far-field refinement and the cluster near-list screen, so the refined
    set provably contains every near cluster; + the flattened tile lists
    when near_mode="pairs" — see near_pair_segments; far3+pairs adds the
    MID-level decomposition: m1_*/m2_* tile lists over mid/cluster
    summaries — see MID and _mid_near_lists)."""
    perm, inv, clusters, stats = _build_clustering(
        pos, mass, gg, leaf, cluster_mode
    )
    mid_pairs = far_levels == 3 and near_mode == "pairs"
    if far_levels == 3:
        if gg % SUPER:
            raise ValueError(f"far_levels=3 needs gg % {SUPER} == 0, got {gg}")
        g2 = gg // SUPER
        idx2, over2 = _super_screen(
            stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
            theta, k_super or default_k_super(theta, g2),
        )
        if mid_pairs:
            # MID hierarchy: near supers decompose into MID multipoles
            # (M1) and only near MIDs into cluster multipoles (M2); the
            # cluster near lists come from the near-mid pool (k_mid*MID
            # candidates — ~6x smaller than the K2*SUPER pool at N=8M).
            com_m, spread_m, rs_max_m, _ = _super_stats(
                stats["com"], stats["m_tot"], stats["r_src"],
                stats["r_tgt"], group=MID,
            )
            m_tot_m = stats["m_tot"].reshape(-1, MID).sum(axis=1)
            if k_mid is None:
                k_mid = default_k_mid(theta, gg // MID)
            idx_mid2, over_mid = _mid_near_lists(
                stats["com"], stats["m_tot"], stats["r_src"],
                stats["r_tgt"], com_m, spread_m, rs_max_m, m_tot_m,
                idx2, theta, k_mid,
            )
            idx, over_near = _near_lists_from_mids(
                stats["com"], stats["m_tot"], stats["r_src"],
                stats["r_tgt"], idx_mid2, theta, k_near,
            )
            overflow = over_near + over_mid * SUPER + over2 * SUPER
        else:
            idx, overflow = _near_lists_hier(
                stats["com"], stats["m_tot"], stats["r_src"],
                stats["r_tgt"], theta, k_near, idx2=idx2,
            )
            overflow = overflow + over2 * SUPER
    else:
        idx2 = jnp.zeros((1, 1), jnp.int32)
        idx, overflow = near_lists(
            stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
            theta, k_near, k_super=k_super,
        )
    prep = dict(idx=idx, idx2=idx2, perm=perm, inv=inv, clusters=clusters,
                **stats)
    if near_mode == "pairs":
        block = leaf + 1
        if NEAR_TILE_J % block:
            raise ValueError(
                f"near_mode='pairs' needs block=leaf+1 to divide "
                f"{NEAR_TILE_J}, got leaf={leaf}"
            )
        pj = NEAR_TILE_J // block
        if near_tiles is None:
            near_tiles = gg * max(-(-k_near // pj), 1)
        if near_tiles_q is None:
            near_tiles_q = gg * max(-(-k_near // NEAR_QUAD_PJ), 1)
        flat, ttgt, ntd, flatq, ttgtq, ntq, drop = (
            near_pair_segments_consistent(
                idx, gg, pj, near_tiles, idx, gg, NEAR_QUAD_PJ, near_tiles_q
            )
        )
        prep.update(near_flat=flat, near_tile_tgt=ttgt, near_ntiles=ntd,
                    nearq_flat=flatq, nearq_tile_tgt=ttgtq,
                    nearq_ntiles=ntq)
        overflow = overflow + drop
        if mid_pairs:
            segs, dropped = mid_pair_segments(
                idx2, idx_mid2, gg,
                m1_src_tiles=m1_src_tiles, m2_src_tiles=m2_src_tiles,
            )
            prep.update(segs)
            overflow = overflow + dropped
    elif near_mode != "strip":
        raise ValueError(f"unknown near_mode {near_mode!r}")
    prep["near_overflow"] = overflow + clusters.overflow
    return prep


#: keys of the tree_prep entries that stay valid across steps (bodies move
#: a tiny fraction of a cluster radius per step); everything else is a
#: statistic of the current positions and is recomputed by
#: `acc_tree_cached` each call.
STRUCTURE_KEYS = ("perm", "inv", "clusters", "idx", "idx2",
                  "near_flat", "near_tile_tgt", "near_ntiles",
                  "nearq_flat", "nearq_tile_tgt", "nearq_ntiles",
                  "m1_flat", "m1_tgt", "m1_src", "m1_ntiles",
                  "m2_flat", "m2_tgt", "m2_src", "m2_ntiles")


def tree_structure(pos, mass, *, theta: float, k_near: int, gg: int,
                   far_levels: int = 2, leaf: int = LEAF,
                   cluster_mode: str = "equal", near_mode: str = "strip",
                   near_tiles: int | None = None,
                   near_tiles_q: int | None = None,
                   k_super: int | None = None,
                   k_mid: int | None = None,
                   m1_src_tiles: int | None = None,
                   m2_src_tiles: int | None = None):
    """The cacheable part of tree construction: space-filling-curve sort,
    clustering, near lists (and their flattened pair tiles). Returns a dict
    of the STRUCTURE_KEYS present for the given modes."""
    p = tree_prep(pos, mass, theta=theta, k_near=k_near, gg=gg,
                  far_levels=far_levels, leaf=leaf,
                  cluster_mode=cluster_mode, near_mode=near_mode,
                  near_tiles=near_tiles, near_tiles_q=near_tiles_q,
                  k_super=k_super, k_mid=k_mid,
                  m1_src_tiles=m1_src_tiles, m2_src_tiles=m2_src_tiles)
    return {k: p[k] for k in STRUCTURE_KEYS if k in p}


def tree_eval(prep: dict, c0, n_clusters: int, *, softening: str,
              eps, g, backend: str, interpret, multipole_order: int = 1,
              far_levels: int = 2, near_mode: str = "strip",
              pairs_accum: str = "vpu"):
    """Phases 2+3 for target clusters [c0, c0 + n_clusters): far-field
    multipoles plus near correction, returning the slot-order acceleration
    block of shape (n_clusters * leaf, 3). n_clusters is static; c0 may be
    traced (the sharded tree slices per-device blocks). near_mode="pairs"
    (full range only) drives the near phase through the flattened tile
    lists prep carries — cost proportional to the actual near-pair count.

    multipole_order=1: monopole far field; the near correction embeds a -M
    pseudo-body per source cluster so direct-minus-monopole is one pass.
    multipole_order=2: monopole+quadrupole far field (plummer only); the
    near correction is direct pairs plus a separate negated-multipole
    evaluation over each cluster's near list (a pseudo-body cannot carry a
    quadrupole).

    far_levels=3 (requires multipole_order=2, gg/c0/n_clusters multiples
    of SUPER): the dense far field runs against SUPERCLUSTER multipoles
    (G2 = G/64 columns) and each target super additionally evaluates a
    refinement strip replacing its near supers (prep["idx2"]) by their
    member clusters — O(N*(G2 + K2*65)) instead of O(N*G), the step that
    keeps the far field near-linear at N >= 4M."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if multipole_order not in (1, 2):
        raise ValueError(f"multipole_order must be 1 or 2, got {multipole_order}")
    if multipole_order == 2 and softening != "plummer":
        raise ValueError("multipole_order=2 requires softening='plummer'")
    if far_levels not in (2, 3):
        raise ValueError(f"far_levels must be 2 or 3, got {far_levels}")
    if far_levels == 3 and multipole_order != 2:
        raise ValueError("far_levels=3 requires multipole_order=2")
    dtype = prep["pos_s"].dtype
    gg, leaf = prep["pos_g"].shape[:2]
    if near_mode == "pairs" and n_clusters != gg:
        raise ValueError("near_mode='pairs' supports the full target range "
                         "only (c0=0, n_clusters=G)")
    pos_g = jax.lax.dynamic_slice_in_dim(prep["pos_g"], c0, n_clusters, 0)
    mass_g = jax.lax.dynamic_slice_in_dim(prep["mass_g"], c0, n_clusters, 0)
    idx = jax.lax.dynamic_slice_in_dim(prep["idx"], c0, n_clusters, 0)
    targets = pos_g.reshape(n_clusters * leaf, 3)
    g_arr = jnp.asarray(g, dtype)

    if multipole_order == 2:
        summaries = _cluster_summaries(
            prep["pos_g"], prep["mass_g"], prep["com"], prep["m_tot"], g_arr
        )

    # Phase 2: dense far field.
    if far_levels == 3:
        from spacetpu.ops import pallas_direct

        if n_clusters % SUPER or gg % SUPER:
            raise ValueError("far_levels=3 needs SUPER-aligned blocks")
        super_summaries = _super_multipoles(summaries[:, :gg])
        s2 = c0 // SUPER
        n2 = n_clusters // SUPER
        idx2_t = jax.lax.dynamic_slice_in_dim(prep["idx2"], s2, n2, 0)
        acc = _superfar_dense_masked(
            targets, super_summaries, idx2_t, eps=eps, backend=backend,
            interpret=interpret,
        )
        if "m1_tgt" in prep:
            # MID-level decomposition of the near supers (see MID): M1
            # evaluates mid multipoles (near supers' mids minus near
            # mids), M2 evaluates cluster multipoles of the near mids.
            # Together they cover the dense pass's masked supers exactly
            # once — per-body cost K2*(SUPER/MID) + k_mid*MID instead of
            # the strip refine's K2*SUPER.
            acc = acc + mid_far_eval(
                pos_g, summaries, prep, eps=eps, backend=backend,
                interpret=interpret,
            )
        else:
            strips = _superfar_refine_table(
                summaries[:, :gg], super_summaries, prep["idx2"]
            )
            s_pad = strips.shape[1] // (gg // SUPER)
            strips = jax.lax.dynamic_slice_in_dim(
                strips, s2 * s_pad, n2 * s_pad, 1
            )
            if backend == "pallas":
                acc = acc + _superfar_refine_pallas(
                    _pack_targets(pos_g), strips, eps=float(eps),
                    interpret=bool(interpret), block=leaf + 1,
                )
            else:
                acc = acc + _superfar_refine_xla(pos_g, strips, eps=eps)
    elif multipole_order == 2:
        from spacetpu.ops import pallas_direct

        if backend == "pallas":
            acc = pallas_direct.acc_cross_quad(
                targets, summaries[:, :gg], eps=eps, interpret=interpret,
            )
        else:
            acc = pallas_direct.acc_cross_quad_xla(
                targets, summaries[:, :gg], eps=eps
            )
    elif backend == "pallas":
        from spacetpu.ops import pallas_direct

        acc = pallas_direct.acc_cross_pallas(
            targets, prep["com"], prep["m_tot"],
            softening=softening, eps=eps, g=g, interpret=interpret,
        )
    else:
        acc = direct.acc_cross(
            targets, prep["com"], prep["m_tot"],
            softening=softening, eps=eps, g=g,
        )

    # Phase 3: near-field correction.
    monopole_pseudo = multipole_order == 1
    block = leaf + 1
    if near_mode == "pairs":
        corr = near_pairs_correction(
            prep["pos_g"], prep["pos_g"], prep["mass_g"], prep["com"],
            prep["m_tot"], prep["near_flat"], prep["near_tile_tgt"],
            softening=softening, eps=eps, g=g, backend=backend,
            interpret=interpret, monopole_pseudo=monopole_pseudo,
            n_tiles=prep.get("near_ntiles"), accum=pairs_accum,
        )
        if multipole_order == 2:
            corr = corr + near_pairs_multipole_subtraction(
                prep["pos_g"], summaries, prep["nearq_flat"],
                prep["nearq_tile_tgt"], eps=eps, backend=backend,
                interpret=interpret, n_tiles=prep.get("nearq_ntiles"),
            )
    elif backend == "pallas":
        pad_mult = NEAR_TILE_J // block
        if idx.shape[1] % pad_mult != 0:  # pad near lists w/ the null cluster
            pad = pad_mult - idx.shape[1] % pad_mult
            idx = jnp.concatenate(
                [idx, jnp.full((n_clusters, pad), gg, jnp.int32)], axis=1
            )
        tcols = _pack_targets(pos_g)
        # sources cover ALL clusters (near lists point anywhere)
        srows = _pack_augmented(
            prep["pos_g"], prep["mass_g"], prep["com"], prep["m_tot"], g_arr,
            monopole_pseudo=monopole_pseudo,
        )
        corr = _near_correction_pallas(
            tcols, srows, idx,
            softening=softening, eps=float(eps), interpret=bool(interpret),
            block=block,
        ).reshape(n_clusters * leaf, 3)
        if multipole_order == 2:
            corr = corr + _near_multipole_sub_pallas(
                tcols, summaries.at[3:10].multiply(-1.0), idx,
                eps=float(eps), interpret=bool(interpret), block=block,
            )
    else:
        aug_pos = jnp.concatenate(
            [prep["pos_g"], prep["com"][:, None, :]], axis=1
        )
        pseudo_gm = (-prep["m_tot"][:, None] * g_arr if monopole_pseudo
                     else jnp.zeros((gg, 1), dtype))
        aug_gm = jnp.concatenate([prep["mass_g"] * g_arr, pseudo_gm], axis=1)
        corr = _near_correction_xla(
            pos_g, aug_pos, aug_gm, idx, softening=softening, eps=eps
        ).reshape(n_clusters * leaf, 3)
        if multipole_order == 2:
            corr = corr + _near_multipole_sub_xla(
                pos_g, summaries.at[3:10].multiply(-1.0), idx, eps=eps
            )
    return acc + corr


def near_direct_correction(pos_g_t, idx, pool_pos_g, pool_mass_g, pool_com,
                           pool_m_tot, *, softening, eps, g, backend,
                           interpret, monopole_pseudo: bool):
    """Near-field direct(-minus-monopole) correction of target clusters
    against an arbitrary source-cluster POOL (the sharded tree's pool is
    [local clusters | halo clusters]; the single-chip pool is all
    clusters). idx: (G_t, K) slots into the pool; invalid slots point to
    len(pool) (a trailing null cluster is appended). Returns
    (G_t * leaf, 3)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n_t, leaf = pos_g_t.shape[:2]
    block = leaf + 1
    p = pool_pos_g.shape[0]
    dtype = pos_g_t.dtype
    g_arr = jnp.asarray(g, dtype)
    if backend == "pallas":
        pad_mult = NEAR_TILE_J // block
        if idx.shape[1] % pad_mult != 0:
            pad = pad_mult - idx.shape[1] % pad_mult
            idx = jnp.concatenate(
                [idx, jnp.full((n_t, pad), p, jnp.int32)], axis=1
            )
        tcols = _pack_targets(pos_g_t)
        srows = _pack_augmented(
            pool_pos_g, pool_mass_g, pool_com, pool_m_tot, g_arr,
            monopole_pseudo=monopole_pseudo,
        )
        return _near_correction_pallas(
            tcols, srows, idx,
            softening=softening, eps=float(eps), interpret=bool(interpret),
            block=block,
        ).reshape(n_t * leaf, 3)
    aug_pos = jnp.concatenate(
        [pool_pos_g, pool_com[:, None, :]], axis=1
    )
    pseudo_gm = (-pool_m_tot[:, None] * g_arr if monopole_pseudo
                 else jnp.zeros((p, 1), dtype))
    aug_gm = jnp.concatenate([pool_mass_g * g_arr, pseudo_gm], axis=1)
    return _near_correction_xla(
        pos_g_t, aug_pos, aug_gm, idx, softening=softening, eps=eps
    ).reshape(n_t * leaf, 3)


def near_multipole_subtraction(pos_g_t, summaries, idx, *, eps, backend,
                               interpret):
    """Subtract the quadrupole far-field of each target cluster's near
    list (idx indexes `summaries` columns; invalid = summaries null col -1
    ... callers pass idx whose invalid slots equal summaries.shape[1]-1).
    Returns (G_t * leaf, 3)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    neg = summaries.at[3:10].multiply(-1.0)
    if backend == "pallas":
        return _near_multipole_sub_pallas(
            _pack_targets(pos_g_t), neg, idx, eps=float(eps),
            interpret=bool(interpret), block=pos_g_t.shape[1] + 1,
        )
    return _near_multipole_sub_xla(pos_g_t, neg, idx, eps=eps)


def near_pairs_correction(pos_g_t, pool_pos_g, pool_mass_g, pool_com,
                          pool_m_tot, flat_src, tile_tgt, *, softening, eps,
                          g, backend, interpret, monopole_pseudo: bool,
                          n_tiles=None, accum="vpu"):
    """Pair-tile analogue of `near_direct_correction` (same source-pool
    contract; flat_src/tile_tgt from near_pair_segments over pool slots).
    Returns (G_t * leaf, 3)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n_t, leaf = pos_g_t.shape[:2]
    p = pool_pos_g.shape[0]
    dtype = pos_g_t.dtype
    g_arr = jnp.asarray(g, dtype)
    if backend == "pallas":
        srows = _pack_augmented(
            pool_pos_g, pool_mass_g, pool_com, pool_m_tot, g_arr,
            monopole_pseudo=monopole_pseudo,
        )
        return _near_pairs_direct_pallas(
            pos_g_t, srows, flat_src, tile_tgt, softening=softening,
            eps=float(eps), interpret=bool(interpret), n_tiles=n_tiles,
            accum=accum,
        ).reshape(n_t * leaf, 3)
    aug_pos = jnp.concatenate([pool_pos_g, pool_com[:, None, :]], axis=1)
    pseudo_gm = (-pool_m_tot[:, None] * g_arr if monopole_pseudo
                 else jnp.zeros((p, 1), dtype))
    aug_gm = jnp.concatenate([pool_mass_g * g_arr, pseudo_gm], axis=1)
    return _near_pairs_direct_xla(
        pos_g_t, aug_pos, aug_gm, flat_src, tile_tgt,
        softening=softening, eps=eps,
    ).reshape(n_t * leaf, 3)


def near_pairs_multipole_subtraction(pos_g_t, summaries, flat_src, tile_tgt,
                                     *, eps, backend, interpret,
                                     n_tiles=None):
    """Pair-tile analogue of `near_multipole_subtraction` (flat_src slots
    into `summaries` columns; invalid = the trailing null column).
    Returns (G_t * leaf, 3)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n_t, leaf = pos_g_t.shape[:2]
    neg = summaries.at[3:10].multiply(-1.0)
    if backend == "pallas":
        return _near_pairs_quad_pallas(
            pos_g_t, neg, flat_src, tile_tgt, eps=float(eps),
            interpret=bool(interpret), n_tiles=n_tiles,
        ).reshape(n_t * leaf, 3)
    return _near_pairs_quad_xla(
        pos_g_t, neg, flat_src, tile_tgt, eps=eps
    ).reshape(n_t * leaf, 3)


#: switch the far field to 3 levels (supercluster multipoles + refinement)
#: above this many clusters: below it the dense N x G pass is cheap.
FAR3_CUTOFF = 4096


def resolve_far_levels(far_levels, gg: int, multipole_order: int) -> int:
    if far_levels == "auto":
        return 3 if (multipole_order == 2 and gg >= FAR3_CUTOFF) else 2
    return int(far_levels)


def _gg_for(n: int, far_levels, multipole_order: int, leaf: int = LEAF,
            cluster_mode: str = "equal") -> int:
    """Cluster-count cap for N bodies; SUPER-aligned when the 3-level far
    field may engage (padding clusters are zero-mass, parked at the last
    body). The adaptive cap is the provable worst case — production
    callers measure the scene instead (measure_near) and pass gg
    explicitly."""
    if cluster_mode == "adaptive":
        gg = cluster_ops.g_cap_for(n, leaf)
    else:
        gg = max(1, math.ceil(n / leaf))
    if resolve_far_levels(far_levels, gg, multipole_order) == 3:
        gg = -(-gg // SUPER) * SUPER
    return gg


def acc_tree(
    pos,
    mass,
    *,
    theta: float = constants.BARNES_HUT_THETA,
    softening: str = "plummer",
    eps=None,
    g=None,
    backend: str = "xla",
    k_near: int | None = None,
    interpret: bool | None = None,
    multipole_order: int = 1,
    far_levels="auto",
    leaf: int = LEAF,
    cluster_mode: str = "equal",
    near_mode: str = "strip",
    near_tiles: int | None = None,
    near_tiles_q: int | None = None,
    gg: int | None = None,
    k_super: int | None = None,
    k_mid: int | None = None,
    m1_src_tiles: int | None = None,
    m2_src_tiles: int | None = None,
    pairs_accum: str = "vpu",
):
    """Clustered Barnes-Hut acceleration: (N, 3), (N,) -> (N, 3)."""
    if softening not in direct.SOFTENINGS:
        raise ValueError(f"unknown softening {softening!r}")
    if eps is None:
        eps = constants.COLLISION_EPSILON if softening == "ref" else 0.0
    if g is None:
        g = constants.G
    n = pos.shape[0]
    if gg is None:
        gg = _gg_for(n, far_levels, multipole_order, leaf, cluster_mode)
    far_levels = resolve_far_levels(far_levels, gg, multipole_order)
    if k_near is None:
        k_near = default_k_near(theta, gg)

    prep = tree_prep(pos, mass, theta=theta, k_near=k_near, gg=gg,
                     far_levels=far_levels, leaf=leaf,
                     cluster_mode=cluster_mode, near_mode=near_mode,
                     near_tiles=near_tiles, near_tiles_q=near_tiles_q,
                     k_super=k_super, k_mid=k_mid,
                     m1_src_tiles=m1_src_tiles, m2_src_tiles=m2_src_tiles)
    acc = tree_eval(prep, 0, gg, softening=softening, eps=eps, g=g,
                    backend=backend, interpret=interpret,
                    multipole_order=multipole_order, far_levels=far_levels,
                    near_mode=near_mode, pairs_accum=pairs_accum)
    # Unsort back to the caller's body order (gather via the inverse
    # permutation — gathers are far cheaper than scatters on TPU).
    return cluster_ops.unsort_slots(acc, prep["clusters"], prep["inv"])


def acc_tree_cached(pos, mass, structure, *, softening: str, eps, g,
                    backend: str, interpret=None, multipole_order: int = 1,
                    far_levels: int = 2, near_mode: str = "strip",
                    pairs_accum: str = "vpu"):
    """acc_tree with a cached `tree_structure` dict: statistics are
    recomputed from the current positions, the sort/clustering/near lists
    are reused (rollouts refresh them every few steps — see
    Simulation tree_refresh_every)."""
    inv = structure["inv"]
    clusters = structure["clusters"]
    gg = structure["idx"].shape[0]
    stats = cluster_stats(pos, mass, structure["perm"], clusters)
    prep = dict(structure, **stats)
    acc = tree_eval(prep, 0, gg, softening=softening, eps=eps, g=g,
                    backend=backend, interpret=interpret,
                    multipole_order=multipole_order, far_levels=far_levels,
                    near_mode=near_mode, pairs_accum=pairs_accum)
    return cluster_ops.unsort_slots(acc, clusters, inv)
