"""Static-shape clusterings of SFC-sorted bodies for the clustered treecode.

The reference's octree adapts its cell size to the local density by
recursive splitting (`/root/reference/space/src/sim/barnes_hut/tree.rs:143-174`).
The TPU treecode's round-1 clustering did not: it cut the sorted order into
equal-count LEAF-body runs, so clusters in the sparse tail of a
high-density-contrast scene (a Plummer sphere's rho ~ r^-5 halo) span huge
radii and fail the theta opening test against *everything* — measured near
lists ~60% dense on plummer(300k), which degenerates the tree toward
all-pairs cost.

`adaptive_clusters` restores the octree's density adaptivity without its
pointers or dynamic shapes: every body finds the deepest SFC cell (prefix
of its two-word deep Hilbert key, morton.hilbert_keys_2w) that still holds
more than `leaf` bodies — its "parent" cell, the exact analogue of the
octree node whose children are leaves — and each maximal run of
consecutive same-parent bodies is split into equal-count clusters of at
most `leaf`. Every cluster fits inside a cell whose size tracks the local
density, the cluster count is < 3*ceil(N/leaf) (runs number at most twice
the parents, parents hold > leaf bodies each), and the whole construction
is sorts, scans and gathers — no data-dependent shapes.

All partitions are expressed as a `Clusters` gather plan over the sorted
body order, so the rest of the tree (stats, multipoles, near lists, pair
kernels) is independent of how clusters were formed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spacetpu.ops import morton


class Clusters(NamedTuple):
    """Static-shape partition of N sorted bodies into g_cap clusters.

    slot[g, j]   index into the *sorted* body arrays for slot j of cluster
                 g; padded slots repeat the cluster's last real body (so
                 centroids/radii are never polluted by foreign positions).
    mask[g, j]   True where the slot holds a real body.
    body_slot[i] flat (g * leaf + j) slot of sorted body i — the inverse
                 gather used to read per-body results back out of packed
                 (G, leaf) blocks.
    n_clusters   actual cluster count (<= g_cap; trailing clusters empty).
    overflow     1 if the adaptive build exceeded g_cap and fell back to
                 the equal-count split for this rebuild (telemetry).
    """

    slot: jax.Array
    mask: jax.Array
    body_slot: jax.Array
    n_clusters: jax.Array
    overflow: jax.Array


def equal_clusters(n: int, leaf: int, g_cap: int) -> Clusters:
    """The round-1 partition: consecutive equal-count runs of `leaf`."""
    flat = jnp.arange(g_cap * leaf, dtype=jnp.int32)
    slot = jnp.minimum(flat, n - 1).reshape(g_cap, leaf)
    mask = (flat < n).reshape(g_cap, leaf)
    body_slot = jnp.arange(n, dtype=jnp.int32)
    g_used = (n + leaf - 1) // leaf
    return Clusters(
        slot, mask, body_slot,
        jnp.asarray(g_used, jnp.int32), jnp.zeros((), jnp.int32),
    )


def _cid_to_clusters(cid, n: int, leaf: int, g_cap: int, overflow) -> Clusters:
    """Materialize the gather plan from sorted-order cluster ids
    (non-decreasing, starting at 0)."""
    grange = jnp.arange(g_cap, dtype=jnp.int32)
    cstart = jnp.searchsorted(cid, grange, side="left").astype(jnp.int32)
    cend = jnp.searchsorted(cid, grange, side="right").astype(jnp.int32)
    ccount = cend - cstart
    j = jnp.arange(leaf, dtype=jnp.int32)[None, :]
    # padded slots repeat the cluster's last real body; empty clusters
    # clamp to index 0 (mask is all-False there anyway)
    slot = cstart[:, None] + jnp.minimum(j, jnp.maximum(ccount - 1, 0)[:, None])
    slot = jnp.clip(slot, 0, n - 1)
    mask = j < ccount[:, None]
    idx = jnp.arange(n, dtype=jnp.int32)
    body_slot = cid * leaf + (idx - cstart[cid])
    n_clusters = (cid[-1] + 1).astype(jnp.int32)
    return Clusters(slot, mask, body_slot, n_clusters, overflow)


def adaptive_clusters(hi_sorted, lo_sorted, n: int, leaf: int,
                      g_cap: int) -> Clusters:
    """Density-adaptive partition from sorted two-word deep Hilbert keys.

    For each sorted body: scan depths 1..2*BITS (10 per key word) for the
    deepest prefix cell holding > leaf bodies (cell start/end found with
    boundary flags + prefix scans, no searchsorted over 64-bit keys), then
    split that parent cell's run into ceil(count/leaf) equal buckets.
    Falls back to the equal-count split if the partition would exceed
    g_cap (cannot happen when g_cap >= 2*ceil(n/leaf); the fallback keeps
    rollout rebuilds safe when the caller sized g_cap to a measured scene
    with headroom instead).
    """
    idx = jnp.arange(n, dtype=jnp.int32)
    parent_start = jnp.zeros((n,), jnp.int32)
    parent_count = jnp.full((n,), n, jnp.int32)

    bits = morton.BITS2 // 2  # 10 bit-planes per word
    for d in range(1, 2 * bits + 1):
        if d <= bits:
            s = jnp.uint32(3 * (bits - d))
            neq = (hi_sorted[1:] >> s) != (hi_sorted[:-1] >> s)
        else:
            s = jnp.uint32(3 * (2 * bits - d))
            neq = (hi_sorted[1:] != hi_sorted[:-1]) | (
                (lo_sorted[1:] >> s) != (lo_sorted[:-1] >> s)
            )
        flag = jnp.concatenate([jnp.ones((1,), bool), neq])
        start = jax.lax.cummax(jnp.where(flag, idx, 0))
        arr = jnp.where(flag, idx, n)
        suffix_min = jnp.flip(jax.lax.cummin(jnp.flip(arr)))
        end = jnp.concatenate([suffix_min[1:], jnp.full((1,), n, jnp.int32)])
        cnt = end - start
        better = cnt > leaf
        parent_start = jnp.where(better, start, parent_start)
        parent_count = jnp.where(better, cnt, parent_count)

    # Bodies choosing the same parent cell need not be contiguous: a denser
    # sub-cell in the middle of the parent claims its own bodies, splitting
    # the parent's remainder into several runs. Each maximal run of
    # consecutive same-parent bodies ((start, count) identifies the cell —
    # nested cells sharing a start always differ in count) is equal-count
    # split on its own.
    pflag = jnp.concatenate([
        jnp.ones((1,), bool),
        (parent_start[1:] != parent_start[:-1])
        | (parent_count[1:] != parent_count[:-1]),
    ])
    run_start = jax.lax.cummax(jnp.where(pflag, idx, 0))
    arr = jnp.where(pflag, idx, n)
    suffix_min = jnp.flip(jax.lax.cummin(jnp.flip(arr)))
    run_end = jnp.concatenate([suffix_min[1:], jnp.full((1,), n, jnp.int32)])
    run_len = run_end - run_start
    nsub = -(-run_len // leaf)
    bucket = -(-run_len // nsub)
    rank = idx - run_start
    sub = rank // bucket
    newflag = pflag | jnp.concatenate([
        jnp.zeros((1,), bool), sub[1:] != sub[:-1]
    ])
    cid = (jnp.cumsum(newflag) - 1).astype(jnp.int32)
    n_clusters = cid[-1] + 1
    over = n_clusters > g_cap
    cid = jnp.where(over, idx // leaf, cid)
    return _cid_to_clusters(
        cid, n, leaf, g_cap, over.astype(jnp.int32)
    )


def gather_clusters(pos_sorted, mass_sorted, clusters: Clusters):
    """Packed (G, leaf, 3) positions and (G, leaf) masses (zero where
    padded) from sorted body arrays."""
    pos_g = pos_sorted[clusters.slot]
    mass_g = jnp.where(
        clusters.mask, mass_sorted[clusters.slot], jnp.zeros((), mass_sorted.dtype)
    )
    return pos_g, mass_g


def unsort_slots(acc_slots, clusters: Clusters, inv):
    """Read per-body results out of packed (G*leaf, ...) slot-order blocks
    back into the caller's body order. inv: sorted position of user body i."""
    return jnp.take(
        jnp.take(acc_slots, clusters.body_slot, axis=0), inv, axis=0
    )


def g_cap_for(n: int, leaf: int, multiple: int = 1) -> int:
    """A g_cap that can never overflow: < 3*ceil(n/leaf), rounded up.
    (Production callers size g_cap to a measured scene instead; the
    equal-count fallback inside `adaptive_clusters` covers drift.)"""
    cap = 3 * ((n + leaf - 1) // leaf)
    return -(-cap // multiple) * multiple
