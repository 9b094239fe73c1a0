"""Sharded tree v2: O(N/D) per-device memory over a 1-D device mesh.

Round 1's sharded tree all_gathered the full body arrays to every chip and
ran prep redundantly (ring.py `_tree_acc_sharded`), capping multi-chip N at
one chip's HBM. This module removes every O(N) per-device term:

- **Body order**: the sharded state itself lives in (approximately
  current) global space-filling-curve order; a distributed bitonic
  merge-exchange (`parallel/dsort.py`) re-sorts it in place every
  `resort_every` steps. An `ids` array rides along so host consumers can
  restore user order. No per-step permutation routing is needed — forces
  are produced in the same order the state is stored.
- **Clusters**: each device reshapes its local (N/D)-body shard into
  LEAF-body clusters and computes stats/multipoles locally.
- **Gathers are summaries only**: cluster COM/mass/radii (O(G) scalars)
  and multipole rows (16 x G), never bodies. Near lists are built from
  the gathered summaries with the hierarchical builder (ops/tree.py).
- **Near-field bodies move via a halo exchange**: each device derives the
  remote clusters its near lists touch, publishes per-owner request
  tables (all_gather of ids), and owners answer with the requested
  (LEAF, 4) body blocks through one all_to_all. Requests beyond the
  per-owner `halo_cap` degrade gracefully to far-field accuracy and are
  counted (`diagnose`).
- **Far field** is the same 2- or 3-level multipole pass as the
  single-chip tree (supercluster refinement strips at scale).

The reference's analogue of all of this is a single shared-memory octree
(`/root/reference/space/src/sim/barnes_hut/tree.rs:111-174`); the TPU-native
re-design splits the same physics across ICI with static shapes end to end.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spacetpu import constants
from spacetpu.ops import integrators, morton
from spacetpu.ops import tree as tree_ops
from spacetpu.parallel import dsort
from spacetpu.parallel.ring import AXIS
from spacetpu.state import State

LEAF = tree_ops.LEAF
BLOCK = tree_ops.BLOCK


class TreeShardedState(NamedTuple):
    """Sharded sim state in (approximately current) global SFC order,
    plus the original body row of every slot and a resort tick counter."""

    state: State
    ids: jax.Array  # (n,) int32, body-axis sharded
    tick: jax.Array  # scalar int32, replicated


def _state_payload(state: State):
    """The per-body arrays that must travel with a resort."""
    arrs = [state.pos, state.vel, state.mass, state.acc]
    opt = [a for a in (state.pos_c, state.vel_c) if a is not None]
    return arrs + opt


def _rebuild_state(state: State, sorted_arrs):
    it = iter(sorted_arrs)
    pos, vel, mass, acc = next(it), next(it), next(it), next(it)
    pos_c = next(it) if state.pos_c is not None else None
    vel_c = next(it) if state.vel_c is not None else None
    return state._replace(pos=pos, vel=vel, mass=mass, acc=acc,
                          pos_c=pos_c, vel_c=vel_c)


def _resort_local(state: State, ids, *, axis: str):
    """Globally re-sort the local shards by current Hilbert key (pad rows
    past n_active sort last, keyed to the max key)."""
    lo = jax.lax.pmin(jnp.min(state.pos, axis=0), axis)
    hi = jax.lax.pmax(jnp.max(state.pos, axis=0), axis)
    keys = morton.hilbert_keys(state.pos, lo=lo, hi=hi)
    if state.n_active is not None:
        keys = jnp.where(ids >= state.n_active, jnp.uint32(0xFFFFFFFF), keys)
    payload = _state_payload(state) + [ids]
    out = dsort.bitonic_sort_sharded(keys, *payload, axis=axis)
    sorted_arrs = list(out[1:])
    new_ids = sorted_arrs.pop()
    return _rebuild_state(state, sorted_arrs), new_ids


def _gather_cols(x, axis: str):
    """all_gather a (rows, G_l) array along its column axis -> (rows, G)."""
    return jax.lax.all_gather(x.T, axis, tiled=True).T


def _halo_exchange(idx_mine, pos_g, mass_g, *, axis: str, g_l: int,
                   halo_cap: int):
    """Fetch the remote near clusters' bodies.

    idx_mine: (G_l, K) GLOBAL cluster ids (null = G). Returns
    (idx_pool, pool_pos_g, pool_mass_g, overflow) with idx_pool slots into
    [local | halo | null]."""
    d = jax.lax.axis_size(axis)
    rank = jax.lax.axis_index(axis)
    base = rank * g_l
    g = d * g_l
    big = jnp.int32(2**30)

    flat = idx_mine.reshape(-1).astype(jnp.int32)
    is_local = (flat >= base) & (flat < base + g_l)
    is_null = flat >= g
    remote = jnp.where(is_local | is_null, big, flat)
    rs = jnp.sort(remote)
    uniq = jnp.concatenate(
        [jnp.ones((1,), bool), rs[1:] != rs[:-1]]
    ) & (rs < big)
    u_sorted = jnp.sort(jnp.where(uniq, rs, big))

    owner_edges = (jnp.arange(d + 1, dtype=jnp.int32) * g_l).astype(jnp.int32)
    bounds = jnp.searchsorted(u_sorted, owner_edges).astype(jnp.int32)
    starts = bounds[:-1]
    counts = bounds[1:] - starts
    j = jnp.arange(halo_cap, dtype=jnp.int32)
    pos_idx = jnp.minimum(starts[:, None] + j[None, :],
                          u_sorted.shape[0] - 1)
    valid = j[None, :] < jnp.minimum(counts, halo_cap)[:, None]
    req = jnp.where(valid, u_sorted[pos_idx], -1)  # (D, H) global ids
    overflow = jnp.sum(jnp.maximum(counts - halo_cap, 0))

    # serve: what every requester wants from ME
    req_all = jax.lax.all_gather(req, axis)  # (D requester, D owner, H)
    ids_out = jnp.take(req_all, rank, axis=1)  # (D, H)
    slot = jnp.clip(ids_out - base, 0, g_l - 1)
    ok = (ids_out >= 0).astype(pos_g.dtype)
    out_pos = pos_g[slot]  # (D, H, LEAF, 3)
    out_mass = mass_g[slot] * ok[..., None]
    payload = jnp.concatenate([out_pos, out_mass[..., None]], axis=-1)
    recv = jax.lax.all_to_all(
        payload.reshape(d * halo_cap, LEAF, 4), axis,
        split_axis=0, concat_axis=0, tiled=True,
    )  # slice [o*H:(o+1)*H] = blocks I requested from owner o, in req order

    pool_pos_g = jnp.concatenate([pos_g, recv[..., :3]], axis=0)
    pool_mass_g = jnp.concatenate([mass_g, recv[..., 3]], axis=0)

    # remap global near ids -> pool slots via a small inverse table:
    # scatter the D*H requested ids to their pool slots, then one gather
    # of the flat list from the (G+1,) table. The direct formulation —
    # searchsorted(u_sorted, flat) — is a 22-round binary-search loop of
    # G_l*K random gathers from a G_l*K table, measured as the dominant
    # cost of the D=1 step (logs/r4w1_r3_tree2_prof.log: the segment-
    # build prefix is 354 ms of the 774 ms step; the same build in pure
    # global id space costs ~60 ms).
    p = g_l + d * halo_cap  # null slot
    slot_ids = g_l + jnp.arange(d * halo_cap, dtype=jnp.int32)
    table = jnp.full((g + 1,), jnp.int32(p))
    table = table.at[jnp.where(req.reshape(-1) >= 0,
                               req.reshape(-1), g)].set(slot_ids)
    table = table.at[g].set(p)  # null id stays null even if requested
    idx_pool = jnp.where(
        is_local, flat - base,
        table[jnp.minimum(flat, g)],
    )
    return (idx_pool.reshape(idx_mine.shape).astype(jnp.int32),
            pool_pos_g, pool_mass_g, overflow)


def _tree2_acc(pos_l, mass_l, *, axis: str, theta: float, k_near: int,
               softening: str, eps: float, g: float, backend: str,
               interpret, multipole_order: int, far_levels: int,
               halo_cap: int, near_mode: str = "strip",
               near_tiles: int = 0, near_tiles_q: int = 0,
               k_super: int = 0, k_mid: int = 0,
               m1_src_tiles: int | None = None,
               m2_src_tiles: int | None = None,
               with_diag: bool = False):
    """Per-device tree force for a globally SFC-sorted body shard.

    Runs inside shard_map; pos_l/mass_l are the local (G_l*LEAF,) shards.
    Everything gathered is O(G) cluster summaries; bodies move only
    through the halo exchange."""
    from spacetpu.ops import pallas_direct

    m = pos_l.shape[0]
    g_l = m // LEAF
    rank = jax.lax.axis_index(axis)
    base = rank * g_l
    dtype = pos_l.dtype
    g_arr = jnp.asarray(g, dtype)

    pos_g = pos_l.reshape(g_l, LEAF, 3)
    mass_g = mass_l.reshape(g_l, LEAF)
    com, m_tot, r_src, r_tgt = tree_ops._group_stats(pos_g, mass_g)

    com_all = jax.lax.all_gather(com, axis, tiled=True)  # (G, 3)
    m_all = jax.lax.all_gather(m_tot, axis, tiled=True)
    rs_all = jax.lax.all_gather(r_src, axis, tiled=True)
    rt_all = jax.lax.all_gather(r_tgt, axis, tiled=True)
    gg = com_all.shape[0]

    if multipole_order == 2:
        # _cluster_summaries appends a null column — drop it pre-gather or
        # the per-device nulls would interleave and shift global indices
        summ_l = tree_ops._cluster_summaries(
            pos_g, mass_g, com, m_tot, g_arr
        )[:, :g_l]
        summ_all = _gather_cols(summ_l, axis)  # (16, G)

    # Near lists for the LOCAL target clusters only (round 2 built them
    # for ALL G targets redundantly on every device — O(G·K) wasted work;
    # the halo requests are derivable from the local lists alone, and
    # owners answer requests without needing the requesters' lists).
    mid_pairs = far_levels == 3 and near_mode == "pairs"
    if far_levels == 3:
        s2 = base // tree_ops.SUPER
        n2 = g_l // tree_ops.SUPER
        idx2_mine, over2 = tree_ops._super_screen(
            com_all, m_all, rs_all, rt_all, theta,
            k_super or tree_ops.default_k_super(theta, gg // tree_ops.SUPER),
            s0=s2, n2=n2,
        )
        if mid_pairs:
            # MID decomposition, sharded: near supers decompose into MID
            # multipoles (M1) and only near MIDs into cluster multipoles
            # (M2), with the cluster near lists drawn from the near-mid
            # pool — identical physics to the single-chip tree_prep MID
            # path (ops/tree.py), target-sliced to the local block. This
            # replaces the per-device strip refine table, whose
            # (16, G2*K2*SUPER) layout-padded buffer OOMs at large G.
            com_m, spread_m, rs_max_m, _ = tree_ops._super_stats(
                com_all, m_all, rs_all, rt_all, group=tree_ops.MID
            )
            m_tot_m = jnp.sum(
                jnp.reshape(m_all, (-1, tree_ops.MID)), axis=1
            )
            km = k_mid or tree_ops.default_k_mid(
                theta, gg // tree_ops.MID
            )
            idx_mid2_mine, over_mid = tree_ops._mid_near_lists(
                com_all, m_all, rs_all, rt_all, com_m, spread_m,
                rs_max_m, m_tot_m, idx2_mine, theta, km,
                t0=base, n_t=g_l,
            )
            idx_mine, over_near = tree_ops._near_lists_from_mids(
                com_all, m_all, rs_all, rt_all, idx_mid2_mine, theta,
                k_near, t0=base, n_t=g_l,
            )
            over_near = (over_near + over_mid * tree_ops.SUPER
                         + over2 * tree_ops.SUPER)
        else:
            idx_mine, over_near = tree_ops._near_lists_hier(
                com_all, m_all, rs_all, rt_all, theta, k_near,
                idx2=idx2_mine, t0=base, n_t=g_l,
            )
            over_near = over_near + over2 * tree_ops.SUPER
    else:
        hier = (gg > tree_ops.HIER_NEAR_CUTOFF
                and g_l % tree_ops.SUPER == 0
                and gg % tree_ops.SUPER == 0)
        if hier:
            idx_mine, over_near = tree_ops._near_lists_hier(
                com_all, m_all, rs_all, rt_all, theta, min(k_near, gg),
                k_super=k_super or None, t0=base, n_t=g_l,
            )
        else:
            idx_mine, over_near = tree_ops._near_lists(
                com_all, m_all, rs_all, rt_all, theta, min(k_near, gg),
                t0=base, n_t=g_l,
            )

    # Issue the halo exchange BEFORE the far field: its all_gather +
    # all_to_all have no data dependency on the far pass, so XLA can
    # overlap the collectives with the dense multipole compute.
    idx_pool, pool_pos_g, pool_mass_g, over_halo = _halo_exchange(
        idx_mine, pos_g, mass_g, axis=axis, g_l=g_l, halo_cap=halo_cap,
    )

    # far field (targets = local bodies; sources = gathered summaries)
    over_far = jnp.zeros((), jnp.int32)
    if far_levels == 3:
        super_summ = tree_ops._super_multipoles(summ_all)
        acc = tree_ops._superfar_dense_masked(
            pos_l, super_summ, idx2_mine, eps=eps, backend=backend,
            interpret=interpret,
        ).reshape(m, 3)
        if mid_pairs:
            # shared with the single-chip build — see tree.py
            # mid_pair_segments/mid_far_eval (the index/null-id logic
            # must not drift between the two paths)
            summ_null = jnp.concatenate(
                [summ_all, jnp.zeros((16, 1), dtype)], axis=1
            )
            segs, over_far = tree_ops.mid_pair_segments(
                idx2_mine, idx_mid2_mine, gg,
                m1_src_tiles=m1_src_tiles, m2_src_tiles=m2_src_tiles,
            )
            acc = acc + tree_ops.mid_far_eval(
                pos_g, summ_null, segs, eps=eps, backend=backend,
                interpret=interpret,
            )
        else:
            strips_mine = tree_ops._superfar_refine_table(
                summ_all, super_summ, idx2_mine
            )
            if backend == "pallas":
                acc = acc + tree_ops._superfar_refine_pallas(
                    tree_ops._pack_targets(pos_g), strips_mine,
                    eps=float(eps), interpret=bool(interpret),
                )
            else:
                acc = acc + tree_ops._superfar_refine_xla(
                    pos_g, strips_mine, eps=eps
                )
    elif multipole_order == 2:
        if backend == "pallas":
            acc = pallas_direct.acc_cross_quad(
                pos_l, summ_all, eps=eps, interpret=interpret
            )
        else:
            acc = pallas_direct.acc_cross_quad_xla(pos_l, summ_all, eps=eps)
    elif backend == "pallas":
        acc = pallas_direct.acc_cross_pallas(
            pos_l, com_all, m_all, softening=softening, eps=eps, g=g,
            interpret=interpret,
        )
    else:
        from spacetpu.ops import direct

        acc = direct.acc_cross(
            pos_l, com_all, m_all, softening=softening, eps=eps, g=g
        )

    # near correction through the halo pool (exchanged above). The pool
    # is [local | halo]: the local prefix's stats are already in
    # com/m_tot, so only the halo rows need the reduction.
    halo_com, halo_m, _, _ = tree_ops._group_stats(
        pool_pos_g[g_l:], pool_mass_g[g_l:]
    )
    pool_com = jnp.concatenate([com, halo_com], axis=0)
    pool_m = jnp.concatenate([m_tot, halo_m], axis=0)
    over_tiles = over_far
    monopole_pseudo = multipole_order == 1
    if near_mode == "pairs":
        # pair-tile near phase (cost ~ the device's ACTUAL near-pair
        # count; see ops/tree.py pair-list section). The caps are static
        # and identical on every device under SPMD — size them with
        # measure_near(n_shards=D)'s worst-shard totals. The direct list
        # lives in halo-pool slots, the quad list in global cluster ids;
        # halo-dropped clusters are nulled in BOTH (a cluster present in
        # only one list would leave a force hole worse than far-field
        # fallback), and the consistent builder drops whole targets that
        # fit neither cap.
        p = pool_pos_g.shape[0]
        pj = tree_ops.NEAR_TILE_J // BLOCK
        idx_q = jnp.where(idx_pool >= p, gg, idx_mine)
        flat, ttgt, ntd, flatq, ttgtq, ntq, drop = (
            tree_ops.near_pair_segments_consistent(
                idx_pool, p, pj, near_tiles,
                idx_q, gg, tree_ops.NEAR_QUAD_PJ, near_tiles_q,
            )
        )
        over_tiles = over_tiles + drop
        corr = tree_ops.near_pairs_correction(
            pos_g, pool_pos_g, pool_mass_g, pool_com, pool_m,
            flat, ttgt, softening=softening, eps=eps, g=g,
            backend=backend, interpret=interpret,
            monopole_pseudo=monopole_pseudo, n_tiles=ntd,
        ).reshape(m, 3)
        if multipole_order == 2:
            summ_null = jnp.concatenate(
                [summ_all, jnp.zeros((16, 1), dtype)], axis=1
            )
            corr = corr + tree_ops.near_pairs_multipole_subtraction(
                pos_g, summ_null, flatq, ttgtq, eps=eps,
                backend=backend, interpret=interpret, n_tiles=ntq,
            ).reshape(m, 3)
    else:
        corr = tree_ops.near_direct_correction(
            pos_g, idx_pool, pool_pos_g, pool_mass_g, pool_com, pool_m,
            softening=softening, eps=eps, g=g, backend=backend,
            interpret=interpret, monopole_pseudo=monopole_pseudo,
        )
        if multipole_order == 2:
            summ_null = jnp.concatenate(
                [summ_all, jnp.zeros((16, 1), dtype)], axis=1
            )
            # null the halo-dropped clusters here too: the direct pass
            # skipped them, so subtracting their multipole would leave a
            # force hole instead of far-field fallback
            p = pool_pos_g.shape[0]
            idx_sub = jnp.where(idx_pool >= p, gg, idx_mine)
            corr = corr + tree_ops.near_multipole_subtraction(
                pos_g, summ_null, idx_sub, eps=eps, backend=backend,
                interpret=interpret,
            )
    acc = acc.reshape(m, 3) + corr.reshape(m, 3)
    if with_diag:
        # halo ids dropped by the cap degrade those clusters to far-field
        # accuracy; psum so every device reports the global counts (each
        # device now counts only its OWN target clusters' overflows)
        return acc, {
            "near_overflow": jax.lax.psum(over_near, axis),
            "halo_overflow": jax.lax.psum(over_halo, axis),
            "tile_overflow": jax.lax.psum(over_tiles, axis),
        }
    return acc


def required_n(n: int, n_devices: int, far_levels=3) -> int:
    """Round N up so shards split into whole clusters (and whole
    superclusters when the 3-level far field engages). Pass the result to
    make_state(pad_to=...)."""
    unit = n_devices * LEAF * (tree_ops.SUPER if far_levels == 3 else 1)
    return -(-n // unit) * unit


@dataclasses.dataclass
class ShardedTreeSimulation:
    """Tree-solver N-body simulation with O(N/D) per-device memory.

    The state lives in global SFC order (see module docstring); use
    shard_state() to place + sort an initial State and user_order() to
    bring results back. step/run/prime operate on TreeShardedState and are
    jitted with donation."""

    mesh: Mesh
    n: int
    theta: float = constants.BARNES_HUT_THETA
    k_near: Optional[int] = None
    softening: str = "plummer"
    eps: Optional[float] = None
    g: float = constants.G
    integrator: str = "leapfrog"
    backend: str = "auto"
    multipole_order: object = "auto"
    far_levels: object = "auto"
    halo_cap: Optional[int] = None
    #: near-phase kernel: "pairs" (tile list sized to the actual near-pair
    #: count; the auto default, mirroring the single-chip policy) or
    #: "strip" (static per-cluster cap). Pairs caps default to the worst
    #: case (= strip cost); pass measured near_tiles/near_tiles_q from
    #: tree.measure_near(n_shards=D)'s *_shard values for the real win.
    near_mode: str = "auto"
    near_tiles: Optional[int] = None
    near_tiles_q: Optional[int] = None
    #: supercluster-screen cap (None = geometric default; pass
    #: measure_near()'s "k_super" — the default silently truncates once
    #: G2 outgrows it, under-covering the near lists)
    k_super: Optional[int] = None
    #: MID far-field caps (far_levels=3 + pairs): per-super union
    #: near-MID cap and the worst shard's M1/M2 strip-tile totals
    #: (measure_near "k_mid" / "m1_src_tiles_shard" / "m2_src_tiles_shard";
    #: None = geometric default / static worst case)
    k_mid: Optional[int] = None
    m1_src_tiles: Optional[int] = None
    m2_src_tiles: Optional[int] = None
    #: re-sort the state globally every this many steps (the SFC order
    #: degrades slowly; near lists are rebuilt every step regardless)
    resort_every: int = 16
    #: max device-side scan length per run() call (None = auto, the
    #: scan x dense-near-list TPU fence — see spacetpu.sim.SAFE_DENSE_SCAN)
    run_chunk: Optional[int] = None
    interpret: Optional[bool] = None

    def __post_init__(self):
        d = self.mesh.devices.size
        if d & (d - 1):
            raise ValueError(f"mesh size must be a power of 2, got {d}")
        if self.n % (d * LEAF):
            raise ValueError(
                f"N={self.n} must be a multiple of D*LEAF={d * LEAF}; pad "
                f"with make_state(pad_to=tree2.required_n(n, {d}))"
            )
        self._d = d
        self._g_l = self.n // d // LEAF
        order = self.multipole_order
        if order == "auto":
            order = 2 if self.softening == "plummer" else 1
        self._order = int(order)
        gg = self._g_l * d
        fl = self.far_levels
        if fl == "auto":
            fl = 3 if (self._order == 2 and gg >= tree_ops.FAR3_CUTOFF) else 2
        self._far_levels = int(fl)
        if self._far_levels == 3 and self._g_l % tree_ops.SUPER:
            raise ValueError(
                f"far_levels=3 needs per-device clusters ({self._g_l}) "
                f"divisible by SUPER={tree_ops.SUPER}; pad N to "
                f"required_n(n, {d})"
            )
        eps = self.eps
        if eps is None:
            eps = constants.COLLISION_EPSILON if self.softening == "ref" else 0.0
        self._eps = float(eps)
        backend = self.backend
        if backend == "auto":
            backend = ("pallas" if jax.devices()[0].platform == "tpu"
                       else "xla")
        self._backend = backend
        interpret = self.interpret
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        self._interpret = bool(interpret)
        # k_near=None auto-calibrates at prime() time (measure_near with
        # n_shards=D), exactly like the single-chip Simulation — the
        # geometric default overflows on any clustered mass distribution
        # and the static caps below want the worst SHARD's measured totals.
        self._needs_calibration = self.k_near is None
        k = self.k_near
        if k is None:
            k = tree_ops.default_k_near(self.theta, gg)
        self._k_near = int(k)
        h = self.halo_cap
        if h is None:
            h = max(64, self._g_l // 2)
        self._halo_cap = int(min(h, self._g_l))
        # pairs on the Pallas/TPU path only (the XLA tile-list fallback's
        # lax.map compile degenerates at large G on CPU)
        self._near_mode = (
            ("pairs" if backend == "pallas" else "strip")
            if self.near_mode == "auto" else self.near_mode
        )
        if self._near_mode not in ("pairs", "strip"):
            raise ValueError(f"unknown near_mode {self.near_mode!r}")
        pj = tree_ops.NEAR_TILE_J // BLOCK
        self._near_tiles = int(
            self.near_tiles
            if self.near_tiles is not None
            else self._g_l * max(-(-self._k_near // pj), 1)
        )
        self._near_tiles_q = int(
            self.near_tiles_q
            if self.near_tiles_q is not None
            else self._g_l * max(-(-self._k_near // tree_ops.NEAR_QUAD_PJ), 1)
        )
        self._stepper = integrators.get_stepper(self.integrator)

        acc_fn = functools.partial(
            _tree2_acc, axis=AXIS, theta=self.theta, k_near=self._k_near,
            softening=self.softening, eps=self._eps, g=self.g,
            backend=self._backend, interpret=self._interpret,
            multipole_order=self._order, far_levels=self._far_levels,
            halo_cap=self._halo_cap, near_mode=self._near_mode,
            near_tiles=self._near_tiles, near_tiles_q=self._near_tiles_q,
            k_super=int(self.k_super or 0), k_mid=int(self.k_mid or 0),
            m1_src_tiles=self.m1_src_tiles, m2_src_tiles=self.m2_src_tiles,
        )
        r = self.resort_every

        def local_step(ts: TreeShardedState, dt) -> TreeShardedState:
            state, ids = ts.state, ts.ids

            def do_sort(args):
                return _resort_local(args[0], args[1], axis=AXIS)

            state, ids = jax.lax.cond(
                ts.tick % r == 0, do_sort, lambda args: args, (state, ids)
            )
            state = self._stepper(state, dt, lambda p, m: acc_fn(p, m))
            return TreeShardedState(state, ids, ts.tick + 1)

        def local_prime(ts: TreeShardedState) -> TreeShardedState:
            state, ids = _resort_local(ts.state, ts.ids, axis=AXIS)
            state = integrators.prime(state, lambda p, m: acc_fn(p, m))
            return TreeShardedState(state, ids, jnp.ones((), jnp.int32))

        def local_run(ts: TreeShardedState, dt, steps: int):
            def body(t, _):
                return local_step(t, dt), None

            ts, _ = jax.lax.scan(body, ts, None, length=steps)
            return ts

        def local_diag(ts: TreeShardedState):
            _, diag = acc_fn(ts.state.pos, ts.state.mass, with_diag=True)
            return diag

        smap = functools.partial(jax.shard_map, mesh=self.mesh,
                                 check_vma=False)

        def ts_specs(ts: TreeShardedState):
            st = ts.state
            sp = State(
                pos=P(AXIS), vel=P(AXIS), mass=P(AXIS), acc=P(AXIS),
                pos_c=None if st.pos_c is None else P(AXIS),
                vel_c=None if st.vel_c is None else P(AXIS),
                time=None if st.time is None else P(),
                n_active=None if st.n_active is None else P(),
            )
            return TreeShardedState(sp, P(AXIS), P())

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(ts, dt):
            sp = ts_specs(ts)
            return smap(local_step, in_specs=(sp, P()), out_specs=sp)(ts, dt)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def prime(ts):
            sp = ts_specs(ts)
            return smap(local_prime, in_specs=(sp,), out_specs=sp)(ts)

        @functools.partial(jax.jit, static_argnames=("steps",),
                           donate_argnums=(0,))
        def run(ts, dt, steps):
            sp = ts_specs(ts)
            return smap(
                functools.partial(local_run, steps=steps),
                in_specs=(sp, P()), out_specs=sp,
            )(ts, dt)

        @jax.jit
        def diagnose(ts):
            sp = ts_specs(ts)
            return smap(local_diag, in_specs=(sp,), out_specs={
                "near_overflow": P(), "halo_overflow": P(),
                "tile_overflow": P(),
            })(ts)

        self.step = step
        self._prime_jit = prime
        self._run_jit = run
        self._diagnose = diagnose

    # --- host-side helpers -------------------------------------------------

    def calibrate(self, ts_or_state):
        """Measure the scene's near-list shape once (tree.measure_near with
        n_shards=D) and rebuild the jitted closures with the measured caps:
        k_near, k_super, and the worst shard's pair-tile capacities — the
        multi-chip analogue of Simulation.calibrate. prime() runs this
        automatically when k_near was not given; call it manually (with the
        current TreeShardedState or an unsharded State) to re-calibrate
        after the scene evolves."""
        state = getattr(ts_or_state, "state", ts_or_state)
        m = tree_ops.measure_near(
            state.pos, state.mass, theta=self.theta,
            gg=self._d * self._g_l, leaf=LEAF, cluster_mode="equal",
            n_shards=self._d,
            measure_mid=(self._far_levels == 3
                         and self._near_mode == "pairs"),
        )
        self.k_near = m["k_near"]
        self.k_super = m["k_super"]
        self.near_tiles = m["near_tiles_shard"]
        self.near_tiles_q = m["near_tiles_q_shard"]
        self.k_mid = m.get("k_mid")
        self.m1_src_tiles = m.get("m1_src_tiles_shard")
        self.m2_src_tiles = m.get("m2_src_tiles_shard")
        self.__post_init__()  # rebuild the closures with the measured caps

    @property
    def caps(self) -> dict:
        """Measured/derived static-shape caps (read-only snapshot) — the
        public way for benches/telemetry to report the sharded solver's
        calibration (mirrors Simulation.caps)."""
        return {
            "k_near": self._k_near,
            "k_super": self.k_super,
            "near_tiles": self._near_tiles,
            "near_tiles_q": self._near_tiles_q,
            "halo_cap": self._halo_cap,
            "far_levels": self._far_levels,
            "near_mode": self._near_mode,
            "g_l": self._g_l,
        }

    def prime(self, ts: TreeShardedState) -> TreeShardedState:
        if self._needs_calibration:
            self.calibrate(ts)
        return self._prime_jit(ts)

    def scan_chunk(self) -> Optional[int]:
        """Max device-scan length per run() call (None = unlimited); the
        same fence policy as Simulation.scan_chunk."""
        from spacetpu import sim as sim_mod

        if self.run_chunk:
            return self.run_chunk
        if self._backend != "pallas":
            return None
        if self._k_near > sim_mod.DENSE_K_NEAR:
            # per-device near work drives the fault; above the single-step
            # threshold only plain step() dispatches are proven safe
            if self._near_tiles > sim_mod.DENSE_TILES_SINGLE_STEP:
                return 1
            return sim_mod.SAFE_DENSE_SCAN
        return sim_mod.DEFAULT_RUN_CHUNK

    def run(self, ts: TreeShardedState, dt, steps: int) -> TreeShardedState:
        """Rollout in device scans of at most scan_chunk() steps (state
        donated through every chunk)."""
        chunk = self.scan_chunk()
        if chunk is None or (chunk >= steps and chunk > 1):
            return self._run_jit(ts, dt, steps)
        done = 0
        while done < steps:
            todo = min(chunk, steps - done)
            # chunk==1: dispatch the plain step program, the one form the
            # isolation matrix proved always safe (sim.py "Known issue")
            ts = (self.step(ts, dt) if todo == 1
                  else self._run_jit(ts, dt, todo))
            done += todo
        return ts

    def shard_state(self, state: State) -> TreeShardedState:
        """Place a State on the mesh (body axis sharded) with an identity
        ids array; prime() performs the first global sort."""
        if state.n != self.n:
            raise ValueError(f"state has {state.n} bodies, expected {self.n}")

        def put(leaf, spec):
            if leaf is None:
                return None
            # copy before placing: device_put may alias the input buffer
            # (replicated leaves / matching placements), and prime()'s
            # donation would then delete the caller's array out from under
            # them (one extra copy, once per run)
            if isinstance(leaf, jax.Array):
                leaf = jnp.copy(leaf)
            return jax.device_put(leaf, NamedSharding(self.mesh, spec))

        st = State(
            pos=put(state.pos, P(AXIS)), vel=put(state.vel, P(AXIS)),
            mass=put(state.mass, P(AXIS)), acc=put(state.acc, P(AXIS)),
            pos_c=put(state.pos_c, P(AXIS)), vel_c=put(state.vel_c, P(AXIS)),
            time=put(state.time, P()), n_active=put(state.n_active, P()),
        )
        ids = put(jnp.arange(self.n, dtype=jnp.int32), P(AXIS))
        return TreeShardedState(st, ids, put(jnp.zeros((), jnp.int32), P()))

    def user_order(self, ts: TreeShardedState) -> State:
        """Restore the original body order (host-side gather; for
        checkpoints, rendering snapshots, and tests)."""
        import numpy as np

        ids = np.asarray(ts.ids)
        inv = np.empty_like(ids)
        inv[ids] = np.arange(len(ids), dtype=ids.dtype)

        def unsort(a):
            if a is None:
                return None
            arr = np.asarray(a)
            return jnp.asarray(arr[inv]) if arr.ndim and len(arr) == len(ids) else a

        st = ts.state
        return st._replace(
            pos=unsort(st.pos), vel=unsort(st.vel), mass=unsort(st.mass),
            acc=unsort(st.acc), pos_c=unsort(st.pos_c),
            vel_c=unsort(st.vel_c),
        )

    def diagnose(self, ts: TreeShardedState) -> dict:
        """Overflow telemetry: near-list truncations (per-device count of
        the shared global build) and halo-cap drops (global sum)."""
        d = self._diagnose(ts)
        return {k: int(v) for k, v in d.items()}

    def maybe_recalibrate(self, ts: TreeShardedState, *,
                          frac: float = 0.02) -> bool:
        """Multi-chip analogue of Simulation.maybe_recalibrate: when the
        overflow telemetry exceeds `frac` of the global cluster count,
        re-measure the evolved scene and rebuild the jitted closures
        (calibrate -> __post_init__) with the new worst-shard caps.
        Returns True when a re-calibration ran (one re-compile)."""
        d = self.diagnose(ts)
        total = (d.get("near_overflow", 0) + d.get("halo_overflow", 0)
                 + d.get("tile_overflow", 0))
        if total <= frac * self._d * self._g_l:
            return False
        self.calibrate(ts)
        return True
