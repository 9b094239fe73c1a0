"""Decompose tree2's D=1 calibrated step (the 5562 ms regression hunt).

Reproduces prof_tree2_tpu.py's exact configuration (auto-calibrated caps)
and times cumulative prefixes of _tree2_acc's pipeline, plus the
single-chip acc_tree at the same measured caps for the tax ratio.
Run detached: nohup python benches/r3_tree2_prof.py > log 2>&1 &
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax

from spacetpu.utils import benchenv

benchenv.force_platform()

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

N_TARGET = benchenv.size(1_000_000, 16_000)
BACKEND = benchenv.size("pallas", "xla")


def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    print(f"{name:40s} {(time.perf_counter() - t0) / reps * 1e3:8.1f} ms",
          flush=True)


from spacetpu.ops import tree
from spacetpu.parallel import ring, tree2
from spacetpu.state import make_state

D = 1
# far_levels=3 alignment (N=1011840, g_l=3968) — matches prof_tree2_tpu
# and keeps g_l SUPER-aligned so the hier near-list stage is exercisable
# standalone (the sim falls back to flat lists when unaligned)
N = tree2.required_n(N_TARGET, D, far_levels=3)
rng = np.random.default_rng(0)
u = rng.normal(size=(N, 3))
u /= np.linalg.norm(u, axis=-1, keepdims=True)
r = rng.uniform(0, 1, size=(N, 1)) ** (1 / 3)
state = make_state((u * r).astype(np.float32), np.zeros((N, 3), np.float32),
                   (rng.uniform(0.5, 1.5, N) / N).astype(np.float32))
mesh = ring.make_mesh(D)
sim = tree2.ShardedTreeSimulation(
    mesh, N, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
    backend=BACKEND, multipole_order=2, resort_every=8,
)
ts = sim.prime(sim.shard_state(state))
caps = sim.caps
print(f"caps: {caps}", flush=True)
pos_l = ts.state.pos
mass_l = ts.state.mass
g_l = sim.caps["g_l"]
smap = functools.partial(jax.shard_map, mesh=mesh, check_vma=False)
sp = (P(ring.AXIS), P(ring.AXIS))

kw = dict(axis=ring.AXIS, theta=0.5, k_near=caps["k_near"],
          softening="plummer", eps=1e-3, g=1.0, backend=BACKEND,
          interpret=False, multipole_order=2, far_levels=caps["far_levels"],
          halo_cap=caps["halo_cap"], near_mode=caps["near_mode"],
          near_tiles=caps["near_tiles"], near_tiles_q=caps["near_tiles_q"],
          k_super=int(sim.k_super or 0))

f_full = jax.jit(smap(lambda p, m: tree2._tree2_acc(p, m, **kw),
                      in_specs=sp, out_specs=P(ring.AXIS)))
timeit("tree2 acc (full, calibrated)", f_full, pos_l, mass_l)

# stage 1: stats + hier near lists for local targets
def s1(p, m):
    pos_g = p.reshape(g_l, tree.LEAF, 3)
    mass_g = m.reshape(g_l, tree.LEAF)
    com, m_tot, r_src, r_tgt = tree._group_stats(pos_g, mass_g)
    com_all = jax.lax.all_gather(com, ring.AXIS, tiled=True)
    m_all = jax.lax.all_gather(m_tot, ring.AXIS, tiled=True)
    rs = jax.lax.all_gather(r_src, ring.AXIS, tiled=True)
    rt = jax.lax.all_gather(r_tgt, ring.AXIS, tiled=True)
    idx, over = tree._near_lists_hier(
        com_all, m_all, rs, rt, 0.5, caps["k_near"],
        k_super=int(sim.k_super), t0=0, n_t=g_l)
    return idx

f1 = jax.jit(smap(s1, in_specs=sp, out_specs=P(ring.AXIS)))
timeit("stats + hier near lists", f1, pos_l, mass_l)

# stage 2: + halo exchange
def s2(p, m):
    pos_g = p.reshape(g_l, tree.LEAF, 3)
    mass_g = m.reshape(g_l, tree.LEAF)
    idx = s1(p, m)
    out = tree2._halo_exchange(idx, pos_g, mass_g, axis=ring.AXIS,
                               g_l=g_l, halo_cap=caps["halo_cap"])
    return out[1]

f2 = jax.jit(smap(s2, in_specs=sp, out_specs=P(ring.AXIS)))
timeit("+ halo exchange", f2, pos_l, mass_l)

# far field alone (quad cross N x G)
def s3(p, m):
    from spacetpu.ops import pallas_direct
    pos_g = p.reshape(g_l, tree.LEAF, 3)
    mass_g = m.reshape(g_l, tree.LEAF)
    com, m_tot, r_src, r_tgt = tree._group_stats(pos_g, mass_g)
    summ = tree._cluster_summaries(pos_g, mass_g, com, m_tot,
                                   jnp.float32(1.0))[:, :g_l]
    summ_all = tree2._gather_cols(summ, ring.AXIS)
    if BACKEND == "xla":  # smoke path: non-interpret pallas needs a TPU
        return pallas_direct.acc_cross_quad_xla(p, summ_all, eps=1e-3)
    return pallas_direct.acc_cross_quad(p, summ_all, eps=1e-3,
                                        interpret=False)

f3 = jax.jit(smap(s3, in_specs=sp, out_specs=P(ring.AXIS)))
timeit("far field (quad cross)", f3, pos_l, mass_l)

# single-chip reference at the same measured caps (pairs mode)
f_ref = jax.jit(lambda p, m: tree.acc_tree(
    p, m, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
    backend=BACKEND, multipole_order=2, far_levels=2,
    k_near=caps["k_near"], near_mode="pairs",
    near_tiles=caps["near_tiles"], near_tiles_q=caps["near_tiles_q"],
    k_super=int(sim.k_super)))
timeit("single-chip acc_tree (same caps)", f_ref, pos_l, mass_l)


# stage 4: + pair-segment build (cumulative on s2)
def s4(p, m):
    pos_g = p.reshape(g_l, tree.LEAF, 3)
    mass_g = m.reshape(g_l, tree.LEAF)
    idx = s1(p, m)
    idx_pool, pool_pos_g, pool_mass_g, _ = tree2._halo_exchange(
        idx, pos_g, mass_g, axis=ring.AXIS, g_l=g_l,
        halo_cap=caps["halo_cap"])
    pp = pool_pos_g.shape[0]
    pj = tree.NEAR_TILE_J // tree.BLOCK
    gg = g_l * D
    idx_q = jnp.where(idx_pool >= pp, gg, idx)
    return tree.near_pair_segments_consistent(
        idx_pool, pp, pj, caps["near_tiles"],
        idx_q, gg, tree.NEAR_QUAD_PJ, caps["near_tiles_q"])[:2]


f4 = jax.jit(smap(s4, in_specs=sp, out_specs=(P(), P())))
timeit("+ pair-segment build", f4, pos_l, mass_l)


# stage 5: + the direct pairs near call (cumulative on s4)
def s5(p, m):
    pos_g = p.reshape(g_l, tree.LEAF, 3)
    mass_g = m.reshape(g_l, tree.LEAF)
    idx = s1(p, m)
    idx_pool, pool_pos_g, pool_mass_g, _ = tree2._halo_exchange(
        idx, pos_g, mass_g, axis=ring.AXIS, g_l=g_l,
        halo_cap=caps["halo_cap"])
    pp = pool_pos_g.shape[0]
    pj = tree.NEAR_TILE_J // tree.BLOCK
    gg = g_l * D
    idx_q = jnp.where(idx_pool >= pp, gg, idx)
    flat, ttgt, ntd, flatq, ttgtq, ntq, drop = (
        tree.near_pair_segments_consistent(
            idx_pool, pp, pj, caps["near_tiles"],
            idx_q, gg, tree.NEAR_QUAD_PJ, caps["near_tiles_q"]))
    pool_com, pool_m, _, _ = tree._group_stats(pool_pos_g, pool_mass_g)
    return tree.near_pairs_correction(
        pos_g, pool_pos_g, pool_mass_g, pool_com, pool_m, flat, ttgt,
        softening="plummer", eps=1e-3, g=1.0, backend=BACKEND,
        interpret=False, monopole_pseudo=False, n_tiles=ntd)


f5 = jax.jit(smap(s5, in_specs=sp, out_specs=P(ring.AXIS)))
timeit("+ direct pairs near call", f5, pos_l, mass_l)


# single-chip near pairs call at the same tile cap, local pool (the
# apples-to-apples twin of stage 5 minus halo indirection)
def s6(p, m):
    pos_g = p.reshape(g_l * D, tree.LEAF, 3)
    mass_g = m.reshape(g_l * D, tree.LEAF)
    com, m_tot, r_src, r_tgt = tree._group_stats(pos_g, mass_g)
    idx, _ = tree._near_lists_hier(
        com, m_tot, r_src, r_tgt, 0.5, caps["k_near"],
        k_super=int(sim.k_super))
    pj = tree.NEAR_TILE_J // tree.BLOCK
    gg = g_l * D
    flat, ttgt, ntd, _, _, _, _ = tree.near_pair_segments_consistent(
        idx, gg, pj, caps["near_tiles"],
        idx, gg, tree.NEAR_QUAD_PJ, caps["near_tiles_q"])
    return tree.near_pairs_correction(
        pos_g, pos_g, mass_g, com, m_tot, flat, ttgt,
        softening="plummer", eps=1e-3, g=1.0, backend=BACKEND,
        interpret=False, monopole_pseudo=False, n_tiles=ntd)


f6 = jax.jit(s6)
timeit("single-chip near pairs (same cap)", f6, pos_l, mass_l)
print("PROF DONE", flush=True)
