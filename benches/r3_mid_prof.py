"""Phase profile of the MID-hierarchy far3 step at fixed_cloud(4M).

The mid hierarchy cut far-field evals ~4x but the full step REGRESSED
(2926 -> 6304 ms): this decomposes tree_prep (screens, near lists, M1/M2
segment builds) vs tree_eval (dense + M1 + M2 + near) to find where the
time went. Run detached:
  nohup python benches/r3_mid_prof.py > logs/r3_mid_prof.log 2>&1 &
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spacetpu.models import presets
from spacetpu.ops import tree


def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    print(f"{name:42s} {(time.perf_counter() - t0) / reps * 1e3:8.1f} ms",
          flush=True)
    return out


N = 4_000_000
scene = presets.fixed_cloud(N)
state = scene.state(dtype=jnp.float32)
pos = jnp.asarray(state.pos)
mass = jnp.asarray(state.mass)
gg = tree._gg_for(N, "auto", 2)
m = tree.measure_near(pos, mass, theta=0.5, gg=gg)
print("caps:", {k: v for k, v in m.items()}, flush=True)
kw = dict(theta=0.5, k_near=m["k_near"], gg=gg, far_levels=3,
          near_mode="pairs", k_super=m["k_super"], k_mid=m["k_mid"],
          near_tiles=m["near_tiles"], near_tiles_q=m["near_tiles_q"])

prep_f = jax.jit(lambda p, q: tree.tree_prep(p, q, **kw))
prep = timeit("tree_prep (full)", prep_f, pos, mass)

# prep sub-stages
def s_sort(p, q):
    perm, inv, clusters, stats = tree._build_clustering(p, q, gg, tree.LEAF,
                                                        "equal")
    return stats["com"]

timeit("  clustering + stats", jax.jit(s_sort), pos, mass)

def s_screens(p, q):
    _, _, _, st = tree._build_clustering(p, q, gg, tree.LEAF, "equal")
    idx2, _ = tree._super_screen(st["com"], st["m_tot"], st["r_src"],
                                 st["r_tgt"], 0.5, m["k_super"])
    com_m, spread_m, rs_max_m, _ = tree._super_stats(
        st["com"], st["m_tot"], st["r_src"], st["r_tgt"], group=tree.MID)
    m_tot_m = st["m_tot"].reshape(-1, tree.MID).sum(axis=1)
    idx_mid2, _ = tree._mid_near_lists(
        st["com"], st["m_tot"], st["r_src"], st["r_tgt"],
        com_m, spread_m, rs_max_m, m_tot_m, idx2, 0.5, m["k_mid"])
    return idx2, idx_mid2, st

def s_screens_only(p, q):
    return s_screens(p, q)[1]

timeit("  + super screen + mid lists", jax.jit(s_screens_only), pos, mass)

def s_nearlists(p, q):
    idx2, idx_mid2, st = s_screens(p, q)
    idx, _ = tree._near_lists_from_mids(
        st["com"], st["m_tot"], st["r_src"], st["r_tgt"], idx_mid2, 0.5,
        m["k_near"])
    return idx

timeit("  + cluster near lists", jax.jit(s_nearlists), pos, mass)

def s_m1build(p, q):
    idx2, idx_mid2, st = s_screens(p, q)
    m1_ids = tree._m1_lists(idx2, idx_mid2, gg)
    return tree.shared_pair_segments(m1_ids, gg // tree.MID)[0]

timeit("  + m1 lists + segments", jax.jit(s_m1build), pos, mass)

def s_m2build(p, q):
    idx2, idx_mid2, st = s_screens(p, q)
    m2_ids = jnp.minimum(
        idx_mid2[:, :, None] * tree.MID
        + jnp.arange(tree.MID, dtype=jnp.int32)[None, None, :], gg
    ).reshape(idx_mid2.shape[0], -1)
    return tree.shared_pair_segments(m2_ids, gg)[0]

timeit("  + m2 segments", jax.jit(s_m2build), pos, mass)

def s_nearseg(p, q):
    idx = s_nearlists(p, q)
    pj = tree.NEAR_TILE_J // tree.BLOCK
    return tree.near_pair_segments_consistent(
        idx, gg, pj, m["near_tiles"], idx, gg, tree.NEAR_QUAD_PJ,
        m["near_tiles_q"])[0]

timeit("  + near segments (consistent)", jax.jit(s_nearseg), pos, mass)

# eval with a fixed prep (cached-structure analogue)
eval_f = jax.jit(lambda pr: tree.tree_eval(
    pr, 0, gg, softening="plummer", eps=1e-2, g=1.0, backend="pallas",
    interpret=False, multipole_order=2, far_levels=3, near_mode="pairs"))
timeit("tree_eval (full, cached prep)", eval_f, prep)

# eval sub-passes
summ_f = jax.jit(lambda pr: tree._cluster_summaries(
    pr["pos_g"], pr["mass_g"], pr["com"], pr["m_tot"], jnp.float32(1.0)))
summaries = timeit("  cluster summaries", summ_f, prep)

def e_dense(pr, summ):
    super_summ = tree._super_multipoles(summ[:, :gg])
    idx2_t = pr["idx2"]
    targets = pr["pos_g"].reshape(gg * tree.LEAF, 3)
    return tree._superfar_dense_masked(targets, super_summ, idx2_t,
                                       eps=1e-2, backend="pallas",
                                       interpret=False)

timeit("  dense super pass", jax.jit(e_dense), prep, summaries)

def e_m1(pr, summ):
    mid_summ = tree._super_multipoles(summ[:, :gg], group=tree.MID)
    mid_ext = jnp.concatenate([mid_summ, jnp.zeros((16, 1), jnp.float32)],
                              axis=1)
    return tree._near_pairs_quad_pallas(
        pr["pos_g"], mid_ext, pr["m1_flat"], pr["m1_tgt"], eps=1e-2,
        interpret=False, n_tiles=pr["m1_ntiles"], tile_src=pr["m1_src"])

timeit("  M1 mid pass", jax.jit(e_m1), prep, summaries)

def e_m2(pr, summ):
    return tree._near_pairs_quad_pallas(
        pr["pos_g"], summ, pr["m2_flat"], pr["m2_tgt"], eps=1e-2,
        interpret=False, n_tiles=pr["m2_ntiles"], tile_src=pr["m2_src"])

timeit("  M2 cluster pass", jax.jit(e_m2), prep, summaries)

def e_near(pr):
    return tree.near_pairs_correction(
        pr["pos_g"], pr["pos_g"], pr["mass_g"], pr["com"], pr["m_tot"],
        pr["near_flat"], pr["near_tile_tgt"], softening="plummer",
        eps=1e-2, g=1.0, backend="pallas", interpret=False,
        monopole_pseudo=False, n_tiles=pr["near_ntiles"])

timeit("  near direct pass", jax.jit(e_near), prep)

def e_nearq(pr, summ):
    return tree.near_pairs_multipole_subtraction(
        pr["pos_g"], summ, pr["nearq_flat"], pr["nearq_tile_tgt"],
        eps=1e-2, backend="pallas", interpret=False,
        n_tiles=pr["nearq_ntiles"])

timeit("  near quad subtraction", jax.jit(e_nearq), prep, summaries)
print("MID PROF DONE", flush=True)
