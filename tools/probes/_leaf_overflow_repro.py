"""CPU repro of the leaf=127 adaptive MID-path calibration overflow
(logs/r3_leaf_sweep2.log: fixed_cloud(1M) leaf=127 k=184 overflow=203250).

Forces far_levels=3 (the MID pairs decomposition) at small N and prints
each overflow counter separately.
"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, ".")
from spacetpu.models import presets
from spacetpu.ops import tree as T

N = 120_000
scene = presets.fixed_cloud(N)
st = scene.state(dtype=jnp.float32)
pos, mass = jnp.asarray(st.pos), jnp.asarray(st.mass)

for leaf in (127, 255):
    for cmode in ("adaptive", "equal"):
        gg = T._gg_for(N, 3, 2, leaf, cmode)
        m = T.measure_near(pos, mass, theta=0.5, gg=gg, leaf=leaf,
                           cluster_mode=cmode)
        # calibrate()'s gg shrink for adaptive
        gg_run = gg
        if cmode == "adaptive":
            gg_run = -(-min(gg, int(m["n_clusters"] * 1.25) + 8) // T.SUPER) * T.SUPER
        print(f"leaf={leaf} {cmode}: gg_meas={gg} gg_run={gg_run} m={m}",
              flush=True)
        # mirror tree_prep's far3+pairs path with per-counter reporting
        perm, inv, clusters, stats = T._build_clustering(
            pos, mass, gg_run, leaf, cmode)
        g2 = gg_run // T.SUPER
        idx2, over2 = T._super_screen(
            stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
            0.5, m["k_super"])
        com_m, spread_m, rs_max_m, _ = T._super_stats(
            stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
            group=T.MID)
        m_tot_m = stats["m_tot"].reshape(-1, T.MID).sum(axis=1)
        idx_mid2, over_mid = T._mid_near_lists(
            stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
            com_m, spread_m, rs_max_m, m_tot_m, idx2, 0.5, m["k_mid"])
        idx, over_near = T._near_lists_from_mids(
            stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
            idx_mid2, 0.5, m["k_near"])
        pj = T.NEAR_TILE_J // (leaf + 1)
        flat, ttgt, ntd, flatq, ttgtq, ntq, drop = (
            T.near_pair_segments_consistent(
                idx, gg_run, pj, m["near_tiles"],
                idx, gg_run, T.NEAR_QUAD_PJ, m["near_tiles_q"]))
        print(f"  over2={int(over2)} over_mid={int(over_mid)} "
              f"over_near={int(over_near)} drop={int(drop)} "
              f"clusters.overflow={int(clusters.overflow)} "
              f"ntd={int(ntd)}/{m['near_tiles']} ntq={int(ntq)}/{m['near_tiles_q']}",
              flush=True)
        # ground truth: dense near lists at the same caps
        idx_d, over_d = T._near_lists(
            stats["com"], stats["m_tot"], stats["r_src"], stats["r_tgt"],
            0.5, m["k_near"])
        # compare coverage: every dense-near cluster must appear in idx
        a = np.asarray(idx); b = np.asarray(idx_d)
        miss = 0
        for t in range(0, gg_run, max(1, gg_run // 64)):
            sa = set(x for x in a[t] if x < gg_run)
            sb = set(x for x in b[t] if x < gg_run)
            miss += len(sb - sa)
        print(f"  dense over={int(over_d)}; sampled coverage misses={miss}",
              flush=True)
