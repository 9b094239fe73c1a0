"""Why does measure_near report k_super ~ G2 on a UNIFORM cloud?
Inspect the per-row super-accept counts and the super stats driving them."""
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, '/root/repo')
from spacetpu.models import presets
from spacetpu.ops import tree as t

n = 1_000_000
scene = presets.fixed_cloud(n)
st = scene.state(dtype=jnp.float32)
pos, mass = jnp.asarray(st.pos), jnp.asarray(st.mass)
for cmode in ("equal",):
    gg = t._gg_for(n, "auto", 2, t.LEAF, cmode)
    _, _, clusters, stats = t._build_clustering(pos, mass, gg, t.LEAF, cmode)
    com, m_tot = stats["com"], stats["m_tot"]
    r_src, r_tgt = stats["r_src"], stats["r_tgt"]
    g2 = -(-gg // t.SUPER)
    com2, spread, rs_max, rt_max = t._super_stats(com, m_tot, r_src, r_tgt)
    possible, d2 = t._super_accept(com2, spread, rs_max, rt_max, 0.5)
    cnt = np.asarray(jnp.sum(possible, axis=1))
    print(f"{cmode}: gg={gg} G2={g2} n_clusters={int(clusters.n_clusters)}")
    print("  counts: min/med/mean/max =", cnt.min(), int(np.median(cnt)),
          f"{cnt.mean():.1f}", cnt.max())
    print("  top rows:", np.argsort(cnt)[-5:], cnt[np.argsort(cnt)[-5:]])
    sp = np.asarray(spread); rs = np.asarray(rs_max); rt = np.asarray(rt_max)
    print("  spread: med/max = %.3f/%.3f  rs_max: med/max = %.3f/%.3f  rt_max: med/max = %.3f/%.3f"
          % (np.median(sp), sp.max(), np.median(rs), rs.max(),
             np.median(rt), rt.max()))
    # which rows have huge spread/rs?
    j = np.argsort(rs)[-5:]
    print("  worst rs_max supers:", j, rs[j], "spread:", sp[j])
    # cluster-level radii
    rsc = np.asarray(r_src); mt = np.asarray(m_tot)
    print("  cluster r_src: med/max = %.3f/%.3f (real rows: %d)"
          % (np.median(rsc[mt > 0]), rsc[mt > 0].max(), int((mt > 0).sum())))
    print("  empty-cluster r_src max:", rsc[mt <= 0].max() if (mt <= 0).any() else None)
    com_np = np.asarray(com)
    print("  empty-cluster com rows (first 3):", com_np[mt <= 0][:3] if (mt <= 0).any() else None)
