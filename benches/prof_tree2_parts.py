"""Decompose tree2's D=1 TPU step cost."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import PartitionSpec as P

def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))

def timeit(name, fn, *args, reps=3):
    out = fn(*args); fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    print(f"{name:45s} {(time.perf_counter()-t0)/reps*1e3:8.1f} ms", flush=True)

from spacetpu.ops import tree
from spacetpu.parallel import ring, tree2, dsort
from spacetpu.state import make_state

D = 1
N = tree2.required_n(1_000_000, D, far_levels=2)
rng = np.random.default_rng(0)
u = rng.normal(size=(N, 3)); u /= np.linalg.norm(u, axis=-1, keepdims=True)
r = rng.uniform(0, 1, size=(N, 1)) ** (1 / 3)
pos = jnp.asarray(u * r, jnp.float32)
mass = jnp.asarray(rng.uniform(0.5, 1.5, N) / N, jnp.float32)
mesh = ring.make_mesh(D)
g_l = N // D // tree.LEAF
k_near = tree.default_k_near(0.5, g_l * D)

smap = functools.partial(jax.shard_map, mesh=mesh, check_vma=False)

# full acc
acc_fn = functools.partial(
    tree2._tree2_acc, axis=ring.AXIS, theta=0.5, k_near=k_near,
    softening="plummer", eps=1e-3, g=1.0, backend="pallas",
    interpret=False, multipole_order=2, far_levels=2, halo_cap=g_l // 2)
f_acc = jax.jit(smap(lambda p, m: acc_fn(p, m),
                     in_specs=(P(ring.AXIS), P(ring.AXIS)),
                     out_specs=P(ring.AXIS)))
timeit("tree2 acc (full)", f_acc, pos, mass)

# single-chip reference
f_ref = jax.jit(lambda p, m: tree.acc_tree(
    p, m, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
    backend="pallas", multipole_order=2, far_levels=2))
timeit("single-chip acc_tree", f_ref, pos, mass)

# halo exchange alone (on sorted clusters)
def halo_only(p, m):
    pos_g = p.reshape(-1, tree.LEAF, 3)
    mass_g = m.reshape(-1, tree.LEAF)
    com, m_tot, r_src, r_tgt = tree._group_stats(pos_g, mass_g)
    idx, _ = tree.near_lists(com, m_tot, r_src, r_tgt, 0.5, k_near)
    out = tree2._halo_exchange(idx, pos_g, mass_g, axis=ring.AXIS,
                               g_l=pos_g.shape[0], halo_cap=g_l // 2)
    return out[1]
f_halo = jax.jit(smap(halo_only, in_specs=(P(ring.AXIS), P(ring.AXIS)),
                      out_specs=P(ring.AXIS)))
timeit("stats + near lists + halo", f_halo, pos, mass)

# near lists alone
def nl_only(p, m):
    pos_g = p.reshape(-1, tree.LEAF, 3)
    mass_g = m.reshape(-1, tree.LEAF)
    com, m_tot, r_src, r_tgt = tree._group_stats(pos_g, mass_g)
    idx, _ = tree.near_lists(com, m_tot, r_src, r_tgt, 0.5, k_near)
    return idx
f_nl = jax.jit(smap(nl_only, in_specs=(P(ring.AXIS), P(ring.AXIS)),
                    out_specs=P(ring.AXIS)))
timeit("stats + near lists", f_nl, pos, mass)

# resort alone
ids = jnp.arange(N, dtype=jnp.int32)
def resort_only(p, m, i):
    from spacetpu.ops import morton
    lo = jax.lax.pmin(jnp.min(p, axis=0), ring.AXIS)
    hi = jax.lax.pmax(jnp.max(p, axis=0), ring.AXIS)
    keys = morton.hilbert_keys(p, lo=lo, hi=hi)
    out = dsort.bitonic_sort_sharded(keys, p, m, i, axis=ring.AXIS)
    return out[1]
f_rs = jax.jit(smap(resort_only,
                    in_specs=(P(ring.AXIS), P(ring.AXIS), P(ring.AXIS)),
                    out_specs=P(ring.AXIS)))
timeit("resort (keys + local bitonic)", f_rs, pos, mass, ids)
print("DONE", flush=True)
