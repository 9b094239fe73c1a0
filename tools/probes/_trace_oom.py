"""Reproduce the 8M adaptive compile-OOM abstractly: lower the jitted
step with the chip-measured calibration (logs/r3_largen.log) and grep the
StableHLO for the 29 GB intermediate (f32[57253888,16])."""
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import sys
sys.path.insert(0, '/root/repo')
from spacetpu import make_simulation
from spacetpu.sim import _build_acc_fn
from spacetpu.state import State  # noqa: F401  (maybe different path)

n = 8_000_000
sim = make_simulation(n, algorithm="tree", theta=0.5, k_near="auto",
                      cluster_mode="adaptive", near_mode="pairs",
                      backend="pallas")
from spacetpu.ops import tree as tree_ops
# chip-measured (r3_largen.log, fixed_cloud 8M adaptive):
m = dict(k_near=152, near_tiles=549304, near_tiles_q=117688,
         n_clusters=49322, k_super=925)
sim._cluster_mode = "adaptive"
sim._k_near = m["k_near"]
sim._near_tiles = m["near_tiles"]
sim._near_tiles_q = m["near_tiles_q"]
sim._k_super = m["k_super"]
sim._k_mid = None
gg_meas = min(94144, int(m["n_clusters"] * 1.25) + 8)
sim._gg = -(-gg_meas // tree_ops.SUPER) * tree_ops.SUPER
print("gg =", sim._gg, "G2 =", sim._gg // tree_ops.SUPER, flush=True)
sim.acc_fn = _build_acc_fn(
    sim.config, sim._k_near, gg=sim._gg, near_tiles=sim._near_tiles,
    near_tiles_q=sim._near_tiles_q, cluster_mode="adaptive",
    k_super=sim._k_super, k_mid=sim._k_mid,
)
sim._needs_calibration = False

from spacetpu.state import State

f32 = jnp.float32
st = State(
    pos=jax.ShapeDtypeStruct((n, 3), f32),
    vel=jax.ShapeDtypeStruct((n, 3), f32),
    mass=jax.ShapeDtypeStruct((n,), f32),
    acc=jax.ShapeDtypeStruct((n, 3), f32),
    time=jax.ShapeDtypeStruct((), f32),
    n_active=jax.ShapeDtypeStruct((), jnp.int32),
)
print("lowering step...", flush=True)
low = jax.jit(sim._step).lower(st, 10.0)
txt = low.as_text()
print("HLO chars:", len(txt), flush=True)
import re
big = {}
for m_ in re.finditer(r"tensor<([0-9x]+)xf32>", txt):
    dims = [int(d) for d in m_.group(1).split("x")]
    sz = 1
    for d in dims:
        sz *= d
    if sz >= 3_000_000:
        big[m_.group(1)] = big.get(m_.group(1), 0) + 1
for k in sorted(big, key=lambda k: -int(k.split("x")[0])):
    print(f"  f32[{k}] x{big[k]}", flush=True)
# also int32 biggies
big = {}
for m_ in re.finditer(r"tensor<([0-9x]+)xi32>", txt):
    dims = [int(d) for d in m_.group(1).split("x")]
    sz = 1
    for d in dims:
        sz *= d
    if sz >= 3_000_000:
        big[m_.group(1)] = big.get(m_.group(1), 0) + 1
for k in sorted(big, key=lambda k: -int(k.split("x")[0])):
    print(f"  i32[{k}] x{big[k]}", flush=True)

print("compiling on CPU...", flush=True)
comp = low.compile()
ma = comp.memory_analysis()
print("memory analysis:", ma, flush=True)
opt = comp.as_text()
print("optimized HLO chars:", len(opt), flush=True)
big = {}
for m_ in re.finditer(r"f32\[([0-9,]+)\]", opt):
    dims = [int(d) for d in m_.group(1).split(",")]
    sz = 1
    for d in dims:
        sz *= d
    if sz >= 50_000_000:
        big[m_.group(1)] = big.get(m_.group(1), 0) + 1
for k in sorted(big, key=lambda k: -eval(k.replace(",", "*"))):
    print(f"  f32[{k}] x{big[k]}", flush=True)
