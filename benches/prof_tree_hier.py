"""TPU check: hierarchical near lists at N=1M (timing + overflow)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, math
import jax, jax.numpy as jnp, numpy as np

def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))

from spacetpu.models import presets
from spacetpu.ops import tree

N = 1_000_000
scene = presets.fixed_cloud(N)
pos = jnp.asarray(scene.pos, jnp.float32)
mass = jnp.asarray(scene.mass, jnp.float32)
gg = max(1, math.ceil(scene.n / tree.LEAF))

t0 = time.perf_counter()
k_auto = tree.measure_k_near(pos, mass, theta=0.5, gg=gg)
print(f"measure_k_near: k={k_auto} (default {tree.default_k_near(0.5, gg)}) "
      f"in {time.perf_counter()-t0:.2f}s", flush=True)

f = jax.jit(lambda p, m: tree.acc_tree(p, m, theta=0.5, softening="plummer",
                                       eps=1e-3, g=scene.g, backend="pallas",
                                       multipole_order=2))
a = f(pos, mass); fence(a)
t0 = time.perf_counter()
for _ in range(3):
    a = f(pos, mass)
fence(a)
print(f"acc_tree N=1M th=0.5 quad (hier near lists): "
      f"{(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)

# overflow telemetry on device
prep = jax.jit(lambda p, m: tree.tree_prep(
    p, m, theta=0.5, k_near=tree.default_k_near(0.5, gg), gg=gg
)["near_overflow"])
print("fixed_cloud(1M) overflow @ default k:", int(prep(pos, mass)), flush=True)
print("DONE", flush=True)
