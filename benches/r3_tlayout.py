"""Chip validation of the transposed pair-tile operand layout.

The pairs path's target + aliased-accumulator operands were (N, 8) f32,
which the pallas boundary materializes in the (8, 128) tiled layout —
16x lane padding. At fixed_cloud(8M)/adaptive (G=61696 clusters) that
was two 7.53 GB buffers and a compile-time OOM (logs/r3_largen2.log);
every pairs-mode config ≥4M paid gigabytes of dead HBM. The fix stores
them transposed (8, N) (tree._pack_targets_t) with one VMEM transpose
each way per tile.

Three checks on the real chip:
1. correctness: pairs-mode pallas force vs the XLA fallback at small N
   (also proves Mosaic lowers the in-kernel transposes);
2. no regression: fixed_cloud(1M) auto step (pre-fix chip number:
   397 ms, logs/r3_largen2.log);
3. the OOM config compiles and steps: fixed_cloud(8M), cluster_mode
   adaptive (pre-fix: compile OOM at 23.43 GB / 15.75 GB HBM).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spacetpu import make_simulation
from spacetpu.models import presets
from spacetpu.ops import direct, tree

print(f"platform={jax.devices()[0].platform}", flush=True)


def fence(x):
    float(jnp.sum(x))


# 1. correctness
rng = np.random.default_rng(3)
n = 64 * 255 - 5
pos = jnp.asarray(rng.standard_normal((n, 3)) * 2.0, jnp.float32)
mass = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
kw = dict(theta=0.5, softening="plummer", eps=1e-2, g=1.0,
          multipole_order=2, gg=64, k_near=32, far_levels=2,
          near_mode="pairs")
a_x = np.asarray(tree.acc_tree(pos, mass, backend="xla", **kw))
a_p = np.asarray(tree.acc_tree(pos, mass, backend="pallas", **kw))
d = np.linalg.norm(a_p - a_x, axis=1) / (
    np.linalg.norm(a_x, axis=1) + 1e-30)
print(f"pairs pallas-vs-xla on chip: med={np.median(d):.2e} "
      f"p99={np.percentile(d, 99):.2e} max={d.max():.2e}", flush=True)
# median/p99: the quad far/near cancellation leaves f32 noise that is
# summation-order dependent, so isolated near-zero-net-force bodies show
# large RELATIVE diffs under any backend pairing (measured: med 1.3e-7,
# p99 7.7e-6, max 8e-2 — the max is one body; the OLD layout measured
# the same, logs/r3_pairs_check_old.log)
assert np.median(d) < 1e-5 and np.percentile(d, 99) < 1e-3, (
    np.median(d), np.percentile(d, 99))

# 2. fixed_cloud(1M) auto step
scene = presets.fixed_cloud(1_000_000)
sim = make_simulation(scene.n, algorithm="tree", k_near="auto", theta=0.5, g=scene.g,
                      softening="plummer", eps=0.0)
st = sim.prime(scene.state(dtype=jnp.float32))
st = sim.step(st, jnp.float32(1e-3))
fence(st.pos)
t0 = time.perf_counter()
for _ in range(5):
    st = sim.step(st, jnp.float32(1e-3))
fence(st.pos)
print(f"fixed_cloud(1M) auto step: {(time.perf_counter()-t0)/5*1e3:.0f} ms "
      f"(pre-fix 397)", flush=True)
del st, sim

# 3. the OOM config: fixed_cloud(8M) adaptive
scene = presets.fixed_cloud(8_000_000)
sim = make_simulation(scene.n, algorithm="tree", k_near="auto", theta=0.5,
                      cluster_mode="adaptive", g=scene.g,
                      softening="plummer", eps=0.0)
t0 = time.perf_counter()
st = sim.prime(scene.state(dtype=jnp.float32))
fence(st.pos)
print(f"fixed_cloud(8M) adaptive primed in {time.perf_counter()-t0:.1f}s "
      f"(pre-fix: compile OOM)", flush=True)
st = sim.step(st, jnp.float32(1e-3))
fence(st.pos)
t0 = time.perf_counter()
for _ in range(3):
    st = sim.step(st, jnp.float32(1e-3))
fence(st.pos)
print(f"fixed_cloud(8M) adaptive step: {(time.perf_counter()-t0)/3*1e3:.0f} "
      f"ms  health={sim.health(st)}", flush=True)
print("TLAYOUT DONE", flush=True)
