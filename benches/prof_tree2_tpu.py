"""tree2 pallas path on the real chip (D=1 mesh; halo machinery active
but empty) — validates the pool-based near kernels + timing at N=1M."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))

from spacetpu.ops import tree
from spacetpu.parallel import ring, tree2
from spacetpu.state import make_state

D = 1
N = tree2.required_n(1_000_000, D, far_levels=3)
rng = np.random.default_rng(0)
u = rng.normal(size=(N, 3)); u /= np.linalg.norm(u, axis=-1, keepdims=True)
r = rng.uniform(0, 1, size=(N, 1)) ** (1 / 3)
state = make_state((u * r).astype(np.float32), np.zeros((N, 3), np.float32),
                   (rng.uniform(0.5, 1.5, N) / N).astype(np.float32))
mesh = ring.make_mesh(D)
sim = tree2.ShardedTreeSimulation(
    mesh, N, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
    backend="pallas", multipole_order=2, resort_every=8,
)
print(f"N={N}, far_levels={sim.caps['far_levels']}", flush=True)
ts = sim.prime(sim.shard_state(state))  # auto-calibrates (measured caps)
print(f"calibrated: k={sim.caps['k_near']} k_super={sim.caps['k_super']} "
      f"tiles={sim.caps['near_tiles']} tiles_q={sim.caps['near_tiles_q']}",
      flush=True)
fence(ts.state.acc)
t0 = time.perf_counter()
for _ in range(4):
    ts = sim.step(ts, jnp.float32(1e-3))
fence(ts.state.pos)
print(f"tree2 pallas step (N=1M, D=1): {(time.perf_counter()-t0)/4*1e3:.0f} ms",
      flush=True)
print("diag:", sim.diagnose(ts), flush=True)
print("finite:", bool(jnp.all(jnp.isfinite(ts.state.pos))), flush=True)
print("DONE", flush=True)
