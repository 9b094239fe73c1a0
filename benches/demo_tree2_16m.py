"""Sharded tree v2 at N=16M on the 8-virtual-device CPU mesh.

Demonstrates the VERDICT r1 'done' criterion for sharded tree v2: a full
tree force pass + leapfrog step at N=16M with per-device memory O(N/D)
(the v1 gather design needed the whole body array on every device and the
single-chip path OOMs 16 GB HBM at this N — see BENCH_NOTES).

Run:  python benches/demo_tree2_16m.py   (CPU, ~minutes; prints RSS)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
jax.config.update("jax_platforms", "cpu")

import time
import numpy as np
import jax.numpy as jnp

from spacetpu.ops import tree
from spacetpu.parallel import ring, tree2
from spacetpu.state import make_state


def rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return float("nan")


D = 8
N = tree2.required_n(16_000_000, D, far_levels=3)
print(f"N={N} over D={D} devices ({N // D} bodies/device)", flush=True)

rng = np.random.default_rng(0)
u = rng.normal(size=(N, 3)).astype(np.float32)
u /= np.linalg.norm(u, axis=-1, keepdims=True)
r = rng.uniform(0, 1, size=(N, 1)).astype(np.float32) ** (1 / 3)
pos = u * r
vel = np.zeros((N, 3), np.float32)
mass = (rng.uniform(0.5, 1.5, size=N) / N).astype(np.float32)
state = make_state(pos, vel, mass, dtype=jnp.float32)
del u, r, pos, vel, mass
print(f"host state built, RSS {rss_gb():.1f} GB", flush=True)

mesh = ring.make_mesh(D)
sim = tree2.ShardedTreeSimulation(
    mesh, N, theta=0.8, softening="plummer", eps=1e-3, g=1.0,
    backend="xla", multipole_order=2, far_levels=3,
)
print(f"G={sim.caps['g_l'] * D} clusters, k_near={sim.caps['k_near']}, "
      f"halo_cap={sim.caps['halo_cap']}, "
      f"far_levels={sim.caps['far_levels']}", flush=True)

ts = sim.shard_state(state)
del state
t0 = time.perf_counter()
ts = sim.prime(ts)  # global bitonic sort + full force pass
jax.block_until_ready(ts.state.acc)
print(f"prime (sort + force pass): {time.perf_counter()-t0:.1f}s, "
      f"RSS {rss_gb():.1f} GB", flush=True)

t0 = time.perf_counter()
ts = sim.step(ts, jnp.float32(1e-3))
jax.block_until_ready(ts.state.pos)
print(f"one leapfrog step: {time.perf_counter()-t0:.1f}s, "
      f"RSS {rss_gb():.1f} GB", flush=True)

diag = sim.diagnose(ts)
print(f"telemetry: {diag}", flush=True)
print(f"finite: {bool(jnp.all(jnp.isfinite(ts.state.pos)))}", flush=True)
print("DONE", flush=True)
