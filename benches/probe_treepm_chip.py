"""Chip probe: TreePM force accuracy vs EXACT direct at small N.

Isolates whether the 0.25 median treepm-vs-tree delta seen in
logs/r3_treepm2.log is (a) a Pallas short-range kernel bug on real
hardware, (b) a long-range mesh error at scale, or (c) a metric artifact
(relative error against near-cancelling net forces in a uniform cloud).

Runs on the chip: N=16384 fixed_cloud, grid=32 (same rs/rcut geometry in
cells as the big bench). Compares, at the initial positions:
  - treepm backend=pallas (the chip path)
  - treepm backend=xla    (the CPU-tested fallback, here on TPU)
  - exact all-pairs direct (ground truth)
  - tree (calibrated)
and prints median/p90/p99 relative error of each against exact, plus the
pallas-vs-xla delta (any nonzero-beyond-roundoff value = kernel bug).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spacetpu.utils import benchenv

benchenv.force_platform()

import jax.numpy as jnp
import numpy as np

from spacetpu import make_simulation
from spacetpu.models import presets
from spacetpu.ops import direct

N = benchenv.size(16384, 2048)
GRID = 32
# smoke runs the xla short-range backend only (interpret-mode pallas is
# pointlessly slow on CPU); the pallas-vs-xla delta is a chip question
BACKENDS = benchenv.size(("pallas", "xla"), ("xla",))
print(f"platform={jax.devices()[0].platform} N={N} grid={GRID}", flush=True)

scene = presets.fixed_cloud(N)
N = scene.n
state0 = scene.state(dtype=jnp.float32)
pos = state0.pos
mass = state0.mass

a_exact = np.asarray(
    direct.acc_direct(pos, mass, softening="plummer", eps=0.0, g=scene.g),
    np.float64,
)
print("exact done", flush=True)


def rel(a):
    d = np.linalg.norm(np.asarray(a, np.float64) - a_exact, axis=1)
    n = np.maximum(np.linalg.norm(a_exact, axis=1), 1e-300)
    r = d / n
    return (f"med={np.median(r):.3e} p90={np.quantile(r, 0.9):.3e} "
            f"p99={np.quantile(r, 0.99):.3e}")


accs = {}
for backend in BACKENDS:
    sim = make_simulation(N, algorithm="treepm", pm_grid=GRID, g=scene.g,
                          softening="plummer", eps=0.0, backend=backend)
    st = sim.prime(scene.state(dtype=jnp.float32))  # prime donates its arg
    accs[backend] = np.asarray(st.acc, np.float64)
    mp = sim.mesh_params
    print(f"treepm[{backend}] grid={mp['grid']} rcut={mp['rcut']:.4g} "
          f"k_near={sim.caps['k_near']} health={sim.health(st)}", flush=True)
    print(f"  vs exact: {rel(accs[backend])}", flush=True)
    del sim, st

if "pallas" in accs and "xla" in accs:
    d = np.linalg.norm(accs["pallas"] - accs["xla"], axis=1)
    n = np.maximum(np.linalg.norm(accs["xla"], axis=1), 1e-300)
    print(f"pallas vs xla: med={np.median(d/n):.3e} max={np.max(d/n):.3e}",
          flush=True)

sim = make_simulation(N, algorithm="tree", k_near="auto", g=scene.g,
                      softening="plummer", eps=0.0)
st = sim.prime(scene.state(dtype=jnp.float32))
print(f"tree vs exact: {rel(st.acc)}", flush=True)

print("PROBE DONE", flush=True)
