"""TreePM hybrid solver on the real chip: step time + force accuracy vs
the calibrated treecode at large N.

Workload: fixed_cloud (uniform) at N=1M and 4M, f32, grid=128 — the PM
bench's configuration so the three families line up. For each N:

  treepm — erf-split step: PM long range (erf-smoothed kernel) + Pallas
           short-range pair tiles within r_cut = 4.5 rs
  tree   — calibrated treecode at theta=0.5 (the incumbent)

plus a one-shot accuracy probe at the initial positions: relative error
of each solver against the other (the tree's median error vs exact is
~1.6e-4; TreePM's CPU-measured median is ~4e-3, so their disagreement is
dominated by — and therefore measures — the TreePM mesh error).

The claim under test: TreePM lands between PM (cheapest, mesh-limited
percent-level accuracy that softens everything at the grid scale) and
the tree (most accurate) — PM-like cost scaling with a force law that
stays exact-Plummer below the grid scale, where PM cannot resolve at
all. Also drives the short-range Pallas kernel (A&S erf on the VPU) on
real hardware for the first time.
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

GRID = int(os.environ.get("SPACETPU_TREEPM_GRID",
                          benchenv.size(128, 32)))
STEPS = benchenv.size(10, 2)
NS = benchenv.size((1_000_000, 4_000_000), (16_384,))

print(f"platform={jax.devices()[0].platform} grid={GRID}", flush=True)


def fence(x):
    float(jnp.sum(x))


def time_steps(sim, st, dt, steps):
    st = sim.step(st, dt)  # compile
    fence(st.pos)
    t0 = time.perf_counter()
    for _ in range(steps):
        st = sim.step(st, dt)
    fence(st.pos)
    return (time.perf_counter() - t0) / steps, st


for n in NS:
    scene = presets.fixed_cloud(n)
    dt = jnp.float32(1e-3)

    sim_tp = make_simulation(scene.n, algorithm="treepm", pm_grid=GRID,
                             g=scene.g, softening="plummer", eps=0.0)
    st = sim_tp.prime(scene.state(dtype=jnp.float32))
    acc_tp = np.asarray(st.acc, np.float64)
    ms_tp, st = time_steps(sim_tp, st, dt, STEPS)
    h = sim_tp.health(st)
    mp = sim_tp.mesh_params
    print(f"N={n}: treepm grid={mp['grid']} caps "
          f"k_near={sim_tp._k_near} tiles={sim_tp._near_tiles} "
          f"rcut={mp['rcut']:.4g} health={h}", flush=True)
    del st

    sim_tr = make_simulation(scene.n, algorithm="tree", k_near="auto",
                             g=scene.g, softening="plummer", eps=0.0)
    st = sim_tr.prime(scene.state(dtype=jnp.float32))
    acc_tr = np.asarray(st.acc, np.float64)
    ms_tr, st = time_steps(sim_tr, st, dt, STEPS)
    del st, sim_tp, sim_tr

    rel = (np.linalg.norm(acc_tp - acc_tr, axis=1)
           / np.maximum(np.linalg.norm(acc_tr, axis=1), 1e-300))
    print(f"N={n}: treepm {ms_tp*1e3:8.1f} ms/step  tree {ms_tr*1e3:8.1f} "
          f"ms/step  ratio {ms_tr/ms_tp:4.2f}x  "
          f"force delta med={np.median(rel):.4f} "
          f"p90={np.quantile(rel, 0.9):.4f}", flush=True)
print("TREEPM BENCH DONE", flush=True)
