"""Particle-mesh solver on the real chip: step time + force accuracy vs
the tree at large N.

Workload: fixed_cloud (uniform — PM's home turf) at N=1M and 4M, f32,
grid=128. For each N:

  pm    — PM leapfrog step (CIC deposit -> rFFT Poisson -> gather)
  tree  — the calibrated treecode step at theta=0.5 (the incumbent)

plus a one-shot force-accuracy probe: median/p90 relative error of the PM
acceleration against the tree's (the tree's own median error vs exact is
~1.6e-4, far below PM's mesh error, so it stands in for truth here).

The claim under test: for smooth scenes the PM step undercuts the tree's
near-phase cost at equal (mesh-limited) far-field quality, giving the
framework a cheap solver for very large uniform boxes.
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

GRID = 128
STEPS = 10

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


for n in (1_000_000, 4_000_000):
    scene = presets.fixed_cloud(n)
    dt = jnp.float32(1e-3)

    sim_pm = make_simulation(scene.n, algorithm="pm", pm_grid=GRID,
                             g=scene.g)
    st = sim_pm.prime(scene.state(dtype=jnp.float32))
    # force-accuracy snapshot at the INITIAL positions (before the two
    # solvers' trajectories diverge)
    acc_pm = np.asarray(st.acc, np.float64)
    ms_pm, st = time_steps(sim_pm, st, dt, STEPS)
    h = sim_pm.health(st)
    del st

    sim_tr = make_simulation(scene.n, algorithm="tree", k_near="auto",
                             g=scene.g, softening="plummer",
                             eps=sim_pm.mesh_params["h"])  # matched softening
    st = sim_tr.prime(scene.state(dtype=jnp.float32))
    acc_tr = np.asarray(st.acc, np.float64)
    ms_tr, st = time_steps(sim_tr, st, dt, STEPS)
    del st, sim_pm, sim_tr

    rel = (np.linalg.norm(acc_pm - acc_tr, axis=1)
           / np.maximum(np.linalg.norm(acc_tr, axis=1), 1e-300))
    print(f"N={n}: pm {ms_pm*1e3:8.1f} ms/step  tree {ms_tr*1e3:8.1f} "
          f"ms/step  speedup {ms_tr/ms_pm:4.2f}x  "
          f"force err med={np.median(rel):.3f} p90="
          f"{np.quantile(rel, 0.9):.3f}  out_of_box={h['out_of_box']}",
          flush=True)
print("PM BENCH DONE", flush=True)
