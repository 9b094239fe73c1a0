"""Multirate vs fine-stepped leapfrog on the real chip.

Workload: a Plummer sphere (dense core => genuine timescale split) at
N=256k, f32, eps=1e-2. Three runs over the same simulated time T=steps*dt:

  coarse    — plain leapfrog at dt               (cheapest, core-limited)
  multirate — substeps=M, fast_cap=N/8 at dt     (the new path)
  fine      — plain leapfrog at dt/M             (accuracy target)

Reports wall/step-equivalents and energy drift for each; the claim under
test is multirate ~ fine accuracy at a fraction of fine's wall time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from spacetpu import make_simulation
from spacetpu.models import presets
from spacetpu.ops import energy

N = 262_144
M = 8
DT = 2e-3
STEPS = 30  # outer steps; fine runs STEPS*M

scene = presets.plummer_sphere(N, seed=0)
print(f"platform={jax.devices()[0].platform} N={N} M={M} dt={DT}", flush=True)


def run(substeps, dt, steps, label):
    sim = make_simulation(
        N, algorithm="direct", backend="pallas", integrator="leapfrog",
        softening="plummer", eps=1e-2, g=scene.g, substeps=substeps,
    )
    st = sim.prime(scene.state(dtype=jnp.float32))
    e0 = float(energy.total_energy(st.pos, st.vel, st.mass, eps=1e-2,
                                   g=scene.g))
    st = sim.step(st, dt)  # compile
    float(jnp.sum(st.pos[0]))
    t0 = time.perf_counter()
    for _ in range(steps - 1):
        st = sim.step(st, dt)
    float(jnp.sum(st.pos[0]))
    wall = time.perf_counter() - t0
    e1 = float(energy.total_energy(st.pos, st.vel, st.mass, eps=1e-2,
                                   g=scene.g))
    per_outer = wall / (steps - 1) * (M if substeps == 1 and dt < DT else 1)
    print(f"{label:10s}: {wall/(steps-1)*1e3:8.2f} ms/step "
          f"({per_outer*1e3:8.2f} ms/outer-dt) "
          f"drift={abs((e1-e0)/e0):.3e}", flush=True)


run(1, DT, STEPS, "coarse")
run(M, DT, STEPS, "multirate")
run(1, DT / M, STEPS * M, "fine")
