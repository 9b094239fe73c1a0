"""Round-5: prime-time receipt for the device-built kernel spectrum.

logs/r5w3_r5_treepm_finegrid.log measured the grid=512 prime at 1683 s,
dominated by the HOST kernel construction (204 s for the 1024^3 rfftn
alone on this box's single core, plus elementwise f64 passes over
8.6 GB and a 2.15 GB host->device kernel ride). Commit ad1e038 builds
the poly kernel spectrum ON DEVICE (fftmm.kernel_hat_from_corner: three
HIGHEST cosine contractions from the (G+1)^3 corner) for grids >=
treepm.KERNEL_DEVICE_MIN_GRID. This measures the same 8M grid=512
calibration + one step with the new path — the A/B against the r5w1/r5w3
numbers (prime 1683 s, step 7109 ms, caps k_near=2450/tiles=694063; the
step and caps must reproduce, the prime must collapse).

Run detached: nohup python benches/r5_kernel_device.py > log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spacetpu.utils import benchenv

benchenv.force_platform()

import jax.numpy as jnp

from spacetpu import make_simulation
from spacetpu.models import presets
from spacetpu.ops import treepm

N = benchenv.size(8_000_000, 65_025)
GRID = benchenv.size(512, 48)
REPS = 3

print(f"platform={jax.devices()[0].platform} N={N} grid={GRID} "
      f"device_kernel_min={treepm.KERNEL_DEVICE_MIN_GRID}", flush=True)


def fence(x):
    return float(jnp.sum(x.ravel()[:8]))


scene = presets.fixed_cloud(N)
sim = make_simulation(scene.n, algorithm="treepm", pm_grid=GRID,
                      softening="plummer", eps=1e-2, g=scene.g,
                      integrator="leapfrog")
state = scene.state(dtype=jnp.float32)
t0 = time.perf_counter()
state = sim.prime(state)
fence(state.pos)
t_prime = time.perf_counter() - t0
print(f"  primed in {t_prime:.0f}s (device kernel build)", flush=True)
t0 = time.perf_counter()
state = sim.step(state, 10.0)
fence(state.pos)
print(f"  first step (+compile) {time.perf_counter() - t0:.0f}s", flush=True)
t0 = time.perf_counter()
for i in range(REPS):
    state = sim.step(state, 10.0)
    fence(state.pos)
    print(f"  .. rep {i + 1}/{REPS}", flush=True)
ms = (time.perf_counter() - t0) / REPS * 1e3
print(f"KERNEL DEVICE RESULT: prime {t_prime:.0f}s (was 1683s host-built) "
      f"step {ms:.0f} ms (expect ~7109) caps k_near={sim.caps.get('k_near')} "
      f"tiles={sim.caps.get('near_tiles')} health={sim.health(state)}",
      flush=True)
print("KERNEL DEVICE DONE", flush=True)
