"""Round-5 capacity probe: the largest single-chip N (verdict r4 #9).

Climbs fixed_cloud N with the production large-N solver (TreePM,
grid=256, poly split, matmul-DFT Poisson) until the chip runs out of
HBM or a step exceeds the time guard, recording ms/step at each rung.
The reference tops out at an interactive N=10k on a 20-thread CPU pool
(/root/reference/space/src/main.rs:61, constants.rs:17-19); this
documents how far ONE TPU chip carries the same physics.

Each rung is independent (fresh sim + state) so an OOM at rung k still
leaves rung k-1's numbers on record; allocation failures are caught and
reported, not fatal.

Run detached: nohup python benches/r5_maxn.py > log 2>&1 &
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

NS = benchenv.size((8_000_000, 16_000_000, 24_000_000, 32_000_000),
                   (65_025,))
GRID = benchenv.size(256, 32)
STEP_GUARD_S = 120.0  # stop climbing once a step costs more than this
REPS = 3

print(f"platform={jax.devices()[0].platform} grid={GRID} rungs={NS}",
      flush=True)


def fence(x):
    return float(jnp.sum(x.ravel()[:8]))


best = None
for n_req in NS:
    scene = presets.fixed_cloud(n_req)
    n = scene.n
    print(f"=== fixed_cloud({n}) treepm grid={GRID} ===", flush=True)
    try:
        sim = make_simulation(n, algorithm="treepm", pm_grid=GRID,
                              softening="plummer", eps=1e-2, g=scene.g,
                              integrator="leapfrog")
        state = scene.state(dtype=jnp.float32)
        t0 = time.perf_counter()
        state = sim.prime(state)
        fence(state.pos)
        t_prime = time.perf_counter() - t0
        print(f"  .. primed in {t_prime:.0f}s", flush=True)
        t0 = time.perf_counter()
        state = sim.step(state, 10.0)
        fence(state.pos)
        t_first = time.perf_counter() - t0
        print(f"  .. first step (+compile) {t_first:.0f}s", flush=True)
        t0 = time.perf_counter()
        for i in range(REPS):
            state = sim.step(state, 10.0)
            fence(state.pos)
            print(f"  .. rep {i + 1}/{REPS}", flush=True)
        ms = (time.perf_counter() - t0) / REPS * 1e3
        h = sim.health(state)
        print(f"  prime {t_prime:.0f}s  first(+compile) {t_first:.0f}s  "
              f"step {ms:.0f} ms  caps k_near={sim.caps.get('k_near')} "
              f"gg={sim.caps.get('gg')} tiles={sim.caps.get('near_tiles')} "
              f"health={h}", flush=True)
        best = (n, ms)
        if ms > STEP_GUARD_S * 1e3:
            print(f"  step exceeds guard {STEP_GUARD_S}s; stopping climb",
                  flush=True)
            break
        del sim, state
    except Exception as e:  # noqa: BLE001 — record the rung that broke
        print(f"  FAILED at N={n}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:300]}", flush=True)
        break

if best is not None:
    n, ms = best
    print(f"MAXN RESULT: N={n} at {ms:.0f} ms/step "
          f"(treepm grid={GRID}, single chip)", flush=True)
print("MAXN DONE", flush=True)
