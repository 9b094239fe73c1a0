"""Round-5: attack the capacity ceiling with a finer TreePM mesh.

The r5w1 capacity ladder (logs/r5w1_r5_maxn.log) found the single-chip
ceiling at N=16M/37.5 s/step and diagnosed it: **at the grid cap (256)
the cutoff near volume grows with density** — k_near 3328->4255 and near
tiles 3.0x going 8M->16M — "the capacity ceiling is the near pass, not
the mesh". TreePM's grid is a pure work dial (accuracy is set by the
split, ops/treepm.py docstring): halving h halves r_cut = RCUT_RS *
RS_CELLS * h and cuts the short-range pair volume ~8x, trading cheap
MXU transform MACs for expensive pair tiles.

The matmul-DFT transform (ops/fftmm.py) makes fine grids practical where
the recursive FFT compile-OOM'd at 256: any m works (the DFT tables are
generic — 384 = 1.5x finer is a valid rung, not just powers of two), and
the compact path never materializes the doubled mesh. Estimated at
grid=512 (m=1024): transform ~1e13 MACs ~ 0.4-0.8 s on the MXU, spectrum
planes 2 x 2.15 GB + kernel table 2.15 GB live — tight but plausible
next to a 16M-body state; grid=384 (m=768) is the ~3x-less-memory
fallback rung.

Ladder (safe rungs first — a hard TPU worker OOM kills the process and
briefly wedges the tunnel, so the risky big-N rungs run last):

  (8M, 512)   A/B vs r5w1's 11,872 ms at grid=256
  (16M, 384)  memory-safe capacity improvement
  (16M, 512)  the headline attempt (vs 37,500 ms)
  (24M, 384)  unlock attempt: near arrays ~3x smaller than the config
              that crashed r5w1 at grid=256
  (24M, 512)

Run detached: nohup python benches/r5_treepm_finegrid.py > log 2>&1 &
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

RUNGS = benchenv.size(
    ((8_000_000, 512), (16_000_000, 384), (16_000_000, 512),
     (24_000_000, 384), (24_000_000, 512)),
    ((65_025, 48),),
)
STEP_GUARD_S = 120.0
REPS = 3

print(f"platform={jax.devices()[0].platform} rungs={RUNGS}", flush=True)


def fence(x):
    return float(jnp.sum(x.ravel()[:8]))


results = []
for n_req, grid in RUNGS:
    scene = presets.fixed_cloud(n_req)
    n = scene.n
    print(f"=== fixed_cloud({n}) treepm grid={grid} ===", flush=True)
    try:
        sim = make_simulation(n, algorithm="treepm", pm_grid=grid,
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
        results.append((n, grid, ms))
        if ms > STEP_GUARD_S * 1e3:
            print(f"  step exceeds guard {STEP_GUARD_S}s; skipping "
                  "larger rungs at this grid", flush=True)
        del sim, state
    except Exception as e:  # noqa: BLE001 — record the rung that broke
        print(f"  FAILED at N={n} grid={grid}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:300]}", flush=True)
        # an allocation failure at one rung doesn't invalidate the rest
        # of the ladder (different N/grid mixes stress different pools)
        continue

for n, grid, ms in results:
    print(f"FINEGRID RESULT: N={n} grid={grid} {ms:.0f} ms/step", flush=True)
print("FINEGRID DONE", flush=True)
