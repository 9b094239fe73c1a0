"""Round-3 pair-tile far3 refine probe (VERDICT r2 weak #3).

The strip-table refine sizes every target super's strip by the WORST
super's near count (measured fixed_cloud(8M): max 491 vs mean 152), which
made the far field degenerate toward dense N x G at N >= 4M (r3_largen:
1M/4M/8M = 396/2673/9215 ms with the measured k_super caps; the 8M
adaptive prime OOM'd at a 29 GB strip table). superfar_pair_segments
sizes the refine by the ACTUAL per-super counts through the near phase's
pair-tile machinery. This probe re-times the same auto configs. Run
detached:
  nohup python benches/r3_refine_pairs.py > logs/r3_refine_pairs.log 2>&1 &
"""

import sys
import time

import jax.numpy as jnp

sys.path.insert(0, ".")

from spacetpu import make_simulation
from spacetpu.models import presets


def fence(x):
    return float(jnp.sum(x))


def step_time(sim, state, steps=3):
    t0 = time.perf_counter()
    state = sim.prime(state)
    fence(state.pos)
    print(f"  prime(calibrate) {time.perf_counter() - t0:.1f}s "
          f"(caps={sim.caps})", flush=True)
    t0 = time.perf_counter()
    state = sim.step(state, 10.0)
    fence(state.pos)
    print(f"  compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = sim.step(state, 10.0)
    fence(state.pos)
    return (time.perf_counter() - t0) / steps, state


for n, cmodes in ((1_000_000, ("auto",)), (4_000_000, ("auto",)),
                  (8_000_000, ("auto", "adaptive"))):
    print(f"=== fixed_cloud({n}) ===", flush=True)
    scene = presets.fixed_cloud(n)
    for cmode in cmodes:
        sim = make_simulation(
            scene.n, algorithm="tree", theta=0.5, k_near="auto",
            cluster_mode=cmode, near_mode="pairs",
        )
        try:
            dt, _ = step_time(sim, scene.state(dtype=jnp.float32))
            print(f"  step[{cmode} -> {sim.caps['cluster_mode']}]: "
                  f"{dt * 1e3:.0f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 - probe logs and continues
            print(f"  FAILED[{cmode}]: {type(e).__name__}: {e}", flush=True)
print("REFINE PROBE DONE", flush=True)
