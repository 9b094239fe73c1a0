"""Round-3 leaf sweep at N=1M (VERDICT r2 weak #2 done-criterion).

Round 2's sweep errored at leaf<=127 on dense scenes: the measured
k_near exceeded the K2*SUPER refinement candidate pool. Verifies the
interaction is resolved on the real chip and re-measures the leaf=127
step-time win seen on fixed_cloud(1M). Run detached:
  nohup python benches/r3_leaf_sweep.py > logs/r3_leaf_sweep.log 2>&1 &
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spacetpu import make_simulation
from spacetpu.models import presets
from spacetpu.ops import energy


def fence(x):
    return float(jnp.sum(x))


N = 1_000_000
for preset_name, scene in (
    ("fixed_cloud", presets.fixed_cloud(N)),
    ("plummer_sphere", presets.plummer_sphere(N, seed=0)),
):
    for leaf in (127, 255):
        # fresh state per sim: prime()/step() donate their input
        state0 = scene.state(dtype=jnp.float32)
        tag = f"{preset_name}/leaf={leaf}"
        print(f"=== {tag} ===", flush=True)
        try:
            # scene.g, not 1.0: fixed_cloud's orbital velocities are built
            # for the physical constants.G — forcing g=1.0 blows the cloud
            # apart within a few steps and the post-step overflow telemetry
            # then measures the explosion, not the calibration (CPU repro:
            # overflow 0 -> 140168 in 4 steps at N=120k).
            sim = make_simulation(
                scene.n, algorithm="tree", theta=0.5, k_near="auto",
                cluster_mode="adaptive", near_mode="pairs", leaf=leaf,
                softening="plummer", eps=1e-2, g=scene.g,
            )
            st = sim.prime(state0)
            print(f"  caps: {sim.caps}", flush=True)
            st = sim.step(st, 1e-3)
            fence(st.pos)
            t0 = time.perf_counter()
            for _ in range(3):
                st = sim.step(st, 1e-3)
            fence(st.pos)
            ms = (time.perf_counter() - t0) / 3 * 1e3
            h = sim.health(st)
            print(f"  step={ms:.0f} ms overflow={h['near_overflow']}",
                  flush=True)
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
print("LEAF SWEEP DONE", flush=True)
