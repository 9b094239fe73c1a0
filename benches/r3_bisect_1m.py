"""Bisect the plummer-1M tree energy blowup (round 3).

Direct 256k at the same dt/eps drifts 3e-7, so the fault is in the tree
path. Axes: far_levels (2 vs 3), cluster_mode (equal vs adaptive),
near_mode (pairs vs strip). Drift traced every 20 steps to distinguish a
systematic force error (smooth growth) from a structural glitch (jump).
Run detached: nohup python benches/r3_bisect_1m.py > logs/r3_bisect.log 2>&1 &
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spacetpu import make_simulation
from spacetpu.models import presets
from spacetpu.ops import energy

N = 1_000_000
DT, EPS = 1e-3, 1e-2
scene = presets.plummer_sphere(N, seed=0)

CONFIGS = [
    ("adaptive/pairs/far3", dict(cluster_mode="adaptive", near_mode="pairs",
                                 far_levels=3)),
    ("adaptive/pairs/far2", dict(cluster_mode="adaptive", near_mode="pairs",
                                 far_levels=2)),
    ("equal/pairs/far3", dict(cluster_mode="equal", near_mode="pairs",
                              far_levels=3)),
    ("adaptive/strip/far3", dict(cluster_mode="adaptive", near_mode="strip",
                                 far_levels=3)),
]

for name, kw in CONFIGS:
    print(f"=== {name} ===", flush=True)
    try:
        sim = make_simulation(N, algorithm="tree", theta=0.5,
                              softening="plummer", eps=EPS, g=1.0,
                              k_near="auto", **kw)
        st = sim.prime(scene.state(dtype=jnp.float32))
        e0 = float(energy.total_energy(st.pos, st.vel, st.mass, eps=EPS,
                                       g=1.0))
        print(f"  cmode={sim.caps['cluster_mode']} k={sim.caps['k_near']} "
              f"gg={sim.caps['gg']} tiles={sim.caps['near_tiles']} "
              f"e0={e0:.6f}", flush=True)
        t0 = time.perf_counter()
        for k in range(10):
            st = sim.run(st, DT, 20)
            e1 = float(energy.total_energy(st.pos, st.vel, st.mass,
                                           eps=EPS, g=1.0))
            h = sim.health(st)
            print(f"  steps={20 * (k + 1):4d} drift={(e1 - e0) / abs(e0):+.3e}"
                  f" overflow={h['near_overflow']}"
                  f" t={time.perf_counter() - t0:.0f}s", flush=True)
            if abs((e1 - e0) / e0) > 1.0:
                print("  BLOWN UP — stopping this config", flush=True)
                break
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
print("BISECT DONE", flush=True)
