"""Conservation check for the MID-hierarchy 3-level far field on chip.

Two configs that previously stressed far3:
  - plummer_sphere(1M) with far_levels=3 forced — the r3_bisect energy
    blowup config (strip-refine zero-init fault, since replaced by the
    M1/M2 pair passes entirely in pairs mode).
  - fixed_cloud(4M) auto (far3 engages) — the superlinearity scene.
Runs 200 leapfrog steps each through Simulation.run (exercising the
scan-chunk fence with the extra M1/M2 launches inside rollout scans) and
reports energy drift + overflow telemetry. Run detached:
  nohup python benches/r3_far3_drift.py > logs/r3_far3_drift.log 2>&1 &
"""

import sys
import time

import jax.numpy as jnp

sys.path.insert(0, ".")

from spacetpu import make_simulation
from spacetpu.models import presets
from spacetpu.ops import energy


def fence(x):
    return float(jnp.sum(x))


CONFIGS = (
    ("plummer_1m_far3", presets.plummer_sphere(1_000_000, seed=0),
     dict(far_levels=3)),
    ("fixed_cloud_4m", presets.fixed_cloud(4_000_000), {}),
)

for tag, scene, extra in CONFIGS:
    print(f"=== {tag} (n={scene.n}) ===", flush=True)
    try:
        sim = make_simulation(
            scene.n, algorithm="tree", theta=0.5, k_near="auto",
            near_mode="pairs", softening="plummer", eps=1e-2, g=1.0,
            **extra,
        )
        st = sim.prime(scene.state(dtype=jnp.float32))
        print(f"  caps: k={sim.caps['k_near']} k_super={sim.caps['k_super']} "
              f"k_mid={sim.caps['k_mid']} scan_chunk={sim.scan_chunk()}",
              flush=True)
        e0 = float(energy.total_energy(st.pos, st.vel, st.mass,
                                       eps=1e-2, g=1.0))
        t0 = time.perf_counter()
        done = [0]

        def report(k, _t0=t0, _done=done):
            _done[0] = k
            print(f"  steps={k} t={time.perf_counter() - _t0:.0f}s",
                  flush=True)

        st = sim.run(st, 1e-3, 200, progress=report)
        e1 = float(energy.total_energy(st.pos, st.vel, st.mass,
                                       eps=1e-2, g=1.0))
        h = sim.health(st)
        print(f"  drift={abs((e1 - e0) / e0):.3e} overflow="
              f"{h['near_overflow']} wall={time.perf_counter() - t0:.0f}s",
              flush=True)
    except Exception as e:  # noqa: BLE001 - probe logs and continues
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
print("FAR3 DRIFT DONE", flush=True)
