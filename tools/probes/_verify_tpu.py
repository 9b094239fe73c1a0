"""/verify surface 1 on the real chip: library drive at the reference's
default workload, default kernel AND the round-5 mxu variant. Queued via
tools/chip_queue.py so it never collides with a measurement job."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

import spacetpu
from spacetpu.models import presets
from spacetpu.ops import energy

print(f"platform={jax.devices()[0].platform}", flush=True)
scene = presets.fixed_cloud(10000)
for method in ("vpu", "mxu"):
    sim = spacetpu.make_simulation(
        scene.n, algorithm="direct", integrator="leapfrog",
        softening="plummer", eps=1e-2, pallas_method=method)
    state = sim.prime(scene.state(dtype=jnp.float32))
    state = sim.run(state, spacetpu.constants.DELTA, 120)
    e = float(energy.total_energy(state.pos, state.vel, state.mass,
                                  eps=1e-2))
    print(f"{method}: energy after 120 steps = {e}", flush=True)
print("VERIFY TPU DONE", flush=True)
