"""Re-measure the plummer_sphere(1M) auto-policy step after the MID far
field + shared-strip improvements (the 1k-step drift run's 2.0 s/step,
logs/r3_drift_plummer1m.log, predates them).

Run detached: nohup python benches/r3_plummer_mid.py > logs/r3_plummer_mid.log 2>&1 &
"""

import sys
import time

import jax.numpy as jnp

sys.path.insert(0, ".")

from spacetpu import make_simulation
from spacetpu.models import presets


def fence(x):
    return float(jnp.sum(x))


N = 1_000_000
scene = presets.plummer_sphere(N, seed=0)
sim = make_simulation(
    scene.n, algorithm="tree", theta=0.5, k_near="auto",
    softening="plummer", eps=1e-2, g=scene.g,
)
st = sim.prime(scene.state(dtype=jnp.float32))
print(f"caps: {sim.caps}", flush=True)
st = sim.step(st, 1e-3)
fence(st.pos)
t0 = time.perf_counter()
for _ in range(5):
    st = sim.step(st, 1e-3)
fence(st.pos)
ms = (time.perf_counter() - t0) / 5 * 1e3
h = sim.health(st)
print(f"step={ms:.0f} ms overflow={h['near_overflow']}", flush=True)
print("PLUMMER MID DONE", flush=True)
