"""Round-3: interactive cached-structure tick rate at N=1M (VERDICT r2
weak #7 done-criterion). Measures the engine's two tick forms on the
real chip: step() (rebuild sort + near lists every tick — reference
parity, barnes_hut/mod.rs:13-14) vs the cached-structure pair
(build_structure every r ticks + step_cached between), the machinery
run_sim_loop uses when tree_refresh_every > 1. Run detached:
  nohup python benches/r3_engine_tick.py > logs/r3_engine_tick.log 2>&1 &
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spacetpu import make_simulation
from spacetpu.models import presets


def fence(x):
    return float(jnp.sum(x))


N = 1_000_000
R = 8
scene = presets.fixed_cloud(N)
sim = make_simulation(scene.n, algorithm="tree", theta=0.5, k_near="auto",
                      near_mode="pairs", tree_refresh_every=R)
st = sim.prime(scene.state(dtype=jnp.float32))
print(f"k={sim.caps['k_near']} gg={sim.caps['gg']} "
      f"tiles={sim.caps['near_tiles']}", flush=True)

# warm both programs
st = sim.step(st, 1e-3)
structure = sim.build_structure(st)
st = sim.step_cached(st, structure, 1e-3)
fence(st.pos)

t0 = time.perf_counter()
for _ in range(10):
    st = sim.step(st, 1e-3)
fence(st.pos)
full = (time.perf_counter() - t0) / 10
print(f"step (rebuild every tick): {full * 1e3:.0f} ms", flush=True)

t0 = time.perf_counter()
for _ in range(2):
    structure = sim.build_structure(st)
    for _ in range(R):
        st = sim.step_cached(st, structure, 1e-3)
fence(st.pos)
cached = (time.perf_counter() - t0) / (2 * R)
print(f"cached structure (refresh every {R}): {cached * 1e3:.0f} ms "
      f"({full / cached:.2f}x)", flush=True)
print("finite:", bool(jnp.all(jnp.isfinite(st.pos))), flush=True)
print("ENGINE TICK DONE", flush=True)
