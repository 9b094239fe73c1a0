"""Round-3 large-N probe: the 4M->8M superlinearity (VERDICT r2 weak #3).

Measures, on the real chip, for fixed_cloud at 1M/4M/8M:
  - the equal-count partition's near shape (measure_near) and step time
  - the adaptive partition's near shape and step time
so the auto-policy trigger can engage adaptive on absolute near growth,
not only on the heavy-tail ratio. Run detached:
  nohup python benches/r3_largen.py > logs/r3_largen.log 2>&1 &
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacetpu.utils import benchenv

benchenv.force_platform()

import jax.numpy as jnp

from spacetpu import make_simulation
from spacetpu.models import presets
from spacetpu.ops import tree as tree_ops

NS = benchenv.size((1_000_000, 4_000_000, 8_000_000), (65_025,))


def fence(x):
    return float(jnp.sum(x))


def step_time(sim, state, steps=3):
    state = sim.prime(state)
    t0 = time.perf_counter()
    state = sim.step(state, 10.0)
    fence(state.pos)
    print(f"  compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = sim.step(state, 10.0)
    fence(state.pos)
    dt = (time.perf_counter() - t0) / steps
    return dt, state


for n in NS:
    print(f"=== fixed_cloud({n}) ===", flush=True)
    scene = presets.fixed_cloud(n)
    n = scene.n  # presets may round N up; gg must match the real body count
    state0 = scene.state(dtype=jnp.float32)
    pos = jnp.asarray(state0.pos)
    mass = jnp.asarray(state0.mass)
    for cmode in ("equal", "adaptive"):
        gg = tree_ops._gg_for(n, "auto", 2, tree_ops.LEAF, cmode)
        t0 = time.perf_counter()
        m = tree_ops.measure_near(pos, mass, theta=0.5, gg=gg,
                                  cluster_mode=cmode)
        pj = tree_ops.NEAR_TILE_J // tree_ops.BLOCK
        print(f"  {cmode}: gg={gg} measured={m} "
              f"mean_near~{m['near_tiles'] * pj / max(m['n_clusters'], 1):.0f} "
              f"measure_t={time.perf_counter() - t0:.1f}s", flush=True)
    for cmode in ("auto", "adaptive"):
        sim = make_simulation(
            scene.n, algorithm="tree", theta=0.5, k_near="auto",
            cluster_mode=cmode, near_mode="pairs",
        )
        dt, _ = step_time(sim, scene.state(dtype=jnp.float32))
        print(f"  step[{cmode} -> {sim.caps['cluster_mode']}]: {dt * 1e3:.0f} ms "
              f"(k={sim.caps['k_near']} gg={sim.caps['gg']} tiles={sim.caps['near_tiles']})",
              flush=True)
