"""Why does the pinned tree ENGINE tick 19.8 s at 4M when a standalone
step is 4.6 s (logs/r5w6_r5_engine_accurate_4m.log vs r4w17)?

Three measurements, same sim/engine config as the 4M A/B:
  A. raw sim.step loop (no engine) — the r4w17 baseline shape
  B. SimEngine, NO frontend sampling (current_ticks polling only)
  C. SimEngine, sampling every 2 s (gentle frontend)

If B ~ A, the engine loop is innocent and the A/B harness's hot
sample() loop (a 48 MB f32 ride per call at 4M) is what starved the
sim thread; if B ~ 20 s, the engine's cached-tree path itself breaks
at 4M. Run via chip_queue."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax

from spacetpu.utils import benchenv

benchenv.force_platform()

import jax.numpy as jnp
import numpy as np

from spacetpu import make_simulation
from spacetpu.engine import SimEngine
from spacetpu.models import presets

N = benchenv.size(4_000_000, 4096)
WINDOW = benchenv.size(120.0, 2.0)

print(f"platform={jax.devices()[0].platform} N={N}", flush=True)
scene = presets.fixed_cloud(N)
kw = dict(softening="plummer", eps=1e-2, g=scene.g, integrator="leapfrog",
          tree_refresh_every=8)


def fence(st):
    float(jnp.sum(st.pos.ravel()[:8]))


# A: raw cached-structure stepping, the engine's own work shape
sim = make_simulation(scene.n, algorithm="tree", theta=0.5, k_near="auto",
                      near_mode="pairs", **kw)
st = sim.prime(scene.state(dtype=np.float32))
structure = sim.build_structure(st)
st = sim.step_cached(st, structure, 10.0)
fence(st)  # compile
t0 = time.perf_counter()
k = 0
while time.perf_counter() - t0 < WINDOW / 2:
    if k % 8 == 0:
        structure = sim.build_structure(st)
    st = sim.step_cached(st, structure, 10.0)
    fence(st)
    k += 1
ms = (time.perf_counter() - t0) / max(k, 1) * 1e3
print(f"A raw step_cached loop: {k} steps, {ms:.0f} ms/step", flush=True)
del sim, st, structure

for label, sample_period in (("B no-sampling", None),
                             ("C sample every 2s", 2.0)):
    sim = make_simulation(scene.n, algorithm="tree", theta=0.5,
                          k_near="auto", near_mode="pairs", **kw)
    eng = SimEngine(sim, scene.state(dtype=np.float32), delta=10.0)
    eng.start()
    t0 = time.perf_counter()
    while eng.exchange.current_ticks() == 0:
        eng.check_health()
        time.sleep(0.5)
        if time.perf_counter() - t0 > 2400:
            raise SystemExit("no first tick")
    tick0 = eng.exchange.current_ticks()
    t1 = time.perf_counter()
    last_sample = t1
    while time.perf_counter() - t1 < WINDOW:
        eng.check_health()
        if (sample_period is not None
                and time.perf_counter() - last_sample >= sample_period):
            eng.exchange.sample()
            last_sample = time.perf_counter()
        time.sleep(0.05)
    ticks = eng.exchange.current_ticks() - tick0
    dt_w = time.perf_counter() - t1
    eng.stop(timeout=600.0)
    ms = dt_w / max(ticks, 1) * 1e3
    print(f"{label}: {ticks} ticks in {dt_w:.1f}s = {ms:.0f} ms/tick",
          flush=True)
    del sim, eng

print("TREE4M PROBE DONE", flush=True)
