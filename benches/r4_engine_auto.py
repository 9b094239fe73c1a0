"""Interactive auto-select at N=1M: does the mesh tier pay off? (r3 #7)

make_engine_for now picks PM above constants.MESH_SOLVER_CUTOFF
(commit 6b62ff3); the done-criterion is the interactive engine ticking
>=2x faster under auto than the pinned tree at N=1M. This runs the REAL
SimEngine (sim thread + Exchange + DEVICE_LOCK) twice on a Plummer
sphere, polling the exchange like a frontend, and reports ticks/sec:

  auto — make_engine_for (expected: algorithm=pm at prod scale)
  tree — pinned tree, tree_refresh_every=8 (the old interactive path)

Run detached: nohup python benches/r4_engine_auto.py > log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spacetpu.utils import benchenv

benchenv.force_platform()

import numpy as np

from spacetpu import make_simulation
from spacetpu.engine import SimEngine, make_engine_for
from spacetpu.models import presets

N = benchenv.size(1_000_000, 4096)
WINDOW_S = benchenv.size(60.0, 2.0)
FIRST_TICK_TIMEOUT_S = benchenv.size(1200.0, 180.0)
DT = 1e-3

print(f"platform={jax.devices()[0].platform} N={N} window={WINDOW_S}s",
      flush=True)

scene = presets.plummer_sphere(N)
sim_kwargs = dict(softening="plummer", eps=1e-3, g=scene.g,
                  integrator="leapfrog", tree_refresh_every=8)


def measure(name, engine):
    engine.start()
    t0 = time.perf_counter()
    # wait for the first tick (prime + first compile can take ~a minute)
    while True:
        engine.check_health()
        engine.exchange.sample()  # keep requesting like a frontend
        if engine.exchange.current_ticks() > 0:
            break
        if time.perf_counter() - t0 > FIRST_TICK_TIMEOUT_S:
            engine.stop()
            raise SystemExit(f"{name}: no tick within "
                             f"{FIRST_TICK_TIMEOUT_S}s")
        time.sleep(0.5)
    warm = time.perf_counter() - t0
    # measured window: poll the exchange at frontend cadence
    tick0 = engine.exchange.current_ticks()
    t1 = time.perf_counter()
    while time.perf_counter() - t1 < WINDOW_S:
        engine.check_health()
        engine.exchange.sample()
        time.sleep(0.05)
    # one final sample so current_ticks reflects the last stored batch
    engine.exchange.sample()
    time.sleep(0.5)
    ticks = engine.exchange.current_ticks() - tick0
    dt_w = time.perf_counter() - t1
    engine.stop(timeout=600.0)
    rate = ticks / dt_w if dt_w > 0 else 0.0
    ms = 1e3 / rate if rate else float("inf")
    print(f"{name:28s} algo={engine.algorithm:6s} first-tick {warm:6.1f}s "
          f"{ticks:6d} ticks in {dt_w:5.1f}s = {rate:7.2f} ticks/s "
          f"({ms:8.1f} ms/tick)", flush=True)
    return rate


state = scene.state(dtype=np.float32)
auto_rate = measure(
    "auto (make_engine_for)",
    make_engine_for(state, delta=DT, **sim_kwargs))

state = scene.state(dtype=np.float32)
tree_sim = make_simulation(N, algorithm="tree", theta=0.5, k_near="auto",
                           near_mode="pairs", **sim_kwargs)
tree_rate = measure("tree (pinned, refresh=8)",
                    SimEngine(tree_sim, state, delta=DT))

speedup = auto_rate / tree_rate if tree_rate else float("inf")
verdict = "PASS" if speedup >= 2.0 else "MISS"
print(f"auto/tree tick-rate ratio: {speedup:.2f}x -> {verdict} "
      f"(target >=2x)", flush=True)
print("ENGINE AUTO DONE", flush=True)
