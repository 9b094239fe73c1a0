"""Round-5: accurate-tier A/B at N=4M — where does TreePM actually win?

r5w2's 1M engine A/B (logs/r5w2_r5_engine_accurate.log) found the
round-4 promotion premise broken AT THE ENGINE LEVEL: with the
production structure cache (tree_refresh_every=8) the pinned tree ticks
383.5 ms vs TreePM's 644 — the r4w17 step-level win (686 vs 861) was
measured with per-step structure rebuilds, which the cache removes from
7 of 8 tree ticks while TreePM's per-tick mesh pass shrinks not at all.

This measures the SAME two engines at N=4M (r4w17 step-level: treepm
4047 vs tree 4572 ms) to find the real crossover for the accurate
profile's N-gate. Same harness as benches/r5_engine_accurate.py.

Run detached: nohup python benches/r5_engine_accurate_4m.py > log 2>&1 &
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
from spacetpu.engine import SimEngine
from spacetpu.models import presets

N = benchenv.size(4_000_000, 4096)
WINDOW_S = benchenv.size(120.0, 2.0)
FIRST_TICK_TIMEOUT_S = benchenv.size(2400.0, 180.0)

print(f"platform={jax.devices()[0].platform} N={N} window={WINDOW_S}s",
      flush=True)


def measure(name, engine):
    engine.start()
    t0 = time.perf_counter()
    while True:
        engine.check_health()
        engine.exchange.sample()
        if engine.exchange.current_ticks() > 0:
            break
        if time.perf_counter() - t0 > FIRST_TICK_TIMEOUT_S:
            engine.stop()
            raise SystemExit(f"{name}: no tick within "
                             f"{FIRST_TICK_TIMEOUT_S}s")
        time.sleep(0.5)
    warm = time.perf_counter() - t0
    tick0 = engine.exchange.current_ticks()
    t1 = time.perf_counter()
    while time.perf_counter() - t1 < WINDOW_S:
        engine.check_health()
        engine.exchange.sample()
        time.sleep(0.05)
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


scene = presets.fixed_cloud(N)
sim_kwargs = dict(softening="plummer", eps=1e-2, g=scene.g,
                  integrator="leapfrog", tree_refresh_every=8)

st = scene.state(dtype=np.float32)
treepm_sim = make_simulation(scene.n, algorithm="treepm",
                             **sim_kwargs)
treepm_rate = measure("4M treepm grid=auto(256)",
                      SimEngine(treepm_sim, st, delta=10.0))

st = scene.state(dtype=np.float32)
tree_sim = make_simulation(scene.n, algorithm="tree", theta=0.5,
                           k_near="auto", near_mode="pairs", **sim_kwargs)
tree_rate = measure("4M tree th=0.5 (pinned)",
                    SimEngine(tree_sim, st, delta=10.0))

ratio = treepm_rate / tree_rate if tree_rate else float("inf")
print(f"4M treepm/tree engine tick-rate ratio {ratio:.2f}x", flush=True)
print("ENGINE ACCURATE 4M DONE", flush=True)
