"""Adaptive queue-bound A/B: does crediting consumer materializations
as syncs remove the sim thread's SYNC_EVERY readback from the pm tick?

One row — fixed_cloud(1M), auto=pm, actively-sampled 60 s window — the
exact configuration of logs/r4w17_r4_engine_auto.log's first row
(191.4 ms/tick against a 146 ms step; the ~45 ms gap is the scalar
readback every 8th tick ≈ 67 ms amortized, partially overlapped). With
Exchange.synced_tick crediting each snapshot materialization, an
actively-sampling frontend should never trigger the sim-thread sync and
the tick should approach the step time plus lock contention.

Run detached: nohup python benches/r4_engine_sync.py > log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spacetpu.utils import benchenv

benchenv.force_platform()

import numpy as np

from spacetpu.engine import make_engine_for, mesh_resolves
from spacetpu.models import presets

N = benchenv.size(1_000_000, 4096)
WINDOW_S = benchenv.size(60.0, 2.0)
FIRST_TICK_TIMEOUT_S = benchenv.size(1200.0, 180.0)

print(f"platform={jax.devices()[0].platform} N={N} window={WINDOW_S}s",
      flush=True)

scene = presets.fixed_cloud(N)
st = scene.state(dtype=np.float32)
print(f"fixed_cloud(n={scene.n}): mesh_resolves={mesh_resolves(st)}",
      flush=True)
engine = make_engine_for(st, delta=10.0, softening="plummer", eps=1e-2,
                         g=scene.g, integrator="leapfrog",
                         tree_refresh_every=8)
engine.start()
t0 = time.perf_counter()
while True:
    engine.check_health()
    engine.exchange.sample()
    if engine.exchange.current_ticks() > 0:
        break
    if time.perf_counter() - t0 > FIRST_TICK_TIMEOUT_S:
        engine.stop()
        raise SystemExit(f"no tick within {FIRST_TICK_TIMEOUT_S}s")
    time.sleep(0.5)
warm = time.perf_counter() - t0
tick0 = engine.exchange.current_ticks()
t1 = time.perf_counter()
samples = 0
while time.perf_counter() - t1 < WINDOW_S:
    engine.check_health()
    engine.exchange.sample()
    samples += 1
    time.sleep(0.05)
engine.exchange.sample()
time.sleep(0.5)
ticks = engine.exchange.current_ticks() - tick0
dt_w = time.perf_counter() - t1
engine.stop(timeout=600.0)
rate = ticks / dt_w if dt_w > 0 else 0.0
ms = 1e3 / rate if rate else float("inf")
print(f"auto algo={engine.algorithm} first-tick {warm:.1f}s "
      f"{ticks} ticks in {dt_w:.1f}s = {rate:.2f} ticks/s "
      f"({ms:.1f} ms/tick), {samples} frontend samples, "
      f"synced_tick={engine.exchange.synced_tick()}", flush=True)
print("ENGINE SYNC DONE", flush=True)
