"""Can a consumer's snapshot ride overlap the sim thread's dispatches?

Round-4 verdict #7: the sampled interactive tick at N=1M PM is ~1.3x
the headless step because the consumer materializes its snapshot handle
under DEVICE_LOCK, blocking the sim thread's next dispatch for the ride
duration. The lock exists because some tunneled PJRT transports were
seen to deadlock on CONCURRENT transfers from different host threads —
but a dispatch is not a transfer (donated device buffers; dt is
pre-placed on device here so repeated step() calls move no host data).
This probes, on the real chip:

  A. steps only (the headless floor)
  B. steps + inline snapshot materializations, serialized (current
     engine behavior: ride under DEVICE_LOCK)
  C. steps dispatched from the main thread WHILE a second thread
     materializes snapshots WITHOUT the lock — if the transport honors
     it, wall(C) ~ max(steps, rides) instead of steps + rides

If C deadlocks, the queue watchdog reaps this job (~40 min) and the
answer is 'keep the lock'; if C ~= B, transfers serialize with compute
in the transport itself (the r4w12 conclusion) and the wire format is
the only lever. Run detached:
  nohup python benches/r5_overlap_probe.py > log 2>&1 &
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spacetpu.utils import benchenv

benchenv.force_platform()

import jax.numpy as jnp
import numpy as np

from spacetpu import make_simulation
from spacetpu.engine import _snapshot_begin, _snapshot_finish
from spacetpu.models import presets

N = benchenv.size(1_000_000, 4096)
STEPS = benchenv.size(30, 4)
RIDES = benchenv.size(10, 2)

print(f"platform={jax.devices()[0].platform} N={N} steps={STEPS} "
      f"rides={RIDES}", flush=True)

scene = presets.fixed_cloud(N)
sim = make_simulation(scene.n, algorithm="pm", softening="plummer",
                      eps=1e-2, g=scene.g)
state = sim.prime(scene.state(dtype=jnp.float32))
dt_dev = jnp.float32(10.0)  # pre-placed: dispatches move no host data


def fence(st):
    float(jnp.sum(st.pos.ravel()[:8]))


# warm the step program
state = sim.step(state, dt_dev)
fence(state)

# A: steps only
t0 = time.perf_counter()
for _ in range(STEPS):
    state = sim.step(state, dt_dev)
fence(state)
t_steps = time.perf_counter() - t0
print(f"A steps only:             {t_steps * 1e3 / STEPS:7.1f} ms/step "
      f"({t_steps:.2f}s total)", flush=True)

# B: steps + serialized inline rides (the current engine shape)
t0 = time.perf_counter()
ride_s = 0.0
for i in range(STEPS):
    state = sim.step(state, dt_dev)
    if i % (STEPS // RIDES) == 0:
        r0 = time.perf_counter()
        snap = _snapshot_finish(_snapshot_begin(state, "f32"), "f32")
        ride_s += time.perf_counter() - r0
fence(state)
t_serial = time.perf_counter() - t0
print(f"B steps + {RIDES} inline rides: {t_serial * 1e3 / STEPS:7.1f} "
      f"ms/step ({t_serial:.2f}s total, rides {ride_s:.2f}s)", flush=True)

# C: concurrent — dispatches from this thread, rides from another,
# NO lock between them
handles = []
handles_lock = threading.Lock()
done_flag = threading.Event()
ride_wall = [0.0, 0]


def rider():
    while not done_flag.is_set() or handles:
        with handles_lock:
            h = handles.pop() if handles else None
            if h is not None and handles:
                handles.clear()  # latest wins, like the exchange
        if h is None:
            time.sleep(0.001)
            continue
        r0 = time.perf_counter()
        _snapshot_finish(h, "f32")
        ride_wall[0] += time.perf_counter() - r0
        ride_wall[1] += 1


th = threading.Thread(target=rider, daemon=True)
th.start()
t0 = time.perf_counter()
for i in range(STEPS):
    state = sim.step(state, dt_dev)
    if i % (STEPS // RIDES) == 0:
        h = _snapshot_begin(state, "f32")
        with handles_lock:
            handles.append(h)
fence(state)
done_flag.set()
th.join(timeout=600)
t_conc = time.perf_counter() - t0
print(f"C steps + concurrent rides: {t_conc * 1e3 / STEPS:6.1f} ms/step "
      f"({t_conc:.2f}s total; {ride_wall[1]} rides, "
      f"{ride_wall[0]:.2f}s ride wall)", flush=True)

overlap = (t_serial - t_conc) / max(ride_s, 1e-9)
print(f"VERDICT: serialized {t_serial:.2f}s vs concurrent {t_conc:.2f}s "
      f"— {'OVERLAPS' if t_conc < t_serial - 0.3 * ride_s else 'SERIAL'} "
      f"(recovered {overlap * 100:.0f}% of ride time)", flush=True)
print("OVERLAP PROBE DONE", flush=True)
