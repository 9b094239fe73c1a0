"""Multirate on the workload it was built for, at chip scale (VERDICT-r3 #5).

r3's chip measurement (logs/r3_multirate2.log) benched multirate on a bare
Plummer sphere at a dt where EVERY row already had identical drift — the
machinery was pure overhead there. The feature's actual target (pinned on
CPU at N=98 by tests/test_multirate.py::test_multirate_recovers_fine_
accuracy_on_binary) is a tight timescale split: a hard binary whose period
the outer dt under-resolves, inside a large slow cloud. This reproduces
that scene at N=256k on the real chip:

  bodies 0,1 — the test's eccentric binary (m=1 each, sep 0.02, e~0.6)
  rest       — light shell cloud at r in [4,5), near-circular speeds

and runs the same three rows over the same simulated time T:

  coarse    — plain leapfrog at dt=2e-3 (binary period ~4.4e-3: blows up)
  multirate — substeps=M, fast_cap from suggest_substeps (the auto path)
  fine      — plain leapfrog at dt/M (the accuracy target, M-fold cost)

Pass iff multirate's drift is within ~10x of fine at >=3x less wall time.
Run detached: nohup python benches/r4_multirate.py > log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spacetpu.utils import benchenv

benchenv.force_platform()

import jax.numpy as jnp
import numpy as np

from spacetpu import make_simulation, make_state
from spacetpu.ops import energy

N = benchenv.size(262_144, 1024)
M = 16
DT = 2e-3
STEPS = int(os.environ.get("SPACETPU_MULTIRATE_STEPS",
                           benchenv.size(150, 6)))
EPS = 1e-3
BACKEND = benchenv.size("pallas", "xla")

print(f"platform={jax.devices()[0].platform} N={N} M={M} dt={DT} "
      f"steps={STEPS}", flush=True)


def binary_in_cloud(n_total, seed=3):
    """tests/test_multirate.py::_binary_in_cloud, scaled to chip N."""
    rng = np.random.default_rng(seed)
    pos = [[0.01, 0.0, 0.0], [-0.01, 0.0, 0.0]]
    v = 0.8 * np.sqrt(1.0 / 0.02)
    vel = [[0.0, 0.5 * v, 0.0], [0.0, -0.5 * v, 0.0]]
    mass = [1.0, 1.0]
    n_cloud = n_total - 2
    u = rng.normal(size=(n_cloud, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    r = 4.0 + rng.uniform(0, 1, n_cloud)
    cp = u * r[:, None]
    tang = np.cross(np.array([0.0, 0.0, 1.0]), u)
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    cv = tang * np.sqrt(2.0 / r)[:, None]
    return (np.concatenate([pos, cp]).astype(np.float32),
            np.concatenate([vel, cv]).astype(np.float32),
            np.concatenate([mass, np.full(n_cloud, 1e-6)]).astype(np.float32))


POS, VEL, MASS = binary_in_cloud(N)


def run(label, substeps, fast_cap, dt, steps):
    sim = make_simulation(
        N, algorithm="direct", backend=BACKEND, integrator="leapfrog",
        softening="plummer", eps=EPS, g=1.0, substeps=substeps,
        fast_cap=fast_cap,
    )
    st = sim.prime(make_state(POS, VEL, MASS, dtype=jnp.float32,
                              compensated=True))
    e0 = float(energy.total_energy(st.pos, st.vel, st.mass, eps=EPS, g=1.0))
    st = sim.step(st, dt)  # compile
    float(jnp.sum(st.pos[0]))
    t0 = time.perf_counter()
    st = sim.run(st, dt, steps - 1)
    float(jnp.sum(st.pos[0]))
    wall = time.perf_counter() - t0
    e1 = float(energy.total_energy(st.pos, st.vel, st.mass, eps=EPS, g=1.0))
    print(f"{label:10s}: {wall / (steps - 1) * 1e3:8.2f} ms/step  "
          f"wall={wall:7.1f}s  drift={abs((e1 - e0) / e0):.3e}", flush=True)
    return wall, abs((e1 - e0) / e0)


# what does the auto path suggest here?
probe = make_simulation(N, algorithm="direct", backend=BACKEND,
                        softening="plummer", eps=EPS, g=1.0)
st = probe.prime(make_state(POS, VEL, MASS, dtype=jnp.float32))
m_s, f_s, reason = probe.suggest_substeps(st, DT)
print(f"suggest_substeps(dt={DT}): m={m_s} fast_cap={f_s} reason={reason}",
      flush=True)
del probe, st
if reason != "multirate":
    m_s, f_s = M, 128
# cap m for the chip run: the fine row costs m*STEPS full N^2 passes, and
# the CPU test already shows m=16 rescues this binary (coarse/50); what the
# chip run adds is the WALL-TIME claim at scale, which needs matched m.
m_s = min(m_s, M)

w_c, d_c = run("coarse", 1, 0, DT, STEPS)
w_m, d_m = run(f"multi m={m_s}", m_s, f_s, DT, STEPS)
w_f, d_f = run("fine", 1, 0, DT / m_s, STEPS * m_s)
print(f"multirate vs fine: {w_f / max(w_m, 1e-9):.1f}x less wall, "
      f"drift {d_m:.3e} vs fine {d_f:.3e} vs coarse {d_c:.3e}", flush=True)
print("MULTIRATE BENCH DONE", flush=True)
