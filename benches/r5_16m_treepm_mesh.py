"""Flagship-scale end-to-end: 16M-body TreePM sharded on an 8-device mesh.

Round-4 verdict #9 (stretch): the largest multi-device configuration the
framework ships — compact-mesh TreePM (ops/treepm.py split +
parallel/treepmshard.py halo exchange; the global mass mesh is ONE psum
of (G+1)^3 compact deposits, 8x smaller than the doubled-mesh payload)
at N=16M over a 1-D device mesh, with conservation + truncation
telemetry. The reference tops out at an interactive N=10k on a
20-thread CPU pool (/root/reference/space/src/main.rs:61).

Runs on the 8-virtual-device CPU mesh (default; ~tens of minutes) — the
same sharding program the driver's dryrun_multichip compile-checks, at
production scale. Momentum drift is the conservation check (exact,
O(N)); total-energy drift needs all-pairs potential, which at 2.5e14
pairs is measured at N=1M instead (benches/r5_scorecard.py rows).

Harness caveat: this machine exposes ONE physical core, and XLA's CPU
in-process collectives carry a stuck-detector that hard-aborts (CHECK
failure in AwaitAndLogIfStuck) when one rank waits too long at a
rendezvous while the core timeslices the other seven ranks' local
phases — at 16M the bitonic-sort ppermutes sit minutes apart and trip
it. That is a limit of the 1-core TEST HARNESS, not of the sharding
program (the same program executes at 16M tiny-shape via
dryrun_multichip, and the real chip runs 16M single-chip —
logs/r5w1_r5_maxn.log). So without SPACETPU_16M_N this script climbs a
ladder of N rungs, each in its OWN subprocess (the abort kills the
process), and reports the largest N the harness completes.

Env knobs: SPACETPU_16M_N (single-rung mode), SPACETPU_16M_GRID,
SPACETPU_16M_STEPS.
Run: nohup python benches/r5_16m_treepm_mesh.py > log 2>&1 &
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

if "SPACETPU_16M_N" not in os.environ and __name__ == "__main__":
    # ladder driver: one subprocess per rung; a stuck-detector abort
    # fails the rung, not the ladder
    rungs = [2_000_000, 4_000_000, 8_000_000, 16_000_000]
    if os.environ.get("SPACETPU_BENCH_SCALE") == "smoke":
        rungs = [100_000]
        os.environ.setdefault("SPACETPU_16M_GRID", "32")
        os.environ.setdefault("SPACETPU_16M_STEPS", "2")
    best = None
    for n in rungs:
        print(f"===== rung N={n} =====", flush=True)
        env = dict(os.environ, SPACETPU_16M_N=str(n))
        rc = subprocess.call([sys.executable, os.path.abspath(__file__)],
                             env=env)
        if rc != 0:
            print(f"rung N={n} FAILED rc={rc} (1-core harness collective "
                  f"stall at scale — see header)", flush=True)
            break
        best = n
    if best:
        print(f"16M MESH LADDER: largest harness-complete rung N={best}",
              flush=True)
    print("16M MESH LADDER DONE", flush=True)
    raise SystemExit(0)

import jax

if os.environ.get("SPACETPU_16M_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from spacetpu.parallel import ring, treepmshard

D = jax.device_count()
N = treepmshard.required_n(
    int(os.environ.get("SPACETPU_16M_N", 16_000_000)), D)
GRID = int(os.environ.get("SPACETPU_16M_GRID", 128))
STEPS = int(os.environ.get("SPACETPU_16M_STEPS", 4))
DT = 1e-3

print(f"platform={jax.devices()[0].platform} D={D} N={N} "
      f"({N // D} bodies/device) grid={GRID} steps={STEPS}", flush=True)


def rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return float("nan")


rng = np.random.default_rng(0)
u = rng.normal(size=(N, 3)).astype(np.float32)
u /= np.linalg.norm(u, axis=-1, keepdims=True)
r = rng.uniform(0, 1, size=(N, 1)).astype(np.float32) ** (1 / 3)
pos = u * r
vel = np.zeros((N, 3), np.float32)
mass = (rng.uniform(0.5, 1.5, size=N) / N).astype(np.float32)

from spacetpu.state import make_state

state = make_state(pos, vel, mass, dtype=jnp.float32)
mom0 = (np.asarray(mass, np.float64)[:, None]
        * np.asarray(vel, np.float64)).sum(axis=0)
mass_host = np.asarray(mass, np.float64)
del u, r, pos, vel, mass
print(f"host state built, RSS {rss_gb():.1f} GB", flush=True)

mesh = ring.make_mesh(D)
sim = treepmshard.ShardedTreePMSimulation(
    mesh, N, grid=GRID, softening="plummer", eps=1e-3, g=1.0,
    backend="xla", resort_every=8,
)
ts = sim.shard_state(state)
del state
print(f"sharded, RSS {rss_gb():.1f} GB", flush=True)

t0 = time.perf_counter()
ts = sim.prime(ts)  # global bitonic sort + calibration + force pass
jax.block_until_ready(ts.state.acc)
print(f"prime (sort + calibrate + force): {time.perf_counter() - t0:.1f}s, "
      f"RSS {rss_gb():.1f} GB, caps k_near={sim._k_near} "
      f"near_tiles={sim._near_tiles} grid={sim._grid}", flush=True)

t0 = time.perf_counter()
for i in range(STEPS):
    t1 = time.perf_counter()
    ts = sim.step(ts, jnp.float32(DT))
    jax.block_until_ready(ts.state.pos)
    print(f"  step {i + 1}/{STEPS}: {time.perf_counter() - t1:.1f}s, "
          f"RSS {rss_gb():.1f} GB", flush=True)
wall = (time.perf_counter() - t0) / STEPS

diag = sim.diagnose(ts)
# momentum in the SORTED order — mass rides with the body, so the sum
# is order-independent
vel1 = np.asarray(ts.state.vel, np.float64)
m1 = np.asarray(ts.state.mass, np.float64)
mom1 = (m1[:, None] * vel1).sum(axis=0)
p_scale = float(np.abs(m1[:, None] * vel1).sum()) or 1.0
mom_drift = float(np.linalg.norm(mom1 - mom0)) / p_scale
finite = bool(jnp.all(jnp.isfinite(ts.state.pos)))
print(f"telemetry: {diag}", flush=True)
print(f"momentum drift (rel, {STEPS} steps): {mom_drift:.3e}  "
      f"finite={finite}", flush=True)
print(f"16M MESH RESULT: N={N} D={D} grid={GRID} "
      f"{wall:.1f} s/step on {jax.devices()[0].platform}", flush=True)
print("16M MESH DONE", flush=True)
