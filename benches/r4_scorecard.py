"""Solver-family scorecard on the real chip: the VERDICT-r3 #4 table.

For each NON-lattice scene (plummer_sphere and random_cluster at N=1M —
fixed_cloud's lattice makes relative force error a cancellation artifact,
BENCH_NOTES "PM accuracy caveat") and each solver family:

  tree   — calibrated treecode, theta=0.5 (the incumbent, has its row)
  pm     — particle-mesh, grid=128
  treepm — erf-split hybrid, grid=128

measure, on the same initial state:

  - median / p99 relative force error vs EXACT all-pairs direct
    (the Pallas O(N^2) kernel — 1e12 pairs is ~6 s on chip, so truth is
    affordable at N=1M; no tree stand-in needed),
  - energy drift over a leapfrog rollout of SCORECARD_STEPS (default 500;
    the tree's existing 1k-step rows are in BENCH_NOTES:255),
  - steady-state ms/step from the same rollout (wall / steps, first
    chunk's compile excluded by a 1-step warmup run).

Cheapest families run first so a clock-limited run still fills new rows.
Env knobs: SPACETPU_SCORECARD_STEPS, SPACETPU_SCORECARD_N,
SPACETPU_SCORECARD_SOLVERS (comma list), SPACETPU_SCORECARD_SCENES.
Run detached: nohup python benches/r4_scorecard.py > log 2>&1 &
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

from spacetpu import make_simulation
from spacetpu.models import presets
from spacetpu.ops import energy

N = int(os.environ.get("SPACETPU_SCORECARD_N", benchenv.size(1_000_000, 4096)))
STEPS = int(os.environ.get("SPACETPU_SCORECARD_STEPS", benchenv.size(500, 3)))
# "auto" = each solver's own default grid policy (pm: ~N^(1/3) cap 128;
# treepm: 2 N^(1/3) cap 256 — the r4w11 A/B showed the treepm default is
# both the accuracy and the speed choice once the matmul DFT unlocks 256)
_grid_env = os.environ.get("SPACETPU_SCORECARD_GRID",
                           str(benchenv.size(128, 32)))
GRID = "auto" if _grid_env == "auto" else int(_grid_env)
# >0: call sim.maybe_recalibrate every this-many steps of the measured
# rollout — production behavior for scenes that restructure (the r4w4
# cluster runs ended with ~1e6 counted near-overflows against t=0 caps).
# A recalibration retraces the step program, so ms/step includes those
# compiles; the recal count is reported alongside.
RECAL_EVERY = int(os.environ.get("SPACETPU_SCORECARD_RECAL_EVERY", "0"))
EPS = 1e-2
DT = 1e-3
SOLVERS = os.environ.get("SPACETPU_SCORECARD_SOLVERS", "pm,treepm,tree").split(",")
SCENES = os.environ.get("SPACETPU_SCORECARD_SCENES", "plummer,cluster").split(",")

print(f"platform={jax.devices()[0].platform} N={N} steps={STEPS} "
      f"grid={GRID} dt={DT} eps={EPS}", flush=True)


def fence(x):
    float(jnp.sum(x.ravel()[:16]))


def scene_for(name):
    if name == "plummer":
        return presets.plummer_sphere(N, seed=0)
    return presets.random_cluster(N, seed=0)


def total_e(st, g):
    return float(energy.total_energy(st.pos, st.vel, st.mass, eps=EPS, g=g))


def make(solver, g):
    if solver == "tree":
        # theta=0.5 EXPLICITLY: the config default is the reference-parity
        # 0.3, which saturates plummer(1M)'s near lists (k ~= G) — the
        # dense-near shape behind the known axon runtime fault
        # (BENCH_NOTES "Known issue: TPU runtime fault"). The r3 1k-step
        # drift rows (and this scorecard's header) are theta=0.5.
        return make_simulation(N, algorithm="tree", k_near="auto",
                               theta=0.5,
                               softening="plummer", eps=EPS, g=g)
    return make_simulation(N, algorithm=solver, pm_grid=GRID,
                           softening="plummer", eps=EPS, g=g)


for scene_name in SCENES:
    scene = scene_for(scene_name)
    print(f"=== {scene_name}(n={scene.n}) ===", flush=True)

    # ground truth at the initial positions: exact all-pairs direct
    sim_x = make_simulation(scene.n, algorithm="direct", backend="pallas",
                            softening="plummer", eps=EPS, g=scene.g)
    t0 = time.perf_counter()
    st = sim_x.prime(scene.state(dtype=jnp.float32))
    a_exact = np.asarray(st.acc, np.float64)
    n_exact = np.maximum(np.linalg.norm(a_exact, axis=1), 1e-300)
    print(f"exact prime {time.perf_counter() - t0:.1f}s", flush=True)
    del sim_x, st

    for solver in SOLVERS:
        try:
            t0 = time.perf_counter()
            sim = make(solver, scene.g)
            st = sim.prime(scene.state(dtype=jnp.float32))
            rel = (np.linalg.norm(np.asarray(st.acc, np.float64) - a_exact,
                                  axis=1) / n_exact)
            t_cal = time.perf_counter() - t0
            # warmup: compile the rollout program at the REAL chunk length
            # (a 1-step warmup would trace a different scan length and the
            # measured run would still pay the compile), then measure a
            # multiple of that length so no remainder-length program
            # compiles mid-measurement either.
            warm = min(sim.scan_chunk() or STEPS, STEPS)
            t0 = time.perf_counter()
            st = sim.run(st, DT, warm)
            fence(st.pos)
            t_compile = time.perf_counter() - t0
            steps_meas = max(STEPS // warm, 1) * warm
            e0 = total_e(st, scene.g)
            t0 = time.perf_counter()

            def report(k, _t0=t0):
                print(f"  .. {k} steps t={time.perf_counter() - _t0:.0f}s",
                      flush=True)

            recals = 0
            if RECAL_EVERY > 0:
                done = 0
                while done < steps_meas:
                    todo = min(RECAL_EVERY, steps_meas - done)
                    st = sim.run(st, DT, todo, progress=None)
                    fence(st.pos)
                    done += todo
                    if done < steps_meas and sim.maybe_recalibrate(st):
                        recals += 1
                        print(f"  .. recalibrated at {done} steps "
                              f"(caps {sim.caps})", flush=True)
                    report(done)
            else:
                st = sim.run(st, DT, steps_meas, progress=report)
            fence(st.pos)
            wall = time.perf_counter() - t0
            e1 = total_e(st, scene.g)
            h = sim.health(st)
            h["recals"] = recals
            print(f"{solver:7s}: err med={np.median(rel):.3e} "
                  f"p99={np.quantile(rel, 0.99):.3e}  "
                  f"{wall / steps_meas * 1e3:8.1f} ms/step  "
                  f"drift({steps_meas} st)={abs((e1 - e0) / e0):.3e}  "
                  f"cal={t_cal:.0f}s warm({warm})={t_compile:.0f}s "
                  f"health={h}", flush=True)
            del sim, st
        except Exception as e:  # noqa: BLE001 - scorecard logs and continues
            print(f"{solver:7s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
print("SCORECARD DONE", flush=True)
