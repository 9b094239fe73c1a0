"""Round-5 scorecard: end-of-run force error + mid-run family fallback.

Extends the round-4 scorecard (benches/r4_scorecard.py) with the two
round-4 verdict gaps:

  * **end-err** (verdict #6): the med/p99 force error vs exact all-pairs
    is re-measured at the FINAL state, not only at t=0 — the r4w4/w18
    rows carried six-figure near-overflow counts after the cluster
    collapsed, with drift as the only end-state accuracy proxy.
  * **family fallback** (verdict #2): when `maybe_recalibrate` rebuilds
    a DEGENERATE configuration (`Simulation.degenerate` — r4w18 watched
    TreePM recalibrate into k_near ~= gg twice, step cost doubling), the
    rollout swaps to the tree tier (theta=0.5, the chip-measured-safe
    bound: med err 5.6e-5 on plummer(1M), logs/r4w10) exactly like the
    engine's run_sim_loop fallback, instead of continuing degenerate.

Env knobs as before: SPACETPU_SCORECARD_{N,STEPS,GRID,SOLVERS,SCENES,
RECAL_EVERY}. Fallback can be disabled with SPACETPU_SCORECARD_FALLBACK=0
for A/B against the round-4 behavior.

Run detached: nohup python benches/r5_scorecard.py > log 2>&1 &
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
STEPS = int(os.environ.get("SPACETPU_SCORECARD_STEPS",
                           benchenv.size(1000, 3)))
_grid_env = os.environ.get("SPACETPU_SCORECARD_GRID", "auto")
GRID = "auto" if _grid_env == "auto" else int(_grid_env)
RECAL_EVERY = int(os.environ.get("SPACETPU_SCORECARD_RECAL_EVERY",
                                 benchenv.size(100, 2)))
FALLBACK = os.environ.get("SPACETPU_SCORECARD_FALLBACK", "1") == "1"
EPS = 1e-2
DT = 1e-3
SOLVERS = os.environ.get("SPACETPU_SCORECARD_SOLVERS",
                         "pm,treepm").split(",")
SCENES = os.environ.get("SPACETPU_SCORECARD_SCENES", "cluster").split(",")

print(f"platform={jax.devices()[0].platform} N={N} steps={STEPS} "
      f"grid={GRID} dt={DT} eps={EPS} recal_every={RECAL_EVERY} "
      f"fallback={FALLBACK}", flush=True)


def fence(x):
    float(jnp.sum(x.ravel()[:16]))


def scene_for(name):
    if name == "plummer":
        return presets.plummer_sphere(N, seed=0)
    return presets.random_cluster(N, seed=0)


def total_e(st, g):
    return float(energy.total_energy(st.pos, st.vel, st.mass, eps=EPS, g=g))


def exact_acc(n, g, st):
    """Exact all-pairs forces at st's positions (the Pallas O(N^2)
    kernel: ~6 s for 1e12 pairs on chip — truth is affordable at N=1M).
    Deep-copies the state: prime() donates its input, and st is still
    needed by the caller."""
    from spacetpu.state import make_state

    stx = make_state(np.asarray(st.pos), np.asarray(st.vel),
                     np.asarray(st.mass), dtype=jnp.float32)
    sim_x = make_simulation(n, algorithm="direct", backend="pallas",
                            softening="plummer", eps=EPS, g=g)
    stx = sim_x.prime(stx)
    a = np.asarray(stx.acc, np.float64)
    del sim_x, stx
    return a


def err_vs(a_exact, st):
    n_exact = np.maximum(np.linalg.norm(a_exact, axis=1), 1e-300)
    rel = (np.linalg.norm(np.asarray(st.acc, np.float64) - a_exact,
                          axis=1) / n_exact)
    return float(np.median(rel)), float(np.quantile(rel, 0.99))


def make(solver, g):
    if solver == "tree":
        return make_simulation(N, algorithm="tree", k_near="auto",
                               theta=0.5,
                               softening="plummer", eps=EPS, g=g)
    return make_simulation(N, algorithm=solver, pm_grid=GRID,
                           softening="plummer", eps=EPS, g=g)


def fallback_sim(g):
    return make_simulation(N, algorithm="tree", k_near="auto", theta=0.5,
                           softening="plummer", eps=EPS, g=g)


for scene_name in SCENES:
    scene = scene_for(scene_name)
    print(f"=== {scene_name}(n={scene.n}) ===", flush=True)

    t0 = time.perf_counter()
    st0 = scene.state(dtype=jnp.float32)
    a_exact0 = exact_acc(scene.n, scene.g, st0)
    print(f"exact prime {time.perf_counter() - t0:.1f}s", flush=True)

    for solver in SOLVERS:
        try:
            t0 = time.perf_counter()
            sim = make(solver, scene.g)
            st = sim.prime(scene.state(dtype=jnp.float32))
            med0, p99_0 = err_vs(a_exact0, st)
            t_cal = time.perf_counter() - t0
            warm = min(sim.scan_chunk() or STEPS, STEPS)
            t0 = time.perf_counter()
            st = sim.run(st, DT, warm)
            fence(st.pos)
            t_compile = time.perf_counter() - t0
            steps_meas = max(STEPS // warm, 1) * warm
            e0 = total_e(st, scene.g)
            t0 = time.perf_counter()
            recals = 0
            fellback = None
            done = 0
            while done < steps_meas:
                todo = min(RECAL_EVERY or steps_meas, steps_meas - done)
                st = sim.run(st, DT, todo, progress=None)
                fence(st.pos)
                done += todo
                if RECAL_EVERY and done < steps_meas:
                    if sim.maybe_recalibrate(st):
                        recals += 1
                        print(f"  .. recalibrated at {done} steps "
                              f"(caps {sim.caps})", flush=True)
                    if (FALLBACK and fellback is None
                            and getattr(sim, "degenerate", None)):
                        reason = sim.degenerate
                        sim = fallback_sim(scene.g)
                        st = sim.prime(st)
                        fellback = (done, reason)
                        print(f"  .. FAMILY FALLBACK -> tree th=0.5 at "
                              f"{done} steps (reason: {reason}; caps "
                              f"{sim.caps})", flush=True)
                print(f"  .. {done} steps t="
                      f"{time.perf_counter() - t0:.0f}s", flush=True)
            wall = time.perf_counter() - t0
            e1 = total_e(st, scene.g)
            # end-of-run force error vs exact at the FINAL state
            t0 = time.perf_counter()
            a_exact1 = exact_acc(scene.n, scene.g, st)
            st = sim.prime(st)  # re-evaluate forces with current caps
            med1, p99_1 = err_vs(a_exact1, st)
            t_end = time.perf_counter() - t0
            h = sim.health(st)
            h["recals"] = recals
            if fellback:
                h["fallback_at"] = fellback[0]
                h["fallback_reason"] = fellback[1]
            print(f"{solver:7s}: err med={med0:.3e} p99={p99_0:.3e}  "
                  f"END err med={med1:.3e} p99={p99_1:.3e}  "
                  f"{wall / steps_meas * 1e3:8.1f} ms/step  "
                  f"drift({steps_meas} st)={abs((e1 - e0) / e0):.3e}  "
                  f"cal={t_cal:.0f}s warm({warm})={t_compile:.0f}s "
                  f"endmeas={t_end:.0f}s health={h}", flush=True)
            del sim, st
        except Exception as e:  # noqa: BLE001 - scorecard logs and continues
            print(f"{solver:7s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
print("SCORECARD DONE", flush=True)
