"""Chip A/B of the Poisson-transform implementations (wave r4w11).

BENCH_NOTES round-4 root-caused the 0.25 PM/TreePM chip force error to
the TPU backend's reduced-precision recursive FFT (the central-difference
gradient amplifies potential roundoff 15-40x), and the grid=256 compile
OOM to the 512-point rFFT's 32x-padded internal layout. ops/fftmm.py is
the fix for both: dense DFT matmuls on the MXU at Precision.HIGHEST.
This bench measures, on the real chip:

  1. PM force error vs exact all-pairs at N=262k/1M grid=128, method
     fft vs matmul — expect ~0.25 -> ~1e-2 (the CPU-f64 mesh floor).
  2. TreePM (poly split) total error under each method — the hybrid's
     error budget should drop to its short-range floor.
  3. Isolated mesh-solve time per method (the FLOPs-for-exactness tax).
  4. grid=256 capacity: PM and TreePM at N=1M with matmul — the config
     that previously OOM'd AT COMPILE (logs/r4w5_r4_treepm_grid256.log).

Run detached: nohup python benches/r4_fftmm.py > log 2>&1 &
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
from spacetpu.ops import pm as pm_ops

EPS = 1e-2
DT = 1e-3
GRID = benchenv.size(128, 16)
GRID_BIG = benchenv.size(256, 32)
SIZES = benchenv.size([262144, 1_000_000], [2048])
STEPS = benchenv.size(5, 2)

print(f"platform={jax.devices()[0].platform} grid={GRID}/{GRID_BIG} "
      f"sizes={SIZES}", flush=True)


def fence(x):
    float(jnp.sum(x.ravel()[:16]))


def err_stats(acc, a_exact, nrm):
    rel = (np.linalg.norm(np.asarray(acc, np.float64) - a_exact, axis=1)
           / nrm)
    return f"med={np.median(rel):.3e} p99={np.percentile(rel, 99):.3e}"


def run_family(name, scene, a_exact, nrm, *, grid, method, algorithm):
    """Prime + error + steady ms/step for one (solver, method) cell."""
    pm_ops.PM_FFT_METHOD = method
    t0 = time.perf_counter()
    try:
        sim = make_simulation(scene.n, algorithm=algorithm, pm_grid=grid,
                              softening="plummer", eps=EPS, g=scene.g)
        st = sim.prime(scene.state(dtype=jnp.float32))
        fence(st.acc)
    except Exception as e:  # capacity probes may legitimately fail
        print(f"{name}: FAILED in prime after "
              f"{time.perf_counter() - t0:.1f}s: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return
    t_prime = time.perf_counter() - t0
    e = err_stats(st.acc, a_exact, nrm)
    # steady-state step time (1 warm step compiles the step program)
    st = sim.step(st, DT)
    fence(st.pos)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        st = sim.step(st, DT)
    fence(st.pos)
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name}: {e} ms/step={ms:.1f} prime={t_prime:.1f}s", flush=True)
    del sim, st


def mesh_solve_time(grid, method, dtype=jnp.float32):
    """Isolated Poisson-solve latency (transform pair + spectral mul)."""
    g2 = 2 * grid
    rng = np.random.default_rng(0)
    mesh = jnp.asarray(rng.uniform(size=(g2, g2, g2)), dtype)
    kern = pm_ops.pm_kernel_hat(grid, h=0.1, eps=0.0, g=1.0, dtype=dtype)

    @jax.jit
    def solve(m, k):
        return pm_ops.potential_mesh(m, k, grid, method=method)

    try:
        t0 = time.perf_counter()
        fence(solve(mesh, kern))
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            fence(solve(mesh, kern))
        ms = (time.perf_counter() - t0) / 3 * 1e3
        print(f"mesh-solve grid={grid} {method}: {ms:.1f} ms "
              f"(compile {t_c:.1f}s)", flush=True)
    except Exception as e:
        print(f"mesh-solve grid={grid} {method}: FAILED "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)


# --- 1+2: force-error A/B at grid=128 -------------------------------
for n in SIZES:
    scene = presets.random_cluster(n, seed=0)
    sim_x = make_simulation(n, algorithm="direct", backend="auto",
                            softening="plummer", eps=EPS, g=scene.g)
    t0 = time.perf_counter()
    st = sim_x.prime(scene.state(dtype=jnp.float32))
    a_exact = np.asarray(st.acc, np.float64)
    nrm = np.maximum(np.linalg.norm(a_exact, axis=1), 1e-300)
    print(f"N={n}: exact prime {time.perf_counter() - t0:.1f}s", flush=True)
    del sim_x, st
    for method in ("fft", "matmul"):
        run_family(f"N={n} pm[{method}]", scene, a_exact, nrm,
                   grid=GRID, method=method, algorithm="pm")
    for method in ("fft", "matmul"):
        run_family(f"N={n} treepm[{method}]", scene, a_exact, nrm,
                   grid=GRID, method=method, algorithm="treepm")
    # --- 4: grid-doubling capacity probe (matmul only; fft OOMs) ----
    if n == SIZES[-1]:
        run_family(f"N={n} pm[matmul,grid={GRID_BIG}]", scene, a_exact,
                   nrm, grid=GRID_BIG, method="matmul", algorithm="pm")
        run_family(f"N={n} treepm[matmul,grid={GRID_BIG}]", scene,
                   a_exact, nrm, grid=GRID_BIG, method="matmul",
                   algorithm="treepm")
    del scene, a_exact, nrm

# --- 3: isolated transform cost --------------------------------------
for method in ("fft", "matmul"):
    mesh_solve_time(GRID, method)
mesh_solve_time(GRID_BIG, "matmul")

print("FFTMM AB DONE", flush=True)
