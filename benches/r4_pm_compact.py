"""Compact-mesh PM A/B on chip: does skipping the structural zeros pay?

The Hockney-Eastwood doubled mesh is 7/8 structural zero (bodies occupy
only the corner G^3; CIC corners reach [0, G]). The compact pipeline
(ops/pm.deposit_cic_compact + acc_from_mesh_compact + the sliced-table
matmul-DFT in ops/fftmm.py) deposits into (G+1)^3, transforms with
contractions over occupied slots only, and inverse-transforms only the
(G+3)^3 window the gradient/gather reads. Expected: ~2x fewer transform
MACs, an 8x smaller scatter target, an 8x smaller gradient stack, and
(sharded) an 8x smaller psum payload. This measures, at N=1M:

  - full vs compact isolated phases: deposit, Poisson solve, grad+gather
  - full vs compact whole acc_pm step, grid=128 and grid=256

Values are identical math (equivalence tests in tests/test_pm.py); this
is purely a speed A/B.

Run detached: nohup python benches/r4_pm_compact.py > log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spacetpu.utils import benchenv

benchenv.force_platform()

import functools

import jax.numpy as jnp
import numpy as np

from spacetpu.models import presets
from spacetpu.ops import pm as pm_ops

N = benchenv.size(1_000_000, 4096)
GRIDS = benchenv.size([128, 256], [16])
REPS = benchenv.size(5, 2)

print(f"platform={jax.devices()[0].platform} N={N} grids={GRIDS}",
      flush=True)


def fence(x):
    if isinstance(x, tuple):
        x = x[0]
    float(jnp.sum(x.ravel()[:16]))


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    fence(fn(*args))
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        fence(fn(*args))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  {name:34s} {ms:8.2f} ms   (compile {t_c:.1f}s)", flush=True)
    return ms


scene = presets.fixed_cloud(N)
st = scene.state(dtype=jnp.float32)
pos = st.pos
mass = st.mass

for grid in GRIDS:
    print(f"=== grid={grid} ===", flush=True)
    box_min_h, h = pm_ops.measure_box(np.asarray(pos), grid=grid)
    kern = pm_ops.pm_kernel_hat(grid, h, eps=1e-2, g=scene.g,
                                dtype=jnp.float32)
    box_min = jnp.asarray(box_min_h, jnp.float32)
    inv_h = jnp.asarray(1.0 / h, jnp.float32)

    dep_full = jax.jit(functools.partial(
        pm_ops.deposit_cic, box_min=box_min, inv_h=inv_h, grid=grid))
    dep_comp = jax.jit(functools.partial(
        pm_ops.deposit_cic_compact, box_min=box_min, inv_h=inv_h,
        grid=grid))
    t_dep_f = timeit("deposit full (2G)^3", dep_full, pos, mass)
    t_dep_c = timeit("deposit compact (G+1)^3", dep_comp, pos, mass)

    mesh_f = dep_full(pos, mass)
    mesh_c = dep_comp(pos, mass)

    solve_full = jax.jit(lambda m, k, grid=grid: pm_ops.potential_mesh(
        m, k, grid, method="matmul"))
    solve_comp = jax.jit(lambda m, k, grid=grid: pm_ops.potential_ext(
        m, k, grid, method="matmul"))
    t_sol_f = timeit("solve full matmul", solve_full, mesh_f, kern)
    t_sol_c = timeit("solve compact matmul", solve_comp, mesh_c, kern)

    # kernel_hat rides as a TRACED ARGUMENT of every jit below, never a
    # functools.partial closure: a closed-over table inlines into the
    # HLO as a literal and the grid=256 program text then exceeds the
    # remote compile helper's request-body limit (HTTP 413 — both the
    # r4w20 run and the first r5w1 rerun died on this; the production
    # path threads it the same way via Simulation._jit_consts).
    gat_full = jax.jit(lambda p, m, k: pm_ops.acc_from_mesh(
        p, m, kernel_hat=k, box_min=box_min, inv_h=inv_h, grid=grid))
    gat_comp = jax.jit(lambda p, m, k: pm_ops.acc_from_mesh_compact(
        p, m, kernel_hat=k, box_min=box_min, inv_h=inv_h, grid=grid))
    t_gat_f = timeit("solve+grad+gather full", gat_full, pos, mesh_f, kern)
    t_gat_c = timeit("solve+grad+gather compact", gat_comp, pos, mesh_c,
                     kern)

    # whole-step A/B: the production acc_pm is now compact; reconstruct
    # the old full path inline for the reference side
    def full_step(p, m, k):
        mesh = pm_ops.deposit_cic(p, m, box_min=box_min, inv_h=inv_h,
                                  grid=grid)
        return pm_ops.acc_from_mesh(p, mesh, kernel_hat=k,
                                    box_min=box_min, inv_h=inv_h, grid=grid)

    acc_full = jax.jit(full_step)
    acc_comp = jax.jit(lambda p, m, k: pm_ops.acc_pm(
        p, m, kernel_hat=k, box_min=box_min, h=h, grid=grid))
    t_full = timeit("acc_pm full pipeline", acc_full, pos, mass, kern)
    t_comp = timeit("acc_pm compact pipeline", acc_comp, pos, mass, kern)
    print(f"  grid={grid}: whole-pass speedup {t_full / t_comp:.2f}x "
          f"(deposit {t_dep_f / t_dep_c:.2f}x, solve "
          f"{t_sol_f / t_sol_c:.2f}x, solve+gather "
          f"{t_gat_f / t_gat_c:.2f}x)", flush=True)

print("PM COMPACT DONE", flush=True)
