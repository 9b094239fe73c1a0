"""TreePM chip-accuracy diagnostic: why did the r4w4 scorecard measure
treepm med err 0.252 ~= raw pm's 0.261 on random_cluster(1M), when the
same pipeline on CPU measures ~5e-3 (f64, 16k) and the split math is an
algebraic identity?

Decomposes the TreePM force at the initial state into its mesh (long)
and pair (short) halves and errors each piece against the exact
all-pairs Pallas force, for both split families, at N=262144 (a size
with a CPU-f64 comparison row: plain pm med err 7.7e-2 at grid=64) and
N=1M (the scorecard's size). If the long half carries the 0.25, the
chip's mesh pipeline (f32 CIC / 256^3 FFT) is the defect; if the short
half does, the pair-tile path at unsaturated k_near is.

Run detached: nohup python benches/r4_treepm_diag.py > log 2>&1 &
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
from spacetpu.ops import treepm as treepm_ops

EPS = 1e-2
GRID = benchenv.size(128, 32)
SIZES = ([262144, 1000000] if benchenv.size(1, 0) else [4096])

print(f"platform={jax.devices()[0].platform} grid={GRID}", flush=True)


def fence(x):
    float(jnp.sum(x.ravel()[:16]))


def stats(a, a_ref, nrm):
    rel = np.linalg.norm(np.asarray(a, np.float64) - a_ref, axis=1) / nrm
    return f"med={np.median(rel):.3e} p90={np.percentile(rel, 90):.3e}"


for N in SIZES:
    scene = presets.random_cluster(N, seed=0)
    sim_x = make_simulation(N, algorithm="direct", backend="auto",
                            softening="plummer", eps=EPS, g=scene.g)
    t0 = time.perf_counter()
    st = sim_x.prime(scene.state(dtype=jnp.float32))
    a_exact = np.asarray(st.acc, np.float64)
    nrm = np.maximum(np.linalg.norm(a_exact, axis=1), 1e-300)
    print(f"N={N}: exact prime {time.perf_counter() - t0:.1f}s", flush=True)
    del sim_x, st

    pos = jnp.asarray(np.asarray(scene.pos), jnp.float32)
    mass = jnp.asarray(np.asarray(scene.mass), jnp.float32)

    # raw PM row (the r4w4 comparator)
    sim_pm = make_simulation(N, algorithm="pm", pm_grid=GRID,
                             softening="plummer", eps=EPS, g=scene.g)
    st = sim_pm.prime(scene.state(dtype=jnp.float32))
    print(f"N={N}: pm           {stats(st.acc, a_exact, nrm)}", flush=True)
    del sim_pm, st

    # TreePM decomposition, both splits, direct ops calls (no facade)
    box_min, h = pm_ops.measure_box(pos, grid=GRID, margin=2.0)
    rs, rcut = treepm_ops.split_params(h)
    gg = -(-N // 255)
    m = treepm_ops.measure_near_rcut(pos, mass, rcut=rcut, gg=gg, leaf=255)
    print(f"N={N}: caps k_near={m['k_near']} tiles={m['near_tiles']} "
          f"rcut={rcut:.4g} rs={rs:.4g} h={h:.4g}", flush=True)
    for split in ("gauss", "poly"):
        khat = treepm_ops.make_kernel_hat(split, GRID, h, rs, rcut,
                                          g=scene.g, dtype=jnp.float32)

        @jax.jit
        def f_long(p, ms, kh):
            return pm_ops.acc_pm(p, ms, kernel_hat=kh,
                                 box_min=jnp.asarray(box_min), h=h,
                                 grid=GRID)

        @jax.jit
        def f_tp(p, ms, kh):
            return treepm_ops.acc_treepm(
                p, ms, kernel_hat=kh, box_min=jnp.asarray(box_min), h=h,
                grid=GRID, rs=rs, rcut=rcut, split=split,
                softening="plummer", eps=EPS, g=scene.g,
                k_near=m["k_near"], gg=gg, leaf=255,
                near_tiles=m["near_tiles"],
                backend="pallas" if jax.devices()[0].platform == "tpu"
                else "xla")

        a_long = f_long(pos, mass, khat)
        fence(a_long)
        a_tp = f_tp(pos, mass, khat)
        fence(a_tp)
        a_long_np = np.asarray(a_long, np.float64)
        a_tp_np = np.asarray(a_tp, np.float64)
        a_short_np = a_tp_np - a_long_np
        short_frac = np.median(
            np.linalg.norm(a_short_np, axis=1) / nrm)
        # the short half's own truth: exact minus the long MODEL evaluated
        # pairwise is not available in O(N) — report instead the residual
        # err of the total and of long-only (long-only err >> total err
        # means the short pass IS doing its job)
        print(f"N={N}: treepm[{split:5s}] total {stats(a_tp_np, a_exact, nrm)}"
              f"  long-only {stats(a_long_np, a_exact, nrm)}"
              f"  med|short|/|exact|={short_frac:.3e}", flush=True)

print("TREEPM DIAG DONE", flush=True)
