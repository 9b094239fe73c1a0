"""Round-5: chip A/B of the hybrid (MXU-accumulation) near-pair kernels.

Commit e3fb0b6 routes the near/short pair passes' force accumulation
through the systolic array (tree._kernel_pairs_hybrid,
treepm._kernel_pairs_short_hybrid): pair weights from the same exact
differences, the O(TI*TJ) accumulation as W @ [x_j - c | 1] with a
tile-centered rank-1 correction. CPU-equivalence is pinned to ~3e-6
relative (tests/test_tree.py, tests/test_treepm.py); this measures
whether the MXU actually buys step time at production scale:

  tree   1M theta=0.5 quad pairs  — vpu vs mxu step + force agreement
  treepm 1M grid=256 poly         — vpu vs mxu step + force agreement

Run detached: nohup python benches/r5_pairs_mxu.py > log 2>&1 &
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

N = benchenv.size(1_000_000, 4096)
REPS = benchenv.size(5, 2)

print(f"platform={jax.devices()[0].platform} N={N}", flush=True)

scene = presets.fixed_cloud(N)


def fence(x):
    float(jnp.sum(x.ravel()[:8]))


def run(algo, method, **kw):
    sim = make_simulation(scene.n, algorithm=algo, softening="plummer",
                          eps=1e-2, g=scene.g, integrator="leapfrog",
                          pallas_method=method, **kw)
    st = sim.prime(scene.state(dtype=jnp.float32))
    acc0 = np.asarray(st.acc, np.float64)
    t0 = time.perf_counter()
    st = sim.step(st, 10.0)
    fence(st.pos)
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        st = sim.step(st, 10.0)
        fence(st.pos)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  {algo:7s} {method}: {ms:8.1f} ms/step (compile {t_c:.0f}s) "
          f"caps={sim.caps}", flush=True)
    del sim, st
    return ms, acc0


for algo, kw in (("tree", dict(theta=0.5, k_near="auto")),
                 ("treepm", {})):
    print(f"=== {algo} fixed_cloud({scene.n}) ===", flush=True)
    ms_v, acc_v = run(algo, "vpu", **kw)
    ms_m, acc_m = run(algo, "mxu", **kw)
    scale = np.maximum(np.linalg.norm(acc_v, axis=1), 1e-300)
    rel = np.linalg.norm(acc_m - acc_v, axis=1) / scale
    print(f"  {algo}: mxu/vpu step {ms_v / ms_m:.2f}x speedup; prime-force "
          f"delta med {np.median(rel):.2e} p99 "
          f"{np.percentile(rel, 99):.2e} max {rel.max():.2e}", flush=True)

print("PAIRS MXU AB DONE", flush=True)
