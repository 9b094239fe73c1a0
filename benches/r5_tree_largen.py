"""Round-5: cached-tree step cost at 8M/16M — complete the solver curve.

The r5w8 probe corrected the 4M picture: with the structure cache
(tree_refresh_every=8) the tree steps 1890 ms at 4M — 2.1x FASTER than
TreePM's 4018 (the 4M A/B's 19.8 s tree tick was its hot-sampling
harness starving the sim thread, not the solver). The capacity ladder
(r5w1/r5w3) only ever measured TreePM at 8M/16M; this measures the
cached tree there, completing the single-chip accurate-tier curve:

  1M: tree 383.5 ms/tick vs treepm 644      (r5w2)
  4M: tree 1890 ms/step vs treepm 4018      (r5w8 / r5w6)
  8M: tree ?    vs treepm 7109  (grid=512, r5w3)
 16M: tree ?    vs treepm 20916 (grid=512, r5w3)

Rungs are independent; an OOM at 16M leaves the 8M number standing (the
near-list HBM footprint at 16M is the open question — the r4w6
dense-near worker-fault shape is guarded, fixed_cloud is uniform).

Run detached: nohup python benches/r5_tree_largen.py > log 2>&1 &
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

NS = benchenv.size((8_000_000, 16_000_000), (65_025,))
WINDOW = benchenv.size(90.0, 2.0)
REFRESH = 8

print(f"platform={jax.devices()[0].platform} rungs={NS} refresh={REFRESH}",
      flush=True)


def fence(st):
    float(jnp.sum(st.pos.ravel()[:8]))


results = []
for n_req in NS:
    scene = presets.fixed_cloud(n_req)
    print(f"=== fixed_cloud({scene.n}) tree th=0.5 k_near=auto "
          f"refresh={REFRESH} ===", flush=True)
    try:
        sim = make_simulation(scene.n, algorithm="tree", theta=0.5,
                              k_near="auto", near_mode="pairs",
                              softening="plummer", eps=1e-2, g=scene.g,
                              integrator="leapfrog",
                              tree_refresh_every=REFRESH)
        st = sim.prime(scene.state(dtype=np.float32))
        t0 = time.perf_counter()
        structure = sim.build_structure(st)
        st = sim.step_cached(st, structure, 10.0)
        fence(st)
        print(f"  .. structure+first step (+compile) "
              f"{time.perf_counter() - t0:.0f}s caps={sim.caps}", flush=True)
        t0 = time.perf_counter()
        k = 0
        while time.perf_counter() - t0 < WINDOW:
            if k % REFRESH == 0:
                structure = sim.build_structure(st)
            st = sim.step_cached(st, structure, 10.0)
            fence(st)
            k += 1
        ms = (time.perf_counter() - t0) / max(k, 1) * 1e3
        h = sim.health(st)
        print(f"  {k} steps, {ms:.0f} ms/step (amortized incl. rebuild "
              f"every {REFRESH})  health={h}", flush=True)
        results.append((scene.n, ms))
        del sim, st, structure
    except Exception as e:  # noqa: BLE001
        print(f"  FAILED at N={scene.n}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:300]}", flush=True)
        continue

for n, ms in results:
    print(f"TREE LARGEN RESULT: N={n} {ms:.0f} ms/step cached", flush=True)
print("TREE LARGEN DONE", flush=True)
