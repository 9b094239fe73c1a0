"""Round-5: chip A/B of the two Pallas all-pairs kernels (vpu vs mxu).

`ops/pallas_direct.py` has carried an MXU-assisted variant since round 1
(`method="mxu"`: r^2 by expanded-form Xi.Xj^T on the systolic array, the
force accumulation as W @ [xj|1], leaving ~8 VPU ops/pair instead of
~22) — but it was never chip-measured. The VPU kernel's 1.85e11 pairs/s
at N=256k works out to ~4 Tflop f32 on the vector unit, i.e. near the
VPU roofline; routing ~2/3 of the per-pair arithmetic through the MXU
(which idles in the vpu kernel) is the only way up.

Measures, at the headline config (N=256k, plummer eps=1e-2, f32):

  - pairs/s for vpu (production tile) and mxu over a tile sweep
  - accuracy of BOTH kernels against a host f64 all-pairs oracle on a
    2048-target sample (the mxu expanded form loses ~|x|^2 eps_f32 / d2
    on close pairs — the A/B decides whether that band stays inside the
    vpu kernel's own f32 noise at production softening)

Run detached: nohup python benches/r5_direct_mxu.py > log 2>&1 &
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

from spacetpu.models import presets
from spacetpu.ops import pallas_direct

N = benchenv.size(262_144, 4096)
REPS = benchenv.size(10, 2)
EPS = 1e-2
SAMPLE = benchenv.size(2048, 256)
MXU_TILES = benchenv.size(((512, 2048), (256, 2048), (512, 1024),
                           (1024, 2048), (512, 4096)),
                          ((256, 512),))

print(f"platform={jax.devices()[0].platform} N={N} eps={EPS} reps={REPS}",
      flush=True)

scene = presets.random_cluster(N, seed=0, g=1.0)
st = scene.state(dtype=jnp.float32)
pos, mass = st.pos, st.mass


def fence(x):
    float(jnp.sum(x.ravel()[:8]))


def timeit(name, fn):
    t0 = time.perf_counter()
    fence(fn())
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        fence(fn())
    s = (time.perf_counter() - t0) / REPS
    rate = N * N / s
    print(f"  {name:28s} {s * 1e3:8.2f} ms  {rate:.3e} pairs/s "
          f"(compile {t_c:.1f}s)", flush=True)
    return s, rate


results = {}
results["vpu 512x2048"] = timeit(
    "vpu 512x2048 (production)",
    lambda: pallas_direct.acc_direct_pallas(
        pos, mass, softening="plummer", eps=EPS, g=scene.g, method="vpu"))

for ti, tj in MXU_TILES:
    try:
        results[f"mxu {ti}x{tj}"] = timeit(
            f"mxu {ti}x{tj}",
            lambda ti=ti, tj=tj: pallas_direct.acc_direct_pallas(
                pos, mass, softening="plummer", eps=EPS, g=scene.g,
                method="mxu", tile_i=ti, tile_j=tj))
    except Exception as e:  # noqa: BLE001 — a tile that doesn't fit VMEM
        print(f"  mxu {ti}x{tj} FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)

# --- accuracy vs a host f64 oracle on a target sample ---
print("accuracy vs f64 oracle on "
      f"{SAMPLE} sampled targets:", flush=True)
acc_vpu = np.asarray(pallas_direct.acc_direct_pallas(
    pos, mass, softening="plummer", eps=EPS, g=scene.g, method="vpu"))
acc_mxu = np.asarray(pallas_direct.acc_direct_pallas(
    pos, mass, softening="plummer", eps=EPS, g=scene.g, method="mxu"))

rng = np.random.default_rng(0)
idx = rng.choice(N, size=SAMPLE, replace=False)
p64 = np.asarray(pos, np.float64)
m64 = np.asarray(mass, np.float64)
exact = np.empty((SAMPLE, 3))
for k, i in enumerate(idx):
    d = p64 - p64[i]
    w = scene.g * m64 / (d[:, 0] ** 2 + d[:, 1] ** 2 + d[:, 2] ** 2
                         + EPS * EPS) ** 1.5
    exact[k] = (w[:, None] * d).sum(axis=0)
scale = np.linalg.norm(exact, axis=1) + 1e-300


def err_stats(tag, acc):
    e = np.linalg.norm(acc[idx] - exact, axis=1) / scale
    print(f"  {tag:6s} rel err med {np.median(e):.3e}  p99 "
          f"{np.percentile(e, 99):.3e}  max {e.max():.3e}", flush=True)
    return np.median(e)


err_stats("vpu", acc_vpu)
err_stats("mxu", acc_mxu)

best = max(results.items(), key=lambda kv: kv[1][1])
print(f"MXU AB RESULT: best {best[0]} at {best[1][1]:.3e} pairs/s vs vpu "
      f"{results['vpu 512x2048'][1]:.3e} "
      f"({best[1][1] / results['vpu 512x2048'][1]:.2f}x)", flush=True)
print("MXU AB DONE", flush=True)
