"""TreePM phase decomposition at chip scale (why is it slower than tree?).

logs/r4w1_r3_treepm.log: the grid=128 TreePM step primes fine on chip
after the consts-as-arguments fix, but runs 0.56x the tree's speed at
N=1M and 0.37x at 4M — the near-tile cap explodes (174k tiles at 1M,
1.65M at 4M) because rcut is a fixed physical scale while the cluster
density grows with N. This times each phase of acc_treepm separately so
the fix (bigger grid? cheaper prep? near-kernel tuning?) is chosen from
data, mirroring what benches/r3_tree2_prof.py did for the sharded tree:

  full        — sim.step (donation-safe public path)
  prep        — morton sort + cluster stats + cutoff near lists + tiles
  short       — the Pallas short-range pair pass over the prep's tiles
  pm          — the whole long-range pass (deposit + FFT + gather)
  deposit     — CIC mass deposition alone (scatter-heavy)
  fft         — doubled-grid rFFT Poisson solve alone
  gather      — force interpolation (3x rFFT^-1 gradient + CIC gather)

Run detached: nohup python benches/r4_treepm_prof.py > log 2>&1 &
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

N = benchenv.size(1_000_000, 16_384)
GRID = int(os.environ.get("SPACETPU_TREEPM_GRID", benchenv.size(128, 32)))
BACKEND = benchenv.size("pallas", "xla")
REPS = 3


def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))


def timeit(name, fn, *args, reps=REPS):
    out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:40s} {dt:9.1f} ms", flush=True)
    return dt


print(f"platform={jax.devices()[0].platform} N={N} grid={GRID}", flush=True)

scene = presets.fixed_cloud(N)  # n = N + 1 (central body)
state = scene.state(dtype=jnp.float32)

sim = make_simulation(
    scene.n, algorithm="treepm", pm_grid=GRID, softening="plummer", eps=1e-3,
    g=scene.g, backend=BACKEND,
)
st = sim.prime(state)
mp = sim.mesh_params
caps = sim.caps
print(f"caps: k_near={caps['k_near']} tiles={caps['near_tiles']} "
      f"gg={caps['gg']} rcut={mp['rcut']:.3f} rs={mp['rs']:.3f} "
      f"h={mp['h']:.3f}", flush=True)

leaf = sim.config.resolved_leaf()
gg = -(-scene.n // leaf)
kernel_hat = mp["kernel_hat"]
box_min = jnp.asarray(mp["box_min"])
h, grid, rs, rcut = mp["h"], mp["grid"], mp["rs"], mp["rcut"]
pos, mass = st.pos, st.mass

# full step (public path; not donation-safe to repeat, so time run())
t0 = time.perf_counter()
cur = sim.step(st, 1e-3)
fence(cur.pos)
t0 = time.perf_counter()
for _ in range(REPS):
    cur = sim.step(cur, 1e-3)
fence(cur.pos)
print(f"{'full sim.step':40s} {(time.perf_counter()-t0)/REPS*1e3:9.1f} ms",
      flush=True)
pos, mass = cur.pos, cur.mass

prep_fn = jax.jit(lambda p, m: treepm_ops.treepm_prep(
    p, m, rcut=rcut, k_near=caps["k_near"], gg=gg, leaf=leaf,
    near_tiles=caps["near_tiles"]))
timeit("prep (sort+stats+lists+tiles)", prep_fn, pos, mass)

prep = jax.tree_util.tree_map(lambda x: x, prep_fn(pos, mass))
# measure the PRODUCTION split kernel (r4w11 measured the non-default
# Chebyshev-gauss branch here by omission: 1442 ms standalone while the
# poly full step ran 1111 ms — the split arg must track the sim's)
split = sim.config.resolved_treepm_split()
short_fn = jax.jit(lambda pr: treepm_ops._short_eval(
    pr, softening="plummer", eps=1e-3, g=scene.g, rs=rs, rcut=rcut,
    split=split, backend=BACKEND))
timeit(f"short-range pairs (given prep, {split})", short_fn, prep)

pm_fn = jax.jit(lambda p, m, k, b: pm_ops.acc_pm(
    p, m, kernel_hat=k, box_min=b, h=h, grid=grid))
timeit("pm long-range (deposit+fft+gather)", pm_fn, pos, mass,
       kernel_hat, box_min)

inv_h = 1.0 / h
dep_fn = jax.jit(lambda p, m, b: pm_ops.deposit_cic(
    p, m, box_min=b, inv_h=inv_h, grid=grid))
timeit("deposit (CIC scatter)", dep_fn, pos, mass, box_min)

mesh = dep_fn(pos, mass, box_min)
pot_fn = jax.jit(lambda mm, k: pm_ops.potential_mesh(mm, k, grid=grid))
timeit("poisson (doubled-grid rfft)", pot_fn, mesh, kernel_hat)

gat_fn = jax.jit(lambda p, mm, k, b: pm_ops.acc_from_mesh(
    p, mm, kernel_hat=k, box_min=b, inv_h=inv_h, grid=grid))
timeit("solve+gradient+CIC interp", gat_fn, pos, mesh,
       kernel_hat, box_min)

print("TREEPM PROF DONE", flush=True)
