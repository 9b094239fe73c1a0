"""Chip probe: CIC deposit variants at N=1M, grid=128 (doubled 256^3).

The r4w3 TreePM phase profile put the mass deposit at ~88 ms of the
152 ms mesh pass — the single largest PM phase. All variants compute the
identical mesh (checked against the incumbent to roundoff); this times:

  base      — incumbent: 8 scatter-adds in body order (ops/pm.deposit_cic)
  sorted8   — sort bodies by base cell id once, then the same 8
              scatter-adds with indices_are_sorted=True (corner ids are
              base + const, so ONE argsort sorts all eight scatters)
  fused1    — one concatenated (8N,) scatter, unsorted
  fused1s   — one concatenated (8N,) scatter built from base-sorted
              bodies, interleaved so ids stay monotone? they don't
              (corner offsets interleave) — measured as sorted=False but
              with locality
  seg       — base-sorted + segment-boundary dedup: sum runs of equal
              ids with jnp.segment_sum-style ops, then scatter unique
              ids (sorted+unique hints)

Run detached: nohup python tools/probes/_deposit_probe.py > log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..")))

import jax

from spacetpu.utils import benchenv

benchenv.force_platform()

import jax.numpy as jnp
import numpy as np

from spacetpu.models import presets
from spacetpu.ops import pm as pm_ops

N = benchenv.size(1_000_000, 4096)
GRID = benchenv.size(128, 16)
REPS = benchenv.size(10, 2)

print(f"platform={jax.devices()[0].platform} N={N} grid={GRID}", flush=True)

scene = presets.random_cluster(N, seed=0)
pos = jnp.asarray(np.asarray(scene.pos), jnp.float32)
mass = jnp.asarray(np.asarray(scene.mass), jnp.float32)
box_min, h = pm_ops.measure_box(pos, grid=GRID, margin=2.0)
box_min_j = jnp.asarray(box_min, jnp.float32)
inv_h = jnp.float32(1.0 / h)
G2 = 2 * GRID


def corner_ids_weights(p, m):
    i0, f = pm_ops._cic(p, box_min_j, inv_h, GRID)
    ids, ws = [], []
    for (dx, dy, dz), w in pm_ops._corner_weights(f):
        ids.append(((i0[:, 0] + dx) * G2 + (i0[:, 1] + dy)) * G2
                   + (i0[:, 2] + dz))
        ws.append(m * w)
    return i0, f, ids, ws


@jax.jit
def dep_base(p, m):
    return pm_ops.deposit_cic(p, m, box_min=box_min_j, inv_h=inv_h,
                              grid=GRID)


@jax.jit
def dep_sorted8(p, m):
    i0, f = pm_ops._cic(p, box_min_j, inv_h, GRID)
    base = (i0[:, 0] * G2 + i0[:, 1]) * G2 + i0[:, 2]
    order = jnp.argsort(base)
    i0s, fs, ms = i0[order], f[order], m[order]
    mesh = jnp.zeros((G2 * G2 * G2,), m.dtype)
    for (dx, dy, dz), w in pm_ops._corner_weights(fs):
        lin = ((i0s[:, 0] + dx) * G2 + (i0s[:, 1] + dy)) * G2 + (i0s[:, 2] + dz)
        mesh = mesh.at[lin].add(ms * w, indices_are_sorted=True)
    return mesh.reshape(G2, G2, G2)


@jax.jit
def dep_fused1(p, m):
    _, _, ids, ws = corner_ids_weights(p, m)
    lin = jnp.concatenate(ids)
    w = jnp.concatenate(ws)
    mesh = jnp.zeros((G2 * G2 * G2,), m.dtype)
    return mesh.at[lin].add(w).reshape(G2, G2, G2)


@jax.jit
def dep_seg(p, m):
    # one (8N,) sorted id stream -> run-length segment sums -> one
    # sorted scatter of per-run totals (duplicate ids collapse, so the
    # scatter sees unique, monotone indices)
    _, _, ids, ws = corner_ids_weights(p, m)
    lin = jnp.concatenate(ids)
    w = jnp.concatenate(ws)
    order = jnp.argsort(lin)
    lin_s, w_s = lin[order], w[order]
    csum = jnp.cumsum(w_s)
    last = jnp.concatenate([lin_s[1:] != lin_s[:-1],
                            jnp.ones((1,), bool)])
    # total of each run = csum at run end minus csum at previous run end
    prev = jnp.concatenate([jnp.zeros((1,), csum.dtype),
                            jnp.where(last, csum, 0.0)[:-1]])
    # propagate previous run-end csum forward: use a max-scan on masked
    # csum (monotone nonneg) — masses are positive so csum is monotone
    prevmax = jax.lax.associative_scan(jnp.maximum, prev)
    tot = jnp.where(last, csum - prevmax, 0.0)
    tgt = jnp.where(last, lin_s, G2 * G2 * G2)  # dropped slot for non-ends
    mesh = jnp.zeros((G2 * G2 * G2 + 1,), m.dtype)
    mesh = mesh.at[tgt].add(tot, indices_are_sorted=False)
    return mesh[:-1].reshape(G2, G2, G2)


def fence(x):
    float(jnp.sum(x.ravel()[:4]) + jnp.sum(x.ravel()[-4:]))


ref = None
for name, fn in [("base", dep_base), ("sorted8", dep_sorted8),
                 ("fused1", dep_fused1), ("seg", dep_seg)]:
    try:
        t0 = time.perf_counter()
        out = fn(pos, mass)
        fence(out)
        t_c = time.perf_counter() - t0
        if ref is None:
            ref = np.asarray(out, np.float64)
            err = 0.0
        else:
            err = float(np.abs(np.asarray(out, np.float64) - ref).max()
                        / max(ref.max(), 1e-30))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(pos, mass)
        fence(out)
        ms = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:8s}: {ms:7.2f} ms  rel-err vs base {err:.2e} "
              f"(compile {t_c:.1f}s)", flush=True)
    except Exception as e:
        print(f"{name:8s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

print("DEPOSIT PROBE DONE", flush=True)
