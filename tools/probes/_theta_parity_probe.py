"""Accuracy parity: our quad tree at theta=0.5 vs the REFERENCE octree
at its default theta=0.3 (constants.rs:30).

Motivation (logs/r4w17_r4_engine_auto.log): the interactive auto tree
tier runs the reference-parity theta=0.3 and ticks plummer(1M) at
2992 ms, while theta=0.5 ticks at 1346 ms. If our quadrupole far field
at theta=0.5 already produces LOWER force error than the reference's
monopole octree at theta=0.3, the interactive tier can take the 2.2x
and still beat the reference's own accuracy bar.

Pure CPU, f64, exact-force baseline from the native oracle's direct
sum. Measures median / p90 / p99 relative force error on plummer and
colliding-plummers clouds at N=32k.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from spacetpu import native
from spacetpu.models import presets
from spacetpu.ops import tree

N = 32768
EPS = 1e-3


def errs(acc, ref):
    e = np.linalg.norm(acc - ref, axis=1) / np.linalg.norm(ref, axis=1)
    return tuple(float(np.quantile(e, q)) for q in (0.5, 0.9, 0.99))


def our_tree(pos, mass, theta, order, mode="equal"):
    acc = tree.acc_tree(
        pos.astype(np.float64), mass.astype(np.float64), theta=theta,
        softening="plummer", eps=EPS, g=1.0, backend="xla",
        multipole_order=order, cluster_mode=mode)
    return np.asarray(acc)


for name, scene in [
        ("plummer", presets.plummer_sphere(N, seed=3)),
        ("colliding", presets.colliding_plummers(N, seed=4))]:
    st = scene.state(dtype=np.float64)
    pos = np.asarray(st.pos, np.float64)
    mass = np.asarray(st.mass, np.float64)
    exact = native.acc_direct(pos, mass, g=1.0, eps=EPS,
                              softening="plummer")
    rows = [
        ("ref octree  th=0.3 mono", native.acc_barnes_hut(
            pos, mass, theta=0.3, g=1.0, eps=EPS, softening="plummer")),
        ("ref octree  th=0.5 mono", native.acc_barnes_hut(
            pos, mass, theta=0.5, g=1.0, eps=EPS, softening="plummer")),
        ("our tree    th=0.3 quad", our_tree(pos, mass, 0.3, 2)),
        ("our tree    th=0.5 quad", our_tree(pos, mass, 0.5, 2)),
        ("our tree    th=0.5 mono", our_tree(pos, mass, 0.5, 1)),
        ("our tree ad th=0.4 quad", our_tree(pos, mass, 0.4, 2, "adaptive")),
        ("our tree ad th=0.5 quad", our_tree(pos, mass, 0.5, 2, "adaptive")),
        ("our tree ad th=0.6 quad", our_tree(pos, mass, 0.6, 2, "adaptive")),
    ]
    print(f"=== {name} N={N} (rel force err vs exact f64) ===")
    for label, acc in rows:
        m, p90, p99 = errs(np.asarray(acc), exact)
        print(f"  {label}: med={m:.2e} p90={p90:.2e} p99={p99:.2e}")
print("THETA PARITY PROBE DONE")
