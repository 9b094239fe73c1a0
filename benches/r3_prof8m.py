"""Round-3: decompose the 4M->8M superlinearity (current code).

The largen re-run (logs/r3_largen2.log) shows the equal-mode step going
2041 -> 5177 ms for 2x N while the near TILE count only doubles
(295284 -> 621331) — so the growth is NOT in the near pair kernel's
useful work. This profiles, at fixed_cloud(4M) and (8M) with measured
caps (equal, theta=0.5, far3+pairs — the auto-policy configuration):

  tree_prep (full)   — sort + clustering + near/mid/m1/m2 lists+segments
  tree_eval (cached) — summaries + dense super + M1 + M2 + near passes
  sim.step           — the production uncached step (prep + eval + KDK)
  amortized(R=8)     — prep/8 + eval: what run(tree_refresh_every=8) pays

If prep is the superlinear part, the fix is structure reuse (already
shipped: tree_refresh_every) + a cheaper near-list build; if eval is,
the dense-super pass (O(S^2)) is the next suspect. Run detached:
  nohup python benches/r3_prof8m.py > logs/r3_prof8m.log 2>&1 &
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacetpu.utils import benchenv

benchenv.force_platform()

import jax.numpy as jnp

from spacetpu import make_simulation
from spacetpu.models import presets
from spacetpu.ops import tree

# smoke: n=65025 -> scene.n=65026 -> gg=256 (SUPER-aligned, so the same
# k_mid/M1/M2 measurement path as 4M/8M runs — see measure_near's
# `gg % SUPER == 0` gate)
NS = benchenv.size((4_000_000, 8_000_000), (65_025,))
BACKEND = benchenv.size("pallas", "xla")


def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:42s} {dt:8.1f} ms", flush=True)
    return out, dt


for n in NS:
    print(f"=== fixed_cloud({n}) equal/far3/pairs theta=0.5 ===", flush=True)
    scene = presets.fixed_cloud(n)
    n = scene.n
    state = scene.state(dtype=jnp.float32)
    pos = jnp.asarray(state.pos)
    mass = jnp.asarray(state.mass)
    gg = tree._gg_for(n, "auto", 2, tree.LEAF, "equal")
    t0 = time.perf_counter()
    m = tree.measure_near(pos, mass, theta=0.5, gg=gg, cluster_mode="equal")
    print(f"caps: {m}  measure_t={time.perf_counter() - t0:.1f}s", flush=True)
    kw = dict(theta=0.5, k_near=m["k_near"], gg=gg, far_levels=3,
              near_mode="pairs", k_super=m["k_super"], k_mid=m["k_mid"],
              near_tiles=m["near_tiles"], near_tiles_q=m["near_tiles_q"],
              m1_src_tiles=m["m1_src_tiles"], m2_src_tiles=m["m2_src_tiles"])

    prep_f = jax.jit(lambda p, q: tree.tree_prep(p, q, **kw))
    prep, t_prep = timeit("tree_prep (full)", prep_f, pos, mass)

    eval_f = jax.jit(lambda pr: tree.tree_eval(
        pr, 0, gg, softening="plummer", eps=1e-2, g=scene.g,
        backend=BACKEND, interpret=False, multipole_order=2,
        far_levels=3, near_mode="pairs"))
    _, t_eval = timeit("tree_eval (cached prep)", eval_f, prep)
    del prep

    sim = make_simulation(
        n, algorithm="tree", theta=0.5, k_near="auto",
        cluster_mode="equal", near_mode="pairs", far_levels=3,
        g=scene.g, softening="plummer", eps=1e-2)
    st = sim.prime(state)
    # sim.step donates its state arg — time with reassignment
    st = sim.step(st, jnp.float32(10.0))
    fence(st.pos)
    t0 = time.perf_counter()
    for _ in range(3):
        st = sim.step(st, jnp.float32(10.0))
    fence(st.pos)
    t_step = (time.perf_counter() - t0) / 3 * 1e3
    print(f"{'sim.step (uncached)':42s} {t_step:8.1f} ms", flush=True)
    print(f"amortized(R=8) ~ prep/8 + eval = "
          f"{t_prep / 8 + t_eval:.1f} ms", flush=True)
    del sim, st, state, pos, mass
print("PROF8M DONE", flush=True)
