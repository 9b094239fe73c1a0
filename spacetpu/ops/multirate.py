"""Two-level multirate (block-timestep) leapfrog.

Astrophysical N-body systems are multi-scale: a handful of bodies in close
encounters or tight orbits need a far smaller timestep than the bulk. The
classic answer is individual/block timesteps (Aarseth-style, cf. the
hierarchical-timestep treecodes in PAPERS.md); the reference has nothing of
the kind — one global dt for every body (`/root/reference/space/src/sim/
direct.rs:8-24`). A literal per-body timestep is hostile to TPUs (dynamic
shapes, divergent control flow), so this module implements the TPU-native
form: a **static-capacity fast set**.

Per outer step of ``dt`` with ``substeps = m`` and fast capacity ``F``:

1. One full force pass per outer step (the cached ``state.acc``), exactly
   like plain leapfrog.
2. The ``F`` bodies with the smallest dynamical time ``tau = |v| / |a|``
   are gathered into a fixed-shape fast buffer (``lax.top_k`` — reselected
   every step, no host sync).
3. Slow bodies take the standard KDK step: their drift is linear in time,
   so their position at any intra-step time ``t`` is known in closed form
   (``pos + v_half * t``).
4. Fast bodies take ``m`` KDK substeps of ``h = dt/m``. Each substep's
   force is a rectangular all-pairs pass (`direct.acc_cross`): F fast
   targets against ALL N sources, with slow sources evaluated on their
   exact drift trajectory at the substep time and fast sources at their
   current substep positions (self-pairs vanish identically). Cost
   ``(m-1) * F * N`` pairs instead of ``(m-1) * N^2``.
5. The final substep's force evaluation coincides with the end-of-step
   full pass (every source is at its final position), so it is shared:
   one ``acc_fn`` call closes both the slow bodies' second kick and the
   fast bodies' final half-kick, and refills the acc cache.

Properties:

- ``F = N`` reduces to ``m`` plain leapfrog steps at ``dt/m`` exactly in
  real arithmetic (to rounding in floats: adjacent half-kicks are merged
  into full kicks) — pinned by tests/test_multirate.py. The machinery
  adds no approximation of its own.
- ``m = 1`` reduces to plain leapfrog at ``dt``.
- The approximation for ``F < N`` is the standard block-timestep one:
  slow bodies feel the fast bodies' intra-step motion only through the
  endpoint kicks (the back-reaction is subsampled), while fast bodies
  feel everything continuously. Momentum is no longer conserved to
  machine precision — the error enters at O(dt^3) per step and is
  measured, not assumed, by the test suite.
- Pair evaluations per outer step: ``N^2 + (m-1) * F * N`` vs plain
  fine-stepping's ``m * N^2`` — a ``~m / (1 + (m-1)F/N)`` speedup at
  matched fast-body accuracy.

Kahan compensation (``pos_c``/``vel_c``) is carried through both the slow
step and the fast substeps when present.

With the tree solver, the outer full pass keeps its multipole
approximation while the fast set's substep forces are exact all-pairs
rows — close encounters (exactly where theta-opening error hurts most)
get both finer time resolution AND exact forces; only the final h/2 kick
reuses the shared tree pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spacetpu.ops import direct
from spacetpu.ops.integrators import _comp_add
from spacetpu.state import State

#: denominator floor for tau = v_eff/|a| (avoids 0/0 on padding rows)
_TINY = 1e-30


def dynamical_time(vel, acc):
    """Per-body timescale ``tau = (|v| + 1e-3 * mean|v|) / |a|``.

    The speed floor (a small fraction of the mean speed) keeps bodies at
    an instantaneous turning point — or a stationary central mass with a
    near-zero net force — from registering tau=0 and flooding the fast
    set: with v=0 the ranking falls back to 1/|a|, so only genuinely
    large accelerations still rank fast. Rows with v=0 AND a=0 (padding)
    get tau=+inf (slow)."""
    v = jnp.linalg.norm(vel, axis=-1)
    a = jnp.linalg.norm(acc, axis=-1)
    v_eff = v + 1e-3 * jnp.mean(v)
    tau = v_eff / (a + jnp.asarray(_TINY, a.dtype))
    return jnp.where((v == 0) & (a == 0), jnp.inf, tau)


def select_fast(state: State, cap: int) -> jax.Array:
    """Indices of the `cap` bodies with the smallest dynamical time
    (computed from the cached acceleration — no force pass). Padding
    rows (>= n_active) are forced slow."""
    tau = dynamical_time(state.vel, state.acc)
    if state.n_active is not None:
        rows = jnp.arange(state.n, dtype=jnp.int32)
        tau = jnp.where(rows < state.n_active, tau, jnp.inf)
    _, idx = jax.lax.top_k(-tau, cap)
    return idx


def step_multirate(state: State, dt, acc_fn, *, substeps: int, fast_cap: int,
                   softening: str, eps, g, backend: str = "xla") -> State:
    """One outer step of two-level multirate leapfrog (see module docstring).

    ``acc_fn(pos, mass) -> acc`` is the full force pass (any backend);
    the rectangular fast-target passes use the tiled Pallas cross kernel
    on ``backend="pallas"`` (TPU) and `direct.acc_cross` otherwise.
    """
    m = int(substeps)
    cap = int(fast_cap)
    if backend == "pallas":
        from spacetpu.ops import pallas_direct

        def cross(pos_t, pos_s, mass_s):
            return pallas_direct.acc_cross_pallas(
                pos_t, pos_s, mass_s, softening=softening, eps=eps, g=g)
    else:
        # bound the broadcasted (F, chunk, 3) intermediate to ~2^28 elems
        # (the Pallas path streams j-tiles and needs no such cap)
        chunk = max(1024, (1 << 28) // max(3 * cap, 1))

        def cross(pos_t, pos_s, mass_s):
            return direct.acc_cross_chunked(
                pos_t, pos_s, mass_s, softening=softening, eps=eps, g=g,
                chunk=chunk)
    dt = jnp.asarray(dt, state.pos.dtype)
    h = dt / m

    idx = select_fast(state, cap)

    # --- slow step, phase 1: first kick (dt/2) + the linear drift law.
    # Computed for ALL rows; fast rows get overwritten by the substep
    # results at the end, so the waste is one (N,3) fma.
    v_half, vel_c = _comp_add(state.vel, state.vel_c, state.acc * (dt * 0.5))

    # --- fast substeps. Gather the fast rows (and their compensation).
    pos_f = state.pos[idx]
    vel_f = state.vel[idx]
    pc_f = None if state.pos_c is None else state.pos_c[idx]
    vc_f = None if state.vel_c is None else state.vel_c[idx]
    # first kick: h/2 from the cached acceleration
    vel_f, vc_f = _comp_add(vel_f, vc_f, state.acc[idx] * (h * 0.5))

    def substep(carry, k):
        pos_f, vel_f, pc_f, vc_f = carry
        pos_f, pc_f = _comp_add(pos_f, pc_f, vel_f * h)
        # sources at t = k*h: every body on its drift trajectory, with the
        # fast rows replaced by their current substep positions
        t = k.astype(dt.dtype) * h
        src = state.pos + v_half * t
        src = src.at[idx].set(pos_f)
        a_f = cross(pos_f, src, state.mass)
        vel_f, vc_f = _comp_add(vel_f, vc_f, a_f * h)
        return (pos_f, vel_f, pc_f, vc_f), None

    if m > 1:
        (pos_f, vel_f, pc_f, vc_f), _ = jax.lax.scan(
            substep, (pos_f, vel_f, pc_f, vc_f),
            jnp.arange(1, m, dtype=jnp.int32),
        )
    # final drift to t = dt (for m == 1 this is the only drift)
    pos_f, pc_f = _comp_add(pos_f, pc_f, vel_f * h)

    # --- assemble final positions; ONE full force pass closes everything:
    # slow second kick (dt/2), fast final half-kick (h/2 — the sources all
    # sit at their final positions, so the rectangular pass at k=m would
    # compute exactly these rows), and the next step's acc cache.
    pos1, pos_c = _comp_add(state.pos, state.pos_c, v_half * dt)
    pos1 = pos1.at[idx].set(pos_f)
    if pos_c is not None:
        pos_c = pos_c.at[idx].set(pc_f)
    acc1 = acc_fn(pos1, state.mass)

    vel1, vel_c = _comp_add(v_half, vel_c, acc1 * (dt * 0.5))
    vel_f, vc_f = _comp_add(vel_f, vc_f, acc1[idx] * (h * 0.5))
    vel1 = vel1.at[idx].set(vel_f)
    if vel_c is not None:
        vel_c = vel_c.at[idx].set(vc_f)

    return state._replace(
        pos=pos1, vel=vel1, acc=acc1, pos_c=pos_c, vel_c=vel_c,
        time=None if state.time is None else state.time + dt,
    )
