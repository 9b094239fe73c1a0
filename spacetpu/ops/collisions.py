"""Collision handling: perfectly inelastic merging of overlapping bodies.

The reference stages a collision (`presets.rs:108-119`,
`big_boy_on_collision_course`) but bodies pass through each other — there
is no contact physics anywhere in it. This module adds the standard
N-body treatment on static TPU shapes:

- a pair overlaps when its separation is below the sum of its collision
  radii (by default the scene's body radii);
- the merge is perfectly inelastic: mass-weighted barycentric position
  and velocity (momentum-conserving by construction; the relative-motion
  kinetic energy is physically lost and reported), summed mass, and a
  volume-additive radius ``(r_i^3 + r_j^3)^(1/3)``;
- shapes never change: the absorbed body keeps riding along as a
  massless tracer at the merged barycenter with zero radius (invisible
  to the renderer, inert to the dynamics — massless sources contribute
  exactly zero under both softening laws).

One merge is applied per call (the globally closest overlapping pair);
callers check at their host-chunk cadence (`run_headless
--merge-collisions`), which resolves cascades a pair at a time — the
astrophysically relevant rate is far below one merge per chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spacetpu.ops import encounters
from spacetpu.state import State


@functools.partial(jax.jit, static_argnames=("chunk",))
def merge_closest(state: State, radii, *, chunk: int = 4096):
    """Merge the globally closest overlapping pair, if any.

    radii: (N,) collision radii (0 disables a body — absorbed bodies get
    exactly that). Returns (state, radii, merged, i, j) with `merged` a
    traced bool scalar and i, j the pair examined (meaningful when
    merged). Kahan compensation rows of an absorbed body are zeroed with
    it."""
    d, i, j = encounters.min_separation(state.pos, chunk=chunk)
    radii = jnp.asarray(radii, state.pos.dtype)
    # zero-radius rows never merge (that is what absorbed bodies become);
    # massless tracers with a radius still do (they can be absorbed).
    merged = (d < radii[i] + radii[j]) & (radii[i] > 0) & (radii[j] > 0)

    mi, mj = state.mass[i], state.mass[j]
    mtot = mi + mj
    # massless-massless contact: nothing to merge dynamically
    merged = merged & (mtot > 0)
    wi = jnp.where(mtot > 0, mi / jnp.where(mtot > 0, mtot, 1.0), 0.5)
    wj = 1.0 - wi
    pos_m = wi * state.pos[i] + wj * state.pos[j]
    vel_m = wi * state.vel[i] + wj * state.vel[j]
    r_m = (radii[i] ** 3 + radii[j] ** 3) ** (1.0 / 3.0)

    def apply(val, row_i, row_j, keep_j=None):
        """val[i] := row_i, val[j] := row_j when merged."""
        out = val.at[i].set(jnp.where(merged, row_i, val[i]))
        rj = row_j if keep_j is None else keep_j
        return out.at[j].set(jnp.where(merged, rj, out[j]))

    new = state._replace(
        pos=apply(state.pos, pos_m, pos_m),
        vel=apply(state.vel, vel_m, vel_m),
        mass=apply(state.mass, mtot, jnp.zeros((), state.mass.dtype)),
        # the acc cache is stale for the merged rows; refreshing it is the
        # caller's job (prime) — but zero it so a leapfrog first kick
        # cannot apply the pre-merge acceleration to the merged body
        acc=apply(state.acc, jnp.zeros(3, state.pos.dtype),
                  jnp.zeros(3, state.pos.dtype)),
        pos_c=None if state.pos_c is None else apply(
            state.pos_c, jnp.zeros(3, state.pos.dtype),
            jnp.zeros(3, state.pos.dtype)),
        vel_c=None if state.vel_c is None else apply(
            state.vel_c, jnp.zeros(3, state.pos.dtype),
            jnp.zeros(3, state.pos.dtype)),
    )
    new_radii = apply(radii, r_m, jnp.zeros((), radii.dtype))
    return new, new_radii, merged, i, j


def merge_all_overlapping(state: State, radii, *, max_merges: int = 8,
                          chunk: int = 4096):
    """Resolve up to max_merges overlapping pairs (host loop of
    merge_closest — each merge changes the geometry, so pairs are
    re-searched). Returns (state, radii, n_merged)."""
    n_merged = 0
    for _ in range(max_merges):
        state, radii, merged, _, _ = merge_closest(state, radii, chunk=chunk)
        if not bool(merged):
            break
        n_merged += 1
    return state, radii, n_merged
