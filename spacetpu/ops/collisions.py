"""Collision handling: perfectly inelastic merging of overlapping bodies.

The reference stages a collision (`presets.rs:108-119`,
`big_boy_on_collision_course`) but bodies pass through each other — there
is no contact physics anywhere in it. This module adds the standard
N-body treatment on static TPU shapes:

- a pair overlaps when its separation is below the sum of its collision
  radii (by default the scene's body radii);
- the merge is perfectly inelastic: mass-weighted barycentric position
  and velocity (momentum-conserving by construction), summed mass, and a
  volume-additive radius ``(r_i^3 + r_j^3)^(1/3)``; the relative-motion
  kinetic energy ``0.5 * mi*mj/(mi+mj) * |vi-vj|^2`` is physically lost
  and returned as ``energy_lost`` (run_headless prints the running sum,
  so the drift report's inelastic jumps are attributable);
- shapes never change: the absorbed body keeps riding along as a
  massless tracer at the merged barycenter with zero radius (invisible
  to the renderer, inert to the dynamics — massless sources contribute
  exactly zero under both softening laws). Zero-radius rows are MASKED
  OUT of the pair search, so a dead tracer sitting at d=0 on its host
  can never shadow real encounters.

One merge is applied per call (the globally closest overlapping pair);
`merge_all_overlapping` loops until no overlap remains (each merge
changes the geometry, so pairs are re-searched), and callers check at
their host-chunk cadence (`run_headless --merge-collisions`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from spacetpu.ops import encounters
from spacetpu.state import State


class MergeResult(NamedTuple):
    state: State
    radii: jax.Array
    merged: jax.Array  # bool scalar
    i: jax.Array  # examined pair (meaningful when merged)
    j: jax.Array
    energy_lost: jax.Array  # relative-motion KE of the merged pair, else 0


@functools.partial(jax.jit, static_argnames=("chunk",))
def merge_closest(state: State, radii, *, chunk: int = 4096) -> MergeResult:
    """Merge the globally closest overlapping pair of live bodies, if any.

    radii: (N,) collision radii; rows with radius 0 are dead (that is
    what absorbed bodies become) and are excluded from the pair search.
    Kahan compensation rows of an absorbed body are zeroed with it."""
    radii = jnp.asarray(radii, state.pos.dtype)
    alive = radii > 0
    d, i, j = encounters.min_separation(state.pos, mask=alive, chunk=chunk)
    merged = d < radii[i] + radii[j]

    mi, mj = state.mass[i], state.mass[j]
    mtot = mi + mj
    # massless-massless contact: nothing to merge dynamically
    merged = merged & (mtot > 0)
    wi = jnp.where(mtot > 0, mi / jnp.where(mtot > 0, mtot, 1.0), 0.5)
    wj = 1.0 - wi
    pos_m = wi * state.pos[i] + wj * state.pos[j]
    vel_m = wi * state.vel[i] + wj * state.vel[j]
    r_m = (radii[i] ** 3 + radii[j] ** 3) ** (1.0 / 3.0)
    dv = state.vel[i] - state.vel[j]
    de = jnp.where(
        merged,
        0.5 * mi * mj / jnp.where(mtot > 0, mtot, 1.0) * jnp.sum(dv * dv),
        jnp.zeros((), state.pos.dtype),
    )

    def apply(val, row_i, row_j):
        """val[i] := row_i, val[j] := row_j when merged."""
        out = val.at[i].set(jnp.where(merged, row_i, val[i]))
        return out.at[j].set(jnp.where(merged, row_j, out[j]))

    zero3 = jnp.zeros(3, state.pos.dtype)
    new = state._replace(
        pos=apply(state.pos, pos_m, pos_m),
        vel=apply(state.vel, vel_m, vel_m),
        mass=apply(state.mass, mtot, jnp.zeros((), state.mass.dtype)),
        # the acc cache is stale for the merged rows; refreshing it is the
        # caller's job (prime) — but zero it so a leapfrog first kick
        # cannot apply the pre-merge acceleration to the merged body
        acc=apply(state.acc, zero3, zero3),
        pos_c=None if state.pos_c is None else apply(state.pos_c, zero3,
                                                     zero3),
        vel_c=None if state.vel_c is None else apply(state.vel_c, zero3,
                                                     zero3),
    )
    new_radii = apply(radii, r_m, jnp.zeros((), radii.dtype))
    return MergeResult(new, new_radii, merged, i, j, de)


def merge_all_overlapping(state: State, radii, *, max_merges: int = 8,
                          chunk: int = 4096):
    """Resolve up to max_merges overlapping pairs (host loop of
    merge_closest). Returns (state, radii, n_merged, energy_lost)."""
    n_merged = 0
    e_lost = 0.0
    for _ in range(max_merges):
        r = merge_closest(state, radii, chunk=chunk)
        if not bool(r.merged):
            break
        state, radii = r.state, r.radii
        e_lost += float(r.energy_lost)
        n_merged += 1
    return state, radii, n_merged, e_lost
