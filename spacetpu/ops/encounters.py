"""Close-encounter telemetry: nearest neighbours and minimum separation.

The reference ships a collision-course scene (`presets.rs:108-119`
`big_boy_on_collision_course`) but no way to *observe* an encounter — no
separation diagnostics exist anywhere in it. These helpers provide the
observability side: per-body nearest-neighbour distances and the global
minimum separation, O(N^2) as a j-chunked scan (peak memory O(N * chunk)),
one jittable pass.

Useful together with the multirate stepper (`ops/multirate.py`): bodies
whose nearest-neighbour distance collapses are exactly the ones whose
dynamical time collapses, and `--substeps auto` picks them up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk",))
def nearest_neighbor(pos, *, mask=None, chunk: int = 4096):
    """Per-body nearest neighbour: (dist, idx), each (N,).

    Self-pairs are excluded. ``mask`` (N,) bool excludes rows entirely
    (dead/absorbed bodies): a masked row is skipped as a source and gets
    dist=+inf as a target. Bodies are otherwise compared by position
    only — a massless tracer is a neighbour like any other (encounters
    are geometric, not dynamical)."""
    n = pos.shape[0]
    dtype = pos.dtype
    rows = jnp.arange(n, dtype=jnp.int32)
    if n <= chunk:
        rel = pos[None, :, :] - pos[:, None, :]
        r2 = jnp.sum(rel * rel, axis=-1)
        r2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, r2)
        if mask is not None:
            r2 = jnp.where(mask[None, :], r2, jnp.inf)
        dist = jnp.sqrt(jnp.min(r2, axis=1))
        if mask is not None:
            dist = jnp.where(mask, dist, jnp.inf)
        return dist, jnp.argmin(r2, axis=1).astype(jnp.int32)

    pad = (-n) % chunk
    pos_p = jnp.concatenate([pos, jnp.zeros((pad, 3), dtype)])
    mask_full = jnp.ones((n,), bool) if mask is None else mask
    mask_p = jnp.concatenate([mask_full, jnp.zeros((pad,), bool)])

    def body(carry, sl):
        best2, best_j = carry
        pj, mj, j0 = sl
        rel = pj[None, :, :] - pos[:, None, :]  # (N, chunk, 3)
        r2 = jnp.sum(rel * rel, axis=-1)
        jidx = j0 + jnp.arange(chunk, dtype=jnp.int32)
        drop = (rows[:, None] == jidx[None, :]) | ~mj[None, :]
        r2 = jnp.where(drop, jnp.inf, r2)
        m = jnp.min(r2, axis=1)
        a = jidx[jnp.argmin(r2, axis=1)]
        take = m < best2
        return (jnp.where(take, m, best2), jnp.where(take, a, best_j)), None

    starts = jnp.arange(0, n + pad, chunk, dtype=jnp.int32)
    (best2, best_j), _ = jax.lax.scan(
        body,
        (jnp.full((n,), jnp.inf, dtype), jnp.zeros((n,), jnp.int32)),
        (pos_p.reshape(-1, chunk, 3), mask_p.reshape(-1, chunk), starts),
    )
    dist = jnp.sqrt(best2)
    if mask is not None:
        dist = jnp.where(mask, dist, jnp.inf)
    return dist, best_j


def min_separation(pos, *, mask=None, chunk: int = 4096):
    """Global minimum separation among unmasked rows: (distance, i, j)
    with i the body whose nearest neighbour j is closest. distance=+inf
    when fewer than two rows are unmasked."""
    dist, idx = nearest_neighbor(pos, mask=mask, chunk=chunk)
    i = jnp.argmin(dist)
    return dist[i], i.astype(jnp.int32), idx[i]
