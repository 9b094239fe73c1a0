"""All-pairs gravitational acceleration in plain JAX (XLA path).

This is the TPU-native equivalent of the reference direct solver
(`/root/reference/space/src/sim/direct.rs:26-50` driving
`sim/mod.rs:22-37`): instead of a rayon par_iter over target bodies with a
serial j-loop, the pairwise interaction is expressed as a broadcasted
(N, N, 3) computation that XLA fuses and tiles onto the VPU, with an
optional j-chunked `lax.scan` form that bounds the working set for large N.

Two softening laws are provided:

- ``"ref"``: the reference's additive epsilon on r^3,
  ``a += rel * m * G / (|rel|^3 + eps)`` (`sim/mod.rs:22-37`,
  eps = `constants.rs:13` COLLISION_EPSILON). The i==j term contributes
  exactly zero (rel = 0 numerator with a positive denominator), which is why
  no self-interaction mask is needed — the same elegance the reference gets
  from its ``d^2 == 0`` skip.
- ``"plummer"``: Plummer softening ``a += rel * m * G / (r^2 + eps^2)^(3/2)``,
  the standard choice for collisionless dynamics and the north-star
  energy-drift configuration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spacetpu import constants

SOFTENINGS = ("ref", "plummer")


def _pair_weight(r2, r_dtype, softening: str, eps):
    """Return w with a_i = sum_j w_ij * rel_ij * m_j; rel = pos_j - pos_i."""
    if softening == "ref":
        denom = r2 * jnp.sqrt(r2) + eps
        return jnp.where(denom > 0, 1.0 / denom, jnp.zeros((), r_dtype))
    elif softening == "plummer":
        d2 = r2 + eps * eps
        inv = jax.lax.rsqrt(d2)
        w = inv * inv * inv
        # Guard the eps == 0, r == 0 corner (0/0) without penalising eps > 0.
        return jnp.where(d2 > 0, w, jnp.zeros((), r_dtype))
    raise ValueError(f"unknown softening {softening!r} (want one of {SOFTENINGS})")


@functools.partial(jax.jit, static_argnames=("softening",))
def acc_direct(pos, mass, *, softening: str = "ref", eps=None, g=None):
    """Dense all-pairs acceleration, O(N^2) memory O(N^2) — fine to ~16k bodies.

    pos: (N, 3), mass: (N,) -> acc (N, 3).
    """
    dtype = pos.dtype
    if eps is None:
        eps = constants.COLLISION_EPSILON if softening == "ref" else 0.0
    if g is None:
        g = constants.G
    eps = jnp.asarray(eps, dtype)
    g = jnp.asarray(g, dtype)
    rel = pos[None, :, :] - pos[:, None, :]  # (N, N, 3), rel[i, j] = x_j - x_i
    r2 = jnp.sum(rel * rel, axis=-1)  # (N, N)
    w = _pair_weight(r2, dtype, softening, eps) * mass[None, :] * g
    return jnp.einsum("ij,ijk->ik", w, rel)


def acc_cross(pos_i, pos_j, mass_j, *, softening: str = "ref", eps=None, g=None):
    """Acceleration of target bodies `pos_i` due to source bodies
    `pos_j`/`mass_j` — the building block of the multi-chip ring pass
    (each chip's i-shard accumulates one j-shard per ring step, SURVEY.md SS5).

    pos_i: (M, 3), pos_j: (K, 3), mass_j: (K,) -> (M, 3). Self-pairs (when
    the tiles alias) contribute exactly zero under both softening laws.
    """
    dtype = pos_i.dtype
    if eps is None:
        eps = constants.COLLISION_EPSILON if softening == "ref" else 0.0
    if g is None:
        g = constants.G
    eps = jnp.asarray(eps, dtype)
    g = jnp.asarray(g, dtype)
    rel = pos_j[None, :, :] - pos_i[:, None, :]  # (M, K, 3)
    r2 = jnp.sum(rel * rel, axis=-1)
    w = _pair_weight(r2, dtype, softening, eps) * mass_j[None, :] * g
    return jnp.einsum("ij,ijk->ik", w, rel)


def acc_cross_chunked(pos_i, pos_j, mass_j, *, softening: str = "ref",
                      eps=None, g=None, chunk: int = 8192):
    """`acc_cross` with the SOURCE axis scanned in chunks: peak memory is
    O(M * chunk) instead of O(M * K) — the safe form for a small target
    set against a huge source set (the multirate fast-set substeps on the
    XLA backend). Sources beyond a chunk multiple are handled by zero-mass
    padding (massless sources contribute exactly zero under both laws)."""
    k = pos_j.shape[0]
    if k <= chunk:
        return acc_cross(pos_i, pos_j, mass_j, softening=softening, eps=eps,
                         g=g)
    pad = (-k) % chunk
    if pad:
        pos_j = jnp.concatenate([pos_j, jnp.zeros((pad, 3), pos_j.dtype)])
        mass_j = jnp.concatenate([mass_j, jnp.zeros((pad,), mass_j.dtype)])

    def body(acc, sl):
        pj, mj = sl
        return acc + acc_cross(pos_i, pj, mj, softening=softening, eps=eps,
                               g=g), None

    acc0 = jnp.zeros_like(pos_i)
    acc, _ = jax.lax.scan(
        body, acc0,
        (pos_j.reshape(-1, chunk, 3), mass_j.reshape(-1, chunk)),
    )
    return acc


@functools.partial(jax.jit, static_argnames=("softening", "chunk"))
def acc_direct_chunked(pos, mass, *, softening: str = "ref", eps=None, g=None,
                       chunk: int = 1024):
    """All-pairs acceleration with the i-axis scanned in chunks.

    Memory is O(chunk * N) instead of O(N^2); the XLA analogue of the
    reference splitting target bodies across rayon threads
    (`direct.rs:26-39`) — here the "threads" are sequential scan steps whose
    inner (chunk, N) tile is vectorized on the VPU. Requires N % chunk == 0
    (pad via `make_state(pad_to=...)`).
    """
    dtype = pos.dtype
    n = pos.shape[0]
    if n % chunk != 0:
        raise ValueError(f"N={n} not divisible by chunk={chunk}")
    if eps is None:
        eps = constants.COLLISION_EPSILON if softening == "ref" else 0.0
    if g is None:
        g = constants.G
    eps = jnp.asarray(eps, dtype)
    g = jnp.asarray(g, dtype)

    def body(carry, pos_i):
        rel = pos[None, :, :] - pos_i[:, None, :]  # (chunk, N, 3)
        r2 = jnp.sum(rel * rel, axis=-1)
        w = _pair_weight(r2, dtype, softening, eps) * mass[None, :] * g
        return carry, jnp.einsum("ij,ijk->ik", w, rel)

    _, acc = jax.lax.scan(body, None, pos.reshape(n // chunk, chunk, 3))
    return acc.reshape(n, 3)
