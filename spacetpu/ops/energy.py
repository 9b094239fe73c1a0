"""Conservation diagnostics: energy, momentum, angular momentum.

The reference never computes these (verified: no energy code anywhere in
`/root/reference/space/src/sim/`), but the north-star metric is <1e-4
relative energy drift over 1k steps, so they are first-class here.

Potential energy is the O(N^2) pair sum; on TPU the accumulation is done in
f32 with a pairwise-safe formulation (sum of per-row sums) which in practice
keeps the relative error of the total well below the drift budget. For
strict validation use f64 on CPU (tests enable jax_enable_x64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spacetpu import constants
from spacetpu.state import State


#: i-chunk for the pair sum: memory is O(chunk * N), never O(N^2).
_PE_CHUNK = 1024


@functools.partial(jax.jit, static_argnames=("softening",))
def potential_energy(pos, mass, *, softening: str = "plummer", eps=0.0, g=None):
    """PE = -G * sum_{i<j} m_i m_j / sqrt(r_ij^2 + eps^2)  (plummer)
    or with the reference's bare 1/r (softening="ref": the additive-epsilon
    force law integrates to ~1/r away from contact).

    Scanned over i-chunks so the working set is O(chunk * N) — the dense
    (N, N) form would need 256 GB at the north star's N=256k."""
    dtype = pos.dtype
    if g is None:
        g = constants.G
    g = jnp.asarray(g, dtype)
    eps = jnp.asarray(eps, dtype)

    n = pos.shape[0]
    pad = (-n) % _PE_CHUNK
    if pad:
        # zero-mass padding never contributes (mass product is zero)
        pos_p = jnp.concatenate([pos, jnp.zeros((pad, 3), dtype)], axis=0)
        mass_p = jnp.concatenate([mass, jnp.zeros((pad,), dtype)], axis=0)
    else:
        pos_p, mass_p = pos, mass
    n_chunks = pos_p.shape[0] // _PE_CHUNK

    j_idx = jnp.arange(pos_p.shape[0])

    def body(carry, chunk):
        pos_i, mass_i, i_idx = chunk  # (C, 3), (C,), (C,)
        rel = pos_p[None, :, :] - pos_i[:, None, :]  # (C, N, 3)
        r2 = jnp.sum(rel * rel, axis=-1)
        if softening == "plummer":
            d2 = r2 + eps * eps
        else:
            d2 = r2
        inv_r = jnp.where(d2 > 0, jax.lax.rsqrt(jnp.maximum(d2, 1e-38)), 0.0)
        # exclude i == j: with eps > 0 the softened self-term is nonzero
        inv_r = jnp.where(i_idx[:, None] == j_idx[None, :], 0.0, inv_r)
        mm = mass_i[:, None] * mass_p[None, :]
        return carry + jnp.sum(mm * inv_r), None

    total, _ = jax.lax.scan(
        body,
        jnp.zeros((), dtype),
        (
            pos_p.reshape(n_chunks, _PE_CHUNK, 3),
            mass_p.reshape(n_chunks, _PE_CHUNK),
            j_idx.reshape(n_chunks, _PE_CHUNK),
        ),
    )
    # each unordered pair appears twice in the full sum
    return -0.5 * g * total


@jax.jit
def kinetic_energy(vel, mass):
    return 0.5 * jnp.sum(mass * jnp.sum(vel * vel, axis=-1))


@functools.partial(jax.jit, static_argnames=("softening",))
def total_energy(pos, vel, mass, *, softening: str = "plummer", eps=0.0, g=None):
    return kinetic_energy(vel, mass) + potential_energy(
        pos, mass, softening=softening, eps=eps, g=g
    )


@jax.jit
def momentum(vel, mass):
    return jnp.sum(mass[:, None] * vel, axis=0)


@jax.jit
def angular_momentum(pos, vel, mass):
    return jnp.sum(mass[:, None] * jnp.cross(pos, vel), axis=0)


def diagnostics(state: State, *, softening: str = "plummer", eps=0.0, g=None):
    """Return a dict of conserved quantities for the given state."""
    ke = kinetic_energy(state.vel, state.mass)
    pe = potential_energy(state.pos, state.mass, softening=softening, eps=eps, g=g)
    return {
        "kinetic": ke,
        "potential": pe,
        "energy": ke + pe,
        "momentum": momentum(state.vel, state.mass),
        "angular_momentum": angular_momentum(state.pos, state.vel, state.mass),
    }
