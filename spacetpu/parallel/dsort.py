"""Distributed sort over a device mesh: bitonic merge-exchange.

The sharded tree needs the global body array in space-filling-curve order
with each device holding exactly N/D rows. Sample sort gives variable
per-device counts (hostile to XLA's static shapes); the classic SPMD
answer is a bitonic merge-exchange network: after a local sort, devices
pairwise exchange whole shards (`ppermute`) and keep the lower/upper half
of the merged pair, following the bitonic schedule. log2(D)*(log2(D)+1)/2
exchange rounds, every shard exactly N/D rows at every step, fully
static — the ICI-native replacement for the host-side partition the
reference never needed (its one process holds all bodies,
`/root/reference/space/src/sim/mod.rs:122-127`).

All functions run INSIDE shard_map over a 1-D mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sort_rows(key, payload):
    """Stable-sort rows by key; payload arrays may have trailing dims
    (lax.sort wants equal shapes, so sort a permutation and gather)."""
    perm = jnp.argsort(key, stable=True)
    return key[perm], [p[perm] for p in payload]


def _merge_keep(key_a, pay_a, key_b, pay_b, keep_low: jax.Array,
                mine_first: jax.Array):
    """Merge two locally-sorted shards, keep the low or high half.

    keep_low/mine_first: traced bool scalars. Both partners MUST sort the
    identical concatenated sequence — with duplicate keys, a stable sort
    of concat(A, B) and concat(B, A) breaks ties differently and the two
    kept halves would not partition the pair. mine_first pins a canonical
    order (the lower-rank shard first on both sides)."""
    m = key_a.shape[0]

    def pick(a, b):
        return jnp.where(mine_first, a, b)

    keys = jnp.concatenate([pick(key_a, key_b), pick(key_b, key_a)])
    pays = [jnp.concatenate([pick(a, b), pick(b, a)])
            for a, b in zip(pay_a, pay_b)]
    keys, pays = _sort_rows(keys, pays)
    lo = jnp.where(keep_low, 0, m)
    return (
        jax.lax.dynamic_slice_in_dim(keys, lo, m, 0),
        [jax.lax.dynamic_slice_in_dim(p, lo, m, 0) for p in pays],
    )


def bitonic_sort_sharded(key, *payload, axis: str):
    """Globally sort (key, *payload) rows across the mesh axis.

    key: (m,) local shard of the sort key; payload: arrays with leading
    dim m that travel with their key. Returns the same structure, globally
    ascending across device ranks (device r holds ranks [r*m, (r+1)*m)).
    Mesh size must be a power of two."""
    n_dev = jax.lax.axis_size(axis)
    if n_dev & (n_dev - 1):
        raise ValueError(f"bitonic mesh size must be a power of 2, got {n_dev}")
    rank = jax.lax.axis_index(axis)

    key, payload = _sort_rows(key, list(payload))

    n_bits = n_dev.bit_length() - 1
    for stage in range(n_bits):  # block size 2^(stage+1)
        for sub in range(stage, -1, -1):  # partner distance 2^sub
            dist = 1 << sub
            perm = [(d, d ^ dist) for d in range(n_dev)]
            other = [
                jax.lax.ppermute(arr, axis, perm) for arr in (key, *payload)
            ]
            key_b, pay_b = other[0], list(other[1:])
            # ascending iff the (stage+1)-th bit of rank is 0;
            # keep the low half iff this device is the lower partner of
            # an ascending pair (or the upper partner of a descending one)
            ascending = (rank >> (stage + 1)) & 1 == 0
            is_lower = (rank >> sub) & 1 == 0
            keep_low = jnp.logical_xor(
                jnp.logical_not(ascending), is_lower
            )
            key, payload = _merge_keep(key, payload, key_b, pay_b, keep_low,
                                       is_lower)

    return (key, *payload)
