"""Morton (Z-order) encoding for spatial sorting on TPU.

The reference builds a pointer-free arena octree by recursive octant
splitting with per-octant Vec copies
(`/root/reference/space/src/sim/barnes_hut/tree.rs:143-174`) — an
allocation-heavy, serial, data-dependent structure that XLA cannot express.
The TPU-native equivalent linearizes space instead: bodies are keyed by the
interleaved bits of their quantized coordinates and sorted, after which
spatially adjacent bodies are adjacent in memory and fixed-size "leaf
clusters" play the role of tree cells (SURVEY.md SS7 step 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: bits per axis (3*10 = 30-bit keys, fits int32's positive range)
BITS = 10


def _spread_bits_10(x):
    """Spread the low 10 bits of x so there are two zero bits between each
    original bit (the classic magic-number dilation)."""
    x = x.astype(jnp.uint32) & 0x3FF
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton_keys(pos, lo=None, hi=None):
    """Quantize positions to a 2^BITS^3 grid over [lo, hi] and interleave.

    pos: (N, 3) -> uint32 keys (N,). The bounding box defaults to the data's
    own min/max per axis (the same box the reference scans at
    tree.rs:112-122).
    """
    q = _quantize(pos, lo, hi)
    x = _spread_bits_10(q[:, 0])
    y = _spread_bits_10(q[:, 1])
    z = _spread_bits_10(q[:, 2])
    return (x | (y << 1) | (z << 2)).astype(jnp.uint32)


def _quantize(pos, lo, hi):
    if lo is None:
        lo = jnp.min(pos, axis=0)
    if hi is None:
        hi = jnp.max(pos, axis=0)
    extent = jnp.maximum(hi - lo, 1e-30)
    cells = jnp.float32(1 << BITS)
    return jnp.clip(
        ((pos - lo) / extent * cells).astype(jnp.int32), 0, (1 << BITS) - 1
    ).astype(jnp.uint32)


def hilbert_keys(pos, lo=None, hi=None):
    """Hilbert-curve keys via Skilling's AxesToTranspose transform.

    Z-order (Morton) runs produce elongated, overlapping clusters — measured
    median cluster radius ~2x the ideal sphere-packing radius on uniform
    balls, which inflates tree opening distances and near-list sizes. The
    Hilbert curve has no long jumps, giving much rounder clusters for the
    same O(N log N) sort. The transform is 10 static iterations of
    vectorized bit ops; the final key is the same bit interleave as Morton
    applied to the transposed axes.
    """
    q = _quantize(pos, lo, hi)
    x = [q[:, 0], q[:, 1], q[:, 2]]

    # Inverse undo excess work (Skilling 2004, AxesToTranspose). Static
    # Python loop over bit planes -> pure vector ops under jit.
    q_py = 1 << (BITS - 1)
    while q_py > 1:
        qbit = jnp.uint32(q_py)
        p = jnp.uint32(q_py - 1)
        for i in range(3):
            cond = (x[i] & qbit) > 0
            # if bit set: invert low bits of x[0]; else swap low bits x[0]<->x[i]
            t = (x[0] ^ x[i]) & p
            x0_if = x[0] ^ p
            x0_else = x[0] ^ t
            xi_else = x[i] ^ t
            x[0] = jnp.where(cond, x0_if, x0_else)
            if i != 0:
                x[i] = jnp.where(cond, x[i], xi_else)
        q_py >>= 1

    # Gray encode.
    for i in range(1, 3):
        x[i] = x[i] ^ x[i - 1]
    t = jnp.zeros_like(x[0])
    q_py = 1 << (BITS - 1)
    while q_py > 1:
        qbit = jnp.uint32(q_py)
        t = jnp.where((x[2] & qbit) > 0, t ^ jnp.uint32(q_py - 1), t)
        q_py >>= 1
    for i in range(3):
        x[i] = x[i] ^ t

    # Transpose -> single key: interleave with x[0] carrying the most
    # significant bit of each 3-bit digit.
    return (
        (_spread_bits_10(x[0]) << 2)
        | (_spread_bits_10(x[1]) << 1)
        | _spread_bits_10(x[2])
    )


#: bits per axis of the two-word deep keys (3*20 = 60 bits in two 30-bit
#: words). 10-bit keys put the dense core of a high-density-contrast scene
#: (a Plummer sphere spans ~1000x its core radius) inside a handful of
#: finest cells, defeating adaptive clustering; 20 bits resolve 2^20 cells
#: per axis without needing 64-bit sorts on TPU.
BITS2 = 20


def hilbert_keys_2w(pos, lo=None, hi=None):
    """Deep Hilbert keys as two 30-bit words (hi_word, lo_word).

    Same Skilling AxesToTranspose transform as `hilbert_keys`, on 20-bit
    axes; the transposed axes are split into their top and bottom 10 bits
    and interleaved per word, so (hi_word, lo_word) compares
    lexicographically exactly like the 60-bit key. uint32 throughout
    (TPU-sortable via a two-key `lax.sort`)."""
    if lo is None:
        lo = jnp.min(pos, axis=0)
    if hi is None:
        hi = jnp.max(pos, axis=0)
    extent = jnp.maximum(hi - lo, 1e-30)
    cells = jnp.float32(1 << BITS2)
    q = jnp.clip(
        ((pos - lo) / extent * cells).astype(jnp.int64)
        if pos.dtype == jnp.float64
        else ((pos - lo) / extent * cells).astype(jnp.int32),
        0,
        (1 << BITS2) - 1,
    ).astype(jnp.uint32)
    x = [q[:, 0], q[:, 1], q[:, 2]]

    q_py = 1 << (BITS2 - 1)
    while q_py > 1:
        qbit = jnp.uint32(q_py)
        p = jnp.uint32(q_py - 1)
        for i in range(3):
            cond = (x[i] & qbit) > 0
            t = (x[0] ^ x[i]) & p
            x0_if = x[0] ^ p
            x0_else = x[0] ^ t
            xi_else = x[i] ^ t
            x[0] = jnp.where(cond, x0_if, x0_else)
            if i != 0:
                x[i] = jnp.where(cond, x[i], xi_else)
        q_py >>= 1

    for i in range(1, 3):
        x[i] = x[i] ^ x[i - 1]
    t = jnp.zeros_like(x[0])
    q_py = 1 << (BITS2 - 1)
    while q_py > 1:
        qbit = jnp.uint32(q_py)
        t = jnp.where((x[2] & qbit) > 0, t ^ jnp.uint32(q_py - 1), t)
        q_py >>= 1
    for i in range(3):
        x[i] = x[i] ^ t

    def word(shift):
        return (
            (_spread_bits_10((x[0] >> shift) & 0x3FF) << 2)
            | (_spread_bits_10((x[1] >> shift) & 0x3FF) << 1)
            | _spread_bits_10((x[2] >> shift) & 0x3FF)
        )

    return word(10), word(0)


def sfc_sort_2w(pos):
    """Sort bodies along the deep (two-word) Hilbert curve.

    Returns (perm, inv, hi_sorted, lo_sorted): the sorted key words are
    returned because adaptive clustering consumes them (cluster.py)."""
    hi, lo = hilbert_keys_2w(pos)
    n = pos.shape[0]
    hi_s, lo_s, perm = jax.lax.sort(
        (hi, lo, jnp.arange(n, dtype=jnp.int32)), num_keys=2
    )
    inv = jnp.argsort(perm)
    return perm, inv.astype(jnp.int32), hi_s, lo_s


def morton_order(pos, *, curve: str = "hilbert"):
    """Permutation that sorts bodies along a space-filling curve, and its
    inverse. curve: "hilbert" (default; tighter clusters) or "morton"."""
    if curve == "hilbert":
        keys = hilbert_keys(pos)
    else:
        keys = morton_keys(pos)
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    return perm, inv
