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
    if lo is None:
        lo = jnp.min(pos, axis=0)
    if hi is None:
        hi = jnp.max(pos, axis=0)
    extent = jnp.maximum(hi - lo, 1e-30)
    cells = jnp.float32(1 << BITS)
    q = jnp.clip(
        ((pos - lo) / extent * cells).astype(jnp.int32), 0, (1 << BITS) - 1
    )
    x = _spread_bits_10(q[:, 0])
    y = _spread_bits_10(q[:, 1])
    z = _spread_bits_10(q[:, 2])
    return (x | (y << 1) | (z << 2)).astype(jnp.uint32)


def morton_order(pos):
    """Permutation that sorts bodies in Z-order, and its inverse."""
    keys = morton_keys(pos)
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    return perm, inv
