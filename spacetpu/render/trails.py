"""On-device trail history: the ring buffer of recent positions.

Device-side generalization of the reference's `ObjectVertexCache`
(`/root/reference/space/src/objects.rs:48-167`): instead of a host Vec of
interleaved vertices with pending-range bookkeeping for incremental GPU
uploads, the history is a dense (T, N, 3) device array plus a scalar write
cursor; `push` is one dynamic_update_slice and the "upload" disappears
entirely because the rasterizer consumes the array in place on the TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spacetpu.constants import TRAIL_MAX_LENGTH


class TrailBuffer(NamedTuple):
    """Ring buffer state. `history[k]` is a snapshot; `head` is the slot the
    *next* push writes; `count` saturates at T (how many slots are valid)."""

    history: jax.Array  # (T, N, 3)
    head: jax.Array  # scalar int32
    count: jax.Array  # scalar int32

    @property
    def capacity(self) -> int:
        return self.history.shape[0]


def make_trails(n: int, t: int = TRAIL_MAX_LENGTH, dtype=jnp.float32) -> TrailBuffer:
    return TrailBuffer(
        history=jnp.zeros((t, n, 3), dtype),
        head=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


@jax.jit
def push(tb: TrailBuffer, pos) -> TrailBuffer:
    """Append one position snapshot, overwriting the oldest when full
    (objects.rs:106-123 semantics)."""
    t = tb.capacity
    zero = jnp.zeros((), tb.head.dtype)
    history = jax.lax.dynamic_update_slice(
        tb.history, pos[None].astype(tb.history.dtype), (tb.head, zero, zero)
    )
    return TrailBuffer(
        history=history,
        head=(tb.head + 1) % t,
        count=jnp.minimum(tb.count + 1, t),
    )


@jax.jit
def clear(tb: TrailBuffer) -> TrailBuffer:
    """Reset (the space-key trail clear, objects.rs:161-167)."""
    return TrailBuffer(
        history=jnp.zeros_like(tb.history),
        head=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


@jax.jit
def ages(tb: TrailBuffer):
    """Per-slot age in [0, 1]: 0 = newest snapshot, 1 = oldest valid; invalid
    slots get age > 1 (the rasterizer fades alpha with age, matching the
    trail fade of line_vs, shaders/src/lib.rs:40-47)."""
    t = tb.capacity
    slot = jnp.arange(t)
    newest = (tb.head - 1) % t
    age_steps = (newest - slot) % t  # 0 for newest, t-1 for oldest
    valid = age_steps < tb.count
    denom = jnp.maximum(tb.count - 1, 1)
    return jnp.where(valid, age_steps / denom, 2.0)


@jax.jit
def latest(tb: TrailBuffer):
    """Most recent snapshot (objects.rs:153-159 position_of semantics)."""
    return tb.history[(tb.head - 1) % tb.capacity]
