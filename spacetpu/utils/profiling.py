"""Profiling hooks: jax.profiler traces + step timing.

The reference's only profiling is a pprof flamegraph hook wired into its
criterion bench harness (`/root/reference/space/benches/perf.rs:7-41`).
The TPU equivalents are XLA profiler traces (viewable in TensorBoard /
Perfetto) and a simple host-side step timer with true device sync.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def sync(x) -> float:
    """True device barrier: materialize a scalar on the host. (On some
    remote PJRT transports `block_until_ready` returns early; a host
    readback is the only reliable fence.)"""
    return float(jnp.sum(x))


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a block:

        with profiling.trace("/tmp/trace"):
            state = sim.run(state, dt, 100)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-time per call with a device fence, compile excluded by warmup."""

    def __init__(self, fn, *, warmup: int = 1):
        self.fn = fn
        self.warmup = warmup

    def time(self, *args, reps: int = 5, sync_arg=None):
        """Run fn(*args) reps times; returns seconds/rep. `sync_arg` picks
        the output leaf to fence on (default: the first array leaf)."""
        out = None
        for _ in range(self.warmup):
            out = self.fn(*args)
        self._fence(out if sync_arg is None else sync_arg(out))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = self.fn(*args)
        self._fence(out if sync_arg is None else sync_arg(out))
        return (time.perf_counter() - t0) / reps

    @staticmethod
    def _fence(out):
        leaves = jax.tree.leaves(out)
        if leaves:
            sync(leaves[0])
