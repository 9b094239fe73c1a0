"""Env-var scale/platform overrides so chip bench scripts can be smoke-run.

The chip bench scripts hardcode production workloads (N up to 8M on the
real TPU), so nothing exercised them between edits — two of the three
round-3 queue-10 failures were the benches themselves crashing on drifted
library APIs after the chip had been held for an hour (VERDICT r3 weak #7).
`tests/test_benches_smoke.py` now runs the SAME script files on CPU with
tiny sizes by exporting:

  SPACETPU_BENCH_CPU=1      -> force the CPU backend (see force_platform)
  SPACETPU_BENCH_SCALE=smoke -> scripts substitute their smoke sizes

so a stale kwarg is caught by a <60 s CPU test instead of a wasted chip
slot. Production runs set neither variable and are unaffected.
"""

from __future__ import annotations

import os


def smoke() -> bool:
    """True when the caller asked for the scaled-down smoke workload."""
    return os.environ.get("SPACETPU_BENCH_SCALE") == "smoke"


def force_platform() -> None:
    """Apply the SPACETPU_BENCH_CPU=1 override.

    The axon TPU plugin force-selects its backend during initialization,
    so JAX_PLATFORMS alone is ignored; the config update must run after
    ``import jax`` and before the first device lookup. Call this right
    after the jax import at the top of a bench script.
    """
    if os.environ.get("SPACETPU_BENCH_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")


def size(prod, smoke_val):
    """Pick the production or smoke value for a workload knob."""
    return smoke_val if smoke() else prod
