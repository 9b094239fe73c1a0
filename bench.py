"""North-star benchmark: pair-interactions/sec/chip for the all-pairs force
step at N=256k (BASELINE.md: target >= 1e11 with the tiled Pallas kernel).

Prints exactly ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
plus any detail lines to stderr. Runs on whatever jax.devices() offers:
the real TPU chip under the driver, CPU (reduced N) during development.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from spacetpu.utils import benchenv

    benchenv.force_platform()
    try:
        platform = jax.devices()[0].platform
        note = ""
    except RuntimeError as e:
        # axon tunnel outage: backend init raises after a long hang. Fall
        # back to a CPU measurement rather than crashing with no JSON line
        # at all — the metric string marks the fallback so the record can't
        # be mistaken for a chip number (last good chip run: BENCH_r02.json
        # / logs/r3_bench.log).
        log(f"bench: TPU backend unavailable ({e}); falling back to CPU")
        jax.config.update("jax_platforms", "cpu")
        platform = jax.devices()[0].platform
        note = " [CPU FALLBACK — TPU tunnel unavailable]"
    on_tpu = platform == "tpu"
    n = 262_144 if on_tpu else 8_192
    steps = 10 if on_tpu else 2
    dt = 1e-3

    from spacetpu import make_simulation
    from spacetpu.models import presets
    from spacetpu.utils.metrics import ThroughputTracker

    scene = presets.random_cluster(n, seed=0, g=1.0)
    state = scene.state(dtype=jnp.float32)

    backend = "pallas" if on_tpu else "xla"
    sim = make_simulation(
        n,
        algorithm="direct",
        backend=backend,
        integrator="leapfrog",
        softening="plummer",
        eps=1e-2,
        g=1.0,
        chunk=None if on_tpu else 1024,
    )

    from spacetpu.utils.profiling import sync

    log(f"bench: platform={platform} backend={backend} N={n} steps={steps}")
    state = sim.prime(state)
    # Warmup/compile one step.
    t0 = time.perf_counter()
    state = sim.step(state, dt)
    sync(state.pos)
    log(f"bench: compile+first step {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    for _ in range(steps):
        state = sim.step(state, dt)
    sync(state.pos)
    wall = time.perf_counter() - t0

    tracker = ThroughputTracker(n)
    rate = tracker.rate(steps, wall)
    log(
        f"bench: {wall:.3f}s for {steps} steps -> "
        f"{rate['steps_per_sec']:.2f} steps/s, "
        f"{rate['pairs_per_sec']:.3e} pairs/s"
    )

    result = {
        "metric": (f"pair-interactions/sec/chip (all-pairs N={n}, f32, "
                   f"leapfrog){note}"),
        "value": rate["pairs_per_sec"],
        "unit": "pairs/s",
        "vs_baseline": rate["pairs_per_sec"] / 1e11,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
