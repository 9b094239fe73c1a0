"""Kernel micro-benchmarks: the criterion-bench analogue.

The reference's only executable check is a criterion bench of the
single-threaded Barnes-Hut force pass over 1000 random bodies at theta=0.5
(`/root/reference/space/benches/barnes_hut.rs:30-39`). This harness covers
that workload and the TPU-specific sweeps: all-pairs tile sizes, tree at
large N, and the native C++ engine for CPU context.

Run:  python benches/bench_kernels.py [--quick]
All timings use a host-readback fence (block_until_ready is unreliable on
remote PJRT transports).
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")  # repo root

from spacetpu.utils.profiling import StepTimer  # noqa: E402


def random_bodies(n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(-1, 1, (n, 3)), dtype)
    mass = jnp.asarray(rng.uniform(0.1, 1.0, (n,)), dtype)
    return pos, mass


def bench_reference_workload():
    """The criterion workload: BH force pass, N=1000, theta=0.5."""
    from spacetpu.ops import tree

    pos, mass = random_bodies(1000)
    fn = jax.jit(
        lambda p, m: tree.acc_tree(
            p, m, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
            backend="pallas" if jax.devices()[0].platform == "tpu" else "xla",
        )
    )
    dt = StepTimer(fn).time(pos, mass)
    print(f"tree force pass N=1000 theta=0.5: {dt * 1e3:.2f} ms")

    # native CPU engine on the same workload (single call, threaded)
    try:
        import time

        from spacetpu import native

        p64 = np.asarray(pos, np.float64)
        m64 = np.asarray(mass, np.float64)
        native.acc_barnes_hut(p64, m64, theta=0.5, g=1.0, eps=1e-3,
                              softening="plummer")
        t0 = time.perf_counter()
        for _ in range(5):
            native.acc_barnes_hut(p64, m64, theta=0.5, g=1.0, eps=1e-3,
                                  softening="plummer")
        print(f"native C++ BH N=1000 theta=0.5: "
              f"{(time.perf_counter() - t0) / 5 * 1e3:.2f} ms")
    except Exception as e:  # native toolchain missing is non-fatal
        print(f"native bench skipped: {e}")


def bench_allpairs_tiles(n, tiles):
    from spacetpu.ops import pallas_direct

    pos, mass = random_bodies(n, seed=1)
    for ti, tj in tiles:
        try:
            fn = jax.jit(
                lambda p, m, ti=ti, tj=tj: pallas_direct.acc_direct_pallas(
                    p, m, softening="plummer", eps=1e-2, g=1.0,
                    tile_i=ti, tile_j=tj,
                )
            )
            dt = StepTimer(fn).time(pos, mass)
            print(f"all-pairs N={n} TI={ti} TJ={tj}: {dt * 1e3:.1f} ms "
                  f"({n * n / dt:.3e} pairs/s)")
        except Exception as e:
            print(f"all-pairs N={n} TI={ti} TJ={tj}: failed "
                  f"({str(e).splitlines()[0][:80]})")


def bench_tree_large(n, theta=0.5):
    from spacetpu.ops import tree

    pos, mass = random_bodies(n, seed=2)
    fn = jax.jit(
        lambda p, m: tree.acc_tree(
            p, m, theta=theta, softening="plummer", eps=1e-3, g=1.0,
            backend="pallas" if jax.devices()[0].platform == "tpu" else "xla",
        )
    )
    dt = StepTimer(fn, warmup=1).time(pos, mass, reps=3)
    print(f"tree N={n} theta={theta}: {dt * 1e3:.0f} ms "
          f"({n / dt:.3e} bodies/s, {n * n / dt:.2e} equiv pairs/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    on_tpu = jax.devices()[0].platform == "tpu"
    print(f"platform: {jax.devices()[0].platform}")

    bench_reference_workload()
    if args.quick:
        return
    if on_tpu:
        bench_allpairs_tiles(262_144, [(256, 2048), (512, 2048), (512, 1024)])
        bench_tree_large(1_000_000)
    else:
        bench_allpairs_tiles(8_192, [(256, 1024)])
        bench_tree_large(50_000)


if __name__ == "__main__":
    main()
