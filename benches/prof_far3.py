"""TPU: 2-level vs 3-level far field at N=4M+ (single chip)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))

from spacetpu.ops import tree

def bodies(n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n, 3)); u /= np.linalg.norm(u, axis=-1, keepdims=True)
    r = rng.uniform(0, 1, size=(n, 1)) ** (1 / 3)
    return (jnp.asarray(u * r, jnp.float32),
            jnp.asarray(rng.uniform(0.5, 1.5, n) / n, jnp.float32))

for n in (4_000_000, 8_000_000, 16_000_000):
    pos, mass = bodies(n)
    for fl in ((2, 3) if n <= 4_000_000 else (3,)):
        try:
            f = jax.jit(lambda p, m, fl=fl: tree.acc_tree(
                p, m, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
                backend="pallas", multipole_order=2, far_levels=fl))
            a = f(pos, mass); fence(a)
            t0 = time.perf_counter()
            for _ in range(2):
                a = f(pos, mass)
            fence(a)
            print(f"N={n} far_levels={fl}: {(time.perf_counter()-t0)/2*1e3:.0f} ms",
                  flush=True)
        except Exception as e:
            print(f"N={n} far_levels={fl}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            break
    del pos, mass
print("DONE", flush=True)
