"""TPU timing of the new fastsplat rasterizer vs the scatter path."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))

def timeit(name, fn, *args, reps=5):
    out = fn(*args); fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    print(f"{name:50s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)

from spacetpu.render import fastsplat as fs

W, H = 1920, 1080
for M in (600_000, 1_200_000):
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    px = jax.random.uniform(k1, (M,), minval=-10.0, maxval=W + 10.0)
    py = jax.random.uniform(k2, (M,), minval=-10.0, maxval=H + 10.0)
    rad = jax.random.uniform(k3, (M,), minval=1.0, maxval=3.0)
    rgbw = jax.random.uniform(k4, (M, 3))
    valid = jnp.ones((M,), bool)

    f = jax.jit(lambda px, py, rad, rgbw, valid: fs.splat_entries(
        px, py, rad, rgbw, valid, width=W, height=H, interpret=False))
    timeit(f"fastsplat total M={M}", f, px, py, rad, rgbw, valid)

    # clustered hot-spot distribution (everything in a 200x200 px blob)
    px2 = jax.random.uniform(k1, (M,), minval=800.0, maxval=1000.0)
    py2 = jax.random.uniform(k2, (M,), minval=400.0, maxval=600.0)
    timeit(f"fastsplat hot-blob M={M}", f, px2, py2, rad, rgbw, valid)

# sanity vs XLA fallback on small input
Ms = 4096
px = jax.random.uniform(jax.random.PRNGKey(1), (Ms,), minval=0.0, maxval=W * 1.0)
py = jax.random.uniform(jax.random.PRNGKey(2), (Ms,), minval=0.0, maxval=H * 1.0)
rad = jnp.full((Ms,), 2.0)
rgbw = jax.random.uniform(jax.random.PRNGKey(3), (Ms, 3))
valid = jnp.ones((Ms,), bool)
a = fs.splat_entries(px, py, rad, rgbw, valid, width=W, height=H, interpret=False)
b = fs.splat_entries(px, py, rad, rgbw, valid, width=W, height=H, backend="xla")
print("pallas-tpu vs xla max abs diff:", float(jnp.max(jnp.abs(a - b))), flush=True)
print("DONE", flush=True)
