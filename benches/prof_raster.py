"""Profile the fused frame breakdown + prototype pieces for the new rasterizer."""
import time
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import functools

def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))

def timeit(name, fn, *args, reps=5):
    out = fn(*args); fence(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    f = out if not isinstance(out, tuple) else out[0]
    fence(f)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:45s} {dt:8.2f} ms", flush=True)
    return dt

W, H = 1920, 1080
N = 100_000

from spacetpu.models import presets
from spacetpu.sim import make_simulation
from spacetpu.render import rasterizer, trails, fused
from spacetpu.render.camera import Camera

scene = presets.fixed_cloud(N)
n = scene.n
sim = make_simulation(n, algorithm="tree", integrator="leapfrog",
                      softening="plummer", eps=1e-3, g=scene.g)
state = scene.state()
cam = Camera(W, H)
cam.frame_scene(scene.pos)
view = jnp.asarray(cam.view())
proj = jnp.asarray(cam.projection())
colors = jnp.asarray(scene.colors)
radii = jnp.asarray(scene.radii)

print(f"== N={n} {W}x{H} ==", flush=True)

# 1. full fused frame (current)
init, frame = fused.make_fused_frame(sim, width=W, height=H)
fs = init(state)
dt = jnp.asarray(10.0, jnp.float32)
def run_frame(fs):
    return frame(fs, dt, colors, radii, view, proj)
# warm
fs2, fb = run_frame(fs); fence(fb)
t0 = time.perf_counter()
reps = 5
cur = fs2
for _ in range(reps):
    cur, fb = run_frame(cur)
fence(fb)
print(f"{'fused frame (current)':45s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)

# 2. step only
st = sim.prime(scene.state())
step1 = jax.jit(lambda s, c: sim.traced_step(s, dt, c))
timeit("tree step only", step1, st, sim.jit_consts)

# 3. render_scene only
tb = trails.make_trails(n, t=5)
for _ in range(5):
    tb = trails.push(tb, jnp.asarray(scene.pos, jnp.float32) * (1.0 + 0.001))
render = jax.jit(functools.partial(rasterizer.render_scene, width=W, height=H))
timeit("render_scene only", render, tb.history, trails.ages(tb), colors, radii, view, proj)

# 4. scatter microbench
M = 1_200_000
key = jax.random.PRNGKey(0)
kb, ky, kx, kc = jax.random.split(key, 4)
b = jax.random.randint(kb, (M,), 0, 4)
y = jax.random.randint(ky, (M,), 0, H)
x = jax.random.randint(kx, (M,), 0, W)
c = jax.random.uniform(kc, (M, 3))

@jax.jit
def scatter(b, y, x, c):
    return jnp.zeros((4, H, W, 3), jnp.float32).at[b, y, x].add(c, mode="drop")
timeit(f"XLA scatter {M} entries (4-bucket canvas)", scatter, b, y, x, c)

@jax.jit
def scatter1(y, x, c):
    return jnp.zeros((H, W, 3), jnp.float32).at[y, x].add(c, mode="drop")
timeit(f"XLA scatter {M} entries (1 canvas)", scatter1, y, x, c)

M2 = 300_000
timeit(f"XLA scatter {M2} entries", scatter1, y[:M2], x[:M2], c[:M2])

# 5. conv microbench (the 4-bucket separable falloff pass)
canv = jax.random.uniform(key, (4, H, W, 3))
@jax.jit
def convs(canvases):
    frame = jnp.zeros((H, W, 3), jnp.float32)
    for bk, k1d in enumerate(rasterizer._KERNELS_1D):
        k = jnp.asarray(k1d)
        img = canvases[bk].transpose(2, 0, 1)[:, None]
        img = jax.lax.conv_general_dilated(
            img, k[None, None, :, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        img = jax.lax.conv_general_dilated(
            img, k[None, None, None, :], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        frame = frame + img[:, 0].transpose(1, 2, 0)
    return jnp.clip(frame, 0, 1)
timeit("4-bucket separable convs", convs, canv)

# 6. prototype pieces: sort by tile key + searchsorted + gather + matmul
TX, TY = W // 128, H // 8   # 15 x 135 = 2025 tiles
T = TX * TY
@jax.jit
def sort_entries(y, x, c):
    tile = (y // 8) * TX + (x // 128)
    xl = (x % 128).astype(jnp.float32)
    yl = (y % 8).astype(jnp.float32)
    tile_s, xl_s, yl_s, r_s, g_s, b_s = jax.lax.sort(
        (tile.astype(jnp.int32), xl, yl, c[:, 0], c[:, 1], c[:, 2]),
        num_keys=1)
    return tile_s, xl_s, yl_s, r_s, g_s, b_s
timeit("sort 1.2M entries by tile (6 operands)", sort_entries, y, x, c)
tile_s, xl_s, yl_s, r_s, g_s, b_s = sort_entries(y, x, c)

K = 1024  # capacity per tile (uniform random here ~593/tile)
@jax.jit
def bin_gather(tile_s, xl_s, yl_s, r_s, g_s, b_s):
    starts = jnp.searchsorted(tile_s, jnp.arange(T, dtype=jnp.int32))
    ends = jnp.searchsorted(tile_s, jnp.arange(T, dtype=jnp.int32), side="right")
    idx = starts[:, None] + jnp.arange(K)[None, :]
    valid = idx < ends[:, None]
    idx = jnp.minimum(idx, M - 1)
    packed = jnp.stack([xl_s, yl_s, r_s, g_s, b_s,
                        jnp.ones_like(xl_s), jnp.zeros_like(xl_s),
                        jnp.zeros_like(xl_s)], axis=-1)  # (M, 8)
    g = jnp.take(packed, idx.reshape(-1), axis=0).reshape(T, K, 8)
    g = g * valid[..., None]
    return g
timeit("searchsorted + gather (T,K,8)", bin_gather, tile_s, xl_s, yl_s, r_s, g_s, b_s)
gbuf = bin_gather(tile_s, xl_s, yl_s, r_s, g_s, b_s)

@jax.jit
def tile_matmul(g):
    xl = g[..., 0]; yl = g[..., 1]; rgb = g[..., 2:5]; w = g[..., 5]
    oh_x = (xl[..., None] == jnp.arange(128, dtype=jnp.float32)).astype(jnp.float32)  # (T,K,128)
    oh_y = (yl[..., None] == jnp.arange(8, dtype=jnp.float32)).astype(jnp.float32)    # (T,K,8)
    a = (oh_y[..., None] * (rgb * w[..., None])[..., None, :]).reshape(T, K, 24)      # (T,K,24)
    tiles = jnp.einsum("tkc,tkx->tcx", a, oh_x)  # (T,24,128)
    tiles = tiles.reshape(TY, TX, 8, 3, 128).transpose(0, 2, 3, 1, 4)
    return tiles.reshape(H, 3, W).transpose(0, 2, 1)
timeit("one-hot tile matmul (T,24,K)@(T,K,128)", tile_matmul, gbuf)

# combined prototype
@jax.jit
def proto(y, x, c):
    return tile_matmul(bin_gather(*sort_entries(y, x, c)))
timeit("prototype total (sort+bin+matmul)", proto, y, x, c)

# correctness check vs scatter
ref = scatter1(y, x, c)
got = proto(y, x, c)
print("max abs diff vs scatter:", float(jnp.max(jnp.abs(ref - got))), flush=True)
print("DONE", flush=True)
