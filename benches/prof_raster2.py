"""Round-2 rasterizer measurements: packed sort, blur variants, tree step tuning."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import functools
import jax, jax.numpy as jnp, numpy as np

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
    print(f"{name:50s} {dt:8.2f} ms", flush=True)
    return dt

W, H = 1920, 1080
M = 1_200_000
TX = W // 128
T = TX * (H // 8)

key = jax.random.PRNGKey(0)
ky, kx, kc = jax.random.split(key, 3)
y = jax.random.randint(ky, (M,), 0, H)
x = jax.random.randint(kx, (M,), 0, W)
c = jax.random.uniform(kc, (M, 3))

# --- 1. packed sort: key u32 = tile, payload u32 = xl(7) yl(3) + rgb 8/7/7 quantized
@jax.jit
def sort_packed(y, x, c):
    tile = ((y // 8) * TX + (x // 128)).astype(jnp.uint32)
    xl = (x % 128).astype(jnp.uint32)
    yl = (y % 8).astype(jnp.uint32)
    q = jnp.clip((c * 127.0 + 0.5), 0, 127).astype(jnp.uint32)  # 7b/channel
    payload = (xl << 25) | (yl << 22) | (q[:, 0] << 14) | (q[:, 1] << 7) | q[:, 2]
    tile_s, pay_s = jax.lax.sort((tile, payload), num_keys=1)
    return tile_s, pay_s
timeit("sort packed (2 x u32 operands)", sort_packed, y, x, c)

@jax.jit
def sort_packed3(y, x, c):
    tile = ((y // 8) * TX + (x // 128)).astype(jnp.uint32)
    xl = (x % 128).astype(jnp.uint32)
    yl = (y % 8).astype(jnp.uint32)
    coord = (xl << 16) | yl
    q = jnp.clip((c * 255.0 + 0.5), 0, 255).astype(jnp.uint32)
    rgb = (q[:, 0] << 16) | (q[:, 1] << 8) | q[:, 2]
    tile_s, co_s, rgb_s = jax.lax.sort((tile, coord, rgb), num_keys=1)
    return tile_s, co_s, rgb_s
timeit("sort packed (3 x u32 operands)", sort_packed3, y, x, c)

# single fused key+payload in one u32? key must be distinct per tile (11 bits); 21 left: not enough for payload. skip.

# sort f32 key variant (might be faster than u32?)
@jax.jit
def sort_f32(y, x, c):
    tile = ((y // 8) * TX + (x // 128)).astype(jnp.float32)
    pay = (x % 128).astype(jnp.float32)
    return jax.lax.sort((tile, pay), num_keys=1)
timeit("sort packed (2 x f32)", sort_f32, y, x, c)

# --- 2. blur variants on (4, H, W, 3) canvases
from spacetpu.render import rasterizer
canv = jax.random.uniform(key, (4, H, W, 3))

@jax.jit
def conv_depthwise(canvases):
    # all 4 buckets x 3 channels as 12 grouped channels, one conv per axis
    img = canvases.transpose(0, 3, 1, 2).reshape(1, 12, H, W)
    ks = [np.zeros((12, 1, 17, 1), np.float32) for _ in range(2)]
    kmax = 17
    ky_ = np.zeros((12, 1, kmax, 1), np.float32)
    kx_ = np.zeros((12, 1, 1, kmax), np.float32)
    for b, k1d in enumerate(rasterizer._KERNELS_1D):
        pad = (kmax - len(k1d)) // 2
        for ch in range(3):
            ky_[b * 3 + ch, 0, pad:pad + len(k1d), 0] = k1d
            kx_[b * 3 + ch, 0, 0, pad:pad + len(k1d)] = k1d
    img = jax.lax.conv_general_dilated(
        img, jnp.asarray(ky_), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=12)
    img = jax.lax.conv_general_dilated(
        img, jnp.asarray(kx_), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=12)
    return jnp.clip(img.reshape(4, 3, H, W).sum(0).transpose(1, 2, 0), 0, 1)
timeit("blur: depthwise grouped conv (12ch)", conv_depthwise, canv)

@jax.jit
def conv_matmul(canvases):
    # blur as band-matrix matmuls: Y (H,H) @ canvas @ X (W,W), per bucket
    frame = jnp.zeros((H, W, 3), jnp.float32)
    iy = np.arange(H)
    ix = np.arange(W)
    for b, k1d in enumerate(rasterizer._KERNELS_1D):
        r = (len(k1d) - 1) // 2
        By = np.zeros((H, H), np.float32)
        for o in range(-r, r + 1):
            d = np.clip(iy + o, 0, H - 1)
            np.add.at(By, (iy[(iy + o >= 0) & (iy + o < H)], (iy + o)[(iy + o >= 0) & (iy + o < H)]), 0)
        # simpler: use scipy-style banded via eye
        By = sum(np.eye(H, H, o, dtype=np.float32) * k1d[r + o] for o in range(-r, r + 1))
        Bx = sum(np.eye(W, W, o, dtype=np.float32) * k1d[r + o] for o in range(-r, r + 1))
        img = canvases[b]  # (H, W, 3)
        img = jnp.einsum("ij,jwc->iwc", jnp.asarray(By), img)
        img = jnp.einsum("iwc,wv->ivc", img, jnp.asarray(Bx))
        frame = frame + img
    return jnp.clip(frame, 0, 1)
timeit("blur: band-matrix matmuls", conv_matmul, canv)

@jax.jit
def conv_mip(canvases):
    # r=1,2 full res; r=4 at 1/2 res; r=8 at 1/4 res, with 5-tap kernels
    def sep(img, k1d):  # img (C,1,H,W)
        k = jnp.asarray(k1d)
        img = jax.lax.conv_general_dilated(img, k[None, None, :, None], (1, 1), "SAME",
                                           dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return jax.lax.conv_general_dilated(img, k[None, None, None, :], (1, 1), "SAME",
                                            dimension_numbers=("NCHW", "OIHW", "NCHW"))
    frame = jnp.zeros((3, 1, H, W), jnp.float32)
    for b, k1d in enumerate(rasterizer._KERNELS_1D):
        img = canvases[b].transpose(2, 0, 1)[:, None]
        if b < 2:
            frame = frame + sep(img, k1d)
        else:
            f = 2 ** (b - 1)  # 2 or 4
            small = img.reshape(3, 1, H // f, f, W // f, f).sum((3, 5))
            k_small = rasterizer._falloff_kernel_1d(rasterizer._BUCKET_RADII[b] / f)
            small = sep(small, k_small) / (f * f)
            up = jnp.repeat(jnp.repeat(small, f, axis=2), f, axis=3)
            frame = frame + up
    return jnp.clip(frame[:, 0].transpose(1, 2, 0), 0, 1)
timeit("blur: mipmap (r>=4 at low res)", conv_mip, canv)

# --- 3. tree step tuning at N=100k
from spacetpu.models import presets
from spacetpu.sim import make_simulation

scene = presets.fixed_cloud(100_000)
dt = jnp.asarray(10.0, jnp.float32)
for name, kw in [
    ("tree step th=0.5 quad refresh=1", dict(theta=0.5)),
    ("tree step th=0.8 quad refresh=1", dict(theta=0.8)),
    ("tree step th=0.8 quad refresh=8", dict(theta=0.8, tree_refresh_every=8)),
    ("tree step th=0.6 mono refresh=8", dict(theta=0.6, multipole_order=1, tree_refresh_every=8)),
]:
    sim = make_simulation(scene.n, algorithm="tree", integrator="leapfrog",
                          softening="plummer", eps=1e-3, g=scene.g, **kw)
    st = sim.prime(scene.state())
    # time run(state, dt, 8) / 8 to amortize and exercise refresh caching
    try:
        stt = sim.run(st, 10.0, 8)
        t0 = time.perf_counter()
        for _ in range(3):
            stt = sim.run(stt, 10.0, 8)
        fence(stt.pos)
        print(f"{name:50s} {(time.perf_counter()-t0)/3/8*1e3:8.2f} ms/step", flush=True)
    except Exception as e:
        print(name, "FAILED", repr(e), flush=True)

print("DONE", flush=True)
