"""Fused step+render with the fastsplat renderer at N=100k / 1080p."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))

W, H = 1920, 1080
N = 100_000

from spacetpu.models import presets
from spacetpu.sim import make_simulation
from spacetpu.render import fused
from spacetpu.render.camera import Camera

scene = presets.fixed_cloud(N)
cam = Camera(W, H)
cam.frame_scene(scene.pos)
view = jnp.asarray(cam.view())
proj = jnp.asarray(cam.projection())
colors = jnp.asarray(scene.colors)
radii = jnp.asarray(scene.radii)
dt = jnp.asarray(10.0, jnp.float32)

for name, kw in [
    ("th=0.8 quad", dict(theta=0.8)),
    ("th=0.5 quad", dict(theta=0.5)),
]:
    sim = make_simulation(scene.n, algorithm="tree", integrator="leapfrog",
                          softening="plummer", eps=1e-3, g=scene.g, **kw)
    init, frame = fused.make_fused_frame(sim, width=W, height=H)
    fs_state = init(scene.state())
    fs_state, fb = frame(fs_state, dt, colors, radii, view, proj)
    fence(fb)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        fs_state, fb = frame(fs_state, dt, colors, radii, view, proj)
    fence(fb)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"fused frame {name}: {ms:.2f} ms  ({1e3/ms:.1f} fps)", flush=True)
print("DONE", flush=True)
