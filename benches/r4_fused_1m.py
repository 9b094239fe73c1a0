"""Fused step+render at N=1M / 1080p: the interactive ceiling on chip.

Round-4's mesh tier made a 1M-body interactive tick cheap (PM ~145
ms/step vs the cached tree's 364 ms); this measures the full
end-to-end frame — physics step + trail push + fastsplat rasterize in
ONE XLA program, only the framebuffer leaving the device — for the PM
and cached-tree solvers on the reference's uniform-cloud scene. The
reference's equivalent pipeline is CPU rayon physics + wgpu draw with
a host round-trip per frame (batch_request.rs/objects.rs); at N=10k it
vsync-caps at 60 fps while the fused path measured 197 fps (round-2).

Run detached: nohup python benches/r4_fused_1m.py > log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spacetpu.utils import benchenv

benchenv.force_platform()

import jax.numpy as jnp
import numpy as np

from spacetpu.models import presets
from spacetpu.render import fused
from spacetpu.render.camera import Camera
from spacetpu.sim import make_simulation

N = benchenv.size(1_000_000, 8192)
W, H = benchenv.size((1920, 1080), (320, 200))
REPS = benchenv.size(10, 2)


def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))


print(f"platform={jax.devices()[0].platform} N={N} {W}x{H}", flush=True)

scene = presets.fixed_cloud(N)
cam = Camera(W, H)
cam.frame_scene(scene.pos)
view = jnp.asarray(cam.view())
proj = jnp.asarray(cam.projection())
colors = jnp.asarray(scene.colors)
radii = jnp.asarray(scene.radii)
dt = jnp.asarray(10.0, jnp.float32)

for name, kw in [
    ("pm grid=128", dict(algorithm="pm",
                         pm_grid=benchenv.size(128, 32))),
    ("tree th=0.5 refresh=8", dict(algorithm="tree", theta=0.5,
                                   k_near="auto", near_mode="auto",
                                   tree_refresh_every=8)),
]:
    sim = make_simulation(scene.n, integrator="leapfrog",
                          softening="plummer", eps=1e-3, g=scene.g, **kw)
    init, frame = fused.make_fused_frame(sim, width=W, height=H)
    t0 = time.perf_counter()
    fs_state = init(scene.state(dtype=jnp.float32))
    fs_state, fb = frame(fs_state, dt, colors, radii, view, proj)
    fence(fb)
    print(f"  [{name}] prime+compile {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(REPS):
        fs_state, fb = frame(fs_state, dt, colors, radii, view, proj)
    fence(fb)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"fused frame [{name:24s}] {ms:8.2f} ms  ({1e3 / ms:6.1f} fps)",
          flush=True)

print("FUSED 1M DONE", flush=True)
