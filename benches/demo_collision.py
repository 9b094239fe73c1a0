"""Collision-merge demo: two stars spiral in, touch, and merge into one
(perfectly inelastic, --merge-collisions machinery through the engine).

Writes media/collision_merge.gif. CPU-friendly:
  python benches/demo_collision.py
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from spacetpu.engine import SimEngine  # noqa: E402
from spacetpu.render.viewer import FrameSource, OfflineViewer  # noqa: E402
from spacetpu.sim import make_simulation  # noqa: E402
from spacetpu.state import Scene, make_state  # noqa: E402

rng = np.random.default_rng(4)
N_SPARK = 400

# two equal stars on a head-on collision course
pos = [[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]
vel = [[0.35, 0.0, 0.0], [-0.35, 0.0, 0.0]]
mass = [1.0, 1.0]
radii = [0.09, 0.09]
colors = [[1.0, 0.85, 0.4], [0.5, 0.75, 1.0]]

# massless sparkles orbiting the barycenter for context
u = rng.normal(size=(N_SPARK, 3))
u[:, 2] *= 0.15
u /= np.linalg.norm(u, axis=1, keepdims=True)
r = 1.6 + rng.uniform(0, 1.2, N_SPARK)
sp = u * r[:, None]
tang = np.cross([0.0, 0.0, 1.0], u)
tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
sv = tang * np.sqrt(2.0 / r)[:, None]
pos = np.concatenate([pos, sp])
vel = np.concatenate([vel, sv])
mass = np.concatenate([mass, np.zeros(N_SPARK)])
radii = np.concatenate([radii, np.full(N_SPARK, 0.012)])
colors = np.concatenate([colors, rng.uniform(0.4, 1.0, (N_SPARK, 3))])

n = len(mass)
scene = Scene(
    names=[f"b{i}" for i in range(n)],
    colors=np.asarray(colors, np.float32),
    radii=np.asarray(radii, np.float32),
    pos=pos, vel=vel, mass=mass, g=1.0,
)
state = make_state(pos, vel, mass, dtype=np.float32)
# multirate resolves the plunge (the stars' tau collapses at contact)
sim = make_simulation(n, algorithm="direct", backend="xla",
                      softening="plummer", eps=5e-3, g=1.0,
                      substeps=8, fast_cap=2)
eng = SimEngine(sim, state, delta=4e-3, check_interval=1,
                merge_every=1, radii=scene.radii)
src = FrameSource(eng, scene, width=640, height=360, auto_frame=False,
                  trail_length=12, blend="ordered")
# frame the collision, not the sparkle shell
src.camera.frame_scene(np.asarray(pos[:2]) * 1.6)
media = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "media")
with eng:
    OfflineViewer(src, "/tmp/collision_frames").run(
        int(sys.argv[1]) if len(sys.argv) > 1 else 160,
        gif=os.path.join(media, "collision_merge.gif"))
r_final = np.asarray(eng.radii_snapshot)
print("final radii (top 3):", sorted(r_final)[-3:])
print("merged" if (r_final > 0.1).any() else "NO MERGE — tune the demo")
