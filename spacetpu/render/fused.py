"""Fused step+render: physics tick and rasterization in one XLA program.

The reference necessarily splits simulation (CPU, rayon) from rendering
(GPU, wgpu) and pays a host round-trip per frame (`batch_request.rs` +
`objects.rs` uploads). On TPU both halves are device programs, so a frame
can be produced by a single jitted function: k physics steps, trail-history
update, and the point-splat rasterizer, with the state donated — the only
host traffic is the finished framebuffer (BASELINE.md config #5).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from spacetpu.render import rasterizer, trails
from spacetpu.sim import Simulation
from spacetpu.state import State


class FusedState(NamedTuple):
    sim_state: State
    trail_buf: trails.TrailBuffer


def make_fused_frame(sim: Simulation, *, width: int, height: int,
                     steps_per_frame: int = 1, trail_subdiv: int = 2,
                     exposure: float | None = None):
    """Return (init, frame) where frame(fused_state, dt, colors, radii,
    view, proj) -> (fused_state, framebuffer) runs everything on device.

    exposure defaults to the same N-scaled brightness the interactive
    viewer uses (min(1, 5000/N)) so dense clouds don't saturate to white."""
    from spacetpu.render.fastsplat import render_scene_auto as render_fn

    if exposure is None:
        exposure = min(1.0, 5000.0 / max(sim.config.n, 1))

    def init(state: State, t: int = trails.TRAIL_MAX_LENGTH) -> FusedState:
        state = sim.prime(state)
        tb = trails.make_trails(state.n, t=t, dtype=state.pos.dtype)
        tb = trails.push(tb, state.pos)
        return FusedState(state, tb)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(6,))
    def _frame(fused: FusedState, dt, colors, radii_world, view, proj,
               epoch, consts):
        state = fused.sim_state

        def body(s, _):
            return sim.traced_step(s, dt, consts), None

        state, _ = jax.lax.scan(body, state, None, length=steps_per_frame)
        tb = trails.push(fused.trail_buf, state.pos)
        fb = render_fn(
            tb.history,
            trails.ages(tb),
            colors,
            radii_world,
            view,
            proj,
            width=width,
            height=height,
            trail_subdiv=trail_subdiv,
            exposure=exposure,
        )
        return FusedState(state, tb), fb

    def frame(fused: FusedState, dt, colors, radii_world, view, proj):
        # consts ride as a traced jit argument, fetched fresh per call
        # (a PM/TreePM kernel table must not bake into the frame HLO as
        # a literal, and a recalibration swaps the table); jit_epoch is
        # static so that recalibration also forces a frame retrace even
        # when the consts shapes are unchanged.
        return _frame(fused, dt, colors, radii_world, view, proj,
                      sim.jit_epoch, sim.jit_consts)

    return init, frame
