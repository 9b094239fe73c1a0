"""Render stack tests: camera math, trails ring buffer, rasterizer."""

import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu.render import rasterizer, trails
from spacetpu.render.camera import Camera, infinite_projection, look_at_rh


def test_look_at_matches_convention():
    # Camera at +Z looking at origin: view maps origin to (0,0,-2).
    v = look_at_rh([0, 0, 2], [0, 0, 0], [0, 1, 0])
    p = v @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [0, 0, -2], atol=1e-6)
    # a point right of target appears at +x in view space
    p = v @ np.array([1, 0, 0, 1.0])
    assert p[0] > 0


def test_infinite_projection_entries():
    # camera.rs:86-99: e on x, e*aspect on y, epsilon trick on z, w = -z.
    pr = infinite_projection(np.radians(45.0), 16 / 9)
    e = 1.0 / np.tan(np.radians(45.0) / 2)
    np.testing.assert_allclose(pr[0, 0], e, rtol=1e-6)
    np.testing.assert_allclose(pr[1, 1], e * 16 / 9, rtol=1e-6)
    assert pr[3, 2] == -1.0
    # center point in front of camera projects to ndc origin with w = depth
    clip = pr @ np.array([0, 0, -2, 1.0])
    assert clip[3] == 2.0
    np.testing.assert_allclose(clip[:2], 0.0)


def test_camera_zoom_step_is_tenth_of_distance():
    c = Camera(100, 100)
    d0 = np.linalg.norm(c.eye - c.target)
    c.zoom(zoom_in=True)
    d1 = np.linalg.norm(c.eye - c.target)
    np.testing.assert_allclose(d1, d0 * 0.9, rtol=1e-9)


def test_camera_rotation_preserves_distance():
    c = Camera(100, 100)
    d0 = np.linalg.norm(c.eye - c.target)
    for _ in range(50):
        c.rotate(up=True, left=True)
    d1 = np.linalg.norm(c.eye - c.target)
    np.testing.assert_allclose(d1, d0, rtol=1e-6)


def test_camera_focus_cycling():
    # camera.rs:169-186: f cycles down, g up, h clears, j toggles relative.
    c = Camera(100, 100)
    c.cycle_focus(5, nxt=True)
    assert c.focus == 0
    c.cycle_focus(5, prev=True)
    assert c.focus == 4
    c.cycle_focus(5, toggle_relative=True)
    assert c.relative_target == 4
    c.cycle_focus(5, toggle_relative=True)
    assert c.relative_target is None
    c.cycle_focus(5, clear=True)
    assert c.focus is None


def test_camera_track_focus_preserves_offset():
    c = Camera(100, 100)
    c.focus = 1
    positions = np.array([[0, 0, 0], [5, 5, 0]], np.float32)
    off = c.eye - c.target
    c.track_focus(positions)
    np.testing.assert_allclose(c.target, [5, 5, 0])
    np.testing.assert_allclose(c.eye - c.target, off)


def test_trails_ring_semantics():
    tb = trails.make_trails(2, t=3)
    for k in range(4):
        tb = trails.push(tb, jnp.full((2, 3), float(k)))
    # capacity 3: snapshots 1,2,3 retained; newest = 3
    np.testing.assert_allclose(np.asarray(trails.latest(tb)), 3.0)
    ages = np.asarray(trails.ages(tb))
    assert (ages >= 0).all() and (ages <= 1).all()
    # exactly one age-0 (newest) and one age-1 (oldest)
    assert (ages == 0).sum() == 1
    assert (ages == 1).sum() == 1
    tb = trails.clear(tb)
    assert int(tb.count) == 0


def test_splat_renders_centered_point():
    pos = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    col = jnp.asarray([[1.0, 0.5, 0.25]], jnp.float32)
    cam = Camera(64, 64)
    frame = rasterizer.splat(
        pos, col, jnp.ones((1,)), jnp.zeros((1,)),
        jnp.asarray(cam.view()), jnp.asarray(cam.projection()),
        width=64, height=64,
    )
    frame = np.asarray(frame)
    assert frame.shape == (64, 64, 3)
    # energy concentrated at the center (bilinear AA may split the point
    # across up to 4 pixels), nothing in the corners
    center = frame[30:34, 30:34]
    assert center[..., 0].sum() > 0.9  # red channel sums to ~weight
    assert frame[:4, :4].max() == 0.0
    iy, ix = np.unravel_index(frame[..., 0].argmax(), frame[..., 0].shape)
    assert abs(iy - 32) <= 1 and abs(ix - 32) <= 1


def test_splat_behind_camera_invisible():
    pos = jnp.asarray([[0.0, 0.0, 10.0]], jnp.float32)  # behind (eye at z=2)
    col = jnp.ones((1, 3), jnp.float32)
    cam = Camera(32, 32)
    frame = rasterizer.splat(
        pos, col, jnp.ones((1,)), jnp.zeros((1,)),
        jnp.asarray(cam.view()), jnp.asarray(cam.projection()),
        width=32, height=32,
    )
    assert float(jnp.max(frame)) == 0.0


def test_fused_step_render():
    """One XLA program: k physics steps + trail push + rasterize
    (BASELINE config #5)."""
    from spacetpu import make_simulation
    from spacetpu.models import presets
    from spacetpu.render.fused import make_fused_frame

    n = 64
    scene = presets.random_cluster(n, seed=3)
    sim = make_simulation(n, algorithm="direct", backend="xla",
                          softening="plummer", eps=1e-2, g=1.0)
    init, frame = make_fused_frame(sim, width=64, height=48,
                                   steps_per_frame=3)
    fs = init(scene.state(dtype=jnp.float32))
    cam = Camera(64, 48)
    args = (jnp.float32(1e-3), jnp.asarray(scene.colors),
            jnp.asarray(scene.radii), jnp.asarray(cam.view()),
            jnp.asarray(cam.projection()))
    t0 = float(fs.sim_state.time)
    for _ in range(3):
        fs, fb = frame(fs, *args)
    assert fb.shape == (48, 64, 3)
    assert np.isfinite(np.asarray(fb)).all()
    assert float(jnp.max(fb)) > 0
    # 3 frames x 3 steps each actually advanced the simulation
    assert float(fs.sim_state.time) - t0 == pytest.approx(9 * 1e-3)
    # trail buffer accumulated snapshots
    assert int(fs.trail_buf.count) >= 4


def test_render_scene_relative_mode_recenters():
    """origin_shift (the use_relative_position mode of line_vs/circle_vs)
    moves the subtracted body to the world origin in the rendered frame."""
    n = 2
    tb = trails.make_trails(n, t=2)
    pos = jnp.asarray([[5.0, 5.0, 0.0], [5.5, 5.0, 0.0]], jnp.float32)
    tb = trails.push(tb, pos)
    tb = trails.push(tb, pos)
    cam = Camera(64, 64)
    colors = jnp.ones((n, 3), jnp.float32)
    radii = jnp.full((n,), 1e-4, jnp.float32)
    args = (tb.history, trails.ages(tb), colors, radii,
            jnp.asarray(cam.view()), jnp.asarray(cam.projection()))
    # absolute mode: bodies at x~5 are far off-screen for a camera at origin
    absolute = np.asarray(rasterizer.render_scene(*args, width=64, height=64))
    assert absolute.max() == 0.0
    # relative to body 0: it sits at the origin -> visible at frame centre
    relative = np.asarray(rasterizer.render_scene(
        *args, width=64, height=64, origin_shift=pos[0]))
    assert relative.max() > 0.1
    iy, ix = np.unravel_index(relative[..., 0].argmax(),
                              relative[..., 0].shape)
    assert abs(int(iy) - 32) <= 2 and abs(int(ix) - 32) <= 6


def test_render_scene_end_to_end():
    n = 16
    rng = np.random.default_rng(0)
    tb = trails.make_trails(n, t=4)
    for k in range(4):
        tb = trails.push(tb, jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)),
                                         jnp.float32))
    cam = Camera(48, 48)
    frame = rasterizer.render_scene(
        tb.history, trails.ages(tb),
        jnp.asarray(rng.uniform(0.3, 1, (n, 3)), jnp.float32),
        jnp.full((n,), 1e-4, jnp.float32),
        jnp.asarray(cam.view()), jnp.asarray(cam.projection()),
        width=48, height=48,
    )
    frame = np.asarray(frame)
    assert frame.shape == (48, 48, 3)
    assert frame.max() > 0.1
    assert np.isfinite(frame).all()
    u8 = rasterizer.to_u8(frame)
    assert u8.dtype == np.uint8
