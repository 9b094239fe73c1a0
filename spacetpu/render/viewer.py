"""Host-side frontends consuming on-device framebuffers.

The reference ships two frontends: a raw winit window
(`/root/reference/space/src/event_loop.rs:89-303`) and an eframe/egui app
with an info side panel (`ui.rs`, `ui/info.rs`). A TPU host is headless, so
the two TPU-native frontends are:

- `OfflineViewer`: renders frames to PNG files / an animated GIF — the
  batch-production analogue of the winit path;
- `TerminalViewer`: an interactive ANSI viewer (half-block truecolor
  rendering to the terminal) with the reference's exact key bindings —
  WASD pan, arrows/Home/PageUp rotate, +/- zoom, f/g/h focus cycle,
  j relative-target toggle, space trail clear (event_loop.rs:181-210),
  l/o live dt tuning (ui.rs:128-133), q quit.

Both share `FrameSource`: exchange sampling -> trail push -> camera track ->
render_scene, the per-frame sequence of SpaceEguiApp::update
(ui.rs:75-162). The info panel reproduces ui/info.rs:43-75: rolling
tick-rate average, simulated time, sim-time-per-wall-second, time per tick,
focused object name.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from spacetpu import constants
from spacetpu.engine import DEVICE_LOCK, SimEngine
from spacetpu.render import rasterizer, trails
from spacetpu.render.camera import Camera
from spacetpu.state import Scene
from spacetpu.utils.metrics import TickRateTracker, compute_elapsed_time


@dataclasses.dataclass
class KeyState:
    """One frame's worth of key events (KeyboardState, event_loop.rs:51-86)."""

    w: bool = False
    a: bool = False
    s: bool = False
    d: bool = False
    up: bool = False
    down: bool = False
    left: bool = False
    right: bool = False
    home: bool = False
    pgup: bool = False
    plus: bool = False
    minus: bool = False
    f: bool = False
    g: bool = False
    h: bool = False
    j: bool = False
    space: bool = False
    o: bool = False
    l: bool = False
    quit: bool = False


class FrameSource:
    """Pulls snapshots from a SimEngine and renders framebuffers."""

    def __init__(self, engine: SimEngine, scene: Scene, *,
                 width: int = 960, height: int = 540, auto_frame: bool = True,
                 trail_length: int = constants.TRAIL_MAX_LENGTH,
                 blend: str = "auto"):
        self.engine = engine
        self.scene = scene
        self.width = width
        self.height = height
        self.camera = Camera(width, height)
        if auto_frame:
            self.camera.frame_scene(scene.pos)
        self.trails = trails.make_trails(scene.n, t=trail_length)
        self.colors = jnp.asarray(scene.colors, jnp.float32)
        self.radii = jnp.asarray(scene.radii, jnp.float32)
        self._radii_src = None  # last engine.radii_snapshot reference seen
        self.info = InfoPanel()
        # start from the scene's own positions: the first frames render
        # before the sim thread publishes its first sample, and an
        # all-zeros buffer would draw every body as one dot at the origin
        self._latest_positions = np.asarray(scene.pos, np.float32).copy()
        if blend not in ("auto", "ordered", "additive"):
            raise ValueError(f"unknown blend mode {blend!r}")
        # depth-ordered alpha-over for few-body scenes (opaque planets);
        # additive glow splatting for clouds (rasterizer.render_ordered)
        self.blend = ("ordered" if scene.n <= 128 else "additive"
                      ) if blend == "auto" else blend

    def apply_keys(self, k: KeyState):
        cam = self.camera
        cam.pan(w=k.w, a=k.a, s=k.s, d=k.d)
        cam.zoom(zoom_in=k.plus, zoom_out=k.minus)
        cam.rotate(up=k.up, down=k.down, left=k.left, right=k.right,
                   roll_ccw=k.home, roll_cw=k.pgup)
        cam.cycle_focus(self.scene.n, prev=k.f, nxt=k.g, clear=k.h,
                        toggle_relative=k.j)
        if k.space:
            with DEVICE_LOCK:
                self.trails = trails.clear(self.trails)
        if k.l:
            self.engine.exchange.set_delta(self.engine.exchange.delta() * 0.9)
        if k.o:
            self.engine.exchange.set_delta(self.engine.exchange.delta() * 1.1)

    def frame(self) -> np.ndarray:
        """One UI tick: sample -> trails -> camera -> render (ui.rs:117-142).
        Returns a host (H, W, 3) uint8 frame; all device work happens under
        the engine DEVICE_LOCK so it never races the sim thread's queue."""
        self.engine.check_health()  # surface a dead sim thread immediately
        # collision merging shrinks/zeroes radii mid-run: re-read the sim
        # thread's latest snapshot (atomic reference swap) when it changes
        snap_r = getattr(self.engine, "radii_snapshot", None)
        if snap_r is not None and snap_r is not self._radii_src:
            self._radii_src = snap_r
            self.radii = jnp.asarray(snap_r, jnp.float32)
        snapshot = self.engine.exchange.sample()
        self._latest_positions = snapshot
        self.camera.track_focus(snapshot)
        with DEVICE_LOCK:
            self.trails = trails.push(self.trails, jnp.asarray(snapshot))
            shift = None
            if self.camera.relative_target is not None:
                shift = jnp.asarray(
                    snapshot[self.camera.relative_target % len(snapshot)]
                )
            if self.blend == "ordered":
                render_fn = rasterizer.render_ordered
            else:
                from spacetpu.render.fastsplat import (
                    render_scene_auto as render_fn,
                )

            fb = render_fn(
                self.trails.history,
                trails.ages(self.trails),
                self.colors,
                self.radii,
                jnp.asarray(self.camera.view()),
                jnp.asarray(self.camera.projection()),
                width=self.width,
                height=self.height,
                origin_shift=shift,
                # keep dense clouds from saturating to white
                exposure=min(1.0, 5000.0 / max(self.scene.n, 1)),
            )
            return rasterizer.to_u8(fb)

    def info_lines(self) -> list[str]:
        return self.info.lines(
            self.engine.exchange.current_ticks(),
            self.engine.exchange.delta(),
            self.camera.focus,
            self.scene.names,
        )


class InfoPanel:
    """ui/info.rs:11-75 as text lines."""

    def __init__(self):
        self.tracker = TickRateTracker(30)

    def lines(self, tick: int, delta: float, focus: Optional[int],
              names: list[str]) -> list[str]:
        avg = self.tracker.update(tick)
        out = [
            f"Current time: {compute_elapsed_time(tick, delta)}",
            f"Simulated time per second: {compute_elapsed_time(avg, delta)}",
            f"Current time per tick: {compute_elapsed_time(1.0, delta)}",
        ]
        if focus is not None and 0 <= focus < len(names):
            out.append(f"Focused object: {names[focus]}")
        return out


class OfflineViewer:
    """Render N frames to PNGs (and optionally a GIF): the headless
    counterpart of the winit frontend's redraw loop."""

    def __init__(self, source: FrameSource, out_dir: str = "frames"):
        self.source = source
        self.out_dir = out_dir

    def run(self, n_frames: int, *, every_ticks: Optional[int] = None,
            gif: Optional[str] = None, frame_delay_s: float = 0.0):
        import os

        from PIL import Image

        os.makedirs(self.out_dir, exist_ok=True)
        images = []
        for i in range(n_frames):
            img = Image.fromarray(self.source.frame())
            img.save(os.path.join(self.out_dir, f"frame_{i:05d}.png"))
            images.append(img)
            if (i + 1) % 60 == 0:
                # console heartbeat every 60 frames (event_loop.rs:289-295)
                print(" | ".join(self.source.info_lines()), flush=True)
            if frame_delay_s:
                time.sleep(frame_delay_s)
        if gif and images:
            images[0].save(
                gif, save_all=True, append_images=images[1:], duration=50,
                loop=0,
            )
        return images


def _frame_to_ansi(rgb: np.ndarray) -> str:
    """(H, W, 3) uint8 -> truecolor half-block string (2 rows per line).
    Vectorized escape-buffer assembly (render/termgfx.py)."""
    from spacetpu.render import termgfx

    return termgfx.ansi_halfblocks(rgb).decode("utf-8").rstrip("\n")


class TerminalViewer:
    """Interactive terminal frontend with the reference's key bindings.

    Renders real pixels through the kitty graphics protocol, iTerm2
    inline images, or sixel when the terminal supports one (detected from
    the environment, overridable via --term-graphics), falling back to
    truecolor ANSI half-blocks anywhere else — the closest a TTY gets to
    the reference's vsync'd wgpu window (surface.rs:140-156)."""

    KEYMAP = {
        "w": "w", "a": "a", "s": "s", "d": "d",
        "+": "plus", "-": "minus",
        "f": "f", "g": "g", "h": "h", "j": "j", " ": "space",
        "o": "o", "l": "l", "q": "quit",
        "\x1b[A": "up", "\x1b[B": "down", "\x1b[D": "left", "\x1b[C": "right",
        "\x1b[H": "home", "\x1b[5~": "pgup",
    }

    def __init__(self, source: FrameSource, fps: float = 20.0,
                 graphics: str = "auto"):
        from spacetpu.render import termgfx

        self.source = source
        self.fps = fps
        if graphics not in termgfx.PROTOCOLS:
            raise ValueError(f"graphics must be one of {termgfx.PROTOCOLS}")
        self.graphics = (termgfx.detect_protocol() if graphics == "auto"
                         else graphics)

    def _read_keys(self) -> KeyState:
        """Non-blocking drain of stdin escape sequences."""
        import os
        import select

        k = KeyState()
        buf = ""
        while select.select([sys.stdin], [], [], 0)[0]:
            buf += os.read(sys.stdin.fileno(), 64).decode(errors="ignore")
        i = 0
        while i < len(buf):
            matched = False
            for seq, attr in self.KEYMAP.items():
                if buf.startswith(seq, i):
                    setattr(k, attr, True)
                    i += len(seq)
                    matched = True
                    break
            if not matched:
                i += 1
        return k

    def _fit_to_terminal(self):
        """Resize the framebuffer to the terminal (the resize handling of
        event_loop.rs:171-175 / ui.rs:85-88). Half-block rendering gives 2
        pixel rows per text row (one row reserved for the info line); the
        pixel protocols use the TTY-reported pixel area when available."""
        import shutil

        from spacetpu.render import termgfx

        cols, rows = shutil.get_terminal_size()
        if self.graphics == "ansi":
            w = max(32, cols)
            h = max(32, (rows - 2) * 2)
        else:
            px = termgfx.terminal_pixel_size()
            if px is not None:
                cell_h = max(1, px[1] // max(rows, 1))
                w, h = px[0], max(32, px[1] - 2 * cell_h)
            else:
                # no pixel report: assume ~10x20 px cells
                w, h = cols * 10, max(32, (rows - 2) * 20)
            if self.graphics == "sixel":  # chatty protocol: cap resolution
                w, h = min(w, 640), min(h, 400)
        w -= w % 2
        h -= h % 2
        if (w, h) != (self.source.width, self.source.height):
            self.source.width = w
            self.source.height = h
            self.source.camera.resize(w, h)

    def run(self, max_frames: Optional[int] = None):
        import termios
        import tty

        if not sys.stdin.isatty():
            raise SystemExit(
                "terminal frontend needs an interactive TTY; use "
                "--frontend offline (PNG/GIF) or --frontend none (headless)"
            )
        fd = sys.stdin.fileno()
        old = termios.tcgetattr(fd)
        try:
            tty.setcbreak(fd)
            sys.stdout.write("\x1b[2J")  # clear
            frame_i = 0
            while max_frames is None or frame_i < max_frames:
                t0 = time.monotonic()
                if frame_i % 30 == 0:
                    self._fit_to_terminal()
                keys = self._read_keys()
                if keys.quit:
                    break
                self.source.apply_keys(keys)
                from spacetpu.render import termgfx

                frame = termgfx.encode_frame(self.source.frame(),
                                             self.graphics)
                info = " | ".join(self.source.info_lines())
                if self.graphics == "ansi":
                    buf = (b"\x1b[H" + frame + b"\x1b[0m" + info.encode()
                           + b"\x1b[K\n")
                else:
                    # pixel frame from the top-left, info on the last row
                    buf = (b"\x1b[H" + frame + b"\x1b[999;1H\x1b[0m"
                           + info.encode() + b"\x1b[K")
                sys.stdout.buffer.write(buf)
                sys.stdout.flush()
                frame_i += 1
                dt = 1.0 / self.fps - (time.monotonic() - t0)
                if dt > 0:
                    time.sleep(dt)
        finally:
            termios.tcsetattr(fd, termios.TCSADRAIN, old)
            sys.stdout.write("\x1b[0m\n")
