"""Terminal graphics encoders (render/termgfx.py)."""

import base64
import zlib

import numpy as np
import pytest

from spacetpu.render import termgfx


def _frame(h=10, w=12, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), np.uint8)


def _ansi_reference(rgb):
    """The original per-pixel f-string implementation (the oracle)."""
    h = rgb.shape[0] - (rgb.shape[0] % 2)
    top = rgb[0:h:2]
    bot = rgb[1:h:2]
    lines = []
    for tr, br in zip(top, bot):
        parts = []
        for (r1, g1, b1), (r2, g2, b2) in zip(tr, br):
            parts.append(
                f"\x1b[38;2;{r1:03d};{g1:03d};{b1:03d}m"
                f"\x1b[48;2;{r2:03d};{g2:03d};{b2:03d}m▀"
            )
        lines.append("".join(parts) + "\x1b[0m")
    return ("\n".join(lines) + "\n").encode()


def test_ansi_halfblocks_matches_reference():
    rgb = _frame(8, 16, seed=1)
    assert termgfx.ansi_halfblocks(rgb) == _ansi_reference(rgb)


def test_ansi_halfblocks_odd_height_drops_last_row():
    rgb = _frame(9, 4, seed=2)
    assert termgfx.ansi_halfblocks(rgb) == _ansi_reference(rgb)


def test_kitty_roundtrip():
    """Decode the kitty escape back to the exact RGB payload."""
    rgb = _frame(20, 32, seed=3)
    data = termgfx.kitty_frame(rgb, image_id=5)
    chunks = []
    rest = data
    while rest:
        assert rest.startswith(b"\x1b_G")
        head, rest = rest[3:].split(b";", 1)
        payload, rest = rest.split(b"\x1b\\", 1)
        chunks.append(payload)
        ctl = dict(kv.split(b"=") for kv in head.split(b","))
        if chunks[0] is payload:
            assert ctl[b"f"] == b"24" and ctl[b"o"] == b"z"
            assert ctl[b"s"] == b"32" and ctl[b"v"] == b"20"
    raw = zlib.decompress(base64.standard_b64decode(b"".join(chunks)))
    np.testing.assert_array_equal(
        np.frombuffer(raw, np.uint8).reshape(20, 32, 3), rgb
    )


def test_iterm2_roundtrip():
    import io

    from PIL import Image

    rgb = _frame(16, 16, seed=4)
    data = termgfx.iterm2_frame(rgb)
    assert data.startswith(b"\x1b]1337;File=inline=1;")
    payload = data.split(b":", 1)[1].rstrip(b"\x07")
    img = Image.open(io.BytesIO(base64.standard_b64decode(payload)))
    np.testing.assert_array_equal(np.asarray(img), rgb)


def _decode_sixel(data, w, h):
    """Minimal sixel decoder for the fixed 64-color palette."""
    assert data.startswith(b"\x1bPq") and data.endswith(b"\x1b\\")
    body = data[3:-2]
    # strip raster attributes "...;H
    assert body.startswith(b'"')
    i = body.index(b"#")
    body = body[i:]
    palette = {}
    img = np.zeros((h + 6, w, 3), np.uint8)
    x = y = 0
    color = None
    i = 0
    while i < len(body):
        c = body[i:i + 1]
        if c == b"#":
            j = i + 1
            while j < len(body) and body[j:j + 1].isdigit():
                j += 1
            idx = int(body[i + 1:j])
            if body[j:j + 1] == b";":  # palette definition #i;2;r;g;b
                parts = body[j + 1:].split(b";", 3)
                assert parts[0] == b"2"
                rgbv = []
                k = j + 3
                for _ in range(3):
                    e = k
                    while e < len(body) and body[e:e + 1].isdigit():
                        e += 1
                    rgbv.append(int(body[k:e]))
                    k = e + 1
                palette[idx] = [round(v * 255 / 100) for v in rgbv]
                i = k - 1
            else:
                color = idx
                i = j
            continue
        if c == b"$":
            x = 0
        elif c == b"-":
            x = 0
            y += 6
        elif 63 <= c[0] <= 126:
            bits = c[0] - 63
            for row in range(6):
                if bits >> row & 1:
                    img[y + row, x] = palette[color]
            x += 1
        i += 1
    return img[:h]


def test_sixel_roundtrip_on_palette_colors():
    """An image already on the 64-color palette survives sixel exactly
    (up to the 0-100 palette scale roundtrip)."""
    rng = np.random.default_rng(5)
    levels = np.asarray([0, 85, 170, 255], np.uint8)
    rgb = levels[rng.integers(0, 4, (12, 10, 3))]
    data = termgfx.sixel_frame(rgb)
    got = _decode_sixel(data, 10, 12)
    # palette values quantize to percent and back: allow +-3
    assert np.max(np.abs(got.astype(int) - rgb.astype(int))) <= 3


def test_detect_protocol(monkeypatch):
    monkeypatch.setenv("TERM", "xterm-kitty")
    assert termgfx.detect_protocol() == "kitty"
    monkeypatch.setenv("TERM", "xterm-256color")
    monkeypatch.delenv("KITTY_WINDOW_ID", raising=False)
    monkeypatch.setenv("TERM_PROGRAM", "iTerm.app")
    assert termgfx.detect_protocol() == "iterm2"
    monkeypatch.delenv("TERM_PROGRAM", raising=False)
    monkeypatch.delenv("ITERM_SESSION_ID", raising=False)
    assert termgfx.detect_protocol() == "ansi"
    monkeypatch.setenv("TERM", "foot")
    assert termgfx.detect_protocol() == "sixel"


def test_ansi_speed_smoke():
    """The vectorized path handles a full-screen frame comfortably inside
    a 20 fps budget (the old per-pixel loop took ~100 ms here)."""
    import time

    rgb = _frame(200, 360, seed=6)  # 180x360 cells: a large terminal
    termgfx.ansi_halfblocks(rgb)  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        termgfx.ansi_halfblocks(rgb)
    assert (time.perf_counter() - t0) / 5 < 0.15  # ~9 ms unloaded; slack for CI contention
