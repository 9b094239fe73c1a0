"""On-device point-splat rasterizer: the TPU replacement for the wgpu
render stack.

The reference renders with two GPU pipelines — alpha-blended line-strip
trails (`/root/reference/space/src/pipeline.rs`) and instanced screen-space
circle quads with radial alpha falloff (`circle_pipeline.rs`,
`shaders/src/lib.rs:84-142`). A TPU has no raster units, so this module
re-derives the same picture as dense array ops that XLA compiles well:

1. project all points (bodies + trail history) with the camera's view and
   infinite-far projection — the same two-stage multiply the reference's
   vertex shader does "for stability when zoomed in"
   (shaders/src/lib.rs:52-58);
2. bilinearly scatter-add each point's weighted color into one of a few
   *radius-bucketed* single-pixel canvases (scatter of M points, not M
   splat-areas);
3. convolve each canvas with a precomputed radial-falloff kernel whose
   profile matches circle_fs's (1 - (d/r)^2)^2 falloff
   (shaders/src/lib.rs:137-142) and sum.

Splatting a delta then convolving turns per-splat pixel loops into a few
dense convolutions — the shape of compute TPUs are built for. Blending is
additive (commutative, so scatter order doesn't matter) rather than the
reference's ordered alpha-over; for glowing point clouds the result is
visually equivalent and race-free by construction.

The projected circle size follows circle_vs exactly: clip-space radius
e * r clamped below by MIN_CIRCLE_SIZE *before* the perspective divide
(shaders/src/lib.rs:117-123), so distant bodies still shrink.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spacetpu.constants import MIN_CIRCLE_SIZE

#: splat radius buckets in pixels (kernel k covers radius PX[k])
_BUCKET_RADII = (1.0, 2.0, 4.0, 8.0)


def _falloff_kernel(radius_px: float) -> np.ndarray:
    """(1 - (d/r)^2)^2 radial falloff on a (2r+1)^2 grid (circle_fs)."""
    r = int(np.ceil(radius_px))
    y, x = np.mgrid[-r : r + 1, -r : r + 1]
    d2 = (x * x + y * y) / (radius_px * radius_px)
    k = np.clip(1.0 - d2, 0.0, 1.0) ** 2
    return k.astype(np.float32)


_KERNELS = tuple(_falloff_kernel(r) for r in _BUCKET_RADII)


def project(points, view, proj, *, width: int, height: int, min_clip_size,
            radii_clip):
    """Project world-space points to pixel coordinates.

    Returns (px, py, pixel_radius, valid). radii_clip are pre-projection
    clip-space sizes (e * world_radius, computed by the caller from the
    projection's [0,0] entry, mirroring circle_vs's
    |P*(r,0,0,1)|.xy trick)."""
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    hom = jnp.concatenate([points, ones], axis=-1)  # (..., 4)
    v = hom @ view.T
    c = v @ proj.T
    w = c[..., 3]
    valid = w > 1e-12
    w_safe = jnp.where(valid, w, 1.0)
    ndc_x = c[..., 0] / w_safe
    ndc_y = c[..., 1] / w_safe
    px = (ndc_x + 1.0) * 0.5 * width
    py = (1.0 - ndc_y) * 0.5 * height
    size_clip = jnp.maximum(radii_clip, min_clip_size)
    pixel_radius = size_clip * (height * 0.5) / w_safe
    on_screen = (
        valid
        & (px > -16)
        & (px < width + 16)
        & (py > -16)
        & (py < height + 16)
    )
    return px, py, pixel_radius, on_screen


def _scatter_bilinear(canvas, px, py, rgb, valid, width, height):
    """Add each point's rgb into its 4 neighbouring pixels (anti-aliased
    single-pixel splat). canvas: (H, W, 3)."""
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    for dx, dy, wgt in (
        (0, 0, (1 - fx) * (1 - fy)),
        (1, 0, fx * (1 - fy)),
        (0, 1, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        xi = x0 + dx
        yi = y0 + dy
        ok = valid & (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
        xi = jnp.where(ok, xi, 0)
        yi = jnp.where(ok, yi, 0)
        contrib = rgb * (wgt * ok.astype(rgb.dtype))[..., None]
        canvas = canvas.at[yi, xi].add(contrib, mode="drop")
    return canvas


@functools.partial(jax.jit, static_argnames=("width", "height"))
def splat(points, colors, weights, radii_clip, view, proj, *,
          width: int, height: int, min_clip_size=MIN_CIRCLE_SIZE,
          fixed_pixel_radius=None):
    """Rasterize M points into an (H, W, 3) float framebuffer.

    points (M, 3) world space; colors (M, 3); weights (M,) brightness
    multipliers (trail fade); radii_clip (M,) clip-space sizes.
    fixed_pixel_radius: optional (M,) — where > 0 it overrides the
    perspective pixel radius (trail strokes stay hairline at any zoom).
    """
    dtype = points.dtype
    colors = colors.astype(dtype)
    weights = weights.astype(dtype)
    radii_clip = radii_clip.astype(dtype)
    px, py, pixel_radius, valid = project(
        points, view.astype(dtype), proj.astype(dtype),
        width=width, height=height,
        min_clip_size=jnp.asarray(min_clip_size, dtype),
        radii_clip=radii_clip,
    )
    if fixed_pixel_radius is not None:
        pixel_radius = jnp.where(
            fixed_pixel_radius > 0, fixed_pixel_radius, pixel_radius
        )
    rgb = colors * weights[..., None]
    radii_arr = jnp.asarray(_BUCKET_RADII, dtype)
    # nearest bucket index for each point's pixel radius (clamped to max)
    bucket = jnp.argmin(
        jnp.abs(jnp.log(jnp.maximum(pixel_radius, 1e-3))[..., None]
                - jnp.log(radii_arr)[None, :]),
        axis=-1,
    )
    frame = jnp.zeros((height, width, 3), dtype)
    for b, kern in enumerate(_KERNELS):
        canvas = jnp.zeros((height, width, 3), dtype)
        canvas = _scatter_bilinear(
            canvas, px, py, rgb, valid & (bucket == b), width, height
        )
        k = jnp.asarray(kern, dtype)
        # depthwise conv: channels as batch
        img = canvas.transpose(2, 0, 1)[:, None]  # (3, 1, H, W)
        out = jax.lax.conv_general_dilated(
            img, k[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        frame = frame + out[:, 0].transpose(1, 2, 0)
    return jnp.clip(frame, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("width", "height", "trail_subdiv"))
def render_scene(trail_history, trail_ages, colors, radii_world, view, proj, *,
                 width: int, height: int, origin_shift=None,
                 min_clip_size=MIN_CIRCLE_SIZE, trail_subdiv: int = 2):
    """Render bodies + fading trails from a trail ring buffer.

    trail_history: (T, N, 3) snapshots; trail_ages: (T,) in [0, 1] with >1
    meaning invalid (see trails.ages); colors (N, 3); radii_world (N,) in
    world units. origin_shift: optional (3,) position subtracted from
    everything first — the relative-position render mode of line_vs
    (shaders/src/lib.rs:50-56). trail_subdiv: extra interpolated points per
    trail segment so short trails read as strokes, standing in for the
    reference's LineStrip topology.
    """
    dtype = trail_history.dtype
    t, n, _ = trail_history.shape
    if origin_shift is not None:
        trail_history = trail_history - origin_shift[None, None, :]

    e = proj[0, 0].astype(dtype)  # 1/tan(fovy/2): the circle_vs size basis
    newest_age = jnp.argmin(trail_ages)
    bodies = trail_history[newest_age]  # (N, 3) latest positions

    # --- trail points: every valid snapshot, alpha = (1 - age) * 0.6 ---
    fade = jnp.clip(1.0 - trail_ages, 0.0, 1.0) * 0.6  # (T,)
    # interpolate between consecutive-age snapshots for stroke continuity
    order = jnp.argsort(trail_ages)  # newest..oldest
    hist_sorted = trail_history[order]  # (T, N, 3)
    fade_sorted = fade[order]
    segs_a = hist_sorted[:-1]
    segs_b = hist_sorted[1:]
    frac = jnp.linspace(0.0, 1.0, trail_subdiv + 1, dtype=dtype)[:-1]
    interp = (
        segs_a[None] * (1.0 - frac[:, None, None, None])
        + segs_b[None] * frac[:, None, None, None]
    )  # (S, T-1, N, 3)
    interp_fade = (
        fade_sorted[None, :-1] * (1.0 - frac[:, None])
        + fade_sorted[None, 1:] * frac[:, None]
    )  # (S, T-1)
    # Mask segments with an invalid (never-written) endpoint: interpolating
    # into a zeroed history slot would draw a phantom streak toward the
    # world origin on the first frames after start / trail clear.
    ages_sorted = trail_ages[order]
    pair_valid = (ages_sorted[:-1] <= 1.0) & (ages_sorted[1:] <= 1.0)
    interp_fade = interp_fade * pair_valid[None, :].astype(dtype)
    trail_pts = interp.reshape(-1, 3)
    trail_w = jnp.broadcast_to(
        interp_fade[..., None], interp.shape[:-1]
    ).reshape(-1)
    trail_cols = jnp.broadcast_to(
        colors[None, None], interp.shape[:-1] + (3,)
    ).reshape(-1, 3)
    trail_radii = jnp.zeros_like(trail_w)

    # --- body points: full brightness, projected radius from circle_vs ---
    body_radii = e * radii_world.astype(dtype)

    points = jnp.concatenate([trail_pts, bodies], axis=0)
    cols = jnp.concatenate([trail_cols, colors.astype(dtype)], axis=0)
    wgts = jnp.concatenate(
        [trail_w, jnp.ones((n,), dtype)], axis=0
    )
    radii = jnp.concatenate([trail_radii, body_radii], axis=0)
    # trails render as hairline (1 px) strokes regardless of zoom; bodies
    # use the perspective size (with the MIN_CIRCLE_SIZE clip-space floor)
    fixed_px = jnp.concatenate(
        [jnp.full_like(trail_w, 1.0), jnp.zeros((n,), dtype)], axis=0
    )
    return splat(
        points, cols, wgts, radii, view, proj,
        width=width, height=height, min_clip_size=min_clip_size,
        fixed_pixel_radius=fixed_px,
    )


def to_u8(frame) -> np.ndarray:
    """Device float framebuffer -> host uint8 (H, W, 3)."""
    return np.asarray(jnp.round(jnp.clip(frame, 0, 1) * 255).astype(jnp.uint8))
