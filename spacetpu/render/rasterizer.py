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
2. scatter each point's weighted color into one of a few *radius-bucketed*
   single-pixel canvases — ONE batched scatter for all points and buckets,
   because TPU scatter cost scales with total entry count (bodies get 4
   bilinear corner entries for anti-aliasing; trail points one nearest
   entry);
3. convolve each bucket canvas with a separable falloff kernel whose
   profile follows circle_fs's (1 - d^2)^2 (shaders/src/lib.rs:137-142)
   and sum.

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

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spacetpu.constants import MIN_CIRCLE_SIZE

#: splat radius buckets in pixels (bucket k's kernel covers _BUCKET_RADII[k])
_BUCKET_RADII = (1.0, 2.0, 4.0, 8.0)


def _falloff_kernel_1d(radius_px: float) -> np.ndarray:
    """1-D profile (1 - (t/r)^2)^2; the 2-D splat is the separable product
    f(x) f(y), matching circle_fs's (1 - d^2)^2 falloff along the axes.
    Separability turns each bucket's 2-D convolution into two 1-D passes
    (K + K MACs/pixel instead of K^2); the difference from the true radial
    profile is a slight squareness of the outer glow, invisible in
    practice."""
    r = int(np.ceil(radius_px))
    t = np.arange(-r, r + 1) / radius_px
    return (np.clip(1.0 - t * t, 0.0, 1.0) ** 2).astype(np.float32)


_KERNELS_1D = tuple(_falloff_kernel_1d(r) for r in _BUCKET_RADII)


@dataclasses.dataclass
class PointGroup:
    """A batch of world-space points sharing render options.

    points (M, 3); colors (M, 3); weights (M,) brightness; radii_clip (M,)
    clip-space sizes (e * world_radius). fixed_pixel_radius: where > 0,
    overrides the perspective pixel radius (hairline trails). antialias:
    bilinear 4-corner splat (4 scatter entries/point) vs nearest (1)."""

    points: jax.Array
    colors: jax.Array
    weights: jax.Array
    radii_clip: jax.Array
    fixed_pixel_radius: jax.Array | None = None
    antialias: bool = True


jax.tree_util.register_dataclass(
    PointGroup,
    data_fields=["points", "colors", "weights", "radii_clip",
                 "fixed_pixel_radius"],
    meta_fields=["antialias"],
)


def project(points, view, proj, *, width: int, height: int, min_clip_size,
            radii_clip):
    """Project world-space points to pixel coordinates.

    Returns (px, py, pixel_radius, valid)."""
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


def _bucket_of(pixel_radius):
    radii_arr = jnp.asarray(_BUCKET_RADII, pixel_radius.dtype)
    return jnp.argmin(
        jnp.abs(jnp.log(jnp.maximum(pixel_radius, 1e-3))[..., None]
                - jnp.log(radii_arr)[None, :]),
        axis=-1,
    ).astype(jnp.int32)


def _group_entries(g: PointGroup, view, proj, *, width, height,
                   min_clip_size, dtype):
    """Scatter entries (b, y, x, rgb) for one group."""
    px, py, pixel_radius, valid = project(
        g.points, view, proj, width=width, height=height,
        min_clip_size=min_clip_size, radii_clip=g.radii_clip.astype(dtype),
    )
    if g.fixed_pixel_radius is not None:
        pixel_radius = jnp.where(
            g.fixed_pixel_radius > 0, g.fixed_pixel_radius, pixel_radius
        )
    bucket = _bucket_of(pixel_radius)
    rgb = g.colors.astype(dtype) * g.weights.astype(dtype)[..., None]

    bs, ys, xs, cs = [], [], [], []

    def emit(xi, yi, w):
        ok = valid & (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
        bs.append(jnp.where(ok, bucket, 0))
        ys.append(jnp.where(ok, yi, 0))
        xs.append(jnp.where(ok, xi, 0))
        cs.append(rgb * (w * ok.astype(dtype))[..., None])

    if g.antialias:
        x0 = jnp.floor(px - 0.5)
        y0 = jnp.floor(py - 0.5)
        fx = px - 0.5 - x0
        fy = py - 0.5 - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        emit(x0, y0, (1 - fx) * (1 - fy))
        emit(x0 + 1, y0, fx * (1 - fy))
        emit(x0, y0 + 1, (1 - fx) * fy)
        emit(x0 + 1, y0 + 1, fx * fy)
    else:
        emit(jnp.round(px - 0.5).astype(jnp.int32),
             jnp.round(py - 0.5).astype(jnp.int32),
             jnp.ones_like(px))
    return bs, ys, xs, cs


@functools.partial(jax.jit, static_argnames=("width", "height"))
def splat_groups(groups: Sequence[PointGroup], view, proj, *,
                 width: int, height: int, min_clip_size=MIN_CIRCLE_SIZE):
    """Rasterize point groups into an (H, W, 3) float framebuffer."""
    dtype = groups[0].points.dtype
    view = view.astype(dtype)
    proj = proj.astype(dtype)
    min_clip = jnp.asarray(min_clip_size, dtype)

    bs, ys, xs, cs = [], [], [], []
    for g in groups:
        b, y, x, c = _group_entries(
            g, view, proj, width=width, height=height,
            min_clip_size=min_clip, dtype=dtype,
        )
        bs += b
        ys += y
        xs += x
        cs += c

    canvases = jnp.zeros((len(_BUCKET_RADII), height, width, 3), dtype)
    canvases = canvases.at[
        jnp.concatenate(bs), jnp.concatenate(ys), jnp.concatenate(xs)
    ].add(jnp.concatenate(cs, axis=0), mode="drop")

    frame = jnp.zeros((height, width, 3), dtype)
    for b, k1d in enumerate(_KERNELS_1D):
        k = jnp.asarray(k1d, dtype)
        img = canvases[b].transpose(2, 0, 1)[:, None]  # (3, 1, H, W)
        img = jax.lax.conv_general_dilated(
            img, k[None, None, :, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        img = jax.lax.conv_general_dilated(
            img, k[None, None, None, :], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        frame = frame + img[:, 0].transpose(1, 2, 0)
    return jnp.clip(frame, 0.0, 1.0)


def splat(points, colors, weights, radii_clip, view, proj, *,
          width: int, height: int, min_clip_size=MIN_CIRCLE_SIZE,
          fixed_pixel_radius=None):
    """Single-group convenience wrapper around splat_groups."""
    return splat_groups(
        [PointGroup(points, colors, weights, radii_clip,
                    fixed_pixel_radius=fixed_pixel_radius)],
        view, proj, width=width, height=height, min_clip_size=min_clip_size,
    )


def scene_point_groups(trail_history, trail_ages, colors, radii_world, proj,
                       *, origin_shift=None, trail_subdiv: int = 2,
                       exposure=1.0):
    """Build the (trails, bodies) PointGroups for a frame.

    Shared by the scatter renderer (render_scene) and the tile-segment fast
    path (fastsplat.render_scene_fast)."""
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

    exposure = jnp.asarray(exposure, dtype)
    trails_group = PointGroup(
        points=trail_pts,
        colors=trail_cols.astype(dtype),
        weights=trail_w * exposure,
        radii_clip=jnp.zeros_like(trail_w),
        fixed_pixel_radius=jnp.ones_like(trail_w),  # hairline at any zoom
        antialias=False,
    )
    bodies_group = PointGroup(
        points=bodies,
        colors=colors.astype(dtype),
        weights=jnp.full((n,), 1.0, dtype) * exposure,
        radii_clip=e * radii_world.astype(dtype),
        antialias=True,
    )
    return trails_group, bodies_group


@functools.partial(jax.jit, static_argnames=("width", "height", "trail_subdiv"))
def render_scene(trail_history, trail_ages, colors, radii_world, view, proj, *,
                 width: int, height: int, origin_shift=None,
                 min_clip_size=MIN_CIRCLE_SIZE, trail_subdiv: int = 2,
                 exposure=1.0):
    """Render bodies + fading trails from a trail ring buffer.

    trail_history: (T, N, 3) snapshots; trail_ages: (T,) in [0, 1] with >1
    meaning invalid (see trails.ages); colors (N, 3); radii_world (N,) in
    world units. origin_shift: optional (3,) position subtracted from
    everything first — the relative-position render mode of line_vs
    (shaders/src/lib.rs:50-56). trail_subdiv: extra interpolated points per
    trail segment so short trails read as strokes, standing in for the
    reference's LineStrip topology. exposure: global brightness multiplier
    (additive blending saturates for dense clouds; viewers scale it down
    with N).

    This is the scatter+convolve path; on TPU prefer
    fastsplat.render_scene_fast (identical visual semantics, ~10x faster).
    """
    trails_group, bodies_group = scene_point_groups(
        trail_history, trail_ages, colors, radii_world, proj,
        origin_shift=origin_shift, trail_subdiv=trail_subdiv,
        exposure=exposure,
    )
    return splat_groups(
        [trails_group, bodies_group], view, proj,
        width=width, height=height, min_clip_size=min_clip_size,
    )


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render_ordered(trail_history, trail_ages, colors, radii_world, view,
                   proj, *, width: int, height: int, origin_shift=None,
                   min_clip_size=MIN_CIRCLE_SIZE, trail_subdiv: int = 2,
                   exposure=1.0):
    """Depth-ordered alpha-over body rendering for few-body scenes.

    Both reference pipelines alpha-blend in draw order
    (`/root/reference/space/src/circle_pipeline.rs:42-56`); purely additive
    splatting lets a sun shine through the planet in front of it. This
    path composites bodies back-to-front with the exact radial circle_fs
    profile (1-d^2)^2 as alpha — a lax.scan of dense (H, W) blends, which
    is the right trade below a few hundred bodies (solar-system scenes;
    the additive path remains the scalable default for clouds). Trails
    render additively underneath."""
    dtype = trail_history.dtype
    n = trail_history.shape[1]
    if origin_shift is not None:
        trail_history = trail_history - origin_shift[None, None, :]

    # additive trails as the base layer (no bodies: weight their group out)
    base = render_scene(
        trail_history, trail_ages, colors, jnp.zeros((n,), dtype),
        view, proj, width=width, height=height, min_clip_size=0.0,
        trail_subdiv=trail_subdiv, exposure=exposure,
    )

    e = proj[0, 0].astype(dtype)
    newest_age = jnp.argmin(trail_ages)
    bodies = trail_history[newest_age]
    px, py, pixel_radius, valid = project(
        bodies, view.astype(dtype), proj.astype(dtype), width=width,
        height=height, min_clip_size=jnp.asarray(min_clip_size, dtype),
        radii_clip=e * radii_world.astype(dtype),
    )
    # view-space depth for the painter's order (farthest first)
    hom = jnp.concatenate([bodies, jnp.ones((n, 1), dtype)], axis=-1)
    depth = -(hom @ view.astype(dtype).T)[:, 2]
    order = jnp.argsort(jnp.where(valid, -depth, jnp.inf))

    ys = jnp.arange(height, dtype=dtype)[:, None]
    xs = jnp.arange(width, dtype=dtype)[None, :]

    def composite(frame, i):
        cx, cy = px[i], py[i]
        r = jnp.maximum(pixel_radius[i], 1.0)
        d2 = ((xs - cx) ** 2 + (ys - cy) ** 2) / (r * r)
        a = jnp.clip(1.0 - d2, 0.0, 1.0) ** 2 * valid[i].astype(dtype)
        frame = frame * (1.0 - a[..., None]) + a[..., None] * colors[i]
        return frame, None

    frame, _ = jax.lax.scan(composite, base, order)
    return jnp.clip(frame, 0.0, 1.0)


def to_u8(frame) -> np.ndarray:
    """Device float framebuffer -> host uint8 (H, W, 3)."""
    return np.asarray(jnp.round(jnp.clip(frame, 0, 1) * 255).astype(jnp.uint8))
