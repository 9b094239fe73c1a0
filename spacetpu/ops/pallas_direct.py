"""Tiled Pallas all-pairs gravity kernel for TPU.

This is the TPU-native replacement for the reference's hot loop — the rayon
par_iter over target bodies with a serial j-loop
(`/root/reference/space/src/sim/direct.rs:26-39` +
`sim/mod.rs:22-37` `get_acc_towards`). The work split is the same (i-bodies
are the parallel axis), but instead of ~20 CPU threads the grid tiles the
i-axis across Pallas program instances while j-body tiles stream through
VMEM, with the softened inverse-cube law fused into a single VPU pipeline:

    grid = (N/TI, N/TJ)           # j innermost: i-tile stays VMEM-resident
    dx,dy,dz = xj[1,TJ] - xi[TI,1]  # broadcast to (TI, TJ)
    w = g*mj / (r^2 + eps^2)^{3/2}  (plummer)  |  g*mj / (r^3 + eps) (ref)
    acc[TI] += sum_j w * d{x,y,z}

Data layout: bodies are packed as an (N, 8) "column" array (x, y, z, g*m,
4 pad lanes) for i-tiles and an (8, N) "row" array for j-tiles, so both
broadcast operands arrive in their natural orientation without in-kernel
transposes, and both arrays tile cleanly against the f32 (8, 128) minimum
tile. The (N, 3) -> packed conversion is O(N) XLA work, negligible against
the O(N^2) kernel.

Self-pairs and zero-mass padding rows contribute exactly zero (numerator is
zero while the softened denominator is positive), so no masking is needed —
the same property the reference exploits with its additive epsilon.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spacetpu import constants

# Default tile sizes (tuned on TPU v5e; see bench_kernels.py —
# 512x2048 measured 1.83e11 pairs/s at N=256k vs 1.80e11 for 256x2048).
TILE_I = 512
TILE_J = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(cols_ref, rows_ref, out_ref, *, softening: str, eps: float):
    """One (i-tile, j-tile) interaction block."""
    xi = cols_ref[:, 0:1]  # (TI, 1)
    yi = cols_ref[:, 1:2]
    zi = cols_ref[:, 2:3]
    xj = rows_ref[0:1, :]  # (1, TJ)
    yj = rows_ref[1:2, :]
    zj = rows_ref[2:3, :]
    gmj = rows_ref[3:4, :]

    dx = xj - xi  # (TI, TJ)
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz

    if softening == "plummer":
        d2 = r2 + eps * eps
        inv = jax.lax.rsqrt(d2)
        w = gmj * (inv * inv * inv)
        if eps == 0.0:
            # rsqrt(0) = inf -> 0*inf = NaN on the diagonal; mask it out.
            w = jnp.where(d2 > 0.0, w, 0.0)
    elif softening == "ref":
        # Reference law (sim/mod.rs:25): denom = r^3 + eps.
        denom = r2 * jnp.sqrt(r2) + eps
        w = gmj / denom
        if eps == 0.0:
            # denom is 0 on the diagonal when unsoftened -> inf*0 = NaN.
            w = jnp.where(denom > 0.0, w, 0.0)
    else:
        raise ValueError(f"unknown softening {softening!r}")

    ax = jnp.sum(w * dx, axis=1, keepdims=True)  # (TI, 1)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    zero = jnp.zeros_like(ax)
    tile = jnp.concatenate([ax, ay, az, zero, zero, zero, zero, zero], axis=1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += tile


def _kernel_quad(cols_ref, rows_ref, out_ref, *, eps: float,
                 init_pid: int = 1):
    """Monopole + quadrupole source evaluation (plummer softening).

    Sources are cluster summaries packed as (16, TJ) rows:
      0-2: COM x,y,z   3: g*M   4-9: g*Q (traceless quadrupole
      Qxx,Qyy,Qzz,Qxy,Qxz,Qyz about the COM).
    With rel = COM - target, d2 = |rel|^2 + eps^2:
      a += gM * rel * d2^-3/2
         - (gQ rel) * d2^-5/2 + 2.5 * (rel.gQ.rel) * rel * d2^-7/2

    init_pid names the grid dimension that sweeps source tiles into the
    SAME output block (the accumulation dim): the block is zeroed at its
    first visit, i.e. when program_id(init_pid)==0. It must be the grid's
    innermost accumulation axis — passing the wrong dim leaves output
    blocks uninitialized (reading stale VMEM) or re-zeroes mid-sweep.
    """
    xi = cols_ref[:, 0:1]
    yi = cols_ref[:, 1:2]
    zi = cols_ref[:, 2:3]
    xj = rows_ref[0:1, :]
    yj = rows_ref[1:2, :]
    zj = rows_ref[2:3, :]
    gm = rows_ref[3:4, :]
    qxx = rows_ref[4:5, :]
    qyy = rows_ref[5:6, :]
    qzz = rows_ref[6:7, :]
    qxy = rows_ref[7:8, :]
    qxz = rows_ref[8:9, :]
    qyz = rows_ref[9:10, :]

    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    d2 = dx * dx + dy * dy + dz * dz + eps * eps
    # Mask coincidences (a body sitting on a cluster COM — regular grids
    # do this) to zero contribution. The floor is dtype-aware: below
    # d2 ~ 1e-18, inv^4 overflows f32, so such pairs are treated as
    # coincident (the same mask applies in the near subtraction, keeping
    # the far/near cancellation consistent).
    inv = jnp.where(d2 > 1e-18, jax.lax.rsqrt(jnp.maximum(d2, 1e-30)), 0.0)
    inv2 = inv * inv
    inv3 = inv2 * inv
    inv4 = inv2 * inv2

    # Unit-vector formulation: a_quad = inv^4 * (2.5 (n.Q.n) n - Q n).
    # The naive rel-vector form needs inv^7, which overflows f32 for
    # close-but-not-coincident pairs (d ~ 1e-7) — and the resulting infs
    # break the exact far/near cancellation (inf - inf = NaN). Here every
    # intermediate stays finite down to true coincidence, which is masked.
    nx = dx * inv
    ny = dy * inv
    nz = dz * inv
    qn_x = qxx * nx + qxy * ny + qxz * nz
    qn_y = qxy * nx + qyy * ny + qyz * nz
    qn_z = qxz * nx + qyz * ny + qzz * nz
    s = nx * qn_x + ny * qn_y + nz * qn_z

    wm = gm * inv3
    t = 2.5 * s * inv4
    ax = jnp.sum(wm * dx + t * nx - qn_x * inv4, axis=1, keepdims=True)
    ay = jnp.sum(wm * dy + t * ny - qn_y * inv4, axis=1, keepdims=True)
    az = jnp.sum(wm * dz + t * nz - qn_z * inv4, axis=1, keepdims=True)
    zero = jnp.zeros_like(ax)
    tile = jnp.concatenate([ax, ay, az, zero, zero, zero, zero, zero], axis=1)

    @pl.when(pl.program_id(init_pid) == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += tile


@functools.partial(
    jax.jit, static_argnames=("eps", "tile_i", "tile_j", "interpret")
)
def _acc_quad_packed(cols, rows, *, eps, tile_i, tile_j, interpret):
    n_i = cols.shape[0]
    n_j = rows.shape[1]
    grid = (n_i // tile_i, n_j // tile_j)
    out = pl.pallas_call(
        functools.partial(_kernel_quad, eps=float(eps)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_i, 8), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_i, 8), cols.dtype),
        interpret=interpret,
    )(cols, rows)
    return out[:, :3]


def acc_cross_quad(pos_i, summaries, *, eps, tile_i: int = 256,
                   tile_j: int = 1024, interpret: bool | None = None):
    """Targets vs multipole summaries. summaries: (16, S) rows as described
    in `_kernel_quad` (g pre-folded into gm and gQ). -> (M, 3).

    Default tiles are smaller than the monopole kernel's: the quadrupole
    pipeline keeps ~3x more live (TI, TJ) temporaries in VMEM."""
    if interpret is None:
        interpret = _default_interpret()
    n_i = pos_i.shape[0]
    n_j = summaries.shape[1]
    dtype = pos_i.dtype
    n_i_pad = _round_up(max(n_i, tile_i), tile_i)
    n_j_pad = _round_up(max(n_j, tile_j), tile_j)
    cols = jnp.zeros((n_i_pad, 8), dtype)
    cols = cols.at[:n_i, :3].set(pos_i)
    rows = jnp.zeros((16, n_j_pad), dtype)
    rows = rows.at[:, :n_j].set(summaries)
    acc = _acc_quad_packed(
        cols, rows, eps=float(eps), tile_i=tile_i, tile_j=tile_j,
        interpret=interpret,
    )
    return acc[:n_i]


def acc_cross_quad_xla(pos_i, summaries, *, eps, chunk: int = 8192):
    """XLA reference path for the multipole evaluation (CPU/tests).

    Scanned over target chunks so the working set is O(chunk * S), never
    O(M * S) — the dense form at the 16M-body mesh demo would need 24 GB."""
    m = pos_i.shape[0]
    if m > chunk:
        pad = (-m) % chunk
        pos_p = jnp.concatenate(
            [pos_i, jnp.zeros((pad, 3), pos_i.dtype)], axis=0
        ) if pad else pos_i

        def body(_, tgt):
            return None, acc_cross_quad_xla(tgt, summaries, eps=eps,
                                            chunk=chunk)

        _, out = jax.lax.scan(
            body, None, pos_p.reshape(-1, chunk, 3)
        )
        return out.reshape(-1, 3)[:m]
    dtype = pos_i.dtype
    com = summaries[:3].T  # (S, 3)
    gm = summaries[3]
    q = summaries[4:10]  # (6, S): xx yy zz xy xz yz
    rel = com[None, :, :] - pos_i[:, None, :]  # (M, S, 3)
    d2 = jnp.sum(rel * rel, axis=-1) + jnp.asarray(eps, dtype) ** 2
    # see _kernel_quad: dtype-aware coincidence floor + unit-vector form
    # (inv^4, not inv^7) so f32 intermediates never overflow
    inv = jnp.where(d2 > 1e-18, jax.lax.rsqrt(jnp.maximum(d2, 1e-30)), 0.0)
    inv3 = inv * inv * inv
    inv4 = inv3 * inv
    dx, dy, dz = rel[..., 0], rel[..., 1], rel[..., 2]
    nx, ny, nz = dx * inv, dy * inv, dz * inv
    qn_x = q[0] * nx + q[3] * ny + q[4] * nz
    qn_y = q[3] * nx + q[1] * ny + q[5] * nz
    qn_z = q[4] * nx + q[5] * ny + q[2] * nz
    s = nx * qn_x + ny * qn_y + nz * qn_z
    t = 2.5 * s * inv4
    wm = gm * inv3
    ax = jnp.sum(wm * dx + t * nx - qn_x * inv4, axis=1)
    ay = jnp.sum(wm * dy + t * ny - qn_y * inv4, axis=1)
    az = jnp.sum(wm * dz + t * nz - qn_z * inv4, axis=1)
    return jnp.stack([ax, ay, az], axis=-1)


def _kernel_mxu(cols_ref, rows_ref, aux_ref, jcols_ref, out_ref, *, eps: float):
    """MXU-assisted interaction block (plummer softening only).

    Routes the O(TI*TJ) inner products through the 128x128 systolic array:
      P   = Xi . Xj^T                 (MXU, K=8 packed coords)
      d2  = |xi|^2 + |xj|^2 - 2P + eps^2   (VPU, ~3 ops/pair)
      w   = g*mj * rsqrt(d2)^3             (VPU, ~4 ops/pair)
      acc8 = W @ [xj | 1]                  (MXU, K=TJ)
    accumulating [sum w*xj, sum w] in the output; the caller applies the
    rank-1 correction acc = acc8[:, :3] - acc8[:, 3:4] * xi outside the
    kernel (one O(N) XLA op).

    Numerics: the expanded form loses ~eps_f32 * |x|^2 / d2 relative
    precision on close pairs (catastrophic cancellation), so this kernel is
    for well-softened systems; the "vpu" kernel keeps the exact differences.
    """
    # Precision.HIGHEST: without it the MXU truncates f32 operands to bf16
    # (one-pass), which wrecks close-pair distances; the multi-pass f32
    # emulation costs little here because the matmuls are a small fraction
    # of the kernel's work.
    p = jnp.dot(
        cols_ref[:, :], rows_ref[:, :],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sqi = cols_ref[:, 3:4]  # (TI, 1) |xi|^2
    sqj = aux_ref[0:1, :]  # (1, TJ)  |xj|^2
    gmj = aux_ref[1:2, :]  # (1, TJ)  g * m_j
    d2 = (sqi + eps * eps) + (sqj - 2.0 * p)
    # Cancellation can drive d2 below the softening floor for coincident
    # pairs; clamp it back (the wrapper enforces eps > 0).
    d2 = jnp.maximum(d2, eps * eps)
    inv = jax.lax.rsqrt(d2)
    w = gmj * (inv * inv * inv)
    acc8 = jnp.dot(
        w, jcols_ref[:, :],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += acc8


@functools.partial(
    jax.jit,
    static_argnames=("eps", "tile_i", "tile_j", "interpret"),
)
def _acc_packed_mxu(cols, rows, aux, jcols, *, eps, tile_i, tile_j, interpret):
    n_i = cols.shape[0]
    n_j = rows.shape[1]
    grid = (n_i // tile_i, n_j // tile_j)
    out = pl.pallas_call(
        functools.partial(_kernel_mxu, eps=float(eps)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_i, 8), cols.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(7 + 2 * 2 * 8) * n_i * n_j,
            bytes_accessed=(n_i * 16 + n_j * 24) * 4,
            transcendentals=n_i * n_j,
        ),
        interpret=interpret,
    )(cols, rows, aux, jcols)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("softening", "eps", "tile_i", "tile_j", "interpret"),
)
def _acc_packed(cols, rows, *, softening, eps, tile_i, tile_j, interpret):
    n_i = cols.shape[0]
    n_j = rows.shape[1]
    grid = (n_i // tile_i, n_j // tile_j)
    kernel = functools.partial(_kernel, softening=softening, eps=float(eps))
    flops_per_pair = 22 if softening == "plummer" else 23
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_i, 8), cols.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * n_i * n_j,
            bytes_accessed=(n_i * 8 + n_j * 8 + n_i * 8) * 4,
            transcendentals=n_i * n_j,
        ),
        interpret=interpret,
    )(cols, rows)
    return out[:, :3]


def _pack(pos_i, pos_j, mass_j, g, tile_i, tile_j, *, mxu=False):
    """Build the packed kernel operands.

    vpu method: (Ni_pad, 8) i-columns [x y z 0...] and (8, Nj_pad) j-rows
    [x; y; z; g*m; 0...].
    mxu method: additionally |x|^2 in i-column 3, j-rows carry only coords
    (so Xi@Xj^T is a pure dot product), plus an aux (8, Nj_pad) array
    [|xj|^2; g*m] and a (Nj_pad, 8) [x y z 1] accumulation operand.
    """
    dtype = pos_i.dtype
    n_i = pos_i.shape[0]
    n_j = pos_j.shape[0]
    n_i_pad = _round_up(max(n_i, tile_i), tile_i)
    n_j_pad = _round_up(max(n_j, tile_j), tile_j)

    cols = jnp.zeros((n_i_pad, 8), dtype)
    cols = cols.at[:n_i, :3].set(pos_i)

    rows = jnp.zeros((8, n_j_pad), dtype)
    rows = rows.at[:3, :n_j].set(pos_j.T)
    gm = jnp.asarray(g, dtype) * mass_j
    if not mxu:
        rows = rows.at[3, :n_j].set(gm)
        return cols, rows

    cols = cols.at[:n_i, 3].set(jnp.sum(pos_i * pos_i, axis=-1))
    aux = jnp.zeros((8, n_j_pad), dtype)
    aux = aux.at[0, :n_j].set(jnp.sum(pos_j * pos_j, axis=-1))
    aux = aux.at[1, :n_j].set(gm)
    jcols = jnp.zeros((n_j_pad, 8), dtype)
    jcols = jcols.at[:n_j, :3].set(pos_j)
    jcols = jcols.at[:, 3].set(1.0)
    return cols, rows, aux, jcols


def _default_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def acc_cross_pallas(
    pos_i,
    pos_j,
    mass_j,
    *,
    softening: str = "plummer",
    eps: float | None = None,
    g: float | None = None,
    tile_i: int = TILE_I,
    tile_j: int = TILE_J,
    interpret: bool | None = None,
    method: str = "vpu",
):
    """Acceleration of `pos_i` targets due to `pos_j`/`mass_j` sources.

    The cross form used by the multi-chip ring pass; `acc_direct_pallas`
    is the aliased single-array case. Shapes: (M,3),(K,3),(K,) -> (M,3).

    method="vpu": exact pairwise differences, fully VPU-bound (default).
    method="mxu": expanded-form distances + matmul accumulation on the
    systolic array — faster, slightly less accurate on close pairs, and
    plummer-only.
    """
    if eps is None:
        eps = constants.COLLISION_EPSILON if softening == "ref" else 0.0
    if g is None:
        g = constants.G
    if interpret is None:
        interpret = _default_interpret()
    n_i = pos_i.shape[0]
    if method == "mxu":
        if softening != "plummer":
            raise ValueError("method='mxu' supports softening='plummer' only")
        if float(eps) <= 0.0:
            # The expanded-form d2 on the diagonal is cancellation noise
            # (|x|^2 ulps), not exactly 0, so the in-kernel guard cannot
            # detect self-pairs; a real softening floor is required.
            raise ValueError("method='mxu' requires eps > 0")
        cols, rows, aux, jcols = _pack(
            pos_i, pos_j, mass_j, g, tile_i, tile_j, mxu=True
        )
        out = _acc_packed_mxu(
            cols, rows, aux, jcols,
            eps=float(eps), tile_i=tile_i, tile_j=tile_j, interpret=interpret,
        )
        # Rank-1 correction: acc_i = [sum_j w x_j] - [sum_j w] * x_i.
        return out[:n_i, :3] - out[:n_i, 3:4] * pos_i
    cols, rows = _pack(pos_i, pos_j, mass_j, g, tile_i, tile_j)
    acc = _acc_packed(
        cols,
        rows,
        softening=softening,
        eps=float(eps),
        tile_i=tile_i,
        tile_j=tile_j,
        interpret=interpret,
    )
    return acc[:n_i]


def acc_direct_pallas(pos, mass, **kw):
    """All-pairs acceleration (N,3),(N,) -> (N,3) via the tiled kernel."""
    return acc_cross_pallas(pos, pos, mass, **kw)
