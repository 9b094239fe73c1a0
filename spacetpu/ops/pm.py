"""Particle-mesh (PM) force solver: CIC deposit -> FFT Poisson -> gather.

The third force-solver family next to the direct O(N^2) kernels and the
clustered treecode — and the most TPU-idiomatic of the three: the entire
force pass is three dense, statically-shaped primitives XLA already maps
well to the hardware (a scatter-add, a 3-D real FFT pair, and a gather),
with cost O(N + M^3 log M) independent of clustering. The reference has no
mesh solver (its families are `direct.rs` and `barnes_hut/`); this module
extends the framework beyond reference parity for the very-large-N smooth
regime where even the tree's near phase dominates.

Method (isolated boundaries — our scenes are isolated systems, not
periodic boxes): Hockney & Eastwood grid doubling. Mass is CIC-deposited
onto the corner ``grid^3`` of a ``(2*grid)^3`` zero-padded mesh; the
potential is the circular convolution of that mesh with the open-space
Green's function sampled at the minimum-image distance,

    K[d] = -G / sqrt((h*|d|_min)^2 + eps_eff^2),

which equals the true open convolution for every node within one cell of
the source region (the min-image distance is exact there), so no aliased
periodic images contribute. The acceleration is the central-difference
gradient of the potential, gathered back at the particle positions with
the SAME CIC weights used for deposit — the matched deposit/gather +
antisymmetric differencing pair makes the inter-particle forces exactly
antisymmetric (momentum-conserving) and the self-force exactly zero, the
classic PM discretization (Hockney & Eastwood 1988, ch. 5-8).

Resolution: forces are exact-Plummer-softened at ``eps_eff = max(eps,
PM_SOFT_CELLS*h)`` — the mesh cannot resolve structure below the cell
size h, so the kernel is softened at the grid scale even when the caller
asks for less. Pair forces at separations >~ 3h track the softened direct
solver to a few percent; below that the PM force is smooth but mesh-
limited (that's inherent to PM — use the tree for collisional cores, or
pair PM with a short-range correction).

The FFT'd kernel depends only on (grid, h, eps, G) and is precomputed
host-side in f64 (`pm_kernel_hat`); ``Simulation.calibrate`` measures the
bounding box once at prime time (margin-padded, like the tree's cap
calibration) and bodies that later leave the box are clamped to its faces
for deposit/gather — counted by `out_of_box` telemetry, never silent, and
`maybe_recalibrate` rebuilds the box when the count grows.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from spacetpu import constants

#: kernel softening floor, in cells: the mesh resolution limit. 1 cell of
#: Plummer softening keeps the central-difference force monotone through
#: r ~ h (an unsoftened sampled 1/r kernel rings at the cell scale).
PM_SOFT_CELLS = 1.0

#: default auto-grid bounds: 32^3 is the floor where CIC accuracy beats
#: its cost; 128^3 keeps the doubled-grid working set (~0.5 GB of f32
#: intermediates at 256^3 complex) comfortably inside one chip's HBM.
PM_GRID_MIN = 32
PM_GRID_MAX = 128

#: Poisson-transform implementation: "fft" = jnp.fft (recursive FFT —
#: fast, but bf16-grade on the TPU backend and its 512-point
#: factorization compile-OOMs at grid=256), "matmul" = dense DFT matmuls
#: on the MXU at Precision.HIGHEST (ops/fftmm.py — ~1e-6 transform
#: roundoff, sane layout at every grid), "auto" = matmul on TPU, fft
#: elsewhere. Resolved at TRACE time: changing it after a Simulation has
#: primed requires a re-prime (the sim's jit_epoch machinery) to take
#: effect.
PM_FFT_METHOD = "auto"


def fft_method(method: str = None) -> str:
    """Resolve the Poisson-transform implementation ("fft"|"matmul")."""
    m = method or PM_FFT_METHOD
    if m == "auto":
        m = "matmul" if jax.default_backend() == "tpu" else "fft"
    if m not in ("fft", "matmul"):
        raise ValueError(f"unknown PM FFT method {m!r}")
    return m


def default_grid(n: int) -> int:
    """Power-of-two mesh size for N bodies: ~1 body/cell for uniform
    scenes (grid ~ N^(1/3)), clamped to [PM_GRID_MIN, PM_GRID_MAX]."""
    g = 1
    while g < round(n ** (1.0 / 3.0)):
        g *= 2
    return max(PM_GRID_MIN, min(PM_GRID_MAX, g))


def measure_box(pos, *, grid: int, margin: float = 2.0):
    """Host-side bounding-box measurement -> (box_min, h).

    The box is the position extent scaled by ``margin`` about its center
    (an evolving scene gets headroom before bodies hit the faces), mapped
    so grid coordinates span [0, grid-1]. Cubic cells (single h): the
    kernel is spherically symmetric only for cubic cells.
    """
    p = np.asarray(pos, np.float64)
    lo, hi = p.min(axis=0), p.max(axis=0)
    center = 0.5 * (lo + hi)
    half = 0.5 * float((hi - lo).max()) * margin
    half = max(half, 1e-30)  # degenerate single-point scene
    h = 2.0 * half / (grid - 1)
    box_min = center - half
    return box_min, h


def pm_kernel_hat(grid: int, h: float, *, eps: float = 0.0, g: float = None,
                  dtype=jnp.float32):
    """rFFT of the open-BC Green's function on the doubled mesh.

    Returns a REAL (2G, 2G, G+1) array (the kernel is even in every axis,
    so its DFT is real up to roundoff; the imaginary residue is dropped).
    Precomputed host-side in f64 — it depends only on static calibration
    scalars, so baking it as a device constant keeps the per-step FFT
    count at two (forward rho, inverse phi).
    """
    if g is None:
        g = constants.G
    g2 = 2 * grid
    idx = np.arange(g2, dtype=np.float64)
    d = np.minimum(idx, g2 - idx)  # minimum-image per-axis node distance
    r2 = (d[:, None, None] ** 2 + d[None, :, None] ** 2
          + d[None, None, :] ** 2)
    eps_eff = max(float(eps), PM_SOFT_CELLS * h)
    kern = -float(g) / np.sqrt((h * h) * r2 + eps_eff * eps_eff)
    k_hat = np.fft.rfftn(kern).real
    real_dtype = jnp.zeros((), dtype).dtype
    return jnp.asarray(k_hat, real_dtype)


def _cic(pos, box_min, inv_h, grid: int):
    """CIC base corner + per-axis fractional weights, with the out-of-box
    clamp. Positions map to grid coordinates u = (x - box_min)/h in
    [0, grid-1]; the 8 CIC corners land in [0, grid], always inside the
    doubled mesh."""
    u = (jnp.asarray(pos) - box_min) * inv_h
    u = jnp.clip(u, 0.0, grid - 1.0)
    i0 = jnp.floor(u).astype(jnp.int32)
    i0 = jnp.minimum(i0, grid - 1)
    f = u - i0
    return i0, f


def count_out_of_box(pos, box_min, h, grid: int) -> jnp.ndarray:
    """Bodies outside the calibrated box (their deposit is face-clamped —
    accuracy degrades for them, counted not silent)."""
    u = (jnp.asarray(pos) - jnp.asarray(box_min, pos.dtype)) / h
    bad = jnp.any((u < 0.0) | (u > grid - 1.0), axis=-1)
    return jnp.sum(bad.astype(jnp.int32))


def _corner_weights(f):
    """(N,) weight and int offset triple per CIC corner."""
    out = []
    for dx in (0, 1):
        wx = f[:, 0] if dx else 1.0 - f[:, 0]
        for dy in (0, 1):
            wy = f[:, 1] if dy else 1.0 - f[:, 1]
            for dz in (0, 1):
                wz = f[:, 2] if dz else 1.0 - f[:, 2]
                out.append(((dx, dy, dz), wx * wy * wz))
    return out


def deposit_cic(pos, mass, *, box_min, inv_h, grid: int):
    """Scatter-add masses onto the zero-padded doubled mesh -> (2G,2G,2G).

    The mesh holds raw mass (not density): the Green's-function kernel is
    per unit mass, so the density normalization h^-3 and the Poisson 4*pi*G
    both live inside the kernel's closed form.
    """
    g2 = 2 * grid
    i0, f = _cic(pos, box_min, inv_h, grid)
    mesh = jnp.zeros((g2 * g2 * g2,), mass.dtype)
    for (dx, dy, dz), w in _corner_weights(f):
        lin = ((i0[:, 0] + dx) * g2 + (i0[:, 1] + dy)) * g2 + (i0[:, 2] + dz)
        mesh = mesh.at[lin].add(mass * w)
    return mesh.reshape(g2, g2, g2)


def deposit_cic_compact(pos, mass, *, box_min, inv_h, grid: int):
    """Scatter-add masses onto the COMPACT occupied corner of the doubled
    mesh -> (G+1, G+1, G+1).

    CIC corners land in [0, grid] per axis (``_cic``'s clamp), so the
    rest of the (2G)^3 Hockney-Eastwood mesh is structural zero — never
    materializing it makes the scatter target 8x smaller (locality), the
    body-sharded psum payload 8x smaller (ICI), and lets the matmul-DFT
    forward transform contract over occupied slots only (flops). The full
    :func:`deposit_cic` remains as the oracle form (equivalence tested).
    """
    gc = grid + 1
    i0, f = _cic(pos, box_min, inv_h, grid)
    mesh = jnp.zeros((gc * gc * gc,), mass.dtype)
    for (dx, dy, dz), w in _corner_weights(f):
        lin = ((i0[:, 0] + dx) * gc + (i0[:, 1] + dy)) * gc + (i0[:, 2] + dz)
        mesh = mesh.at[lin].add(mass * w)
    return mesh.reshape(gc, gc, gc)


def ext_rows(grid: int) -> np.ndarray:
    """Doubled-mesh node indices of the extended potential window
    [-1 .. G+1] (min-image wrapped: -1 == 2G-1): every sample the
    central-difference gradient at the gatherable cells [0 .. G] reads.
    Extended index e maps to mesh node e-1."""
    return np.concatenate(([2 * grid - 1], np.arange(grid + 2)))


def potential_ext(mesh_c, kernel_hat, grid: int, *, method: str = None):
    """Poisson solve of a COMPACT (G+1)^3 mass mesh, returning phi on the
    extended window ext_rows x ext_rows x ext_rows -> (G+3, G+3, G+3).

    matmul method: compact transforms end to end (ops/fftmm.py — the
    padding never costs a MAC). fft method: zero-pad to the doubled mesh
    for jnp.fft, then slice the window out (CPU path; jnp.fft is fine
    there)."""
    rows = ext_rows(grid)
    if fft_method(method) == "matmul":
        from spacetpu.ops import fftmm
        return fftmm.potential_ext_matmul(mesh_c, kernel_hat, grid, rows)
    g2 = 2 * grid
    gc = grid + 1
    full = jnp.zeros((g2, g2, g2), mesh_c.dtype)
    full = full.at[:gc, :gc, :gc].set(mesh_c)
    phi = jnp.fft.irfftn(jnp.fft.rfftn(full) * kernel_hat, s=(g2, g2, g2))
    return phi[rows][:, rows][:, :, rows]


def acc_from_mesh_compact(pos, mesh_c, *, kernel_hat, box_min, inv_h,
                          grid: int):
    """Solve + gather from a COMPACT (G+1)^3 mass mesh (the production
    path; :func:`acc_from_mesh` is the full-mesh oracle). The gradient is
    built only at the gatherable cells [0 .. G]^3 from the extended
    potential window — slices instead of full-mesh rolls."""
    phi_e = potential_ext(mesh_c, kernel_hat, grid)  # origin at node -1
    half_inv = 0.5 * inv_h
    gc = grid + 1
    lo, mid, hi = slice(0, gc), slice(1, gc + 1), slice(2, gc + 2)
    # a = -grad phi; central difference: a[i] = (phi[i-1] - phi[i+1])/(2h)
    grads = jnp.stack(
        [(phi_e[lo, mid, mid] - phi_e[hi, mid, mid]) * half_inv,
         (phi_e[mid, lo, mid] - phi_e[mid, hi, mid]) * half_inv,
         (phi_e[mid, mid, lo] - phi_e[mid, mid, hi]) * half_inv],
        axis=-1,
    ).reshape(-1, 3)  # ((G+1)^3, 3)
    i0, f = _cic(pos, box_min, inv_h, grid)
    acc = jnp.zeros_like(pos)
    for (dx, dy, dz), w in _corner_weights(f):
        lin = ((i0[:, 0] + dx) * gc + (i0[:, 1] + dy)) * gc + (i0[:, 2] + dz)
        acc = acc + w[:, None] * grads[lin]
    return acc


def potential_mesh(mass_mesh, kernel_hat, grid: int, *, method: str = None):
    """phi = F^-1(F(mass) * K_hat) on the doubled mesh (circular
    convolution == open convolution under the min-image kernel).

    ``method`` overrides :data:`PM_FFT_METHOD` (see there for the
    fft-vs-matmul trade; on TPU the matmul path is both the precision
    and the grid>=256 capacity fix)."""
    if fft_method(method) == "matmul":
        from spacetpu.ops import fftmm
        return fftmm.potential_mesh_matmul(mass_mesh, kernel_hat, grid)
    g2 = 2 * grid
    rho_hat = jnp.fft.rfftn(mass_mesh)
    return jnp.fft.irfftn(rho_hat * kernel_hat, s=(g2, g2, g2))


def acc_from_mesh(pos, mass_mesh, *, kernel_hat, box_min, inv_h, grid: int):
    """Solve + gather stage: FFT Poisson on an already-deposited mass
    mesh, central-difference gradient, CIC gather at ``pos``. Shared by
    the single-chip path and the body-sharded path (where the mesh is the
    psum of per-device local deposits).

    The jnp.roll in the gradient wraps the doubled mesh; under the
    min-image kernel the wrapped neighbor IS the correct open-space
    potential sample (|d|_min stays the true distance one node beyond the
    source region), so the boundary needs no special casing.
    """
    phi = potential_mesh(mass_mesh, kernel_hat, grid)
    # a = -grad phi; central difference: a[i] = (phi[i-1] - phi[i+1])/(2h)
    half_inv = 0.5 * inv_h
    grads = jnp.stack(
        [(jnp.roll(phi, 1, ax) - jnp.roll(phi, -1, ax)) * half_inv
         for ax in range(3)],
        axis=-1,
    ).reshape(-1, 3)  # ((2G)^3, 3)
    g2 = 2 * grid
    i0, f = _cic(pos, box_min, inv_h, grid)
    acc = jnp.zeros_like(pos)
    for (dx, dy, dz), w in _corner_weights(f):
        lin = ((i0[:, 0] + dx) * g2 + (i0[:, 1] + dy)) * g2 + (i0[:, 2] + dz)
        acc = acc + w[:, None] * grads[lin]
    return acc


def acc_pm(pos, mass, *, kernel_hat, box_min, h, grid: int):
    """PM acceleration (N, 3): deposit -> FFT solve -> central-difference
    gradient -> CIC gather. Matches the integrators' AccFn contract
    (close over the calibration products with functools.partial)."""
    pos = jnp.asarray(pos)
    dt_r = pos.dtype
    box_min = jnp.asarray(box_min, dt_r)
    inv_h = 1.0 / jnp.asarray(h, dt_r)
    mesh = deposit_cic_compact(pos, jnp.asarray(mass, dt_r),
                               box_min=box_min, inv_h=inv_h, grid=grid)
    return acc_from_mesh_compact(pos, mesh, kernel_hat=kernel_hat,
                                 box_min=box_min, inv_h=inv_h, grid=grid)


def pm_self_kernel(h: float, *, eps: float = 0.0, g: float = None) -> float:
    """K[0] = -G/eps_eff, the kernel's per-unit-mass self-potential (the
    closed form of the softened Green's function at zero separation)."""
    if g is None:
        g = constants.G
    return -float(g) / max(float(eps), PM_SOFT_CELLS * float(h))


def potential_energy_pm(pos, mass, *, kernel_hat, box_min, h, grid: int,
                        k0: float):
    """Mesh potential energy 0.5 * sum_i m_i * phi(x_i), with the
    self-energy of the softened kernel subtracted (each deposited particle
    sees its own cloud at the ``k0 = pm_self_kernel(...)`` level; removing
    0.5*k0*sum m^2 makes the estimate comparable to the exact pairwise
    energy for drift diagnostics). Mesh-accuracy, not exact — use
    ops.energy for conservation proofs."""
    pos = jnp.asarray(pos)
    dt_r = pos.dtype
    mass = jnp.asarray(mass, dt_r)
    box_min = jnp.asarray(box_min, dt_r)
    inv_h = 1.0 / jnp.asarray(h, dt_r)
    mesh = deposit_cic_compact(pos, mass, box_min=box_min, inv_h=inv_h,
                               grid=grid)
    gc = grid + 1
    # phi at the gatherable cells [0..G]^3: extended-window indices 1..G+1
    phi = potential_ext(mesh, kernel_hat, grid)[1:gc + 1, 1:gc + 1,
                                                1:gc + 1].reshape(-1)
    i0, f = _cic(pos, box_min, inv_h, grid)
    phi_i = jnp.zeros_like(mass)
    for (dx, dy, dz), w in _corner_weights(f):
        lin = ((i0[:, 0] + dx) * gc + (i0[:, 1] + dy)) * gc + (i0[:, 2] + dz)
        phi_i = phi_i + w * phi[lin]
    return 0.5 * (jnp.sum(mass * phi_i) - k0 * jnp.sum(mass * mass))
