"""TreePM hybrid force solver: PM long-range + exact short-range pairs.

The fourth force-solver family, combining the strengths of the other
three: the smooth long-range field comes from the particle-mesh solve
(ops/pm.py — three dense XLA primitives, O(M^3 log M)), and the
mesh-unresolvable short-range part comes from exact pair interactions
within a cutoff radius, evaluated over Hilbert-clustered pair tiles with
the same static-shape machinery as the treecode's near phase
(ops/tree.py). This is the production design of the large-scale
cosmology codes (Bagla 2002; Springel 2005, Gadget-2 §5) — the reference
has no counterpart (its families are `/root/reference/space/src/sim/
direct.rs` and `barnes_hut/`); TreePM extends the framework past
reference parity for very large N at near-exact accuracy.

Two split families, selected by `split`:

- "poly" (production default, round 4): w_long(r) = G(y)/r^3 with the
  quintic blend G(y) = y^3 (10 - 15 y + 6 y^2), y = (r/r_cut)^2 — a
  C^2 polynomial ramp 0 -> 1 over the cutoff sphere. The long-range
  potential is CLOSED FORM (phi_long(r<rc) = -(32/21)/rc + 2 r^5/rc^6
  - (15/7) r^7/rc^8 + (2/3) r^9/rc^10, Newtonian beyond), the short
  weight is EXACTLY zero at r >= r_cut (no erfc truncation tail, the
  pair forces stay antisymmetric), and the pair kernel costs ~8 extra
  VPU ops at depth ~4 — the erf split's transcendental chain made the
  short pass 6.8x the tree's near kernel per tile, and the round-4
  Chebyshev replacement REGRESSED it 1.23x further because its
  15-deep serial Clenshaw recurrence stalls the VPU (chip profiles
  logs/r4w3_r4_treepm_prof.log, logs/r4w8_r4_treepm_prof.log).
  Measured accuracy on a uniform cloud (N=4096, f64, grid 32/64): med
  relative force error 1.1e-2 / 5.1e-3 vs the erf split's 1.8e-2 /
  6.3e-3 at the same r_cut — equal or better, for a fraction of the
  pair cost.

- "gauss": the classic Gaussian/Ewald erf split below (the oracle for
  tests, and the form every published TreePM uses).

Force split (Gaussian/Ewald form). The Plummer-softened pair weight
(a_i = sum_j w(r) * rel_ij * m_j * G) splits exactly as

    w_plummer(r) = w_short(r) + w_long(r),
    w_long(r)    = [erf(u) - (2/sqrt(pi)) u e^(-u^2)] / r^3,  u = r/(2 rs),
    w_short(r)   = w_plummer(r) - w_long(r),

where w_long is the force weight of the smoothed potential
phi_long(r) = -G erf(r/(2 rs))/r. phi_long is C^inf with NO 1/r
singularity (phi_long(0) = -G/(sqrt(pi) rs)), so a mesh with cell size
h <= rs/RS_CELLS represents it accurately — the PM pass computes it for
ALL pairs by sampling phi_long at the min-image node distances
(pm_kernel_hat_long), reusing the deposit/FFT/gather pipeline unchanged.
w_short decays like erfc: at the cutoff r_cut = RCUT_RS * rs the
truncated tail is erfc(RCUT_RS/2) ~ 1.5e-3 of the Newtonian force at
that radius and falls exponentially beyond, so evaluating w_short only
for pairs within r_cut (cluster pair tiles) loses nothing measurable.
No double counting by construction: PM carries the erf part of every
pair including the near ones; the pair pass adds only the complement.

Short-range pair structure: bodies are Hilbert-sorted into equal-count
clusters (ops/morton.py + ops/cluster.py); cluster near lists accept
source clusters with com-distance <= r_cut + r_tgt_i + r_tgt_j — a
symmetric criterion that provably contains every body pair within r_cut
(body-pair distance >= com distance - r_tgt_i - r_tgt_j). The lists
flatten into the treecode's pair tiles (tree.near_pair_segments) and
evaluate through a Pallas VPU kernel (TPU) or a lax.map fallback (CPU
tests), with the same counted-overflow telemetry: targets whose lists
exceed the calibrated caps degrade to PM-only accuracy for the dropped
clusters — counted, never silent.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

from spacetpu import constants
from spacetpu.ops import cluster as cluster_ops
from spacetpu.ops import direct, morton
from spacetpu.ops import pm as pm_ops
from spacetpu.ops import tree as tree_ops

#: Gaussian split scale in mesh cells: rs = RS_CELLS * h. Gadget-2's
#: ASMTH default is 1.25; measured against the exact force on a uniform
#: cloud (N=4096, grid 32/64), 1.75 cells halves the p99 error (3.4e-2
#: -> 1.5e-2 at grid=64) for ~2.7x the — still small — short-range pair
#: volume, so 1.75 is the default here (pm_rs_cells overrides).
RS_CELLS = 1.75

#: short-range cutoff in split scales: r_cut = RCUT_RS * rs. erfc(2.25)
#: ~ 1.5e-3 relative force truncation at the cutoff, exponentially less
#: beyond (Gadget-2 RCUT default is 4.5).
RCUT_RS = 4.5

_TWO_OVER_SQRTPI = 2.0 / math.sqrt(math.pi)

#: force-split family: "poly" (quintic blend, closed-form mesh kernel,
#: cheap pair kernel) or "gauss" (erf split). See the module docstring.
SPLIT = "poly"


#: auto-grid bounds for TreePM. Unlike plain PM (whose accuracy is
#: mesh-limited, so grids past ~128 buy little), TreePM's accuracy is set
#: by the split and the grid is a pure work dial: a finer mesh shrinks
#: r_cut = RCUT_RS*RS_CELLS*h and with it the short-range pair volume,
#: trading cheap FFT flops for expensive pair tiles. Measured at
#: fixed_cloud(1M/4M) grid=128: the cutoff spans ~8 cells while a
#: 255-body cluster spans ~8, so k_near ballooned to 873/2645 and the
#: pair phase dominated; 256^3 (512^3 doubled, ~2 GB of FFT live) cuts
#: the cutoff neighborhood ~8x.
TREEPM_GRID_MIN = 32
TREEPM_GRID_MAX = 256

#: above this N the auto grid unclamps to 512: chip-measured
#: (logs/r5w3_r5_treepm_finegrid.log) 8M steps 1.67x faster at grid=512
#: (7.1 vs 11.9 s) and 16M 1.79x (20.9 vs 37.5 s) — the finer mesh
#: shrinks the cutoff near volume where the near pass dominates. Below
#: 8M the 512 mesh is unmeasured and the 256 clamp stands (its own
#: measured basis is the r4w5 sweep). The once-prohibitive grid=512
#: calibration cost (host rfftn of the mirrored 1024^3 mesh + a 2.15 GB
#: kernel ride) is gone: large-grid poly kernels build on device
#: (KERNEL_DEVICE_MIN_GRID).
TREEPM_GRID_LARGE_N = 8_000_000
TREEPM_GRID_MAX_LARGE = 512


def default_grid(n: int) -> int:
    """Power-of-two TreePM mesh: ~2 cells per body-spacing
    (grid ~ 2 N^(1/3)), clamped to [TREEPM_GRID_MIN, TREEPM_GRID_MAX]
    (TREEPM_GRID_MAX_LARGE above TREEPM_GRID_LARGE_N bodies — the
    chip-measured capacity regime)."""
    g = 1
    target = 2.0 * n ** (1.0 / 3.0)
    while g < target:
        g *= 2
    cap = (TREEPM_GRID_MAX_LARGE if n >= TREEPM_GRID_LARGE_N
           else TREEPM_GRID_MAX)
    return max(TREEPM_GRID_MIN, min(cap, g))


def split_params(h: float, *, rs_cells: float = RS_CELLS,
                 rcut_rs: float = RCUT_RS) -> tuple[float, float]:
    """(rs, r_cut) for a mesh cell size h."""
    rs = float(rs_cells) * float(h)
    return rs, float(rcut_rs) * rs


def pm_kernel_hat_long(grid: int, h: float, rs: float, *, g: float = None,
                       dtype=jnp.float32):
    """rFFT of the LONG-RANGE Green's function on the doubled mesh:
    K[d] = -G erf(r/(2 rs))/r sampled at the min-image node distance,
    K[0] = -G/(sqrt(pi) rs) (the r->0 limit). Host-side f64, like
    pm.pm_kernel_hat — same shape contract ((2G, 2G, G+1) real)."""
    if g is None:
        g = constants.G
    from scipy.special import erf as _erf  # host-side only

    g2 = 2 * grid
    idx = np.arange(g2, dtype=np.float64)
    d = np.minimum(idx, g2 - idx)
    r = float(h) * np.sqrt(
        d[:, None, None] ** 2 + d[None, :, None] ** 2
        + d[None, None, :] ** 2
    )
    rs = float(rs)
    with np.errstate(invalid="ignore", divide="ignore"):
        kern = np.where(r > 0.0, _erf(r / (2.0 * rs)) / np.maximum(r, 1e-300),
                        1.0 / (math.sqrt(math.pi) * rs))
    kern = -float(g) * kern
    k_hat = np.fft.rfftn(kern).real
    real_dtype = jnp.zeros((), dtype).dtype
    return jnp.asarray(k_hat, real_dtype)


def pm_kernel_hat_poly(grid: int, h: float, rcut: float, *, g: float = None,
                       dtype=jnp.float32):
    """rFFT of the poly-split LONG-RANGE Green's function on the doubled
    mesh. The blend G(y) = y^3 (10 - 15 y + 6 y^2), y = (r/rc)^2 gives
    the closed-form potential (per unit source mass, Newtonian law —
    the softened pair law differs from Newton only at r ~ eps << rc,
    which the SHORT pass carries exactly):

        phi_long(r <  rc) = -(32/21)/rc + 2 r^5/rc^6 - (15/7) r^7/rc^8
                            + (2/3) r^9/rc^10
        phi_long(r >= rc) = -1/r            (C^2 at rc; phi(rc) = -1/rc)

    -d(phi)/dr = -G(y)/r^2, i.e. force weight w_long = G(y)/r^3 — the
    exact complement of `_w_short_poly`. Host-side f64; same shape
    contract as pm.pm_kernel_hat ((2G, 2G, G+1) real)."""
    if g is None:
        g = constants.G
    g2 = 2 * grid
    idx = np.arange(g2, dtype=np.float64)
    d = np.minimum(idx, g2 - idx)
    r = float(h) * np.sqrt(
        d[:, None, None] ** 2 + d[None, :, None] ** 2
        + d[None, None, :] ** 2
    )
    rc = float(rcut)
    with np.errstate(divide="ignore"):
        inside = (
            (-32.0 / 21.0) / rc + 2.0 * r ** 5 / rc ** 6
            - (15.0 / 7.0) * r ** 7 / rc ** 8 + (2.0 / 3.0) * r ** 9 / rc ** 10
        )
        outside = -1.0 / np.where(r > 0.0, r, 1.0)
    kern = float(g) * np.where(r < rc, inside, outside)
    k_hat = np.fft.rfftn(kern).real
    real_dtype = jnp.zeros((), dtype).dtype
    return jnp.asarray(k_hat, real_dtype)


#: grid at or above which the poly split builds its kernel spectrum ON
#: DEVICE (fftmm.kernel_hat_from_corner) instead of a host f64 rfftn of
#: the mirrored (2G)^3 mesh. Host cost at grid=512 measured on this
#: box: ~204 s for the 1024^3 rfftn alone + the elementwise kernel
#: build + a 2.15 GB host->device kernel ride — the dominant share of
#: the 1683 s prime in logs/r5w3_r5_treepm_finegrid.log. The device
#: build is ~1-2 s of MXU contractions and never ships the table.
KERNEL_DEVICE_MIN_GRID = 384


def pm_kernel_hat_poly_device(grid: int, h: float, rcut: float, *,
                              g: float = None, dtype=jnp.float32):
    """Device-built poly long-range kernel spectrum: evaluate the
    closed-form phi_long on the (G+1)^3 min-image corner (the kernel is
    even in every axis, so the corner determines the doubled mesh) and
    fold it to the (2G, 2G, G+1) rFFT table with fftmm's cosine
    contractions. Value-equivalent to `pm_kernel_hat_poly` up to
    f32-transform roundoff (pinned by tests/test_fftmm.py)."""
    from spacetpu.ops import fftmm

    if g is None:
        g = constants.G
    d = jnp.arange(grid + 1, dtype=dtype)
    r = jnp.asarray(h, dtype) * jnp.sqrt(
        d[:, None, None] ** 2 + d[None, :, None] ** 2
        + d[None, None, :] ** 2
    )
    rc = jnp.asarray(rcut, dtype)
    inside = (
        (-32.0 / 21.0) / rc + 2.0 * r ** 5 / rc ** 6
        - (15.0 / 7.0) * r ** 7 / rc ** 8 + (2.0 / 3.0) * r ** 9 / rc ** 10
    )
    outside = -1.0 / jnp.where(r > 0.0, r, 1.0)
    corner = jnp.asarray(g, dtype) * jnp.where(r < rc, inside, outside)
    return fftmm.kernel_hat_from_corner(corner, grid)


def make_kernel_hat(split: str, grid: int, h: float, rs: float, rcut: float,
                    *, g: float = None, dtype=jnp.float32):
    """Long-range mesh kernel for the chosen split family."""
    if split == "poly":
        if grid >= KERNEL_DEVICE_MIN_GRID:
            return pm_kernel_hat_poly_device(grid, h, rcut, g=g,
                                             dtype=dtype)
        return pm_kernel_hat_poly(grid, h, rcut, g=g, dtype=dtype)
    if split == "gauss":
        return pm_kernel_hat_long(grid, h, rs, g=g, dtype=dtype)
    raise ValueError(f"unknown treepm split {split!r}")


def _w_long_poly(r2, rcut, r_dtype):
    """Poly-split long-range force weight G(y)/r^3, y = r^2/rcut^2,
    clamped to the Newtonian weight (G = 1) beyond the cutoff."""
    inv_rc2 = 1.0 / (rcut * rcut)
    y = jnp.minimum(r2 * inv_rc2, jnp.asarray(1.0, r_dtype))
    gp = y * y * y * (10.0 + y * (-15.0 + 6.0 * y))
    inv_r = jnp.where(r2 > 0, jax.lax.rsqrt(jnp.maximum(r2, 1e-38)),
                      jnp.zeros((), r_dtype))
    return gp * inv_r * inv_r * inv_r


def _w_long(r2, rs, r_dtype):
    """Long-range force weight [erf(u) - (2/sqrt(pi)) u e^(-u^2)] / r^3
    (exact erf; XLA path). Zero at r = 0 (the numerator ~ u^3 and the
    pair's rel vector is zero anyway)."""
    inv_r = jnp.where(r2 > 0, jax.lax.rsqrt(jnp.maximum(r2, 1e-38)),
                      jnp.zeros((), r_dtype))
    r = r2 * inv_r
    u = r / (2.0 * rs)
    num = jax.scipy.special.erf(u) - _TWO_OVER_SQRTPI * u * jnp.exp(-u * u)
    return num * inv_r * inv_r * inv_r


#: Chebyshev coefficients of h(v) = [erf(u) - (2/sqrt(pi)) u e^(-u^2)]/u^3
#: as a function of v = u^2 on [0, _HLONG_VMAX] (h is ENTIRE in v, so the
#: series converges geometrically; deg 15 reaches f32 roundoff). Beyond
#: the range the bracket is 1 to <=2.1e-5, so w_long ~ 1/r^3 there. This
#: replaces the per-pair erf + exp + divide chain in the short-range
#: kernels with ~30 VPU flops: the r4w3 chip profile
#: (logs/r4w3_r4_treepm_prof.log) measured the short pass at 1192 ms of
#: the 1396 ms N=1M step — ~6.8 us/tile vs ~1.0 for the tree's
#: transcendental-free near kernel — with the transcendental chain as
#: the only per-pair difference. Max relative error vs the Newtonian
#: weight: 1.7e-6 (f32 Clenshaw), pinned by test_w_long_fast_accuracy.
_HLONG_VMAX = 12.25  # u = r/(2 rs) <= 3.5
_HLONG_CHEB = (
    0.192113856961219, -0.2717257282102824, 0.1563599597336091,
    -0.07770857221021463, 0.03409713282293515, -0.013376761116476876,
    0.0047356367163482625, -0.001524426605379348, 0.00044916418572923115,
    -0.00012184889023613674, 3.059320288310997e-05, -7.143091319246147e-06,
    1.5567925396196247e-06, -3.1826850806844793e-07, 6.023877228414106e-08,
    -1.0951542449936198e-08,
)


def _h_long_cheb(x):
    """Clenshaw evaluation of the h(v) series at x = 2 v/VMAX - 1.

    Kernel-safe (adds/muls only) and f32-stable — the power-basis Horner
    form of the same fit loses 3 digits to cancellation (coefficients up
    to 1.5e3 with alternating signs)."""
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    two_x = 2.0 * x
    for c in _HLONG_CHEB[:0:-1]:
        b1, b2 = two_x * b1 - b2 + c, b1
    return x * b1 - b2 + _HLONG_CHEB[0]


def _w_long_fast(r2, rs, r_dtype):
    """`_w_long` with the erf/exp bracket replaced by the Chebyshev fit:
    h(v)/(8 rs^3) inside the fitted range, 1/r^3 beyond it (where the
    bracket is 1 to 2.1e-5). Production default for the pair kernels —
    `_w_long` (exact erf) remains the oracle for the split-identity
    test and accuracy pinning."""
    inv4rs2 = 1.0 / (4.0 * rs * rs)
    v = r2 * inv4rs2
    # clamp the Clenshaw argument: out-of-range lanes would overflow to
    # inf/NaN and poison the select below
    x = jnp.minimum(v * (2.0 / _HLONG_VMAX) - 1.0, jnp.asarray(1.0, r_dtype))
    w_in = _h_long_cheb(x) * (inv4rs2 * (0.5 / rs))  # x 1/(8 rs^3)
    inv_r = jnp.where(r2 > 0, jax.lax.rsqrt(jnp.maximum(r2, 1e-38)),
                      jnp.zeros((), r_dtype))
    w_out = inv_r * inv_r * inv_r
    return jnp.where(v <= _HLONG_VMAX, w_in, w_out)


def w_short(r2, r_dtype, softening: str, eps, rs, *, rcut=None,
            split: str = "gauss", fast: bool = True):
    """Short-range pair weight: the chosen softened law minus the
    long-range part the mesh already carries.

    split="poly": w_pair - G(y)/r^3 inside the cutoff, EXACTLY zero
    beyond it (requires rcut). split="gauss": the erf complement —
    fast=True uses the Chebyshev form of the long-range bracket
    (<=1.7e-6 relative error vs Newton); fast=False keeps the exact
    erf (tests, oracles)."""
    w_pair = direct._pair_weight(r2, r_dtype, softening, eps)
    if split == "poly":
        if rcut is None:
            raise ValueError("split='poly' needs rcut")
        inv_rc2 = 1.0 / (rcut * rcut)
        yc = r2 * inv_rc2
        w = w_pair - _w_long_poly(r2, rcut, r_dtype)
        return jnp.where(yc < 1.0, w, jnp.zeros((), r_dtype))
    if split != "gauss":
        raise ValueError(f"unknown treepm split {split!r}")
    wl = _w_long_fast if fast else _w_long
    return w_pair - wl(r2, rs, r_dtype)


def acc_cross_short(pos_i, pos_j, mass_j, *, softening: str = "plummer",
                    eps=None, rs: float = 1.0, rcut=None,
                    split: str = "gauss", g=None):
    """Short-range acceleration of targets `pos_i` from sources
    `pos_j`/`mass_j` — `direct.acc_cross` with the split weight."""
    dtype = pos_i.dtype
    if eps is None:
        eps = constants.COLLISION_EPSILON if softening == "ref" else 0.0
    if g is None:
        g = constants.G
    eps = jnp.asarray(eps, dtype)
    g = jnp.asarray(g, dtype)
    rel = pos_j[None, :, :] - pos_i[:, None, :]
    r2 = jnp.sum(rel * rel, axis=-1)
    w = w_short(r2, dtype, softening, eps, jnp.asarray(rs, dtype),
                rcut=None if rcut is None else jnp.asarray(rcut, dtype),
                split=split)
    w = w * mass_j[None, :] * g
    return jnp.einsum("ij,ijk->ik", w, rel)


# ---------------------------------------------------------------------------
# Pallas short-range pair kernel
# ---------------------------------------------------------------------------

# Abramowitz & Stegun 7.1.26 rational erf approximation (|err| < 1.5e-7,
# i.e. f32 roundoff) — used inside the Pallas kernel so the lowering never
# depends on a Mosaic erf primitive; needs only exp and a reciprocal.
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _erf_as(x):
    """erf(x) for x >= 0 via A&S 7.1.26 (kernel-safe: exp + rationals)."""
    t = 1.0 / (1.0 + _AS_P * x)
    poly = t * (_AS_A[0] + t * (_AS_A[1] + t * (
        _AS_A[2] + t * (_AS_A[3] + t * _AS_A[4]))))
    return 1.0 - poly * jnp.exp(-x * x)


def _kernel_pairs_short(tgt_ref, vfirst_ref, tcols_ref, strip_ref, accin_ref,
                        out_ref, *, softening: str, eps: float, rs: float,
                        rcut: float = 0.0, split: str = "gauss"):
    """Pair-tile kernel for the short-range pass — `tree._kernel_pairs`
    with the split weight (softened pair law minus the long-range part
    the mesh carries). tcols/accin/out ride the transposed (8, block)
    layout (tree._pack_targets_t).

    split="poly" (production): ~8 extra VPU ops over the tree's near
    kernel at dependency depth ~4. The erf chain measured 6.8 us/tile
    vs the tree kernel's ~1.0 (logs/r4w3_r4_treepm_prof.log) and the
    Chebyshev rewrite REGRESSED it 1.23x — its deg-15 Clenshaw
    recurrence is a 30-deep serial chain, and the VPU pays dependency
    DEPTH here, not op count (logs/r4w8_r4_treepm_prof.log)."""
    del tgt_ref  # consumed by the index maps
    tc = tcols_ref[:, :].T  # (block, 8)
    xi = tc[:, 0:1]
    yi = tc[:, 1:2]
    zi = tc[:, 2:3]
    xj = strip_ref[0:1, :]
    yj = strip_ref[1:2, :]
    zj = strip_ref[2:3, :]
    gmj = strip_ref[3:4, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz
    w = gmj * _w_short_tile(r2, softening=softening, eps=eps, rs=rs,
                            rcut=rcut, split=split)
    ax = jnp.sum(w * dx, axis=1, keepdims=True)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    zero = jnp.zeros_like(ax)
    tile = jnp.concatenate([ax, ay, az, zero, zero, zero, zero, zero], axis=1)
    tree_ops._pairs_prologue(vfirst_ref, accin_ref, out_ref, tile.T)


def _w_short_tile(r2, *, softening: str, eps: float, rs: float,
                  rcut: float, split: str):
    """Per-pair short-range weight (without the g*m_j factor) — shared by
    the vpu and hybrid pair kernels so the force arithmetic is identical
    by construction."""
    if softening == "plummer":
        d2 = r2 + eps * eps
        inv = jax.lax.rsqrt(d2)
        w_pair = inv * inv * inv
        if eps == 0.0:
            w_pair = jnp.where(d2 > 0.0, w_pair, 0.0)
    elif softening == "ref":
        denom = r2 * jnp.sqrt(r2) + eps
        w_pair = jnp.where(denom > 0.0, 1.0 / denom, 0.0)
    else:
        raise ValueError(f"unknown softening {softening!r}")
    inv_r = jnp.where(r2 > 0.0, jax.lax.rsqrt(jnp.maximum(r2, 1e-38)), 0.0)
    if split == "poly":
        inv_rc2 = 1.0 / (rcut * rcut)
        yc = r2 * inv_rc2
        y = jnp.minimum(yc, 1.0)
        gp = y * y * y * (10.0 + y * (-15.0 + 6.0 * y))
        w_long = gp * (inv_r * inv_r * inv_r)
        return jnp.where(yc < 1.0, w_pair - w_long, 0.0)
    if split == "gauss":
        inv4rs2 = 1.0 / (4.0 * rs * rs)
        v = r2 * inv4rs2
        x = jnp.minimum(v * (2.0 / _HLONG_VMAX) - 1.0, 1.0)
        w_in = _h_long_cheb(x) * (inv4rs2 * (0.5 / rs))
        w_out = inv_r * inv_r * inv_r
        w_long = jnp.where(v <= _HLONG_VMAX, w_in, w_out)
        return w_pair - w_long
    raise ValueError(f"unknown treepm split {split!r}")


def _kernel_pairs_short_hybrid(tgt_ref, vfirst_ref, tcols_ref, strip_ref,
                               accin_ref, out_ref, *, softening: str,
                               eps: float, rs: float, rcut: float = 0.0,
                               split: str = "gauss"):
    """`_kernel_pairs_short` with the accumulation routed through the MXU
    (tree._kernel_pairs_hybrid has the scheme and the per-tile centering
    rationale); the pair weights come from the same exact-difference
    arithmetic via `_w_short_tile`."""
    del tgt_ref  # consumed by the index maps
    tc = tcols_ref[:, :].T  # (block, 8)
    xi = tc[:, 0:1]
    yi = tc[:, 1:2]
    zi = tc[:, 2:3]
    xj = strip_ref[0:1, :]
    yj = strip_ref[1:2, :]
    zj = strip_ref[2:3, :]
    gmj = strip_ref[3:4, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz
    w = gmj * _w_short_tile(r2, softening=softening, eps=eps, rs=rs,
                            rcut=rcut, split=split)
    # mask exact-coincidence pairs: zero contribution either way, but the
    # huge self weight would cancel catastrophically in the rank-1 split
    # (see tree._kernel_pairs_hybrid)
    w = jnp.where(r2 > 0.0, w, 0.0)
    cx = tc[0:1, 0:1]
    cy = tc[0:1, 1:2]
    cz = tc[0:1, 2:3]
    jc = jnp.concatenate([
        (xj - cx).T, (yj - cy).T, (zj - cz).T, jnp.ones_like(xj).T,
    ], axis=1)  # (TJ, 4)
    acc4 = jnp.dot(w, jc, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    sw = acc4[:, 3:4]
    ax = acc4[:, 0:1] - sw * (xi - cx)
    ay = acc4[:, 1:2] - sw * (yi - cy)
    az = acc4[:, 2:3] - sw * (zi - cz)
    zero = jnp.zeros_like(ax)
    tile = jnp.concatenate([ax, ay, az, zero, zero, zero, zero, zero], axis=1)
    tree_ops._pairs_prologue(vfirst_ref, accin_ref, out_ref, tile.T)


def _near_pairs_short_pallas(pos_g, srows, flat_src, tile_tgt, *, softening,
                             eps, rs, rcut=0.0, split="gauss", interpret,
                             n_tiles=None, accum="vpu"):
    """Short-range pair-tile pass on the Pallas path. srows from
    tree._pack_augmented(monopole_pseudo=False) — raw bodies with
    g-scaled masses and a massless pseudo slot. Returns (G, leaf, 3)."""
    gg, leaf = pos_g.shape[:2]
    block = leaf + 1
    tcols_ext = tree_ops._append_dummy_block_t(
        tree_ops._pack_targets_t(pos_g), block
    )
    srows3 = srows.reshape(8, srows.shape[1] // block, block)
    kern = (_kernel_pairs_short_hybrid if accum == "mxu"
            else _kernel_pairs_short)
    acc = tree_ops._near_pairs_call(
        functools.partial(kern, softening=softening,
                          eps=float(eps), rs=float(rs), rcut=float(rcut),
                          split=split),
        tcols_ext, srows3, flat_src, tile_tgt,
        block=block, rows=8, interpret=bool(interpret),
        chunk=tree_ops.NEAR_PAIRS_CHUNK, n_tiles=n_tiles,
    )
    return jnp.moveaxis(
        acc[:3, : gg * block].reshape(3, gg, block), 0, -1
    )[:, :leaf, :]


def _near_pairs_short_xla(pos_g, aug_pos, aug_gm, flat_src, tile_tgt, *,
                          softening, eps, rs, rcut=None, split="gauss"):
    """XLA fallback for the short-range pair pass (CPU tests)."""
    gg, leaf = pos_g.shape[:2]
    pj = flat_src.shape[0] // tile_tgt.shape[0]
    pos_ext = jnp.concatenate(
        [pos_g, jnp.zeros((1, leaf, 3), pos_g.dtype)], axis=0
    )
    aug_pos = jnp.concatenate(
        [aug_pos, jnp.zeros((1,) + aug_pos.shape[1:], aug_pos.dtype)], axis=0
    )
    aug_gm = jnp.concatenate(
        [aug_gm, jnp.zeros((1,) + aug_gm.shape[1:], aug_gm.dtype)], axis=0
    )

    def one_tile(args):
        tgt_id, src_ids = args
        tgt = pos_ext[tgt_id]
        sp = aug_pos[src_ids].reshape(-1, 3)
        sm = aug_gm[src_ids].reshape(-1)
        return acc_cross_short(tgt, sp, sm, softening=softening, eps=eps,
                               rs=rs, rcut=rcut, split=split, g=1.0)

    contrib = jax.lax.map(one_tile, (tile_tgt, flat_src.reshape(-1, pj)))
    acc = jax.ops.segment_sum(contrib, tile_tgt, num_segments=gg + 1)
    return acc[:gg]


def near_pairs_short(pos_g_t, pool_pos_g, pool_mass_g, pool_com, flat_src,
                     tile_tgt, *, softening, eps, rs, g, backend: str,
                     rcut=None, split: str = "gauss",
                     interpret=None, n_tiles=None, accum="vpu"):
    """Short-range pair pass with SEPARATE target and source cluster
    tables — the sharded TreePM's near phase, where sources are the
    [local | halo | null] pool from tree2's halo exchange and flat_src
    indexes pool slots. Returns (G_t, leaf, 3) slot-order accelerations.
    (The single-chip `_short_eval` is the pool == targets special case.)"""
    if interpret is None:
        from spacetpu.ops.pallas_direct import _default_interpret

        interpret = _default_interpret()
    g = jnp.asarray(g, pos_g_t.dtype)
    if backend == "pallas":
        pool_m = jnp.sum(pool_mass_g, axis=1)
        srows = tree_ops._pack_augmented(
            pool_pos_g, pool_mass_g, pool_com, pool_m, g,
            monopole_pseudo=False,
        )
        return _near_pairs_short_pallas(
            pos_g_t, srows, flat_src, tile_tgt, softening=softening,
            eps=eps, rs=rs, rcut=0.0 if rcut is None else rcut,
            split=split, interpret=interpret, n_tiles=n_tiles, accum=accum,
        )
    aug_pos = jnp.concatenate([pool_pos_g, pool_com[:, None, :]], axis=1)
    aug_gm = jnp.concatenate(
        [pool_mass_g * g,
         jnp.zeros((pool_pos_g.shape[0], 1), pool_pos_g.dtype)], axis=1
    )
    return _near_pairs_short_xla(
        pos_g_t, aug_pos, aug_gm, flat_src, tile_tgt, softening=softening,
        eps=eps, rs=rs, rcut=rcut, split=split,
    )


# ---------------------------------------------------------------------------
# Cutoff near lists + calibration
# ---------------------------------------------------------------------------


def near_lists_rcut(com, m_tot, r_tgt, rcut, k_near: int,
                    row_chunk: int = 1024, t0=None, n_t: int | None = None):
    """(G_t, K) indices of clusters within the short-range cutoff, +
    overflow count. Symmetric acceptance (com distance <= rcut + r_tgt_i
    + r_tgt_j, using the all-body radius on BOTH sides) keeps the pair
    forces antisymmetric apart from counted overflow drops; zero-mass
    sources are skipped (they exert nothing). Chunked over target rows:
    O(row_chunk * G) peak memory. t0/n_t (traced start, static count)
    restrict the TARGET rows to a slice — the sharded TreePM builds lists
    only for its own clusters (sources stay global); default all G."""
    g = com.shape[0]
    com_t, r_t_rows = com, r_tgt
    if t0 is not None:
        com_t = jax.lax.dynamic_slice_in_dim(com, t0, n_t, 0)
        r_t_rows = jax.lax.dynamic_slice_in_dim(r_tgt, t0, n_t, 0)
    g_t = com_t.shape[0]
    cand = jnp.arange(g, dtype=jnp.int32)
    rcut = jnp.asarray(rcut, com.dtype)

    def rows(args):
        com_r, r_r = args
        dist = jnp.linalg.norm(com_r[:, None, :] - com[None, :, :], axis=-1)
        near = dist <= rcut + r_r[:, None] + r_tgt[None, :]
        near = jnp.logical_and(near, m_tot[None, :] > 0)
        overflow = jnp.sum(jnp.sum(near, axis=1) > k_near)
        masked = jnp.where(near, dist, jnp.inf)
        c = jnp.broadcast_to(cand[None, :], masked.shape)
        return tree_ops._smallest_k(masked, c, k_near, g), overflow

    if g_t <= row_chunk:
        return rows((com_t, r_t_rows))
    pad = (-g_t) % row_chunk
    com_p = jnp.concatenate([com_t, jnp.zeros((pad, 3), com.dtype)])
    # padding rows get r = -inf so they accept nothing (not even self)
    r_p = jnp.concatenate(
        [r_t_rows, jnp.full((pad,), -jnp.inf, r_t_rows.dtype)]
    )
    idx, over = jax.lax.map(
        rows,
        (com_p.reshape(-1, row_chunk, 3), r_p.reshape(-1, row_chunk)),
    )
    return idx.reshape(-1, k_near)[:g_t], jnp.sum(over)


def measure_near_rcut(pos, mass, *, rcut: float, gg: int, leaf: int,
                      headroom: float = 1.25, n_shards: int = 1) -> dict:
    """Measure the scene's cutoff near-list shape for static sizing
    (the TreePM analogue of tree.measure_near): k_near = max accepted
    clusters per row, near_tiles = total pair tiles, both with
    `headroom`. One O(G^2) distance pass in row chunks — runs once at
    calibrate time. n_shards > 1 adds `near_tiles_shard`: the WORST
    shard's tile total under a D-way equal split of the sorted cluster
    rows (the sharded TreePM's per-device static cap — SPMD needs one
    size for every device)."""
    n = pos.shape[0]
    perm, _ = morton.morton_order(jnp.asarray(pos))
    stats = tree_ops.tree_sorted_stats(
        jnp.asarray(pos), jnp.asarray(mass), perm, gg, leaf
    )
    com, m_tot, r_tgt = stats["com"], stats["m_tot"], stats["r_tgt"]
    rcut_t = jnp.asarray(rcut, com.dtype)

    @jax.jit
    def counts():
        def rows(args):
            com_t, r_t = args
            dist = jnp.linalg.norm(
                com_t[:, None, :] - com[None, :, :], axis=-1
            )
            near = (dist <= rcut_t + r_t[:, None] + r_tgt[None, :]) & (
                m_tot[None, :] > 0
            )
            return jnp.sum(near, axis=1)

        chunk = 1024
        pad = (-gg) % chunk
        com_p = jnp.concatenate([com, jnp.zeros((pad, 3), com.dtype)])
        r_p = jnp.concatenate(
            [r_tgt, jnp.full((pad,), -jnp.inf, r_tgt.dtype)]
        )
        k_i = jax.lax.map(
            rows, (com_p.reshape(-1, chunk, 3), r_p.reshape(-1, chunk))
        ).reshape(-1)[:gg]
        return jnp.max(k_i), k_i

    k_max, k_i = counts()
    k_near = max(int(math.ceil(float(k_max) * headroom)), 2)
    k_near = min(k_near, gg)
    pj = tree_ops.NEAR_TILE_J // (leaf + 1)
    tiles_i = np.maximum(-(-np.asarray(k_i, np.int64) // pj), 1)
    near_tiles = int(math.ceil(float(tiles_i.sum()) * headroom)) + 8
    out = dict(k_near=k_near, near_tiles=near_tiles, n_clusters=gg,
               mean_near=float(jnp.mean(k_i)), n=n)
    if n_shards > 1:
        if gg % n_shards:
            raise ValueError(f"gg={gg} not divisible by n_shards={n_shards}")
        per_shard = tiles_i.reshape(n_shards, -1).sum(axis=1).max()
        out["near_tiles_shard"] = int(
            math.ceil(float(per_shard) * headroom)) + 8
    return out


# ---------------------------------------------------------------------------
# Structure build + full solver
# ---------------------------------------------------------------------------

#: tree_prep-style keys that stay valid across steps (see
#: tree.STRUCTURE_KEYS): the sort, the gather plan and the flattened
#: cutoff pair tiles. Cluster statistics are recomputed every call.
STRUCTURE_KEYS = ("perm", "inv", "clusters", "near_flat", "near_tile_tgt",
                  "near_ntiles", "near_overflow")


def treepm_prep(pos, mass, *, rcut: float, k_near: int, gg: int, leaf: int,
                near_tiles: int | None = None):
    """Sort + cluster + cutoff near lists + flattened pair tiles."""
    perm, inv = morton.morton_order(pos)
    clusters = cluster_ops.equal_clusters(pos.shape[0], leaf, gg)
    stats = tree_ops.tree_sorted_stats(pos, mass, perm, gg, leaf)
    idx, overflow = near_lists_rcut(
        stats["com"], stats["m_tot"], stats["r_tgt"], rcut, k_near
    )
    block = leaf + 1
    if tree_ops.NEAR_TILE_J % block:
        raise ValueError(
            f"TreePM pair tiles need leaf+1 to divide "
            f"{tree_ops.NEAR_TILE_J}, got leaf={leaf}"
        )
    pj = tree_ops.NEAR_TILE_J // block
    if near_tiles is None:
        near_tiles = gg * max(-(-k_near // pj), 1)
    flat, ttgt, ntiles, dropped = tree_ops.near_pair_segments(
        idx, gg, pj, near_tiles
    )
    return dict(perm=perm, inv=inv, clusters=clusters, near_flat=flat,
                near_tile_tgt=ttgt, near_ntiles=ntiles,
                near_overflow=overflow + dropped, **stats)


def treepm_structure(pos, mass, *, rcut: float, k_near: int, gg: int,
                     leaf: int, near_tiles: int | None = None):
    """The cacheable part (STRUCTURE_KEYS) of `treepm_prep`."""
    p = treepm_prep(pos, mass, rcut=rcut, k_near=k_near, gg=gg, leaf=leaf,
                    near_tiles=near_tiles)
    return {k: p[k] for k in STRUCTURE_KEYS}


def _short_eval(prep: dict, *, softening: str, eps, g, rs: float,
                rcut=None, split: str = "gauss",
                backend: str, interpret=None, accum="vpu"):
    """Short-range pair pass over the prep's tile list -> (G, leaf, 3)
    accelerations in slot order."""
    pos_g, mass_g = prep["pos_g"], prep["mass_g"]
    if interpret is None:
        from spacetpu.ops.pallas_direct import _default_interpret

        interpret = _default_interpret()
    if backend == "pallas":
        srows = tree_ops._pack_augmented(
            pos_g, mass_g, prep["com"], prep["m_tot"], g,
            monopole_pseudo=False,
        )
        return _near_pairs_short_pallas(
            pos_g, srows, prep["near_flat"], prep["near_tile_tgt"],
            softening=softening, eps=eps, rs=rs,
            rcut=0.0 if rcut is None else rcut, split=split,
            interpret=interpret, n_tiles=prep["near_ntiles"], accum=accum,
        )
    aug_pos = jnp.concatenate([pos_g, prep["com"][:, None, :]], axis=1)
    aug_gm = jnp.concatenate(
        [mass_g * g, jnp.zeros((pos_g.shape[0], 1), pos_g.dtype)], axis=1
    )
    return _near_pairs_short_xla(
        pos_g, aug_pos, aug_gm, prep["near_flat"], prep["near_tile_tgt"],
        softening=softening, eps=eps, rs=rs, rcut=rcut, split=split,
    )


def acc_treepm(pos, mass, *, kernel_hat, box_min, h, grid: int, rs: float,
               rcut: float, split: str = "gauss",
               softening: str = "plummer", eps=None, g=None,
               k_near: int = 64, gg: int | None = None,
               leaf: int = None, near_tiles: int | None = None,
               backend: str = "xla", interpret=None,
               pairs_accum: str = "vpu"):
    """TreePM acceleration: (N, 3), (N,) -> (N, 3).

    kernel_hat must be the LONG-RANGE kernel of the SAME split family
    (make_kernel_hat(split, ...)) for the same (grid, h, rs/rcut, g) —
    the PM pass evaluates the smoothed field of ALL bodies, the pair
    pass adds the exact-minus-smooth complement for pairs within
    rcut."""
    if eps is None:
        eps = constants.COLLISION_EPSILON if softening == "ref" else 0.0
    if g is None:
        g = constants.G
    if leaf is None:
        leaf = tree_ops.LEAF
    n = pos.shape[0]
    if gg is None:
        gg = -(-n // leaf)
    prep = treepm_prep(pos, mass, rcut=rcut, k_near=k_near, gg=gg,
                       leaf=leaf, near_tiles=near_tiles)
    acc_short = _short_eval(prep, softening=softening, eps=eps, g=g, rs=rs,
                            rcut=rcut, split=split, accum=pairs_accum,
                            backend=backend, interpret=interpret)
    acc_short = cluster_ops.unsort_slots(
        acc_short.reshape(gg * leaf, 3), prep["clusters"], prep["inv"]
    )
    acc_long = pm_ops.acc_pm(pos, mass, kernel_hat=kernel_hat,
                             box_min=box_min, h=h, grid=grid)
    return acc_short + acc_long


def acc_treepm_cached(pos, mass, structure, *, kernel_hat, box_min, h,
                      grid: int, rs: float, rcut: float = 0.0,
                      split: str = "gauss", softening: str = "plummer",
                      eps=None, g=None, backend: str = "xla",
                      interpret=None, pairs_accum: str = "vpu"):
    """acc_treepm with a cached `treepm_structure` dict: the sort and
    cutoff pair tiles are reused, cluster statistics track the current
    positions (Simulation tree_refresh_every semantics)."""
    if eps is None:
        eps = constants.COLLISION_EPSILON if softening == "ref" else 0.0
    if g is None:
        g = constants.G
    clusters = structure["clusters"]
    gg, leaf = clusters.slot.shape
    stats = tree_ops.tree_sorted_stats(pos, mass, structure["perm"], gg,
                                       leaf)
    prep = dict(structure, **stats)
    acc_short = _short_eval(prep, softening=softening, eps=eps, g=g, rs=rs,
                            rcut=rcut, split=split, accum=pairs_accum,
                            backend=backend, interpret=interpret)
    acc_short = cluster_ops.unsort_slots(
        acc_short.reshape(gg * leaf, 3), clusters, structure["inv"]
    )
    acc_long = pm_ops.acc_pm(pos, mass, kernel_hat=kernel_hat,
                             box_min=box_min, h=h, grid=grid)
    return acc_short + acc_long
