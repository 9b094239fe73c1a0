"""Poisson transform as explicit DFT matmuls on the MXU.

Why this exists (chip-measured, logs/r4w10_r4_treepm_diag.log +
logs/r4w5_r4_treepm_grid256.log):

1. **Precision.** The TPU backend lowers ``jnp.fft`` to a recursive FFT
   that runs at reduced (bf16-grade) precision; the PM force is the
   central-difference gradient of the FFT'd potential, which amplifies
   relative potential noise by ~|phi|/(h |grad phi|) (~15-40x at our
   cell sizes). Result: med force error ~0.25 at N=1M grid=128 on chip
   where the identical pipeline measures ~1e-2 in CPU f64 — the entire
   error budget was FFT roundoff, not mesh discretization. A dense DFT
   matmul at ``lax.Precision.HIGHEST`` (the 6-pass f32 MXU mode) has
   ~sqrt(M)*eps_f32 ~ 1e-6 transform roundoff — negligible against the
   mesh's own discretization error.

2. **Capacity.** The 512-point recursive rFFT's internal reshape
   ``f32[512,512,128,4]`` is tiled T(8,128): the trailing 4 pads to 128
   and a 512 MB tensor becomes 16.5 GB at compile, OOMing grid=256
   before a single step runs. Dense (M, M) x (M, ...) matmuls never
   materialize that layout, so the matmul path is ALSO the grid=256
   capacity fix.

Cost: a full axis transform is an (M, M) x (M, M^2*...) matmul; the
3-axis forward+inverse pipeline on the doubled mesh (M = 2*grid) with a
half-spectrum last axis is ~10*M^4 MACs — at grid=128 (M=256) that is
4.3e10 MACs, single-digit milliseconds on one chip's MXU even in the
6-pass HIGHEST mode; at grid=256 (M=512) ~0.7 TMAC, tens of ms. The
recursive FFT is asymptotically cheaper (M^3 log M) but the mesh solve
is <15% of a PM step (the deposit scatter dominates, BENCH_NOTES), so
trading FLOPs for exactness + a sane layout is the right TPU call.

Layout/semantics match ``np.fft.rfftn`` exactly: real input (M, M, M),
half spectrum on the LAST axis (M, M, M//2+1), so the precomputed
``pm_kernel_hat`` tables multiply in unchanged. The spectrum is carried
as separate (real, imag) planes — explicit real matmuls keep the
precision knob honest and avoid complex64 lowering surprises.

No reference counterpart (the Rust reference has no mesh solver at all;
its families are direct.rs and barnes_hut/ — README.md:3). This is
TPU-native infrastructure for the PM/TreePM families.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp
from jax import lax

#: all DFT matmuls run in the 6-pass f32 MXU mode — the entire point.
_PREC = lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _dft_tables_np(m: int):
    """cos/sin DFT tables, (m, m) f64: theta[j,k] = 2*pi*(j*k mod m)/m.

    The integer mod keeps the angle argument exact (j*k <= (m-1)^2 fits
    int64 for any practical mesh), so table entries are correctly
    rounded f64 — the tables are the transform's ground truth and get
    cast to the mesh dtype once at trace time (~1 MB/table at M=512,
    baked as HLO constants; the 269 MB kernel_hat lesson does not apply
    at this size).
    """
    k = np.arange(m, dtype=np.int64)
    th = (2.0 * np.pi / m) * ((k[:, None] * k[None, :]) % m).astype(np.float64)
    return np.cos(th), np.sin(th)


def _tables(m: int, dtype):
    c, s = _dft_tables_np(m)
    return jnp.asarray(c, dtype), jnp.asarray(s, dtype)


def _fwd_real_last(x, m: int):
    """rDFT along the last axis: real (..., n) -> ((..., mh), (..., mh))
    with mh = m//2 + 1, matching np.fft.rfft (negative-frequency rows
    dropped by Hermitian symmetry). F = exp(-i theta) = C - i S.

    The input may be SHORTER than ``m`` along the last axis (n < m): the
    table is sliced to the first n source columns, equivalent to
    zero-padding the input to length m (exact zeros contribute exactly
    nothing) — the compact-mesh forward transform."""
    mh = m // 2 + 1
    c, s = _tables(m, x.dtype)
    n = x.shape[-1]
    cf, sf = c[:mh, :n], s[:mh, :n]
    yr = jnp.einsum("abn,kn->abk", x, cf, precision=_PREC)
    yi = -jnp.einsum("abn,kn->abk", x, sf, precision=_PREC)
    return yr, yi


_AXIS_EINSUM = {0: "jk,kbc->jbc", 1: "jk,akc->ajc"}


def _cplx_axis(yr, yi, m: int, axis: int, *, inverse: bool,
               n_src: int = None, out_rows=None):
    """Full complex DFT along ``axis`` (0 or 1) of (re, im) planes.

    Forward multiplies by C - iS; inverse by (C + iS)/m. Written as one
    signed form: y' = (C + i*sig*S)(yr + i*yi)*scale.

    Structural-zero / partial-output slicing (the compact-mesh path):
    ``n_src`` declares the input length along ``axis`` (the transform
    behaves as if it were zero-padded to ``m`` — adding exact zeros, so
    values are bit-compatible up to MXU accumulation order); ``out_rows``
    (a host-side integer index array) restricts the OUTPUT to those
    frequency/space rows. Both just slice the DFT tables, which are
    symmetric, so (out, contract) orientation is preserved.
    """
    c, s = _tables(m, yr.dtype)
    if n_src is not None:
        c, s = c[:, :n_src], s[:, :n_src]
    if out_rows is not None:
        c, s = c[out_rows], s[out_rows]
    sig = 1.0 if inverse else -1.0
    scale = (1.0 / m) if inverse else 1.0
    eq = _AXIS_EINSUM[axis]
    cr = jnp.einsum(eq, c, yr, precision=_PREC)
    sr = jnp.einsum(eq, s, yr, precision=_PREC)
    ci = jnp.einsum(eq, c, yi, precision=_PREC)
    si = jnp.einsum(eq, s, yi, precision=_PREC)
    out_r = (cr - sig * si) * scale
    out_i = (ci + sig * sr) * scale
    return out_r, out_i


def _inv_real_last(zr, zi, m: int, out_rows=None):
    """irDFT along the last axis: Hermitian half spectrum (..., mh) ->
    real (..., m). x[n] = (1/m) * sum_k w_k * Re(X_k e^{+i theta_nk})
    with w = 1 at k=0 and k=m/2 (m even), 2 elsewhere — the dropped
    negative frequencies folded into the weights. ``out_rows`` (host-side
    integer index array) restricts the output samples to those spatial
    positions (the compact-mesh inverse)."""
    mh = m // 2 + 1
    c, s = _tables(m, zr.dtype)
    w = np.full(mh, 2.0)
    w[0] = 1.0
    if m % 2 == 0:
        w[mh - 1] = 1.0
    w = jnp.asarray(w / m, zr.dtype)[:, None]
    ci = c[:mh] * w  # (mh, m); theta table is symmetric
    si = s[:mh] * w
    if out_rows is not None:
        ci, si = ci[:, out_rows], si[:, out_rows]
    return (jnp.einsum("abk,kn->abn", zr, ci, precision=_PREC)
            - jnp.einsum("abk,kn->abn", zi, si, precision=_PREC))


def rfft3_matmul(x):
    """np.fft.rfftn-equivalent of a real (m, m, m) mesh via dense DFT
    matmuls -> (re, im) planes of shape (m, m, m//2+1)."""
    m = x.shape[-1]
    yr, yi = _fwd_real_last(x, m)
    yr, yi = _cplx_axis(yr, yi, m, 0, inverse=False)
    yr, yi = _cplx_axis(yr, yi, m, 1, inverse=False)
    return yr, yi


def irfft3_matmul(yr, yi, m: int):
    """Inverse of :func:`rfft3_matmul` -> real (m, m, m)."""
    yr, yi = _cplx_axis(yr, yi, m, 1, inverse=True)
    yr, yi = _cplx_axis(yr, yi, m, 0, inverse=True)
    return _inv_real_last(yr, yi, m)


def rfft3_matmul_compact(x, m: int):
    """Forward transform of a real (n, n, n) mesh regarded as the corner
    of a zero-padded (m, m, m) mesh (n <= m) -> (re, im) planes of shape
    (m, m, m//2+1). Contractions run over the n occupied source slots
    only — the structural-zero padding never costs a MAC or a byte."""
    n = x.shape[-1]
    yr, yi = _fwd_real_last(x, m)
    yr, yi = _cplx_axis(yr, yi, m, 0, inverse=False, n_src=n)
    yr, yi = _cplx_axis(yr, yi, m, 1, inverse=False, n_src=n)
    return yr, yi


def irfft3_matmul_rows(yr, yi, m: int, rows):
    """Inverse of :func:`rfft3_matmul`, evaluated ONLY at the spatial
    positions ``rows`` (host-side integer index array) along every axis
    -> real (len(rows),)^3. The restriction just slices the inverse DFT
    tables, so each produced sample is the exact full-inverse value."""
    yr, yi = _cplx_axis(yr, yi, m, 1, inverse=True, out_rows=rows)
    yr, yi = _cplx_axis(yr, yi, m, 0, inverse=True, out_rows=rows)
    return _inv_real_last(yr, yi, m, out_rows=rows)


def potential_ext_matmul(mesh_c, kernel_hat, grid: int, rows):
    """Compact-mesh Poisson solve: forward-transform the (G+1)^3 compact
    mass mesh as the corner of the doubled mesh, multiply by the real
    kernel spectrum, inverse-transform only at the ``rows`` window the
    gradient/gather stage reads (pm.ext_rows: [-1 .. G+1] min-image
    wrapped). Roughly halves the MACs of every one of the six transform
    passes relative to the full doubled-mesh transform."""
    m = 2 * grid
    yr, yi = rfft3_matmul_compact(mesh_c, m)
    yr = yr * kernel_hat
    yi = yi * kernel_hat
    return irfft3_matmul_rows(yr, yi, m, rows)


def potential_mesh_matmul(mass_mesh, kernel_hat, grid: int):
    """Drop-in for ``pm.potential_mesh``: phi = IDFT(DFT(rho) * K_hat)
    on the doubled mesh, every transform a HIGHEST-precision matmul.
    ``kernel_hat`` is the real (2G, 2G, G+1) table from pm_kernel_hat /
    treepm.make_kernel_hat — real-valued, so the spectral multiply
    scales both planes."""
    m = 2 * grid
    yr, yi = rfft3_matmul(mass_mesh)
    yr = yr * kernel_hat
    yi = yi * kernel_hat
    return irfft3_matmul(yr, yi, m)


# ---------------------------------------------------------------------------
# Device-side kernel-spectrum construction (large grids)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _cos_fold_tables_np(m: int):
    """Cosine tables for the even-sequence DFT fold: an M-periodic
    sequence with x[M-d] = x[d] is determined by its corner d = 0..G
    (G = M/2), and its DFT is real:

        X[k] = sum_{d=0}^{G} w_d x[d] cos(2 pi k d / M),
        w_0 = w_G = 1, else 2.

    Returns (full, half): (M, G+1) for the first two axes' spectra and
    its first G+1 rows for the rFFT-truncated last axis. f64 ground
    truth like `_dft_tables_np` (exact integer angle reduction)."""
    g = m // 2
    k = np.arange(m, dtype=np.int64)[:, None]
    d = np.arange(g + 1, dtype=np.int64)[None, :]
    th = (2.0 * np.pi / m) * ((k * d) % m).astype(np.float64)
    w = np.full(g + 1, 2.0)
    w[0] = 1.0
    w[g] = 1.0
    full = np.cos(th) * w
    return full, full[: g + 1]


def kernel_hat_from_corner(corner, grid: int):
    """rFFT spectrum of an even doubled-mesh kernel from its corner.

    ``corner``: (G+1, G+1, G+1) samples of the kernel at min-image node
    distances d in [0, G]^3 (the doubled (2G)^3 mesh never needs to be
    materialized: the kernel is even in every axis by construction).
    Returns the real (2G, 2G, G+1) table `pm.pm_kernel_hat` produces —
    but built ON DEVICE with three HIGHEST-precision cosine
    contractions (~10 M^3(G+1)/8 MACs, ~1-2 s at grid=512 on one chip's
    MXU) instead of a host f64 rfftn of the mirrored (2G)^3 mesh
    (measured 204 s for the FFT alone at grid=512 on this host's single
    core, plus the 2 GB host->device ride the device build never pays).

    Spectrum error vs the host f64 path is transform roundoff
    (~sqrt(M) * eps_f32 ~ 1e-6 relative) — far below the mesh's own
    discretization error; pinned by tests/test_fftmm.py."""
    m = 2 * grid
    full_np, half_np = _cos_fold_tables_np(m)
    dt = corner.dtype
    full = jnp.asarray(full_np, dt)
    half = jnp.asarray(half_np, dt)
    # axis 2 (the rFFT-truncated axis): (G+1 freq) <- (G+1 nodes)
    t = jnp.einsum("kc,abc->abk", half, corner, precision=_PREC)
    # axis 1: full M spectrum
    t = jnp.einsum("lb,abk->alk", full, t, precision=_PREC)
    # axis 0: full M spectrum
    return jnp.einsum("ma,alk->mlk", full, t, precision=_PREC)
