"""Matmul-DFT Poisson transform (ops/fftmm.py): exactness against the
recursive FFT path, round-trip identity, and the full PM force pipeline
under the method switch. The module exists because the TPU backend's
recursive FFT is bf16-grade (the chip-measured 0.25 PM force error,
BENCH_NOTES round-4) — on CPU f64 both paths are exact, so these tests
pin transform SEMANTICS; the chip A/B lives in benches/r4_fftmm.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu.ops import fftmm, pm


def _mesh(m, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(m, m, m)), dtype)


def test_rfft3_matches_numpy_f64():
    m = 16
    x = _mesh(m, seed=1)
    yr, yi = fftmm.rfft3_matmul(x)
    ref = np.fft.rfftn(np.asarray(x))
    np.testing.assert_allclose(np.asarray(yr), ref.real, atol=1e-9)
    np.testing.assert_allclose(np.asarray(yi), ref.imag, atol=1e-9)


def test_irfft3_roundtrip_f64():
    m = 16
    x = _mesh(m, seed=2)
    yr, yi = fftmm.rfft3_matmul(x)
    back = fftmm.irfft3_matmul(yr, yi, m)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-11)


def test_irfft3_matches_numpy_on_filtered_spectrum():
    # Multiply by a real even kernel (the production shape) before the
    # inverse — checks the Hermitian-weight fold against np.fft.irfftn.
    m = 16
    x = _mesh(m, seed=3)
    kern = np.abs(np.fft.rfftn(np.exp(-np.linspace(0, 1, m ** 3)
                                      .reshape(m, m, m))))
    yr, yi = fftmm.rfft3_matmul(x)
    kj = jnp.asarray(kern)
    got = fftmm.irfft3_matmul(yr * kj, yi * kj, m)
    ref = np.fft.irfftn(np.fft.rfftn(np.asarray(x)) * kern, s=(m, m, m),
                        axes=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-10)


def test_potential_mesh_method_parity_f64():
    grid = 8
    rng = np.random.default_rng(4)
    mesh = np.zeros((2 * grid,) * 3)
    mesh[:grid, :grid, :grid] = rng.uniform(size=(grid,) * 3)
    kern = pm.pm_kernel_hat(grid, h=0.5, eps=0.0, g=1.0, dtype=jnp.float64)
    mj = jnp.asarray(mesh)
    phi_fft = pm.potential_mesh(mj, kern, grid, method="fft")
    phi_mm = pm.potential_mesh(mj, kern, grid, method="matmul")
    np.testing.assert_allclose(np.asarray(phi_mm), np.asarray(phi_fft),
                               rtol=0, atol=1e-9 * float(jnp.max(
                                   jnp.abs(phi_fft))))


def test_potential_mesh_method_parity_f32():
    # f32 planes through HIGHEST-precision matmuls: the two paths agree
    # to f32 roundoff scaled by ~sqrt(M) — the chip story is that
    # jnp.fft does NOT hold this bound on the TPU backend.
    grid = 16
    rng = np.random.default_rng(5)
    mesh = np.zeros((2 * grid,) * 3, np.float32)
    mesh[:grid, :grid, :grid] = rng.uniform(size=(grid,) * 3)
    kern = pm.pm_kernel_hat(grid, h=0.25, eps=0.0, g=1.0, dtype=jnp.float32)
    mj = jnp.asarray(mesh)
    phi_fft = np.asarray(pm.potential_mesh(mj, kern, grid, method="fft"),
                         np.float64)
    phi_mm = np.asarray(pm.potential_mesh(mj, kern, grid, method="matmul"),
                        np.float64)
    scale = np.abs(phi_fft).max()
    assert np.abs(phi_mm - phi_fft).max() < 3e-6 * scale


def test_acc_pm_under_matmul_method_preserves_invariants():
    # Full PM force pass with the matmul transform: identical forces to
    # the fft path (f64) and the PM invariants (momentum conservation)
    # survive the transform swap.
    rng = np.random.default_rng(6)
    n, grid = 192, 16
    pos = jnp.asarray(rng.normal(size=(n, 3)))
    mass = jnp.asarray(rng.uniform(0.5, 1.5, n))
    box_min, h = pm.measure_box(pos, grid=grid)
    kern = pm.pm_kernel_hat(grid, h, eps=0.0, g=1.0, dtype=jnp.float64)
    old = pm.PM_FFT_METHOD
    try:
        pm.PM_FFT_METHOD = "fft"
        a_fft = np.asarray(pm.acc_pm(pos, mass, kernel_hat=kern,
                                     box_min=box_min, h=h, grid=grid))
        pm.PM_FFT_METHOD = "matmul"
        a_mm = np.asarray(pm.acc_pm(pos, mass, kernel_hat=kern,
                                    box_min=box_min, h=h, grid=grid))
    finally:
        pm.PM_FFT_METHOD = old
    scale = np.linalg.norm(a_fft, axis=1).max()
    assert np.abs(a_mm - a_fft).max() < 1e-9 * scale
    ptot = np.asarray(mass)[:, None] * a_mm
    assert np.abs(ptot.sum(axis=0)).max() < 1e-9 * np.abs(ptot).sum()


def test_fft_method_resolution():
    assert pm.fft_method("fft") == "fft"
    assert pm.fft_method("matmul") == "matmul"
    # auto on the CPU test backend -> the recursive FFT
    assert pm.fft_method("auto") == "fft"
    with pytest.raises(ValueError):
        pm.fft_method("dct")


def test_sharded_pm_matmul_method_traces_and_matches():
    # The TPU multi-chip path routes the replicated Poisson solve through
    # the matmul DFT (PM_FFT_METHOD auto -> matmul on TPU); trace the SAME
    # shape on the 8-device CPU mesh with the method forced, and pin
    # sharded == single-device under it.
    from spacetpu import sim as sim_mod
    from spacetpu.parallel import pmshard, ring
    from spacetpu.state import make_state

    rng = np.random.default_rng(12)
    n = 256
    pos = rng.normal(size=(n, 3))
    mass = rng.uniform(0.5, 1.5, n)
    vel = np.zeros_like(pos)
    old = pm.PM_FFT_METHOD
    try:
        pm.PM_FFT_METHOD = "matmul"
        single = sim_mod.make_simulation(n=n, algorithm="pm", backend="xla",
                                         g=1.0, pm_grid=16)
        s1 = single.prime(make_state(pos, vel, mass, dtype=jnp.float64))
        s1 = single.run(s1, 1e-3, 5)
        mesh = ring.make_mesh(8)
        sh = pmshard.ShardedPMSimulation(mesh, n, grid=16, g=1.0)
        ts = sh.shard_state(make_state(pos, vel, mass, dtype=jnp.float64))
        ts = sh.prime(ts)
        ts = sh.run(ts, 1e-3, 5)
    finally:
        pm.PM_FFT_METHOD = old
    np.testing.assert_allclose(np.asarray(ts.pos), np.asarray(s1.pos),
                               rtol=1e-8, atol=1e-12)


def test_kernel_hat_from_corner_matches_rfftn():
    """The cosine-fold spectrum of an even kernel equals np.fft.rfftn of
    the mirrored doubled mesh (the host construction it replaces)."""
    grid = 8
    m = 2 * grid
    rng = np.random.default_rng(3)
    corner = rng.standard_normal((grid + 1,) * 3)
    # mirror to the even (m, m, m) mesh: x[d] with d -> min(d, m - d)
    idx = np.minimum(np.arange(m), m - np.arange(m))
    full = corner[np.ix_(idx, idx, idx)]
    want = np.fft.rfftn(full).real
    got = np.asarray(fftmm.kernel_hat_from_corner(
        jnp.asarray(corner, jnp.float64), grid))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9 * np.abs(
        want).max())


def test_poly_kernel_device_matches_host():
    """The device-built poly kernel spectrum tracks the host f64 path to
    transform roundoff at the dtype in use."""
    from spacetpu.ops import treepm

    grid, h = 16, 0.37
    rs, rcut = treepm.split_params(h)
    host = np.asarray(treepm.pm_kernel_hat_poly(grid, h, rcut, g=1.0,
                                                dtype=jnp.float64))
    dev = np.asarray(treepm.pm_kernel_hat_poly_device(grid, h, rcut, g=1.0,
                                                      dtype=jnp.float64))
    np.testing.assert_allclose(dev, host, rtol=0,
                               atol=1e-9 * np.abs(host).max())


def test_make_kernel_hat_device_routing(monkeypatch):
    """make_kernel_hat routes poly to the device build at large grids;
    the two constructions agree through the public entry."""
    from spacetpu.ops import treepm

    grid, h = 16, 0.5
    rs, rcut = treepm.split_params(h)
    host = np.asarray(treepm.make_kernel_hat("poly", grid, h, rs, rcut,
                                             g=1.0, dtype=jnp.float64))
    monkeypatch.setattr(treepm, "KERNEL_DEVICE_MIN_GRID", 16)
    dev = np.asarray(treepm.make_kernel_hat("poly", grid, h, rs, rcut,
                                            g=1.0, dtype=jnp.float64))
    np.testing.assert_allclose(dev, host, rtol=0,
                               atol=1e-9 * np.abs(host).max())
