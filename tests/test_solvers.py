"""Solver tests: Jacobi vs numpy.linalg.solve (the SURVEY.md §4 oracle),
the reference's 16x16 diagonal smoke test (fusionsim.js:35-67), FFT Poisson
vs manufactured solutions, CG."""

import numpy as np
import jax.numpy as jnp

from fusion_sim_tpu.ops.solvers import (
    conjugate_gradient,
    gradient_periodic,
    make_sor_iterative,
    poisson_fft,
    weighted_jacobi,
)


def test_reference_smoke_test_diagonal():
    """The commented-out smoke test of fusionsim.js:35-67: a 16x16 random
    diagonal system solved to 1e-3 (n_power=1 -> vec_length=16)."""
    rng = np.random.default_rng(0)
    eq = make_sor_iterative({"n_power": 1, "relaxation": 1.0})
    assert eq.vec_length == 16 and eq.vec_height == 2
    a = np.zeros((16, 16), np.float32)
    d = rng.random(16).astype(np.float32) + 0.1
    np.fill_diagonal(a, d)
    b = rng.random(16).astype(np.float32)
    result = eq.set_matrix(a).set_b(b).solve(
        {"tolerance": 1e-3, "substep": 1, "max_iterations": 100})
    np.testing.assert_allclose(np.asarray(result["result"]), b / d, rtol=1e-4)
    assert result["iterations"] <= 100
    assert result["diff"] <= 1e-3


def test_jacobi_vs_numpy_dense():
    """Diagonally dominant dense system vs numpy.linalg.solve."""
    rng = np.random.default_rng(1)
    n = 64
    a = rng.random((n, n)).astype(np.float32) * 0.5
    a += np.diag(np.abs(a).sum(axis=1) + 1.0)
    b = rng.random(n).astype(np.float32)
    out = weighted_jacobi(a, b, tolerance=1e-6, max_iterations=500)
    expected = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(out.result), expected, rtol=1e-3)
    assert float(out.correlation) > 0.999


def test_jacobi_under_relaxation():
    """omega < 1 still converges to the same solution."""
    rng = np.random.default_rng(2)
    n = 32
    a = rng.random((n, n)).astype(np.float32) * 0.3
    a += np.diag(np.abs(a).sum(axis=1) + 1.0)
    b = rng.random(n).astype(np.float32)
    out = weighted_jacobi(a, b, tolerance=1e-7, max_iterations=2000, omega=0.7)
    expected = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(out.result), expected, rtol=1e-3)


def test_jacobi_max_iterations_respected():
    rng = np.random.default_rng(3)
    n = 16
    a = rng.random((n, n)).astype(np.float32) * 0.4
    a += np.diag(np.abs(a).sum(axis=1) + 1.0)
    b = rng.random(n).astype(np.float32)
    out = weighted_jacobi(a, b, tolerance=1e-30, max_iterations=7)
    assert int(out.iterations) == 7


def test_cg_vs_numpy():
    rng = np.random.default_rng(4)
    n = 48
    m = rng.random((n, n)).astype(np.float32)
    a = m @ m.T + n * np.eye(n, dtype=np.float32)  # SPD
    b = rng.random(n).astype(np.float32)
    out = conjugate_gradient(a, b, tolerance=1e-6, max_iterations=500)
    expected = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(out.result), expected, rtol=1e-3, atol=1e-6)


def test_poisson_fft_manufactured_2d():
    """phi = sin(kx x) sin(ky y) -> rho = eps0 (kx^2+ky^2) phi."""
    nx, ny = 64, 32
    lx, ly = 2 * np.pi, 4 * np.pi
    dx = (lx / nx, ly / ny)
    x = np.arange(nx) * dx[0]
    y = np.arange(ny) * dx[1]
    X, Y = np.meshgrid(x, y, indexing="ij")
    kx, ky = 2.0, 1.0
    phi_true = np.sin(kx * X) * np.sin(ky * Y)
    rho = (kx**2 + ky**2) * phi_true  # eps0 = 1
    phi = np.asarray(poisson_fft(jnp.asarray(rho, jnp.float32), dx))
    np.testing.assert_allclose(phi, phi_true, atol=2e-5)


def test_poisson_fft_1d_and_3d():
    n = 64
    L = 2 * np.pi
    d = L / n
    x = np.arange(n) * d
    rho1 = np.sin(3 * x) * 9.0
    phi1 = np.asarray(poisson_fft(jnp.asarray(rho1, jnp.float32), (d,)))
    np.testing.assert_allclose(phi1, np.sin(3 * x), atol=1e-5)

    n3 = 16
    d3 = L / n3
    g = np.arange(n3) * d3
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    phi_true = np.sin(X) * np.sin(Y) * np.sin(Z)
    rho3 = 3.0 * phi_true
    phi3 = np.asarray(poisson_fft(jnp.asarray(rho3, jnp.float32), (d3, d3, d3)))
    np.testing.assert_allclose(phi3, phi_true, atol=1e-5)


def test_gradient_periodic():
    n = 128
    L = 2 * np.pi
    d = L / n
    x = np.arange(n) * d
    phi = np.sin(x).astype(np.float32)
    (g,) = gradient_periodic(jnp.asarray(phi), (d,))
    # central difference of sin -> cos * sin(d)/d factor
    np.testing.assert_allclose(np.asarray(g), np.cos(x) * np.sin(d) / d, atol=1e-5)


def test_poisson_dft2d_matches_fft_and_exact_bf16_tracks():
    """The dense-DFT MXU solve matches the FFT solve spectrally, and its
    exact_bf16 (3-term split) variant tracks 'highest' at the ~2^-18 grade
    the fused kernels use."""
    import numpy as np

    from fusion_sim_tpu.ops.solvers import poisson_dft2d, poisson_fft

    rng = np.random.default_rng(11)
    rho = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    rho = rho - jnp.mean(rho)
    dx = (0.3, 0.25)
    ref = poisson_fft(rho, dx)
    hi = poisson_dft2d(rho, dx)
    bf = poisson_dft2d(rho, dx, precision="exact_bf16")
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(hi), np.asarray(ref),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(bf), np.asarray(hi),
                               atol=1e-4 * scale)
