"""Moment-deposition tests: conservation, bell-splat factorization oracle,
normalization and EMA semantics (empic.js:936-1084)."""

import jax.numpy as jnp
import numpy as np

from fusion_sim_tpu.ops.deposit import (
    bell_kernel,
    deposit_moments,
    ema_moments,
    normalize_moments,
)


def test_bell_kernel_properties():
    k = np.asarray(bell_kernel())
    assert k.shape == (11, 11)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    # radially symmetric, peaked at center
    assert k[5, 5] == k.max()
    np.testing.assert_allclose(k, k[::-1, :], rtol=1e-6)
    np.testing.assert_allclose(k, k[:, ::-1], rtol=1e-6)
    # zero at corner distance > mid
    assert k[0, 0] == 0.0


def test_total_weight_conservation_interior():
    """Each interior particle deposits total weight exactly 0.001 (the bell
    sums to 1; empic.js:966-971, 1008)."""
    nr = nz = 64
    pos = jnp.array([[0.5, 0.0, 0.5], [0.3, 0.1, 0.7]], jnp.float32)
    vel = jnp.array([[0.001, 0.0, 0.0], [0.0, 0.002, 0.001]], jnp.float32)
    m = np.asarray(deposit_moments(pos, vel, nr, nz))
    np.testing.assert_allclose(m[..., 3].sum(), 0.001 * 2, rtol=1e-5)


def test_single_particle_splat_oracle():
    """One particle -> scatter+conv must equal a direct 11x11 stencil splat."""
    nr = nz = 32
    pos = jnp.array([[0.5, 0.0, 0.5]], jnp.float32)
    vel = jnp.array([[0.002, 0.0, 0.001]], jnp.float32)
    m = np.asarray(deposit_moments(pos, vel, nr, nz))

    # oracle: nearest cell + centered bell
    ir, iz = int(0.5 * nr), int(0.5 * nz)
    bell = np.asarray(bell_kernel())
    expected = np.zeros((nr, nz, 4), dtype=np.float32)
    # local frame at (x=0.5, y=0): vr = vx, va = vy
    color = 0.001 * np.array([0.002, 0.0, 0.001, 1.0], dtype=np.float32)
    for di in range(-5, 6):
        for dj in range(-5, 6):
            expected[ir + di, iz + dj] += color * bell[di + 5, dj + 5]
    np.testing.assert_allclose(m, expected, rtol=1e-5, atol=1e-12)


def test_normalize_moments_semantics():
    """rgb/a mean-velocity + 1000*0.5/r volume weighting (empic.js:1048-1060)."""
    nr = nz = 4
    m = np.zeros((nr, nz, 4), dtype=np.float32)
    m[2, 1] = [0.004, 0.002, 0.0, 0.002]  # sum v*w, sum w
    out = np.asarray(normalize_moments(jnp.asarray(m)))
    u = (2 + 0.5) / nr
    np.testing.assert_allclose(out[2, 1, 0], 1000 * (0.004 / 0.002) * 0.5 / u, rtol=1e-5)
    np.testing.assert_allclose(out[2, 1, 3], 1000 * 0.002 * 0.5 / u, rtol=1e-5)
    # empty cells stay zero (no 0/0)
    assert np.all(out[0, 0] == 0.0)
    assert np.isfinite(out).all()


def test_ema():
    a = jnp.ones((2, 2, 4)) * 2.0
    b = jnp.zeros((2, 2, 4))
    out = np.asarray(ema_moments(a, b))
    np.testing.assert_allclose(out, 0.01 * 2.0, rtol=1e-6)
