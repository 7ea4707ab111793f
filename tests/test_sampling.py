"""Inverse-CDF source sampler tests (oracle: histogram vs PDF, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from fusion_sim_tpu.ops.sampling import build_inverse_cdf_table, sample_inverse_cdf


def test_uniform_box_marginals():
    """The default scenario's box source (fusionsim.js:114-122): uniform over
    r-cells [0, 50), z-cells [350, 450) of a 400x800 grid -> samples must be
    uniform in [0, 50/400) x [350/800, 450/800)."""
    nr, nz = 400, 800
    pdf = np.zeros((nr, nz), dtype=np.float32)
    pdf[:50, 350:450] = 1.0
    table = build_inverse_cdf_table(jnp.asarray(pdf))

    key = jax.random.key(1)
    u = jax.random.uniform(key, (200000, 2))
    r, z = sample_inverse_cdf(table, u[:, 0], u[:, 1])
    r = np.asarray(r)
    z = np.asarray(z)

    assert r.min() >= 0.0 and r.max() <= 50 / 400 + 1e-3
    assert z.min() >= 350 / 800 - 1e-3 and z.max() <= 450 / 800 + 1e-3
    # uniformity: mean and variance of uniform on the box
    np.testing.assert_allclose(r.mean(), 25 / 400, rtol=0.02)
    np.testing.assert_allclose(z.mean(), 400 / 800, rtol=0.02)
    np.testing.assert_allclose(r.std(), (50 / 400) / np.sqrt(12), rtol=0.05)
    np.testing.assert_allclose(z.std(), (100 / 800) / np.sqrt(12), rtol=0.05)


def test_nonuniform_marginal_ratio():
    """A two-block PDF with 3:1 weight ratio splits samples 75/25."""
    nr, nz = 64, 64
    pdf = np.zeros((nr, nz), dtype=np.float32)
    pdf[:16, :] = 3.0
    pdf[48:, :] = 1.0
    table = build_inverse_cdf_table(jnp.asarray(pdf))
    key = jax.random.key(2)
    u = jax.random.uniform(key, (100000, 2))
    r, _ = sample_inverse_cdf(table, u[:, 0], u[:, 1])
    r = np.asarray(r)
    frac_low = np.mean(r < 16 / 64)
    np.testing.assert_allclose(frac_low, 0.75, atol=0.01)


def test_table_reference_interpolation_semantics():
    """Spot-check the (i + frac)/n interpolation of empic.js:1296-1311 against
    a direct scalar reimplementation."""
    pdf = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    table = np.asarray(build_inverse_cdf_table(jnp.asarray(pdf), size=8))

    # scalar oracle
    row_sums = pdf.sum(axis=1)          # [3, 7]
    cdf_x = np.cumsum(row_sums) / row_sums.sum()  # [0.3, 1.0]
    for i in range(8):
        f1 = i / 7
        ix = int(np.searchsorted(cdf_x, f1, side="left"))
        ix = min(ix, 1)
        if ix == 0:
            x = (f1 / cdf_x[0]) / 2
        else:
            x = (ix + (f1 - cdf_x[ix - 1]) / (cdf_x[ix] - cdf_x[ix - 1])) / 2
        np.testing.assert_allclose(table[i, 0, 0], x, rtol=1e-5, atol=1e-6)
