"""Field-source tests: loop field vs elliptic-integral closed form, analytic
line-current/uniform fields (oracles per SURVEY.md §4)."""

import numpy as np
import scipy.special

from fusion_sim_tpu.constants import MU_0, PI
from fusion_sim_tpu.ops import fields


def loop_field_scipy(r, z, R, Z, I):
    """Independent elliptic-integral oracle using scipy."""
    dz = z - Z
    m = 4 * R * r / ((R + r) ** 2 + dz**2)
    K = scipy.special.ellipk(m)
    E = scipy.special.ellipe(m)
    denom = np.sqrt((R + r) ** 2 + dz**2)
    alpha2 = (R - r) ** 2 + dz**2
    pref = MU_0 * I / (2 * PI * denom)
    br = pref * dz / r * (-K + (R**2 + r**2 + dz**2) / alpha2 * E)
    bz = pref * (K + (R**2 - r**2 - dz**2) / alpha2 * E)
    return br, bz


def test_exact_loop_vs_scipy():
    r = np.array([0.3, 0.5, 1.2, 2.0], dtype=np.float64)
    z = np.array([0.1, -0.4, 0.8, 3.0], dtype=np.float64)
    out = np.asarray(fields.current_loop_b_exact(r, z, 1.0, 0.0, 1e6))
    br_ref, bz_ref = loop_field_scipy(r, z, 1.0, 0.0, 1e6)
    np.testing.assert_allclose(out[:, 0], br_ref, rtol=2e-5)
    np.testing.assert_allclose(out[:, 2], bz_ref, rtol=2e-5)


def test_exact_loop_on_axis():
    out = np.asarray(fields.current_loop_b_exact(
        np.zeros(3), np.array([0.0, 0.5, 2.0]), 1.0, 0.0, 1.0))
    expected = MU_0 * 1.0 * 1.0**2 / (2 * (1.0 + np.array([0.0, 0.5, 2.0]) ** 2) ** 1.5)
    np.testing.assert_allclose(out[:, 2], expected, rtol=1e-6)
    np.testing.assert_allclose(out[:, 0], 0.0, atol=1e-12)


def test_shape_table_matches_quadrature_oracle():
    """The table kernel must reproduce the reference quadrature semantics
    (empic.js:305-326), including its 1/(2*pi) amplitude convention."""
    nr, nz = 8, 16
    table = np.asarray(fields.current_loop_shape_table(nr, nz, 0.5))
    # Independent NumPy implementation of the same midpoint sum.
    x = (np.arange(nr) + 0.5) / nr
    y = (np.arange(nz) + 0.5) / nz
    X, Y = np.meshgrid(x, y, indexing="ij")
    R = 0.5
    const = R * 0.001 * MU_0 / (4 * PI)
    bx = np.zeros_like(X)
    bz = np.zeros_like(X)
    for i in range(1000):
        c = np.cos(PI * (i + 0.5) / 1000)
        d = np.sqrt(R**2 + X**2 + Y**2 - 2 * X * R * c)
        f = np.where(d > 0, const / d**3, 0.0)
        bx += Y * f * c
        bz += f * (R - X * c)
    np.testing.assert_allclose(table[..., 0], bx, rtol=1e-4)
    np.testing.assert_allclose(table[..., 2], bz, rtol=1e-4)
    assert np.all(table[..., 1] == 0)


def test_table_lookup_mirror_symmetry():
    """sign(b) flips B_r below the loop plane (empic.js:372-376)."""
    nr, nz = 32, 32
    half, tenth = fields.make_loop_tables(nr, nz)
    field = np.asarray(fields.current_loop_b_table(half, tenth, 0.5, 0.5, 1.0))
    # mirror about z=0.5: B_r antisymmetric, B_z symmetric
    np.testing.assert_allclose(field[:, :16, 0], -field[:, 31:15:-1, 0], rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(field[:, :16, 2], field[:, 31:15:-1, 2], rtol=1e-5, atol=1e-12)


def test_line_current():
    out = np.asarray(fields.line_current_b(16, 8, 2.0e6))
    u = (np.arange(16) + 0.5) / 16
    expected = 2.0e6 * MU_0 / (2 * PI * u)
    np.testing.assert_allclose(out[:, 0, 1], expected, rtol=1e-6)
    assert np.all(out[..., 0] == 0) and np.all(out[..., 2] == 0)


def test_uniform_fields():
    bz = np.asarray(fields.uniform_bz(4, 4, 0.25))
    assert np.all(bz[..., 2] == 0.25) and np.all(bz[..., :2] == 0)
    bt = np.asarray(fields.uniform_btheta(4, 4, 0.5))
    assert np.all(bt[..., 1] == 0.5) and np.all(bt[..., 0] == 0) and np.all(bt[..., 2] == 0)
