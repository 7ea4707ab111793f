"""Spindle BEM tests: the solved surface currents must cancel the normal
field on the conductor (the physical statement of the boundary condition)."""

import numpy as np
import jax.numpy as jnp

from fusion_sim_tpu.models import spindle


def test_geometry_arc_endpoints():
    """Arc runs from the axis at z = 0.4*radius down to the midplane edge
    (spindle.js:140-158 geometry with corrected spacing)."""
    geom = spindle.build_geometry(1.0, 2.0, 64)
    pts = np.asarray(geom.points)
    # first point near the axis at z ~ 0.4
    assert pts[0, 0] < 0.05 and abs(pts[0, 1] - 0.4) < 0.05
    # last point near (0.6, 1.0) — the midplane
    assert abs(pts[-1, 0] - 0.6) < 0.05 and abs(pts[-1, 1] - 1.0) < 0.05
    # normals are unit
    np.testing.assert_allclose(np.linalg.norm(np.asarray(geom.normals), axis=1),
                               1.0, rtol=1e-5)


def test_normal_field_cancellation():
    """After the solve, B_n(total) at collocation points is tiny compared to
    the incident coil field."""
    radius, height, current = 1.0, 2.0, 1e6
    geom, currents, info = spindle.solve_surface_currents(
        radius, height, current, n_loops=64, method="direct")
    incident = spindle.coil_field(geom.points[:, 0], geom.points[:, 1],
                                  radius, height, current)
    bn_inc = (geom.normals[:, 0] * incident[:, 0]
              + geom.normals[:, 1] * incident[:, 2])

    # total normal field = incident + sum of elements
    def element_bn(lp, c):
        f = spindle.element_field(geom.points[:, 0], geom.points[:, 1],
                                  lp, height)
        return c * (geom.normals[:, 0] * f[:, 0] + geom.normals[:, 1] * f[:, 2])

    total_bn = np.asarray(bn_inc).copy()
    for i in range(64):
        total_bn += np.asarray(element_bn(geom.loops[i], currents[i]))
    scale = np.abs(np.asarray(bn_inc)).max()
    assert np.abs(total_bn).max() < 1e-3 * scale, (np.abs(total_bn).max(), scale)


def test_grid_field_midplane_antisymmetry():
    """The element construction is antisymmetric about z = height/2, so the
    induced B_z must vanish... be antisymmetric there like the cusp field."""
    b = np.asarray(spindle.spindle_cusp_field(1.0, 2.0, 24, 48, 1e6, n_power=1))
    assert np.isfinite(b).all()
    # B_r symmetric, B_z antisymmetric about the midplane (cusp symmetry)
    np.testing.assert_allclose(b[:, :24, 2], -b[:, :23:-1, 2], atol=1e-3 * np.abs(b[..., 2]).max())
    np.testing.assert_allclose(b[:, :24, 0], b[:, :23:-1, 0], atol=1e-3 * np.abs(b[..., 0]).max())


def test_jacobi_method_parity_path():
    """The reference's solver call (tol 1e-3, <=10 Jacobi iterations,
    spindle.js:632-636) runs and reports its (non-)convergence honestly."""
    geom, currents, info = spindle.solve_surface_currents(
        1.0, 2.0, 1e6, n_loops=16, method="jacobi")
    assert info["method"] == "jacobi"
    assert info["iterations"] <= 10
    assert np.isfinite(np.asarray(currents)).all()
