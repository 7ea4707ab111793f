"""Spindle-cusp conductor boundary-element solver — completed.

The reference's spindle.js (makeSpindleCuspPlasmaField, spindle.js:31-656)
is work-in-progress dead code with defects that would throw at runtime
(SURVEY.md §2.4), but its intent is legible:

* a perfectly conducting (flux-excluding, i.e. high-beta plasma) boundary —
  a circular arc of radius ``radius*sqrt(1+a^2)``, a = 0.4, centered at
  (radius, 0), running from the axis at z = 0.4*radius to the midplane
  (spindle.js:140-158), mirrored antisymmetrically about z = height/2
  (the vertical-reflection terms of spindle.js:558-614);
* sitting in the field of two opposed fixed coils (+I at z=0, -I at
  z=height, r=radius; spindle.js:504-523);
* surface currents discretized into loops on the arc, solved so the normal
  component of B vanishes at collocation points:
  A x = b, A[p, l] = B_n at point p per unit current in loop l,
  b[p] = -B_n from the fixed coils (spindle.js:632-636).

Completion notes (reference bugs fixed / reformulations, SURVEY.md §2.4
"replicate the intent, not the bugs"):

* angle spacing divided by 1000 instead of n_loops (spindle.js:152,161-162);
* the never-supplied ``spec.current`` (spindle.js:512,518);
* the z-mirror used (1 - z) on *physical* coordinates (spindle.js:580,600);
* basis: the reference superposes adjacent-loop *difference* pairs
  (+loop_l, -loop_{l+1}), a discrete-derivative basis whose collocation
  matrix is catastrophically ill-conditioned (cond ~ 1e8 measured; its
  10-iteration Jacobi could never have converged).  We solve in the
  equivalent single-loop basis — one mirrored loop per arc node, offset a
  half element from the collocation points exactly as the reference offsets
  loops from points — which is well-conditioned and yields the same surface
  current distribution in the continuum limit;
* element fields use the exact elliptic-integral loop field
  (ops/fields.current_loop_b_exact) instead of the two-table approximation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fields import current_loop_b_exact, grid_coords


class SpindleGeometry(NamedTuple):
    points: jax.Array    # (n, 2) collocation points (r, z), meters
    normals: jax.Array   # (n, 2) outward normals (n_r, n_z)
    loops: jax.Array     # (n, 2) basis loop positions (r, z)


def build_geometry(radius: float, height: float, n_loops: int,
                   a: float = 0.4) -> SpindleGeometry:
    """Arc geometry of spindle.js:140-198 (angle spacing corrected).

    The arc: center (radius, 0), radius R = radius*sqrt(1+a^2), parameter
    phi in [pi + alpha, pi + alpha + (pi/2 - 2*alpha)], alpha = atan(a);
    point (x, z) = (R*cos(-phi) + radius, R*sin(-phi)); normal
    (-cos(-phi), -sin(-phi)) (spindle.js:154-158).  Collocation points at
    half-integer angles (l + 0.5); basis loops at integer angles l = 1..n
    (skipping the degenerate r = 0 loop where the arc meets the axis),
    preserving the reference's half-element point/loop offset.
    """
    big_r = radius * np.sqrt(1 + a * a)
    alpha = np.arctan(a)
    theta = alpha + np.pi
    arc = 0.5 * np.pi - 2.0 * alpha

    def arc_point(phi):
        return np.stack([big_r * np.cos(-phi) + radius,
                         big_r * np.sin(-phi)], axis=-1)

    p = np.arange(n_loops)
    phi_pts = (p + 0.5) * arc / n_loops + theta
    points = arc_point(phi_pts)
    normals = np.stack([-np.cos(-phi_pts), -np.sin(-phi_pts)], axis=-1)

    # Loops strictly interior to the arc: the endpoint loops are degenerate
    # (r = 0 at the axis; self-cancelling with its own mirror at the
    # midplane), so distribute n loops at (l+1)/(n+1) fractions of the arc.
    phi_loops = (p + 1.0) * arc / (n_loops + 1.0) + theta
    loops = arc_point(phi_loops)
    return SpindleGeometry(
        points=jnp.asarray(points, jnp.float32),
        normals=jnp.asarray(normals, jnp.float32),
        loops=jnp.asarray(loops, jnp.float32),
    )


def element_field(r: jax.Array, z: jax.Array, loop: jax.Array,
                  height: float) -> jax.Array:
    """Field of one unit-current mirrored-loop basis element at (r, z):
    +loop at z_l, -loop at height - z_l (the antisymmetric cusp pairing of
    spindle.js:577-590)."""
    r0 = jnp.maximum(loop[0], 1e-4)
    return (current_loop_b_exact(r, z, r0, loop[1], 1.0)
            - current_loop_b_exact(r, z, r0, height - loop[1], 1.0))


def coil_field(r: jax.Array, z: jax.Array, radius: float, height: float,
               current: float) -> jax.Array:
    """The two fixed external coils: +I at z=0, -I at z=height, r=radius
    (spindle.js:504-523)."""
    return (current_loop_b_exact(r, z, radius, 0.0, current)
            + current_loop_b_exact(r, z, radius, height, -current))


@functools.partial(jax.jit, static_argnames=("height",))
def _bem_matrix(geom: SpindleGeometry, height: float) -> jax.Array:
    """A[p, l] = n_p . B(element_l; point_p) — vmapped over (point, element)."""

    def entry(point, normal, loop):
        f = element_field(point[0], point[1], loop, height)
        return normal[0] * f[..., 0] + normal[1] * f[..., 2]

    per_point = jax.vmap(
        lambda pt, nm: jax.vmap(lambda lp: entry(pt, nm, lp))(geom.loops))
    return per_point(geom.points, geom.normals)


def solve_surface_currents(
    radius: float, height: float, coil_current: float,
    n_loops: int = 256, method: str = "direct",
    tolerance: float = 1e-3, max_iterations: int = 10,
) -> tuple[SpindleGeometry, jax.Array, dict]:
    """Solve A x = b for the flux-excluding surface currents.

    Returns (geometry, currents, info).  ``method='jacobi'`` reproduces the
    reference's solver call (tol 1e-3, <=10 iterations, spindle.js:632-636).
    """
    geom = build_geometry(radius, height, n_loops)
    a = _bem_matrix(geom, height)
    incident = coil_field(geom.points[:, 0], geom.points[:, 1],
                          radius, height, coil_current)
    b = -(geom.normals[:, 0] * incident[:, 0] + geom.normals[:, 1] * incident[:, 2])

    if method == "direct":
        # Config-time host solve in float64 (f32 triangular solves lose ~2
        # digits on the BEM matrix).
        currents = jnp.asarray(
            np.linalg.solve(np.asarray(a, np.float64), np.asarray(b, np.float64)),
            jnp.float32)
        info = {"method": "direct"}
    elif method == "jacobi":
        from ..ops.solvers import weighted_jacobi

        out = weighted_jacobi(a, b, tolerance=tolerance,
                              max_iterations=max_iterations)
        currents = out.result
        info = {"method": "jacobi", "iterations": int(out.iterations),
                "diff": float(out.diff), "correlation": float(out.correlation)}
    else:
        raise ValueError(f"unknown method {method!r}")
    return geom, currents, info


def spindle_cusp_field(
    radius: float, height: float, nr: int, nz: int,
    coil_current: float, n_power: int = 3, method: str = "direct",
    include_coils: bool = False,
) -> jax.Array:
    """Grid field of the solved surface currents (the superposition loop of
    spindle.js:639-654), on the (nr, nz) normalized grid of the pusher.

    ``n_power`` sizes the system like the reference's solver coupling:
    n_loops = 4*(2^n_power)^2 (matrix_webgl.js:44-54 via spindle.js:64).
    Returns (nr, nz, 3) with components (B_r, B_theta, B_z); add to the
    pusher's B (the intent of empic.js:1369-1378).
    """
    n_loops = 4 * (2 ** n_power) ** 2
    geom, currents, _ = solve_surface_currents(
        radius, height, coil_current, n_loops=n_loops, method=method)

    u, v = grid_coords(nr, nz)
    r_phys = jnp.broadcast_to(u * radius, (nr, nz))
    z_phys = jnp.broadcast_to(v * height, (nr, nz))

    def add_element(carry, inputs):
        loop, cur = inputs
        return carry + cur * element_field(r_phys, z_phys, loop, height), None

    init = jnp.zeros((nr, nz, 3), jnp.float32)
    total, _ = jax.lax.scan(add_element, init, (geom.loops, currents))
    if include_coils:
        total = total + coil_field(r_phys, z_phys, radius, height, coil_current)
    return total
