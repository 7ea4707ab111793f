"""Magnetic-field construction ops.

TPU-native re-implementations of the reference's field-building shader
programs, each a pure jittable function over the whole (nr, nz) grid:

* ``current_loop_shape_table`` / ``current_loop_b_table`` — the two-table
  Biot-Savart scheme of ``programCurrentLoopShape`` / ``programCurrentLoop``
  (empic.js:295-389): a unit-current loop's field is tabulated once by
  1000-point midpoint quadrature over azimuth at loop radius R=0.5 (near-axis
  table) and R=0.1 (far-field table), then any loop (R, Z, I) is a scaled,
  translated NEAREST lookup with z-mirror symmetry via sign(b)
  (empic.js:368-377).
* ``current_loop_b_exact`` — closed form via complete elliptic integrals
  (the modern path; vmapped over the grid).
* ``line_current_b`` — axial line current B_theta = mu0*I/(2*pi*r)
  (``programCurrentZ``, empic.js:392-414).
* ``uniform_bz`` / ``uniform_btheta`` — constant fields
  (``programBZ``/``programBTheta``, empic.js:417-464).

Grid/layout conventions (match the reference texture layout):
fields are ``(nr, nz, 3)`` arrays with components ``(B_r, B_theta, B_z)``
sampled at texel centers ``u=(i+0.5)/nr, v=(j+0.5)/nz`` of the *normalized*
domain (r scaled by 1/radius, z by 1/height — empic.js:45-46).

Fidelity note: the reference's quadrature runs over the half-circle with
weight 0.001 and constant ``R*0.001*mu0/(4*pi)`` (empic.js:314-324), which
yields 1/(2*pi) of the physical loop field, computed in *normalized*
(anisotropically scaled) coordinates.  ``mode='table'`` replicates those
semantics exactly for parity; ``mode='exact'`` gives the physical field in
physical coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import MU_0, PI


def grid_coords(nr: int, nz: int) -> tuple[jax.Array, jax.Array]:
    """Texel-center coordinates of the (nr, nz) field grid in [0,1]^2.

    Mirrors WebGL texcoords: u=(i+0.5)/nr along r, v=(j+0.5)/nz along z.
    Returns broadcastable ``(nr, 1)`` and ``(1, nz)`` arrays.
    """
    u = (jnp.arange(nr, dtype=jnp.float32) + 0.5) / nr
    v = (jnp.arange(nz, dtype=jnp.float32) + 0.5) / nz
    return u[:, None], v[None, :]


def nearest_lookup_2d(table: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """NEAREST/CLAMP texture sampling of a ``(W, H, C)`` table at (u, v) in [0,1].

    Matches the reference texture filtering (utilities.js:556-560: NEAREST,
    CLAMP_TO_EDGE): texel index = clamp(floor(u*W), 0, W-1).
    """
    w, h = table.shape[0], table.shape[1]
    iu = jnp.clip(jnp.floor(u * w).astype(jnp.int32), 0, w - 1)
    iv = jnp.clip(jnp.floor(v * h).astype(jnp.int32), 0, h - 1)
    return table[iu, iv]


@functools.partial(jax.jit, static_argnums=(0, 1))
def current_loop_shape_table(nr: int, nz: int, loop_radius: float | jax.Array) -> jax.Array:
    """Tabulate the unit-current loop field over the normalized grid.

    Parity target: ``programCurrentLoopShape`` (empic.js:295-345) — midpoint
    quadrature with 1000 azimuthal points over the half circle:

        constant = R * 0.001 * mu0 / (4*pi)
        cos_i    = cos(pi*(i+0.5)/1000)
        d_i      = sqrt(R^2 + x^2 + y^2 - 2*x*R*cos_i)
        B_x     += y * constant/d^3 * cos_i
        B_z     += constant/d^3 * (R - x*cos_i)

    Returns ``(nr, nz, 3)`` with components (B_r, 0, B_z) of a unit loop of
    radius ``loop_radius`` centered at the origin, evaluated at (x=r, y=z)
    texel centers in [0,1]^2.
    """
    x, y = grid_coords(nr, nz)  # (nr,1), (1,nz)
    big_r = jnp.float32(loop_radius)
    constant = big_r * 0.001 * MU_0 / (4.0 * PI)

    i = jnp.arange(1000, dtype=jnp.float32)
    cosine = jnp.cos(PI * (i + 0.5) / 1000.0)  # (1000,)

    def accumulate(carry, cos_i):
        bx, bz = carry
        d = jnp.sqrt(big_r * big_r + x * x + y * y - 2.0 * x * big_r * cos_i)
        factor = jnp.where(d > 0.0, constant / (d * d * d), 0.0)
        bx = bx + y * factor * cos_i
        bz = bz + factor * (big_r - x * cos_i)
        return (bx, bz), None

    zero = jnp.zeros((nr, nz), dtype=jnp.float32)
    (bx, bz), _ = jax.lax.scan(accumulate, (zero, zero), cosine)
    return jnp.stack([bx, jnp.zeros_like(bx), bz], axis=-1)


def make_loop_tables(nr: int, nz: int) -> tuple[jax.Array, jax.Array]:
    """The two precomputed shape tables of empic.js:333-345.

    ``half``  — loop radius 0.5, used near the axis (lookup scale 1/2).
    ``tenth`` — loop radius 0.1, used far away (lookup scale 1/10).
    """
    half = current_loop_shape_table(nr, nz, 0.5)
    tenth = current_loop_shape_table(nr, nz, 0.1)
    return half, tenth


@jax.jit
def current_loop_b_table(
    half: jax.Array,
    tenth: jax.Array,
    loop_r: jax.Array,
    loop_z: jax.Array,
    current: jax.Array,
) -> jax.Array:
    """Field of a loop at (normalized) (loop_r, loop_z) carrying ``current``.

    Parity target: ``programCurrentLoop`` (empic.js:349-389): with
    a = r/R, b = (z-Z)/R, the field is I * (sign(b), 1, 1) *
    table(a/s, |b|/s) using the tenth table (s=10) when a>2 or b>2, else the
    half table (s=2).  NEAREST lookups, matching texture filtering.

    Returns ``(nr, nz, 3)``; accumulate loops by summation (the reference
    accumulates with additive blending, empic.js:1358-1361).
    """
    nr, nz = half.shape[0], half.shape[1]
    x, y = grid_coords(nr, nz)
    a = x / loop_r
    b = (y - loop_z) / loop_r
    use_tenth = jnp.logical_or(a > 2.0, b > 2.0)

    field_half = nearest_lookup_2d(half, a / 2.0, jnp.abs(b) / 2.0)
    field_tenth = nearest_lookup_2d(tenth, a / 10.0, jnp.abs(b) / 10.0)
    field = jnp.where(use_tenth[..., None], field_tenth, field_half)
    sign = jnp.stack([jnp.sign(b), jnp.ones_like(b), jnp.ones_like(b)], axis=-1)
    return current * sign * field


def _ellipke(m: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Complete elliptic integrals K(m), E(m) (parameter m = k^2).

    Abramowitz & Stegun 17.3.34 / 17.3.36 polynomial approximations
    (|error| < 2e-8), valid for 0 <= m < 1.  Used by the exact loop field.
    """
    m1 = jnp.clip(1.0 - m, 1e-12, 1.0)
    ln = -jnp.log(m1)  # log(1/m1) without the division
    ka = ((0.01451196212 * m1 + 0.03742563713) * m1 + 0.03590092383) * m1 + 0.09666344259
    ka = ka * m1 + 1.38629436112
    kb = ((0.00441787012 * m1 + 0.03328355346) * m1 + 0.06880248576) * m1 + 0.12498593597
    kb = kb * m1 + 0.5
    big_k = ka + kb * ln
    ea = ((0.01736506451 * m1 + 0.04757383546) * m1 + 0.0626060122) * m1 + 0.44325141463
    ea = ea * m1 + 1.0
    eb = ((0.00526449639 * m1 + 0.04069697526) * m1 + 0.09200180037) * m1 + 0.2499836831
    eb = eb * m1
    big_e = ea + eb * ln
    return big_k, big_e


def current_loop_b_exact(
    r: jax.Array, z: jax.Array, loop_r: jax.Array, loop_z: jax.Array, current: jax.Array
) -> jax.Array:
    """Physical field of a circular current loop, closed form.

    B_r and B_z of a loop of radius ``loop_r`` at height ``loop_z`` carrying
    ``current`` amps, evaluated at cylindrical (r, z) in *meters* (any
    broadcastable shapes).  Standard elliptic-integral solution; on-axis limit
    B_z = mu0*I*R^2 / (2*(R^2+z^2)^{3/2}) handled explicitly.

    This is the modern replacement for the reference's two-table
    approximation (empic.js:295-389); returns stacked (B_r, 0, B_z).
    """
    dz = z - loop_z
    rho = jnp.maximum(r, 0.0)
    dz2 = dz * dz
    denom = (loop_r + rho) ** 2 + dz2
    inv_denom = 1.0 / denom
    m = (4.0 * loop_r) * rho * inv_denom
    big_k, big_e = _ellipke(m)
    inv_alpha2 = 1.0 / ((loop_r - rho) ** 2 + dz2)
    pref = (MU_0 / (2.0 * PI)) * current * jax.lax.rsqrt(denom)
    inv_rho = 1.0 / jnp.where(rho > 1e-9 * loop_r, rho, 1.0)
    r2 = loop_r * loop_r
    rho2 = rho * rho
    br = pref * (dz * inv_rho) * ((r2 + rho2 + dz2) * inv_alpha2 * big_e - big_k)
    bz = pref * (big_k + (r2 - rho2 - dz2) * inv_alpha2 * big_e)
    ax = r2 + dz2
    on_axis_bz = (0.5 * MU_0) * current * r2 * jax.lax.rsqrt(ax) / ax
    on_axis = rho <= 1e-9 * loop_r
    br = jnp.where(on_axis, 0.0, br)
    bz = jnp.where(on_axis, on_axis_bz, bz)
    zeros = jnp.zeros_like(br)
    return jnp.stack([br, zeros, bz], axis=-1)


def line_current_b(nr: int, nz: int, current: jax.Array) -> jax.Array:
    """Axial line current: B_theta = mu0*I/(2*pi*r) on the normalized grid.

    Parity target: ``programCurrentZ`` (empic.js:392-414).
    """
    x, _ = grid_coords(nr, nz)
    btheta = current * MU_0 / (2.0 * PI * x)
    btheta = jnp.broadcast_to(btheta, (nr, nz))
    zeros = jnp.zeros((nr, nz), dtype=jnp.float32)
    return jnp.stack([zeros, btheta, zeros], axis=-1)


def uniform_bz(nr: int, nz: int, bz: jax.Array) -> jax.Array:
    """Uniform axial field (``programBZ``, empic.js:417-439)."""
    field = jnp.zeros((nr, nz, 3), dtype=jnp.float32)
    return field.at[..., 2].set(jnp.float32(bz))


def uniform_btheta(nr: int, nz: int, btheta: jax.Array) -> jax.Array:
    """Uniform azimuthal field (``programBTheta``, empic.js:442-464)."""
    field = jnp.zeros((nr, nz, 3), dtype=jnp.float32)
    return field.at[..., 1].set(jnp.float32(btheta))
