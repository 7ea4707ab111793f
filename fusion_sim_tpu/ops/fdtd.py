"""Yee-grid FDTD field updates (2D and 3D, periodic).

The electromagnetic field solve of the full PIC loop (BASELINE.json
configs[2-3]) — the reference has no EM solver (its B is static,
SURVEY.md §0); this is the standard staggered Yee scheme written as pure
rolls/differences that XLA fuses into a handful of elementwise passes.

Staggering (2D, cell (i, j), periodic; "2D3V" = 2D space, 3 velocity/field
components):

    Ex(i+1/2, j)   Ey(i, j+1/2)   Ez(i, j)
    Bx(i, j+1/2)   By(i+1/2, j)   Bz(i+1/2, j+1/2)

3D uses the canonical Yee cube: E components on edge centers, B on face
centers.  Time integration is the leapfrog B(half) -> E(full) -> B(half)
split so both fields are available at integer steps for the particle push.

Fields are packed as a single array with a trailing component axis:
``e[..., 0:3] = (Ex, Ey, Ez)``, ``b[..., 0:3] = (Bx, By, Bz)``.
Units: natural (c = eps0 = mu0 = 1) by default; pass ``c``/``eps0`` to
rescale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _d_plus(f: jax.Array, axis: int, d: float) -> jax.Array:
    """Forward difference (f[i+1]-f[i])/d with periodic wrap."""
    return (jnp.roll(f, -1, axis=axis) - f) / d


def _d_minus(f: jax.Array, axis: int, d: float) -> jax.Array:
    """Backward difference (f[i]-f[i-1])/d with periodic wrap."""
    return (f - jnp.roll(f, 1, axis=axis)) / d


@functools.partial(jax.jit, static_argnames=("dx",))
def curl_e_2d(e: jax.Array, dx: tuple[float, float]) -> jax.Array:
    """(curl E) evaluated at the B staggering points (2D3V)."""
    ex, ey, ez = e[..., 0], e[..., 1], e[..., 2]
    # Bx(i, j+1/2):      (curl E)_x = dEz/dy
    cx = _d_plus(ez, 1, dx[1])
    # By(i+1/2, j):      (curl E)_y = -dEz/dx
    cy = -_d_plus(ez, 0, dx[0])
    # Bz(i+1/2, j+1/2):  (curl E)_z = dEy/dx - dEx/dy
    cz = _d_plus(ey, 0, dx[0]) - _d_plus(ex, 1, dx[1])
    return jnp.stack([cx, cy, cz], axis=-1)


@functools.partial(jax.jit, static_argnames=("dx",))
def curl_b_2d(b: jax.Array, dx: tuple[float, float]) -> jax.Array:
    """(curl B) evaluated at the E staggering points (2D3V)."""
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    # Ex(i+1/2, j):  (curl B)_x = dBz/dy
    cx = _d_minus(bz, 1, dx[1])
    # Ey(i, j+1/2):  (curl B)_y = -dBz/dx
    cy = -_d_minus(bz, 0, dx[0])
    # Ez(i, j):      (curl B)_z = dBy/dx - dBx/dy
    cz = _d_minus(by, 0, dx[0]) - _d_minus(bx, 1, dx[1])
    return jnp.stack([cx, cy, cz], axis=-1)


@functools.partial(jax.jit, static_argnames=("dx",))
def curl_e_3d(e: jax.Array, dx: tuple[float, float, float]) -> jax.Array:
    ex, ey, ez = e[..., 0], e[..., 1], e[..., 2]
    cx = _d_plus(ez, 1, dx[1]) - _d_plus(ey, 2, dx[2])
    cy = _d_plus(ex, 2, dx[2]) - _d_plus(ez, 0, dx[0])
    cz = _d_plus(ey, 0, dx[0]) - _d_plus(ex, 1, dx[1])
    return jnp.stack([cx, cy, cz], axis=-1)


@functools.partial(jax.jit, static_argnames=("dx",))
def curl_b_3d(b: jax.Array, dx: tuple[float, float, float]) -> jax.Array:
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    cx = _d_minus(bz, 1, dx[1]) - _d_minus(by, 2, dx[2])
    cy = _d_minus(bx, 2, dx[2]) - _d_minus(bz, 0, dx[0])
    cz = _d_minus(by, 0, dx[0]) - _d_minus(bx, 1, dx[1])
    return jnp.stack([cx, cy, cz], axis=-1)


def curl_e(e: jax.Array, dx: tuple[float, ...]) -> jax.Array:
    return curl_e_2d(e, dx) if len(dx) == 2 else curl_e_3d(e, dx)


def curl_b(b: jax.Array, dx: tuple[float, ...]) -> jax.Array:
    return curl_b_2d(b, dx) if len(dx) == 2 else curl_b_3d(b, dx)


def advance_b_half(b: jax.Array, e: jax.Array, dt: float,
                   dx: tuple[float, ...]) -> jax.Array:
    """B -> B - (dt/2) curl E (Faraday half-step)."""
    return b - (0.5 * dt) * curl_e(e, dx)


def advance_e_full(e: jax.Array, b: jax.Array, j: jax.Array, dt: float,
                   dx: tuple[float, ...], c: float = 1.0,
                   eps0: float = 1.0) -> jax.Array:
    """E -> E + dt (c^2 curl B - J/eps0) (Ampere full step)."""
    return e + dt * ((c * c) * curl_b(b, dx) - j / eps0)


# Staggering offsets, in grid units, of each field component relative to the
# cell-corner node lattice (gathers shift particle positions by -offset).
E_OFFSETS_2D = ((0.5, 0.0), (0.0, 0.5), (0.0, 0.0))
B_OFFSETS_2D = ((0.0, 0.5), (0.5, 0.0), (0.5, 0.5))
E_OFFSETS_3D = ((0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 0.5))
B_OFFSETS_3D = ((0.0, 0.5, 0.5), (0.5, 0.0, 0.5), (0.5, 0.5, 0.0))


def center_fields(e: jax.Array, b: jax.Array, e_offsets, b_offsets) -> jax.Array:
    """Average staggered E and B components to cell centers (nodes).

    A component stored at offset +1/2 along an axis is averaged with its
    rolled neighbor to land on the node.  Returns a packed (*grid, 6) table
    (Ex, Ey, Ez, Bx, By, Bz) for the single-gather 'centered' particle push
    (the standard uniform-centering variant; trades the exact Yee stagger
    for one latency-bound gather row per particle instead of six).
    """
    cols = []
    for field, offsets in ((e, e_offsets), (b, b_offsets)):
        for comp, off in enumerate(offsets):
            c = field[..., comp]
            for axis, o in enumerate(off):
                if o:
                    # array index i holds the value at i+1/2; the node-i
                    # average is (value at i-1/2 + value at i+1/2)/2
                    c = 0.5 * (c + jnp.roll(c, 1, axis=axis))
            cols.append(c)
    return jnp.stack(cols, axis=-1)


def gather_staggered(field: jax.Array, position: jax.Array,
                     offsets, shape: tuple[int, ...]) -> jax.Array:
    """CIC-gather each staggered component at particle positions.

    ``field``: (*shape, 3); ``position``: (N, d) grid units.  Each component
    c is sampled on its own staggered lattice by shifting the particle
    coordinate by -offset[c].  Returns (N, 3).
    """
    from .interp import cic_gather_packed

    cols = []
    grid = jnp.asarray(shape, jnp.float32)
    for comp, off in enumerate(offsets):
        shifted = jnp.mod(position - jnp.asarray(off, jnp.float32), grid)
        cols.append(cic_gather_packed(field[..., comp], shifted, shape))
    return jnp.stack(cols, axis=-1)
