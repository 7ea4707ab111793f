"""Esirkepov charge-conserving current deposition (CIC order, 2D and 3D).

The current-deposition half of the electromagnetic PIC loop (BASELINE
configs[2-3]).  Esirkepov's density-decomposition (CPC 135 (2001) 144)
constructs J directly from the particle motion x0 -> x1 such that the
discrete continuity equation

    (rho1 - rho0)/dt + div_Yee J = 0

holds identically at every node, with rho the CIC-deposited density and
div_Yee the staggered Yee divergence.  This keeps Gauss's law satisfied for
all time without divergence cleaning.

Layout: J is packed (*grid_shape, 3) with Jx at (i+1/2, j[, k]), Jy at
(i, j+1/2[, k]), Jz at (i, j, k+1/2) in 3D / collocated at nodes in 2D3V
(where the z-current is a direct vz-weighted deposit, Esirkepov eq. 39).

TPU shape: all particles are processed with a fixed 3-node stencil per axis
(CIC support of the start/end positions unions to <= 3 nodes when
|dx| < 1 cell — enforce with a CFL-style limit), giving 9 (2D) / 27 (3D)
batched scatter-adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shapes_1d(x: jax.Array, base: jax.Array) -> jax.Array:
    """CIC weights of positions ``x`` (N,) at stencil nodes base+{0,1,2}.

    Returns (N, 3)."""
    k = jnp.arange(3, dtype=jnp.float32)
    d = jnp.abs(x[:, None] - (base[:, None].astype(jnp.float32) + k[None, :]))
    return jnp.maximum(0.0, 1.0 - d)


def _stencil_base(x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Common 3-node stencil base: floor(min(x0, x1)) per particle/axis."""
    return jnp.floor(jnp.minimum(x0, x1)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("shape",))
def esirkepov_deposit_2d(
    x0: jax.Array,
    x1: jax.Array,
    vz: jax.Array,
    charge: jax.Array,
    dt: float,
    shape: tuple[int, int],
    cell_size: tuple[float, float],
) -> jax.Array:
    """Current of particles moving x0 -> x1 (grid units) over dt (2D3V).

    ``x0``/``x1``: (N, 2) positions before/after the drift (must differ by
    < 1 cell per axis); ``vz``: (N,) out-of-plane velocity (physical);
    ``charge``: scalar or (N,).  Returns (*shape, 3) current density.
    """
    nx, ny = shape
    dx, dy = cell_size
    vol = dx * dy
    q = jnp.broadcast_to(jnp.asarray(charge, jnp.float32), x0.shape[:1])

    bx = _stencil_base(x0[:, 0], x1[:, 0])
    by = _stencil_base(x0[:, 1], x1[:, 1])
    s0x = _shapes_1d(x0[:, 0], bx)   # (N, 3)
    s1x = _shapes_1d(x1[:, 0], bx)
    s0y = _shapes_1d(x0[:, 1], by)
    s1y = _shapes_1d(x1[:, 1], by)
    dsx = s1x - s0x
    dsy = s1y - s0y

    # Esirkepov 2D decomposition weights over the 3x3 stencil
    wx = dsx[:, :, None] * (s0y + 0.5 * dsy)[:, None, :]            # (N,3,3)
    wy = dsy[:, None, :] * (s0x + 0.5 * dsx)[:, :, None]
    wz = (s0x[:, :, None] * s0y[:, None, :]
          + 0.5 * dsx[:, :, None] * s0y[:, None, :]
          + 0.5 * s0x[:, :, None] * dsy[:, None, :]
          + (1.0 / 3.0) * dsx[:, :, None] * dsy[:, None, :])

    # Jx(i+1/2, j) = -q dx/(V dt) * cumsum_x W_x ; likewise Jy along y
    coef = (q / (vol * dt))[:, None, None]
    jx_vals = -coef * dx * jnp.cumsum(wx, axis=1)
    jy_vals = -coef * dy * jnp.cumsum(wy, axis=2)
    jz_vals = (q * vz / vol)[:, None, None] * wz

    # Packed scatter: one latency-bound row per particle (27 channels =
    # 3x3 stencil x 3 components), stencil offsets recovered with rolls —
    # exact, ~9x fewer scattered rows (see ops/interp.py packed variants).
    vals = jnp.stack([jx_vals, jy_vals, jz_vals], axis=-1)  # (N, 3, 3, 3c)
    packed_vals = vals.reshape(vals.shape[0], 27)
    flat = jnp.mod(bx, nx) * ny + jnp.mod(by, ny)
    packed = jnp.zeros((nx * ny, 27), jnp.float32).at[flat].add(packed_vals)
    packed = packed.reshape(nx, ny, 3, 3, 3)

    grid = jnp.zeros((nx, ny, 3), jnp.float32)
    for kx in range(3):
        for ky in range(3):
            contrib = packed[:, :, kx, ky, :]
            contrib = jnp.roll(contrib, (kx, ky), axis=(0, 1))
            grid = grid + contrib
    return grid


@functools.partial(jax.jit, static_argnames=("shape",))
def esirkepov_deposit_3d(
    x0: jax.Array,
    x1: jax.Array,
    charge: jax.Array,
    dt: float,
    shape: tuple[int, int, int],
    cell_size: tuple[float, float, float],
) -> jax.Array:
    """Full 3D Esirkepov deposition; returns (*shape, 3) current density."""
    nx, ny, nz = shape
    dx, dy, dz = cell_size
    vol = dx * dy * dz
    q = jnp.broadcast_to(jnp.asarray(charge, jnp.float32), x0.shape[:1])

    bases = [_stencil_base(x0[:, c], x1[:, c]) for c in range(3)]
    s0 = [_shapes_1d(x0[:, c], bases[c]) for c in range(3)]
    s1 = [_shapes_1d(x1[:, c], bases[c]) for c in range(3)]
    ds = [a - b for a, b in zip(s1, s0)]

    def outer_pair(a, b):
        return a[:, :, None] * b[:, None, :]

    def w_for(axis: int) -> jax.Array:
        """Esirkepov 3D weight for current component ``axis``:
        W_a = dS_a * [S0_b S0_c + (dS_b S0_c + S0_b dS_c)/2 + dS_b dS_c/3]
        assembled as an (N, 3, 3, 3) stencil tensor in (x, y, z) axis order.
        """
        b_ax, c_ax = [a for a in range(3) if a != axis]  # b_ax < c_ax
        mix = (
            outer_pair(s0[b_ax], s0[c_ax])
            + 0.5 * (outer_pair(ds[b_ax], s0[c_ax]) + outer_pair(s0[b_ax], ds[c_ax]))
            + (1.0 / 3.0) * outer_pair(ds[b_ax], ds[c_ax])
        )  # (N, 3_b, 3_c)
        # Inserting a singleton at 1+axis puts mix's (b, c) axes at the right
        # (x, y, z) slots because b_ax < c_ax and axis is the one missing.
        mix4 = jnp.expand_dims(mix, axis=1 + axis)
        shape4 = [q.shape[0], 1, 1, 1]
        shape4[1 + axis] = 3
        return ds[axis].reshape(shape4) * mix4

    weights = [w_for(0), w_for(1), w_for(2)]  # each (N,3,3,3)
    coef = (q / (vol * dt))[:, None, None, None]
    d_ax = (dx, dy, dz)
    j_vals = [
        -coef * d_ax[a] * jnp.cumsum(weights[a], axis=1 + a) for a in range(3)
    ]

    # Packed scatter (see 2D): one 81-channel row per particle + rolls.
    vals = jnp.stack(j_vals, axis=-1)  # (N, 3, 3, 3, 3c)
    packed_vals = vals.reshape(vals.shape[0], 81)
    flat = (jnp.mod(bases[0], nx) * ny + jnp.mod(bases[1], ny)) * nz \
        + jnp.mod(bases[2], nz)
    packed = jnp.zeros((nx * ny * nz, 81), jnp.float32).at[flat].add(packed_vals)
    packed = packed.reshape(nx, ny, nz, 3, 3, 3, 3)

    grid = jnp.zeros((nx, ny, nz, 3), jnp.float32)
    for kx in range(3):
        for ky in range(3):
            for kz in range(3):
                contrib = packed[:, :, :, kx, ky, kz, :]
                contrib = jnp.roll(contrib, (kx, ky, kz), axis=(0, 1, 2))
                grid = grid + contrib
    return grid
