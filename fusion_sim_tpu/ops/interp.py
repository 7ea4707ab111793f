"""Particle <-> grid interpolation: cloud-in-cell (CIC) deposit and gather.

The reference's only particle->grid transfer is the rendering splat
(empic.js:980-1035, replicated in ops/deposit.py); the self-consistent PIC
loop the reference was building toward (SURVEY.md §0, BASELINE configs)
needs charge deposition and field gather with matching (momentum-conserving)
shape functions.  These are the standard first-order CIC kernels, written
dimension-generically over periodic grids.

TPU notes: deposition is a scatter-add over the 2^d corner weights (one
``.at[].add`` per corner, XLA scatter); gather is the matching corner-
weighted sum of grid values.  For the sorted/supercell Pallas fast path see
ops/pallas (the XLA forms here are the reference implementations and the
CPU/test fallback).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp


def _corner_weights(position: jax.Array, shape: tuple[int, ...]):
    """Base cell index and CIC fractional weights per axis.

    ``position`` is in grid units (0 <= x_i < shape_i), shape (N, d).
    Grid values live at integer nodes; periodic wrap.
    Returns (base_idx (N, d) int32, frac (N, d) float32).
    """
    base = jnp.floor(position).astype(jnp.int32)
    frac = position - base
    return base, frac


@functools.partial(jax.jit, static_argnames=("shape",))
def cic_deposit(
    position: jax.Array, weights: jax.Array, shape: tuple[int, ...]
) -> jax.Array:
    """Deposit per-particle ``weights`` onto a periodic grid with CIC shapes.

    ``position``: (N, d) in grid units; ``weights``: (N,) charge per particle.
    Returns the (shape) grid of summed weights (density = grid / cell_volume
    is the caller's business).
    """
    n_dim = len(shape)
    base, frac = _corner_weights(position, shape)
    grid = jnp.zeros(shape, dtype=weights.dtype)
    flat = grid.reshape(-1)
    strides = []
    s = 1
    for n in reversed(shape):
        strides.append(s)
        s *= n
    strides = jnp.asarray(list(reversed(strides)), jnp.int32)

    for corner in itertools.product((0, 1), repeat=n_dim):
        offs = jnp.asarray(corner, jnp.int32)
        idx = (base + offs) % jnp.asarray(shape, jnp.int32)
        w = weights
        for axis, c in enumerate(corner):
            w = w * jnp.where(c == 1, frac[:, axis], 1.0 - frac[:, axis])
        flat_idx = jnp.sum(idx * strides, axis=1)
        flat = flat.at[flat_idx].add(w)
    return flat.reshape(shape)


@functools.partial(jax.jit, static_argnames=("shape",))
def cic_gather(
    grid: jax.Array, position: jax.Array, shape: tuple[int, ...]
) -> jax.Array:
    """Gather grid values at particle positions with the same CIC shapes.

    ``grid``: (*shape,) or (*shape, C); returns (N,) or (N, C).
    Using identical shapes for deposit and gather makes the ES force
    momentum-conserving (standard PIC result).
    """
    n_dim = len(shape)
    base, frac = _corner_weights(position, shape)
    channels = grid.shape[len(shape):]
    flat = grid.reshape((-1,) + channels)
    strides = []
    s = 1
    for n in reversed(shape):
        strides.append(s)
        s *= n
    strides = jnp.asarray(list(reversed(strides)), jnp.int32)

    out = 0.0
    for corner in itertools.product((0, 1), repeat=n_dim):
        offs = jnp.asarray(corner, jnp.int32)
        idx = (base + offs) % jnp.asarray(shape, jnp.int32)
        w = jnp.ones(position.shape[0], dtype=grid.dtype)
        for axis, c in enumerate(corner):
            w = w * jnp.where(c == 1, frac[:, axis], 1.0 - frac[:, axis])
        flat_idx = jnp.sum(idx * strides, axis=1)
        vals = flat[flat_idx]
        if channels:
            w = w[:, None]
        out = out + w * vals
    return out
