"""Explicit halo exchange over a ring of spatial shards.

XLA already auto-generates collective-permutes for jnp.roll on sharded
arrays; this module provides the *explicit* shard_map form for kernels that
manage their own ghost cells (wide stencils, deposition aprons, and the
Pallas ring path), built on ``lax.ppermute`` — the ring-style neighbor
exchange SURVEY.md §5 names as the CP/ring-equivalent mechanism.

Convention: arrays inside shard_map are the per-shard *local* blocks; halos
are returned as separate (lo, hi) slabs so callers choose how to apply them
(concatenate for stencils, accumulate for deposition aprons).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def exchange_halo(local: jax.Array, axis_name: str, width: int,
                  array_axis: int = 0) -> tuple[jax.Array, jax.Array]:
    """Exchange boundary slabs with ring neighbors.

    Inside shard_map: sends this shard's low/high ``width``-slabs to its
    neighbors; returns ``(halo_lo, halo_hi)`` — the neighbor slabs adjacent
    to this shard's low/high edges (periodic ring).
    """
    n = lax.axis_size(axis_name)
    idx = [slice(None)] * local.ndim

    idx[array_axis] = slice(0, width)
    lo_slab = local[tuple(idx)]
    idx[array_axis] = slice(local.shape[array_axis] - width, None)
    hi_slab = local[tuple(idx)]

    # left neighbor's hi slab becomes our halo_lo; right neighbor's lo slab
    # becomes our halo_hi
    fwd = [(i, (i + 1) % n) for i in range(n)]   # send to right
    bwd = [(i, (i - 1) % n) for i in range(n)]   # send to left
    halo_lo = lax.ppermute(hi_slab, axis_name, fwd)
    halo_hi = lax.ppermute(lo_slab, axis_name, bwd)
    return halo_lo, halo_hi


def with_halo(local: jax.Array, axis_name: str, width: int,
              array_axis: int = 0) -> jax.Array:
    """Local block padded with neighbor halos: concat(halo_lo, local, halo_hi)."""
    halo_lo, halo_hi = exchange_halo(local, axis_name, width, array_axis)
    return jnp.concatenate([halo_lo, local, halo_hi], axis=array_axis)


def accumulate_apron(padded: jax.Array, axis_name: str, width: int,
                     array_axis: int = 0) -> jax.Array:
    """Fold a deposition apron back onto neighbors.

    Inverse of ``with_halo`` for scatter-accumulated quantities: the
    ``width`` apron cells deposited beyond each edge of ``padded`` (shape =
    local + 2*width along ``array_axis``) are sent to the owning neighbor
    and added to its edges.  Returns the local-shaped accumulated block.
    """
    n = lax.axis_size(axis_name)
    size = padded.shape[array_axis]
    idx = [slice(None)] * padded.ndim

    idx[array_axis] = slice(0, width)
    apron_lo = padded[tuple(idx)]
    idx[array_axis] = slice(size - width, None)
    apron_hi = padded[tuple(idx)]
    idx[array_axis] = slice(width, size - width)
    local = padded[tuple(idx)]

    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = lax.ppermute(apron_hi, axis_name, fwd)   # left nbr's hi apron -> our lo edge
    from_right = lax.ppermute(apron_lo, axis_name, bwd)  # right nbr's lo apron -> our hi edge

    idx[array_axis] = slice(0, width)
    local = local.at[tuple(idx)].add(from_left)
    idx[array_axis] = slice(local.shape[array_axis] - width, None)
    local = local.at[tuple(idx)].add(from_right)
    return local


def with_halo_2d(local: jax.Array, axis_names: tuple[str, str],
                 widths: tuple[int, int],
                 array_axes: tuple[int, int] = (0, 1)) -> jax.Array:
    """Ghost-cell pad along TWO decomposed grid axes (2-D mesh
    decomposition — the scaling axis past 1-D slabs).

    Sequential dimension-ordered exchange: the second axis's ppermute ships
    slabs of the already-padded array, so the 8-connected corner ghost
    cells arrive without any explicit diagonal communication (two ICI hops
    total, the standard structured-grid pattern).
    """
    out = with_halo(local, axis_names[0], widths[0], array_axes[0])
    return with_halo(out, axis_names[1], widths[1], array_axes[1])


def accumulate_apron_2d(padded: jax.Array, axis_names: tuple[str, str],
                        widths: tuple[int, int],
                        array_axes: tuple[int, int] = (0, 1)) -> jax.Array:
    """Inverse of ``with_halo_2d`` for scatter-accumulated quantities:
    folds the two-axis deposition apron (shape = local + 2*width on each
    decomposed axis) back onto the owning neighbors, corners included —
    the fold order is the reverse of the pad order so corner contributions
    ride the first fold into the side aprons."""
    out = accumulate_apron(padded, axis_names[1], widths[1], array_axes[1])
    return accumulate_apron(out, axis_names[0], widths[0], array_axes[0])
