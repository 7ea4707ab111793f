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
import numpy as np


def _strides(shape: tuple[int, ...]) -> jax.Array:
    """Row-major flattening strides for ``shape`` (int32 device vector)."""
    out = []
    s = 1
    for n in reversed(shape):
        out.append(s)
        s *= n
    return jnp.asarray(list(reversed(out)), jnp.int32)


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
    strides = _strides(shape)

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
    strides = _strides(shape)

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


# ---------------------------------------------------------------------------
# Packed variants: one memory-latency row per particle instead of 2^d.
#
# XLA TPU gathers/scatters are latency-bound per row (~25-40 ns measured on
# v5e) and row width is nearly free, so the 2^d CIC corners are folded into
# channels of a single row:
#
# * gather: pre-roll the grid once per step into a (cells, 2^d * C) table
#   whose channel block k holds the grid shifted by corner k; one gather +
#   register-weighted reduction replaces 2^d gathers.
# * deposit: scatter each particle's 2^d corner contributions into 2^d
#   channel blocks of its *base* cell row; afterwards roll channel block k
#   back by -k and sum — exactly equivalent to scattering at the corners.
# ---------------------------------------------------------------------------

def _corners(n_dim: int):
    return list(itertools.product((0, 1), repeat=n_dim))


@functools.partial(jax.jit, static_argnames=("shape",))
def cic_deposit_packed(
    position: jax.Array, weights: jax.Array, shape: tuple[int, ...]
) -> jax.Array:
    """CIC deposit with a single scatter-add row per particle (exact)."""
    n_dim = len(shape)
    corners = _corners(n_dim)
    base, frac = _corner_weights(position, shape)
    base = base % jnp.asarray(shape, jnp.int32)

    strides = _strides(shape)
    flat_idx = jnp.sum(base * strides, axis=1)

    cols = []
    for corner in corners:
        w = weights
        for axis, c in enumerate(corner):
            w = w * jnp.where(c == 1, frac[:, axis], 1.0 - frac[:, axis])
        cols.append(w)
    packed_vals = jnp.stack(cols, axis=-1)  # (N, 2^d)

    ncells = int(np.prod(shape))
    packed = jnp.zeros((ncells, len(corners)), dtype=weights.dtype)
    packed = packed.at[flat_idx].add(packed_vals)
    packed = packed.reshape(*shape, len(corners))

    out = jnp.zeros(shape, dtype=weights.dtype)
    for k, corner in enumerate(corners):
        contrib = packed[..., k]
        for axis, c in enumerate(corner):
            if c:
                contrib = jnp.roll(contrib, 1, axis=axis)
        out = out + contrib
    return out


def spill_rows(spill_mask: jax.Array, spill: jax.Array, capacity: int,
               n_total: int) -> tuple[jax.Array, jax.Array]:
    """Compact up to ``capacity`` spilled-row indices for an exact patch.

    The sorted models' out-of-margin fallback used to run whole-population
    packed transfers under ``lax.cond``; XLA reserves the branch temporaries
    and (inside cond) can assign (N, d) arrays a T(8,128) layout that pads
    d -> 128 lanes — a 64x HBM blowup that OOMs at 10M particles.  Instead,
    compact the (rare) spilled rows into a fixed-capacity index buffer and
    patch only those: all patch temporaries are (capacity, d).

    Tail entries get the out-of-bounds sentinel ``n_total`` — gathers clamp
    them (values masked by ``ok``) and ``mode='drop'`` scatters discard them.
    Returns ``(idx (capacity,) int32, ok (capacity,) bool)``.
    """
    idx = jnp.nonzero(spill_mask, size=capacity, fill_value=n_total)[0]
    ok = jnp.arange(capacity) < spill
    return idx.astype(jnp.int32), ok


def spill_rows_cond(spill_mask: jax.Array, spill: jax.Array, capacity: int,
                    n_total: int) -> tuple[jax.Array, jax.Array]:
    """``spill_rows`` under ``lax.cond``: spill-free steps skip the O(N)
    compaction entirely.  The caller's K-row patch ops are no-ops on the
    sentinel indices, so they can run unconditionally; only the (capacity,)
    index vector crosses the branch boundary (returning full particle
    arrays from a cond branch is what triggered the T(8,128) layout blowup
    this module's docstrings warn about).

    The hot branch is ``_gather_compact`` — exact, scatter-free, and
    distribution-independent (~2-3 ms at 10M regardless of how spills are
    scattered).  Every spilled row up to ``capacity`` is always captured
    (in row order); rows beyond ``capacity`` are dropped and the caller
    should surface ``max(spill - capacity, 0)`` as a diagnostic.
    Returns ``(idx (capacity,) int32, ok (capacity,) bool)``.
    """
    # + 0*spill keeps the branch outputs 'varying' under shard_map (a
    # bare constant would be replicated and the branch types clash)
    vary = 0 * spill.astype(jnp.int32)
    idx = jax.lax.cond(
        spill > 0,
        lambda: _gather_compact(spill_mask, capacity, n_total) + vary,
        lambda: jnp.full((capacity,), n_total, jnp.int32) + vary)
    ok = idx < n_total
    return idx, ok


_CHUNK = 1024


def _gather_compact(spill_mask: jax.Array, capacity: int,
                    n_total: int) -> jax.Array:
    """Exact scatter-free stream compaction.

    A flat ``nonzero``/scatter compaction costs ~95 ms at 10M on v5e (XLA
    scatters are latency-bound per row), and the round-2 chunk-budgeted
    hierarchy silently dropped rows when spills scattered across many
    chunks (they always do once particle order decorrelates from space
    inside blocks).  This form inverts the problem — find the k-th spilled
    row for each OUTPUT slot k — so all heavy ops are gathers:

      1. per-chunk spill counts (one bandwidth pass over the bool mask —
         no full-length int32 cumsum is ever materialized) and their
         (N/1024,) prefix sum;
      2. per-slot chunk via ``searchsorted`` on that prefix
         (capacity queries over N/1024 entries);
      3. gather each slot's BOOL mask chunk (capacity x 1024 bytes — 4x
         less traffic than gathering int32 cumsum chunks), cumsum it
         in-register, and count entries <= the slot's in-chunk rank.

    Cost is independent of the spill distribution.  All temporaries are 1-D
    or (capacity, chunk) — no T(8,128) layout hazard.
    """
    nb = -(-n_total // _CHUNK)
    if nb * _CHUNK != n_total:
        m_pad = jnp.concatenate(
            [spill_mask, jnp.zeros((nb * _CHUNK - n_total,), bool)])
    else:
        m_pad = spill_mask
    m2 = m_pad.reshape(nb, _CHUNK)
    s = jnp.sum(m2, axis=1, dtype=jnp.int32)   # (nb,) per-chunk counts
    bc = jnp.cumsum(s)                          # (nb,) inclusive prefix
    total = bc[-1]
    k = jnp.arange(capacity, dtype=jnp.int32)
    ch = jnp.searchsorted(bc, k, side="right").astype(jnp.int32)
    ch_c = jnp.minimum(ch, nb - 1)
    rows_m = m2[ch_c]                           # (capacity, _CHUNK) bool
    rc = jnp.cumsum(rows_m.astype(jnp.int32), axis=1)  # in-chunk inclusive
    k_local = k - (bc[ch_c] - s[ch_c])          # slot rank within its chunk
    j = jnp.sum((rc <= k_local[:, None]).astype(jnp.int32), axis=1)
    idx = ch_c * _CHUNK + j
    return jnp.where(k < total, idx, n_total).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("shape",))
def cic_gather_packed(
    grid: jax.Array, position: jax.Array, shape: tuple[int, ...]
) -> jax.Array:
    """CIC gather with a single gather row per particle (exact).

    ``grid``: (*shape,) or (*shape, C); returns (N,) or (N, C).
    """
    n_dim = len(shape)
    corners = _corners(n_dim)
    channels = grid.shape[len(shape):]
    c_width = int(np.prod(channels)) if channels else 1

    # pre-rolled corner table: (cells, 2^d * C)
    blocks = []
    for corner in corners:
        shifted = grid
        for axis, c in enumerate(corner):
            if c:
                shifted = jnp.roll(shifted, -1, axis=axis)
        blocks.append(shifted.reshape(-1, c_width))
    table = jnp.concatenate(blocks, axis=-1)

    base, frac = _corner_weights(position, shape)
    base = base % jnp.asarray(shape, jnp.int32)
    strides = _strides(shape)
    flat_idx = jnp.sum(base * strides, axis=1)

    rows = table[flat_idx]  # (N, 2^d * C)
    out = 0.0
    for k, corner in enumerate(corners):
        w = jnp.ones(position.shape[0], dtype=grid.dtype)
        for axis, c in enumerate(corner):
            w = w * jnp.where(c == 1, frac[:, axis], 1.0 - frac[:, axis])
        vals = rows[:, k * c_width:(k + 1) * c_width]
        out = out + w[:, None] * vals
    out = out.reshape((position.shape[0],) + channels) if channels else out[:, 0]
    return out
