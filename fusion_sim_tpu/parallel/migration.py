"""Particle migration between spatial shards (fixed-capacity ring exchange).

When the grid is domain-decomposed, particles drifting across a slab
boundary must move to the neighbor shard.  Under jit all shapes are static
(SURVEY.md §7 "hard parts"), so the exchange uses fixed-capacity send
buffers with overflow accounting:

1. classify each particle: stay / send-left / send-right (by its coordinate
   relative to the local slab, assuming < 1 slab of motion per step);
2. pack leavers into (capacity, ...) buffers with a mask (overflow counted
   and reported — the caller sizes capacity so overflow never happens in
   practice and asserts on the counter);
3. ``lax.ppermute`` the buffers around the ring both ways;
4. merge arrivals into vacated slots (particle arrays keep a fixed length
   per shard; empty slots are flagged dead, mirroring the reference's
   alive-flag mechanism, empic.js:719).

All ops are static-shaped sorts/scatters — jit/shard_map safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class MigrationResult(NamedTuple):
    arrays: tuple          # per-field (N, ...) arrays after migration
    alive: jax.Array       # (N,) bool — live occupancy after merge
    overflow: jax.Array    # scalar int — leavers dropped for lack of capacity


def _as_columns(arrays):
    """Split (N, d) arrays into d separate (N,) columns, returning the
    columns plus a rebuild function.

    Row gathers/scatters on a tiny-minor-dim array can be assigned a
    T(8,128) layout that pads d up to 128 lanes — 42x HBM on a (N, 3)
    payload (observed: a 17.3 GB copy at 3.4e7 rows in the 3D sharded
    composition; the hazard documented in PERFORMANCE.md).  Per-column ops
    never expose the tiny minor dim, so the migration innards work on
    columns and re-stack at the boundary."""
    cols, spec = [], []
    for a in arrays:
        if a.ndim == 2:
            cols.extend(a[:, c] for c in range(a.shape[1]))
            spec.append(a.shape[1])
        else:
            cols.append(a)
            spec.append(0)

    def rebuild(out_cols):
        out, i = [], 0
        for d in spec:
            if d == 0:
                out.append(out_cols[i])
                i += 1
            else:
                out.append(jnp.stack(out_cols[i:i + d], axis=-1))
                i += d
        return tuple(out)

    return tuple(cols), rebuild


def _pack(arrays, mask, capacity: int, with_take: bool = False):
    """Gather rows where ``mask`` into fixed (capacity, ...) buffers.

    Returns (buffers, valid, overflow[, take]): rows beyond ``capacity`` are
    counted as overflow; ``take`` is the packed rows' source indices."""
    n = mask.shape[0]
    # stable order: indices of selected rows first
    order = jnp.argsort(~mask)  # True (selected) sort first
    count = jnp.sum(mask)
    take = order[:capacity]
    valid = jnp.arange(capacity) < jnp.minimum(count, capacity)
    buffers = tuple(a[take] for a in arrays)
    overflow = jnp.maximum(count - capacity, 0)
    if with_take:
        return buffers, valid, overflow, take
    return buffers, valid, overflow


class StackedMigrationResult(NamedTuple):
    arrays: tuple          # per-field (N, ...) arrays after migration
    alive: jax.Array       # (N,) bool
    overflow: jax.Array    # leavers dropped + arrivals with no free slot
    free_idx: jax.Array    # updated per-tile dead-slot stacks
    free_cnt: jax.Array
    spare_idx: jax.Array   # updated spare stack (trailing-region slots)
    spare_cnt: jax.Array
    placed_tile: jax.Array  # arrivals placed into their tile's segment
    placed_spare: jax.Array  # arrivals placed into spare (bad-block) slots


def migrate_ring_stacked(
    arrays: tuple,
    alive: jax.Array,
    go_left: jax.Array,
    go_right: jax.Array,
    axis_name: str,
    capacity: int,
    tile_id: jax.Array,
    n_tiles: int,
    arrival_tiles_fn,
    free_idx: jax.Array,
    free_cnt: jax.Array,
    spare_idx: jax.Array,
    spare_cnt: jax.Array,
) -> StackedMigrationResult:
    """``migrate_ring`` for the repair-enabled sorted layouts: dead slots
    are owned by the per-tile free stacks (ops/repair.py), so the merge
    must allocate arrival slots FROM them (tile-local first — the arrival
    is then immediately in-window — falling back to the spare stack of
    trailing-region slots) and push leavers' freed slots back on.

    ``tile_id``: (N,) the layout's per-row block tile (sentinel >= n_tiles
    on trailing blocks); ``arrival_tiles_fn(arrival_arrays) -> (K,) int32``
    maps the concatenated arrival buffers to their destination tile in THIS
    shard's pseudo-grid.  Arrivals that neither stack can seat are dropped
    and counted in ``overflow`` (legacy ``migrate_ring`` would seat them in
    any dead slot; with stacks as the single source of truth that would
    double-book — the resort-on-drain shell logic keeps stacks from running
    dry in practice)."""
    from ..ops.repair import pop_slots, push_slots

    arrays, _rebuild = _as_columns(arrays)
    n_shards = lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    n = alive.shape[0]

    mask_l = jnp.logical_and(alive, go_left)
    mask_r = jnp.logical_and(alive, go_right)
    send_l, valid_l, ov_l, take_l = _pack(arrays, mask_l, capacity,
                                          with_take=True)
    send_r, valid_r, ov_r, take_r = _pack(arrays, mask_r, capacity,
                                          with_take=True)
    stay = jnp.logical_and(alive,
                           jnp.logical_not(jnp.logical_or(go_left, go_right)))

    # every leaver row's slot frees (even capacity-overflow leavers, which
    # are dropped); compacted leaver indices cover up to capacity per side —
    # overflow leaver slots leak until the next resort (overflow is an
    # asserted-zero anomaly)
    for take, valid in ((take_l, valid_l), (take_r, valid_r)):
        t_of = tile_id[take]
        tile_ok = jnp.logical_and(valid, t_of < n_tiles)
        free_idx, free_cnt = push_slots(free_idx, free_cnt, take,
                                        t_of, tile_ok)
        spare_ok = jnp.logical_and(valid, t_of >= n_tiles)
        spare_idx, spare_cnt = push_slots(
            spare_idx, spare_cnt, take, jnp.zeros_like(t_of), spare_ok)

    recv_from_right = tuple(lax.ppermute(b, axis_name, bwd) for b in send_l)
    recv_valid_r = lax.ppermute(valid_l, axis_name, bwd)
    recv_from_left = tuple(lax.ppermute(b, axis_name, fwd) for b in send_r)
    recv_valid_l = lax.ppermute(valid_r, axis_name, fwd)

    arrivals = tuple(
        jnp.concatenate([l, r], axis=0)
        for l, r in zip(recv_from_left, recv_from_right))
    arrivals_valid = jnp.concatenate([recv_valid_l, recv_valid_r])

    # seat arrivals: tile-local pop first, spare stack for the leftovers
    arr_tiles = arrival_tiles_fn(_rebuild(arrivals))
    slot, got, free_idx, free_cnt = pop_slots(
        free_idx, free_cnt, arr_tiles, arrivals_valid, n)
    need_spare = jnp.logical_and(arrivals_valid, jnp.logical_not(got))
    slot2, got2, spare_idx, spare_cnt = pop_slots(
        spare_idx, spare_cnt, jnp.zeros_like(arr_tiles), need_spare, n)
    dest = jnp.where(got, slot, slot2)
    placed = jnp.logical_or(got, got2)
    dest = jnp.where(placed, dest, n)

    out_arrays = []
    for a, arr in zip(arrays, arrivals):
        out_arrays.append(a.at[dest].set(arr, mode="drop"))
    new_alive = stay.at[dest].set(True, mode="drop")
    n_lost = jnp.sum(jnp.logical_and(arrivals_valid,
                                     jnp.logical_not(placed)))
    overflow = ov_l + ov_r + n_lost.astype(jnp.int32)
    return StackedMigrationResult(
        arrays=_rebuild(out_arrays), alive=new_alive, overflow=overflow,
        free_idx=free_idx, free_cnt=free_cnt,
        spare_idx=spare_idx, spare_cnt=spare_cnt,
        placed_tile=jnp.sum(got.astype(jnp.int32)),
        placed_spare=jnp.sum(got2.astype(jnp.int32)))


def migrate_ring(
    arrays: tuple,
    alive: jax.Array,
    go_left: jax.Array,
    go_right: jax.Array,
    axis_name: str,
    capacity: int,
) -> MigrationResult:
    """Exchange leavers with ring neighbors inside shard_map.

    ``arrays``: per-particle field tuple, each (N, ...); ``alive``: (N,)
    bool; ``go_left``/``go_right``: (N,) bool (subset of alive).
    """
    arrays, _rebuild = _as_columns(arrays)
    n_shards = lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    send_l, valid_l, ov_l = _pack(arrays, jnp.logical_and(alive, go_left), capacity)
    send_r, valid_r, ov_r = _pack(arrays, jnp.logical_and(alive, go_right), capacity)

    stay = jnp.logical_and(alive, jnp.logical_not(jnp.logical_or(go_left, go_right)))

    recv_from_right = tuple(lax.ppermute(b, axis_name, bwd) for b in send_l)
    recv_valid_r = lax.ppermute(valid_l, axis_name, bwd)
    recv_from_left = tuple(lax.ppermute(b, axis_name, fwd) for b in send_r)
    recv_valid_l = lax.ppermute(valid_r, axis_name, fwd)

    # merge: free slots = not stay; fill with arrivals (left then right)
    n = alive.shape[0]
    free_order = jnp.argsort(stay)  # free slots first
    arrivals_valid = jnp.concatenate([recv_valid_l, recv_valid_r])
    arrivals = tuple(
        jnp.concatenate([l, r], axis=0) for l, r in zip(recv_from_left, recv_from_right))

    # compact arrivals to the front of their buffer
    arr_order = jnp.argsort(~arrivals_valid)
    arrivals = tuple(a[arr_order] for a in arrivals)
    n_arrive = jnp.sum(arrivals_valid)

    slot_idx = free_order[: 2 * capacity]  # first free slots (may include stays
    # beyond the free count; masked below)
    n_free = n - jnp.sum(stay)
    use = jnp.arange(2 * capacity) < jnp.minimum(n_arrive, n_free)

    out_arrays = []
    for a, arr in zip(arrays, arrivals):
        updated = a.at[slot_idx].set(
            jnp.where(use.reshape((-1,) + (1,) * (a.ndim - 1)), arr[: 2 * capacity], a[slot_idx]))
        out_arrays.append(updated)

    new_alive = stay.at[slot_idx].set(jnp.where(use, True, stay[slot_idx]))
    overflow = ov_l + ov_r + jnp.maximum(n_arrive - n_free, 0)
    return MigrationResult(arrays=_rebuild(out_arrays), alive=new_alive,
                           overflow=overflow)


def migrate_grid(
    arrays: tuple,
    alive: jax.Array,
    mask_fn,
    axis_names: tuple[str, ...],
    capacity: int,
) -> MigrationResult:
    """Dimension-ordered migration over a MULTI-AXIS spatial mesh.

    The 2-D (and N-D) mesh decomposition's particle exchange: one
    ``migrate_ring`` phase per decomposed axis, in order.  A particle whose
    destination differs on both axes routes in two hops (axis 0 first,
    then axis 1 from its intermediate shard) — dimension-ordered routing,
    no diagonal sends.  ``mask_fn(arrays, k)`` is called at the START of
    phase ``k`` with the CURRENT per-shard arrays (phase-1 masks therefore
    see phase-0 arrivals) and returns ``(go_lo, go_hi)`` (N,) bools for
    axis ``axis_names[k]``.

    Returns a ``MigrationResult`` with the summed overflow across phases.
    """
    res = MigrationResult(tuple(arrays), alive, jnp.int32(0))
    for k, ax in enumerate(axis_names):
        go_lo, go_hi = mask_fn(res.arrays, k)
        r = migrate_ring(res.arrays, res.alive, go_lo, go_hi, ax, capacity)
        res = MigrationResult(r.arrays, r.alive, res.overflow + r.overflow)
    return res
