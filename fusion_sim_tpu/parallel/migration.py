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


def _pack(arrays, mask, capacity: int):
    """Gather rows where ``mask`` into fixed (capacity, ...) buffers.

    Returns (buffers, valid, overflow): rows beyond ``capacity`` are counted
    as overflow."""
    n = mask.shape[0]
    # stable order: indices of selected rows first
    order = jnp.argsort(~mask)  # True (selected) sort first
    count = jnp.sum(mask)
    take = order[:capacity]
    valid = jnp.arange(capacity) < jnp.minimum(count, capacity)
    buffers = tuple(a[take] for a in arrays)
    overflow = jnp.maximum(count - capacity, 0)
    return buffers, valid, overflow


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
    return MigrationResult(arrays=tuple(out_arrays), alive=new_alive,
                           overflow=overflow)
