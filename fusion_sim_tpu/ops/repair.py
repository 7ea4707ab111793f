"""Incremental per-tile layout repair for the sorted particle layouts.

The tile-sorted layouts (ops/sorted_deposit.build_padded_layout) decay as
particles drift: rows that leave their block's window (tile +/- margin) fall
onto the exact-but-slow spill patch every step until a full resort rebuilds
the layout.  The full resort is a multi-payload 10M-row sort (~95 ms on v5e)
whose amortized cost caps the fused ES path (~6 ms/step at cadence 16 —
PERFORMANCE.md round 2; VERDICT r2 next-step #1a).

This module removes the cadence cost: every step, the (already compacted)
spilled rows are *relocated* into dead filler slots of blocks belonging to
their NEW tile.  In near-equilibrium flows, tile departures free the slots
that tile arrivals need, so the layout is self-repairing and the full resort
runs only when per-tile free-slot inventories drain (net migration
imbalance), typically hundreds of steps apart.

Data structure: a per-tile stack of dead-slot indices,

    free_idx: (n_tiles, F) int32   slot row indices (sentinel-padded)
    free_cnt: (n_tiles,)   int32   live stack depth (<= F)

maintained entirely on device.  All per-step work is O(K log K) on the
K-row compacted spill buffer (K = spill_capacity), plus K-row scatters.

Layout invariants used (guaranteed by build_padded_layout):
  * rows are tile-contiguous in block units (block b's rows all carry the
    same tile_id, and block tile_ids are sorted ascending);
  * a dead slot in tile t's segment stays in tile t forever (repair only
    flips valid flags and writes payloads; tile_id never changes between
    resorts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_tiles", "block", "capacity",
                                             "spare"))
def init_free_list(tile_id: jax.Array, valid: jax.Array, n_tiles: int,
                   block: int, capacity: int,
                   spare: bool = False) -> tuple[jax.Array, jax.Array]:
    """Per-tile dead-slot stacks for a FRESH layout.

    Fresh = straight out of ``build_padded_layout``: within each tile's
    segment the dead (filler) rows form a contiguous suffix, so the stack is
    a range.  Tiles with more than ``capacity`` fillers track only the first
    ``capacity`` (the rest are recovered at the next full resort).

    ``spare=True`` adds one extra stack row (index ``n_tiles``) tracking up
    to ``capacity`` slots of the TRAILING dead region (rows with
    ``tile_id == n_tiles``) — the overflow capacity the sharded sorted
    models hand to migration arrivals that find their tile's stack empty.

    Returns ``(free_idx (rows, capacity), free_cnt (rows,))`` with
    ``rows = n_tiles + spare``.
    """
    n = tile_id.shape[0]
    blk_tile = tile_id[::block]
    rows = n_tiles + (1 if spare else 0)
    # row-level segment bounds from the sorted block tile ids
    bounds = jnp.searchsorted(blk_tile, jnp.arange(rows + 1)) * block
    dead = jnp.logical_and(~valid, tile_id < rows)
    dead_per_tile = jax.ops.segment_sum(dead.astype(jnp.int32), tile_id,
                                        num_segments=rows)
    cnt = jnp.minimum(dead_per_tile, capacity)
    k = jnp.arange(capacity, dtype=jnp.int32)
    start = bounds[1:].astype(jnp.int32) - dead_per_tile
    free_idx = start[:, None] + k[None, :]
    free_idx = jnp.where(k[None, :] < cnt[:, None], free_idx, n)
    return free_idx, cnt


@functools.partial(jax.jit, static_argnames=("shape", "tiling", "keep"))
def near_band_mask(position: jax.Array, tile_id: jax.Array,
                   shape: tuple, tiling, keep: int) -> jax.Array:
    """Rows that have consumed all but ``keep`` cells of their sort margin.

    True where any axis of ``position`` lies more than ``margin - keep``
    cells outside the row's ASSIGNED tile (periodic wrap) — still inside
    the block window, but within ``keep`` cells of leaving it.  Eager
    repair relocates these rows while their kernel outputs are still exact,
    so no out-of-window patch is ever needed for them; with per-step
    displacement < ``keep`` cells, true window exits drop to zero and the
    (expensive) patch buffer only has to cover respawns/migrants.

    The equilibrium relocation flux is ~2·E|v_axis|/(tile + 2(margin-keep))
    of rows per step per axis — the same order as the window-exit flux the
    plain repair pays, but each row costs a payload move instead of a
    packed re-push + deposit patch.
    """
    nd = len(shape)
    nts = tiling.n_tiles(shape)
    if nd == 2:
        tiles = (tiling.tile_r, tiling.tile_z)
        tid_c = jnp.minimum(tile_id, int(np.prod(nts)) - 1)
        axes = (tid_c // nts[1], tid_c % nts[1])
    else:
        tiles = tiling.tile
        tid_c = jnp.minimum(tile_id, int(np.prod(nts)) - 1)
        t0 = tid_c // (nts[1] * nts[2])
        rem = tid_c % (nts[1] * nts[2])
        axes = (t0, rem // nts[2], rem % nts[2])
    slack = tiling.margin - keep
    if slack < 0:
        raise ValueError(f"keep={keep} exceeds margin={tiling.margin}")
    out = None
    for a in range(nd):
        lo = axes[a].astype(jnp.float32) * tiles[a] - slack
        rel = jnp.mod(position[:, a] - lo, shape[a])
        o = rel >= tiles[a] + 2 * slack
        out = o if out is None else jnp.logical_or(out, o)
    return out


def _segment_ranks(keys: jax.Array) -> jax.Array:
    """Rank of each element within its run of equal (sorted) keys."""
    k = keys.shape[0]
    first = jnp.searchsorted(keys, keys, side="left")
    return jnp.arange(k, dtype=jnp.int32) - first.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_tiles", "rounds"))
def allocate_slots(free_idx: jax.Array, free_cnt: jax.Array,
                   src: jax.Array, ok: jax.Array, new_tile: jax.Array,
                   old_tile: jax.Array, n_total: int, n_tiles: int,
                   rounds: int = 2):
    """Assign each spilled row a dead slot in its new tile (pop), and free
    the source slots of relocated rows for future arrivals (push).

    ``src``: (K,) compacted spilled-row indices (sentinel ``n_total`` on
    unused entries); ``ok``: (K,) validity; ``new_tile``/``old_tile``: (K,)
    tile of the row's new position / of its current block.

    ``rounds`` pop/push passes run per call: with ``rounds >= 2`` an
    arrival can take a slot freed by a departure in the SAME call (later
    pops see earlier pushes), which removes the one-step lag that otherwise
    shows up as persistent ``unplaced`` churn in drift-dominated flows
    where a tile's arrivals and departures balance each step.

    Returns ``(dest (K,), placed (K,) bool, free_idx', free_cnt',
    n_unplaced)`` — ``dest[i] == src[i]`` where no slot was available (the
    row stays in place, remains spilled, and is retried next step).
    """
    dest = src
    placed = jnp.zeros(src.shape, bool)
    for _ in range(rounds):
        want = jnp.logical_and(ok, jnp.logical_not(placed))
        slot, got, free_idx, free_cnt = pop_slots(
            free_idx, free_cnt, new_tile, want, n_total)
        dest = jnp.where(got, slot, dest)
        placed = jnp.logical_or(placed, got)
        # freed source slots (old_tile >= n_tiles rows are trailing-region
        # slots — the sharded callers push those onto the spare stack)
        free_idx, free_cnt = push_slots(free_idx, free_cnt, src,
                                        old_tile, got)
    n_unplaced = jnp.sum(jnp.logical_and(ok, ~placed).astype(jnp.int32))
    return dest, placed, free_idx, free_cnt, n_unplaced


@functools.partial(jax.jit, static_argnames=())
def pop_slots(free_idx: jax.Array, free_cnt: jax.Array, tiles: jax.Array,
              want: jax.Array, n_total: int):
    """Pop one dead slot per requested row from stack row ``tiles[k]``.

    ``tiles``: (K,) stack-row index per request (any value >= the stack row
    count means "no request", like ``want=False``); ``want``: (K,) bool.
    Returns ``(slot (K,), got (K,) bool, free_idx', free_cnt')`` — requests
    the stack could not satisfy come back ``got=False, slot=n_total``.
    """
    rows = free_idx.shape[0]
    cap = free_idx.shape[1]
    sent = jnp.int32(rows)
    key = jnp.where(want, jnp.minimum(tiles, sent), sent).astype(jnp.int32)
    order = jnp.argsort(key)
    key_s = key[order]
    ok_s = key_s < sent
    r = _segment_ranks(key_s)
    t_c = jnp.minimum(key_s, rows - 1)
    cnt_t = free_cnt[t_c]
    got_s = jnp.logical_and(ok_s, r < cnt_t)
    slot_s = free_idx[t_c, jnp.clip(cnt_t - 1 - r, 0, cap - 1)]
    slot_s = jnp.where(got_s, slot_s, n_total)
    used = jax.ops.segment_sum(got_s.astype(jnp.int32), key_s,
                               num_segments=rows)
    free_cnt = free_cnt - used
    inv = jnp.argsort(order)
    return slot_s[inv], got_s[inv], free_idx, free_cnt


@functools.partial(jax.jit, static_argnames=())
def push_slots(free_idx: jax.Array, free_cnt: jax.Array, slots: jax.Array,
               tiles: jax.Array, ok: jax.Array):
    """Push freed slot indices onto per-tile stacks.

    ``slots``/``tiles``/``ok``: (K,) slot row indices, their stack row, and
    a validity mask.  Pushes past a stack's capacity are dropped (the slot
    leaks until the next full resort — bounded by the resort-on-drain
    logic).  Returns ``(free_idx', free_cnt')``."""
    rows = free_idx.shape[0]
    cap = free_idx.shape[1]
    sent = jnp.int32(rows)
    key = jnp.where(ok, jnp.minimum(tiles, sent), sent).astype(jnp.int32)
    order = jnp.argsort(key)
    key_s = key[order]
    slots_s = slots[order]
    ok_s = key_s < sent
    r = _segment_ranks(key_s)
    t_c = jnp.minimum(key_s, rows - 1)
    pos = free_cnt[t_c] + r
    write_ok = jnp.logical_and(ok_s, pos < cap)
    free_idx = free_idx.at[
        jnp.where(write_ok, t_c, rows),
        jnp.clip(pos, 0, cap - 1)].set(slots_s, mode="drop")
    pushed = jax.ops.segment_sum(write_ok.astype(jnp.int32), key_s,
                                 num_segments=rows)
    return free_idx, free_cnt + pushed


def relocate(arrays, valid: jax.Array, src: jax.Array, dest: jax.Array,
             placed: jax.Array, values, n_total: int):
    """Move rows ``src -> dest`` (payload ``values`` written at ``dest``;
    ``dest == src`` for unplaced rows, handled by the same scatter).

    ``arrays``: tuple of (N, ...) payload arrays; ``values``: matching (K,
    ...) new payload values (the exact-patch results).  Returns
    ``(arrays', valid')``.
    """
    out = []
    for a, v in zip(arrays, values):
        out.append(a.at[dest].set(v, mode="drop"))
    sent = jnp.int32(n_total)
    src_clear = jnp.where(placed, src, sent)
    valid = valid.at[src_clear].set(False, mode="drop")
    dest_set = jnp.where(placed, dest, sent)
    valid = valid.at[dest_set].set(True, mode="drop")
    return tuple(out), valid


def repair_relocate(state, x1, velocity, idx, ok, pos_k, vel_k,
                    shape, tiling, n_tiles: int, ndim: int,
                    in_win=None, eager_keep: int = 0, eager_cap: int = 0):
    """Shared repair wiring for the single-chip sorted steps (ES and EM):
    relocate the compacted spilled rows (exact values ``pos_k``/``vel_k``)
    into dead slots of their new tile, then — with ``eager_keep > 0`` and
    ``in_win`` = the step's in-window mask — ALSO relocate rows within
    ``eager_keep`` cells of leaving their window, carrying their own
    (exact) values: no patch involved, and true window exits then only
    occur for per-step displacements > ``eager_keep`` cells.

    ``state`` needs ``.free_idx/.free_cnt/.valid/.tile_id/.unplaced``.
    Band rows beyond ``eager_cap`` are deferred to the next step and
    counted into ``unplaced`` (they are NOT lossy — still in-window — but
    persistent deferral means the buffer is undersized and feeds the
    shell's resort-on-drain heuristic).  Returns
    ``(x1, velocity, valid, extra)`` with ``extra`` the state updates."""
    from .interp import spill_rows_cond
    from .sorted_deposit import tile_ids, tile_ids_3d

    n_tot = x1.shape[0]
    tid_fn = tile_ids if ndim == 2 else tile_ids_3d
    new_t = tid_fn(pos_k, shape, tiling)
    dest, placed, fidx, fcnt, nun = allocate_slots(
        state.free_idx, state.free_cnt, idx, ok, new_t,
        state.tile_id[idx], n_tot, n_tiles)
    (x1, velocity), valid = relocate(
        (x1, velocity), state.valid, idx, dest, placed,
        (pos_k, vel_k), n_tot)
    if eager_keep:
        grid_f = jnp.asarray(shape, jnp.float32)
        mask_e = jnp.logical_and(
            jnp.logical_and(in_win, valid),
            near_band_mask(x1, state.tile_id, shape, tiling, eager_keep))
        n_band = jnp.sum(mask_e).astype(jnp.int32)
        idx_e, ok_e = spill_rows_cond(mask_e, n_band, eager_cap, n_tot)
        new_te = tid_fn(jnp.mod(x1[idx_e], grid_f), shape, tiling)
        dest_e, placed_e, fidx, fcnt, nun_e = allocate_slots(
            fidx, fcnt, idx_e, ok_e, new_te, state.tile_id[idx_e],
            n_tot, n_tiles)
        (x1, velocity), valid = relocate(
            (x1, velocity), valid, idx_e, dest_e, placed_e,
            (x1[idx_e], velocity[idx_e]), n_tot)
        # deferred band rows (beyond eager_cap) retry next step; surface
        # them so an undersized buffer is observable
        nun = nun + nun_e + jnp.maximum(n_band - eager_cap, 0)
    extra = dict(free_idx=fidx, free_cnt=fcnt, valid=valid,
                 unplaced=state.unplaced + nun)
    return x1, velocity, valid, extra


def sharded_repair_migrate(
    x1: jax.Array,
    velocity: jax.Array,
    alive: jax.Array,
    tile_id: jax.Array,
    idx: jax.Array,
    ok: jax.Array,
    lx1: jax.Array,
    ly1_wrapped: jax.Array,
    go_left: jax.Array,
    go_right: jax.Array,
    free_idx: jax.Array,
    free_cnt: jax.Array,
    spare_idx: jax.Array,
    spare_cnt: jax.Array,
    unplaced: jax.Array,
    overflow: jax.Array,
    arrival_tiles_fn,
    *,
    axis: str,
    n_shards: int,
    migration_buffer: int,
    pseudo_shape: tuple,
    tiling,
    n_tiles: int,
    slab: int,
    halo_w: int,
    in_win=None,
    eager_keep: int = 0,
    eager_cap: int = 0,
):
    """The repair-enabled tail of a sorted-sharded local step: relocate the
    compacted spilled rows (``idx``/``ok``, already exact-patched in
    ``x1``/``velocity``) into dead slots of their new tile, then migrate
    slab crossers with stack-coordinated slot accounting
    (parallel/migration.migrate_ring_stacked).

    ``lx1``: (N,) the new LOCAL x of every row (pseudo-grid frame);
    ``ly1_wrapped``: (N, d-1) the new local/global rest coordinates already
    wrapped.  Rows about to migrate are excluded from relocation (their
    slot frees on the other side of the exchange).

    With ``eager_keep > 0`` (``in_win`` = this step's in-window mask),
    staying non-migrant rows within ``eager_keep`` cells of leaving their
    window are ALSO relocated, carrying their own exact values — the
    sharded form of the single-chip eager repair (no patch for them next
    step).  Staying rows sit inside the owned slab, so the pseudo-grid's
    non-periodic x axis never wraps under the band test.

    Returns ``(x1, velocity, alive, free_idx, free_cnt, spare_idx,
    spare_cnt, unplaced, overflow)``.
    """
    from ..parallel import migration
    from .interp import spill_rows_cond
    from .sorted_deposit import tile_ids, tile_ids_3d

    n_tot = x1.shape[0]
    # rows this shard keeps: local x inside the owned slab
    lx_k = lx1[idx]
    staying = jnp.logical_and(lx_k >= float(halo_w),
                              lx_k < float(halo_w + slab))
    req = jnp.logical_and(ok, staying)
    loc_k = jnp.concatenate([lx_k[:, None], ly1_wrapped[idx]], axis=1)
    tid_fn = tile_ids if len(pseudo_shape) == 2 else tile_ids_3d
    new_t = tid_fn(loc_k, pseudo_shape, tiling)
    old_t = tile_id[idx]
    if eager_keep:
        # mask computed on the PRE-relocation view (spill rows and freshly
        # seated dest slots are excluded by in_win/staying/band); the
        # relocation itself runs after the spill round below
        stay_all = jnp.logical_and(lx1 >= float(halo_w),
                                   lx1 < float(halo_w + slab))
        loc_all = jnp.concatenate([lx1[:, None], ly1_wrapped], axis=1)
        mask_e = jnp.logical_and(
            jnp.logical_and(in_win, alive),
            jnp.logical_and(
                jnp.logical_and(stay_all, jnp.logical_not(
                    jnp.logical_or(go_left, go_right))),
                near_band_mask(loc_all, tile_id, pseudo_shape, tiling,
                               eager_keep)))
        n_band = jnp.sum(mask_e).astype(jnp.int32)
        idx_e, ok_e = spill_rows_cond(mask_e, n_band, eager_cap, n_tot)
        new_te = tid_fn(loc_all[idx_e], pseudo_shape, tiling)
    dest, placed, free_idx, free_cnt, nun = allocate_slots(
        free_idx, free_cnt, idx, req, new_t, old_t, n_tot, n_tiles)
    (x1, velocity), alive_b = relocate(
        (x1, velocity), alive, idx, dest, placed,
        (x1[idx], velocity[idx]), n_tot)
    alive = alive_b
    # placed rows vacating TRAILING (bad-block) slots free them to the
    # spare stack (allocate_slots only pushes tile-segment slots)
    spare_free = jnp.logical_and(placed, old_t >= n_tiles)
    spare_idx, spare_cnt = push_slots(
        spare_idx, spare_cnt, idx, jnp.zeros_like(old_t), spare_free)
    unplaced = unplaced + nun
    if eager_keep:
        # eager rows are in-window (never bad-block), so their freed slots
        # all push back through the tile stacks — no spare handling
        dest_e, placed_e, free_idx, free_cnt, nun_e = allocate_slots(
            free_idx, free_cnt, idx_e, ok_e, new_te, tile_id[idx_e],
            n_tot, n_tiles)
        (x1, velocity), alive = relocate(
            (x1, velocity), alive, idx_e, dest_e, placed_e,
            (x1[idx_e], velocity[idx_e]), n_tot)
        unplaced = unplaced + nun_e + jnp.maximum(n_band - eager_cap, 0)

    if n_shards > 1:
        res = migration.migrate_ring_stacked(
            (x1, velocity), alive, go_left, go_right, axis,
            migration_buffer, tile_id, n_tiles, arrival_tiles_fn,
            free_idx, free_cnt, spare_idx, spare_cnt)
        x1, velocity = res.arrays
        alive = res.alive
        overflow = overflow + res.overflow
        free_idx, free_cnt = res.free_idx, res.free_cnt
        spare_idx, spare_cnt = res.spare_idx, res.spare_cnt
    return (x1, velocity, alive, free_idx, free_cnt, spare_idx, spare_cnt,
            unplaced, overflow)


@functools.partial(jax.jit, static_argnames=("n_tiles", "block", "capacity"))
def init_spare_list(tile_id: jax.Array, valid: jax.Array, n_tiles: int,
                    block: int, capacity: int):
    """Spare stack over the TRAILING dead region (rows with
    ``tile_id == n_tiles``) of a fresh layout, directly as a range — O(S),
    no per-tile work (unlike ``init_free_list(spare=True)``).

    Returns ``(spare_idx (1, capacity), spare_cnt (1,))``."""
    n = tile_id.shape[0]
    blk_tile = tile_id[::block]
    start = jnp.searchsorted(blk_tile, jnp.int32(n_tiles)) * block
    # the trailing region is all dead by construction (surplus fillers +
    # invalid rows sorted past every tile segment); guard with `valid`
    # anyway so a non-fresh layout cannot hand out live rows
    k = jnp.arange(capacity, dtype=jnp.int32)
    idx = start.astype(jnp.int32) + k
    ok = jnp.logical_and(idx < n, ~valid[jnp.minimum(idx, n - 1)])
    cnt = jnp.sum(ok.astype(jnp.int32), keepdims=True)
    # dead rows are contiguous from `start` on a fresh layout, so the first
    # `cnt` entries are exactly the usable ones
    idx = jnp.where(k < cnt, idx, n)
    return idx[None, :], cnt


def make_sharded_free_init(tiling, pseudo_shape, block: int,
                           free_slots: int, spare_slots: int):
    """Shared per-shard free-stack builder for the sharded repair
    compositions (ES and EM): returns a function
    ``(tile_id, alive) -> (free_idx, free_cnt, spare_idx, spare_cnt)``
    suitable for shard_map over per-shard local arrays."""
    import numpy as _np

    n_tiles = int(_np.prod(tiling.n_tiles(pseudo_shape)))

    def local_init(tile_id, alive):
        fidx, fcnt = init_free_list(tile_id, alive, n_tiles, block,
                                    free_slots)
        sidx, scnt = init_spare_list(tile_id, alive, n_tiles, block,
                                     spare_slots)
        return fidx, fcnt, sidx, scnt

    return local_init


def drain_check(state, unplaced_seen: int, overflow_seen: int,
                spill_capacity: int, per_shard_capacity: int,
                n_steps: int):
    """Shared resort-on-drain heuristic for the sharded repair shells.

    Schedules a full resort when either signal fires since the last check
    (one host sync per step() call):

    * a large ``unplaced`` delta — relocation requests found their tile's
      stack empty (net migration imbalance draining the free slots);
    * ANY ``overflow`` delta — with repair on, overflow includes migration
      arrivals DROPPED because both their tile's stack and the spare stack
      were empty (permanent particle loss; legacy ``migrate_ring`` would
      have seated them in an untracked dead slot).  The resort rebuilds
      every stack from the full dead inventory, stopping further loss.

    Returns ``(need_resort, unplaced_seen', overflow_seen')``."""
    import warnings

    import jax.numpy as _jnp

    unplaced = int(_jnp.sum(state.unplaced))
    overflow = int(_jnp.sum(state.overflow))
    d_unpl = unplaced - unplaced_seen
    d_ovf = overflow - overflow_seen
    need = d_unpl > max(64, min(spill_capacity,
                                per_shard_capacity) // 8) * max(1, n_steps)
    if d_ovf > 0:
        warnings.warn(
            f"{d_ovf} migration arrivals were dropped (their tile's free "
            f"stack AND the spare stack were empty); scheduling a full "
            f"resort — raise spare_slots/repair_free_slots or lower the "
            f"resort threshold to avoid the loss",
            RuntimeWarning, stacklevel=3)
        need = True
    return need, unplaced, overflow
