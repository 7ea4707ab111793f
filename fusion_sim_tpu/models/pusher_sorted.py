"""Tile-sorted fast path for the grid-parity cylindrical pusher.

The reference's hot loop samples four coefficient textures per particle at
its (r, z) cell (``step_velocity_frag``, empic.js:749-773) and the sink mask
at the drifted position (``step_position_frag``, empic.js:712-720).  On TPU
the XLA row gather is latency-bound (~25-40 ns/row), capping the grid-parity
path near 3.5e7 pushes/s.  This module keeps the particles permanently in
the padded tile-sorted layout of ops/sorted_deposit and turns both samplings
into windowed MXU matmuls (``gather_sorted_2d`` with the reference's
NEAREST semantics), with the compacted exact patch (ops.interp.spill_rows)
for rows that out-drift their sort window or respawn across the domain.

Physics is bit-for-bit the non-sorted grid path per particle (the kernels
are shared: ``velocity_from_rows``, ``sink_respawn``); only the gather
route and particle ordering differ.  Particle *order* is NOT preserved —
``get_state`` of the shell returns the live rows in layout order.

Filler rows introduced by the padding sit frozen at a safe interior
position (r = z = 0.5, away from the r = 0 direction singularity) with
weight 0 in every deposit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boris import gather_nearest, velocity_from_rows
from ..ops.interp import spill_rows_cond
from ..ops.push import sink_respawn
from ..ops.rng import substep_uniforms
from ..ops.sorted_deposit import (Tiling2D, build_padded_layout,
                                  gather_sorted_2d)

FILLER = jnp.asarray([0.5, 0.0, 0.5], jnp.float32)


class SortedPusherState(NamedTuple):
    position: jax.Array     # (Np, 3) normalized Cartesian (fillers: FILLER)
    velocity: jax.Array     # (Np, 3)
    alive: jax.Array        # (Np,) the w flag (fillers: 1 = inert)
    valid: jax.Array        # (Np,) bool — False on filler rows
    tile_id: jax.Array      # (Np,) (r,z)-cell tile at last resort
    key: jax.Array
    moments_avg: jax.Array  # (nr, nz, 4)
    spill: jax.Array        # cumulative exact-patched rows (diagnostic)
    dropped: jax.Array      # cumulative respawns past respawn_capacity
                            # (backlog; rows retry next substep — should
                            # stay 0; raise respawn_capacity if not)
    dropped_over: jax.Array = None  # cumulative out-of-window rows past
                            # spill_capacity (frozen this substep, retry;
                            # raise spill_capacity / shorten resort_every)
    # incremental layout repair (repair=True) only:
    free_idx: jax.Array | None = None  # (n_tiles, F) per-tile dead-slot stacks
    free_cnt: jax.Array | None = None  # (n_tiles,)
    unplaced: jax.Array | None = None  # cumulative spills left in place


def _cell_coords(position: jax.Array, nr: int, nz: int) -> jax.Array:
    """(r*nr, z*nz) clamped — the NEAREST/CLAMP sample cell in grid units.

    Clamping reproduces the reference's CLAMP_TO_EDGE filtering AND keeps
    every coordinate inside the periodic window machinery's interior (edge
    windows wrap, but clamped coords only ever index interior window rows).
    """
    x, y, z = position[..., 0], position[..., 1], position[..., 2]
    r = jnp.sqrt(x * x + y * y)
    cu = jnp.clip(r * nr, 0.0, nr - 1e-3)
    cv = jnp.clip(z * nz, 0.0, nz - 1e-3)
    return jnp.stack([cu, cv], axis=-1)


def _relocate_out_rows(state: SortedPusherState, position, velocity, alive,
                       nr: int, nz: int, tiling: Tiling2D,
                       spill_capacity: int):
    """Repair pass shared by both substep backends: rows whose FINAL sample
    cell left their block's sort window (margin out-drifters and fresh
    respawns — the pusher's dominant layout churn) are relocated into dead
    filler slots of their new tile (ops/repair.py).  Unplaced rows stay put,
    keep taking the exact patch, and retry next substep.

    Returns ``(position, velocity, alive, valid, extra_state_fields)``."""
    from ..ops.repair import allocate_slots, relocate
    from ..ops.sorted_deposit import tile_ids

    n_tot = position.shape[0]
    ntz = tiling.n_tiles((nr, nz))[1]
    m = tiling.margin
    wr = tiling.tile_r + 2 * m + 1
    wz = tiling.tile_z + 2 * m + 1
    cell = _cell_coords(position, nr, nz)
    org_r = ((state.tile_id // ntz) * tiling.tile_r - m).astype(jnp.float32)
    org_z = ((state.tile_id % ntz) * tiling.tile_z - m).astype(jnp.float32)
    lr = jnp.mod(cell[:, 0] - org_r, nr)
    lz = jnp.mod(cell[:, 1] - org_z, nz)
    out = jnp.logical_or(lr >= float(wr - 1), lz >= float(wz - 1))
    mask = jnp.logical_and(out, state.valid)
    n_rel = jnp.sum(mask)
    idx, ok = spill_rows_cond(mask, n_rel, spill_capacity, n_tot)
    new_t = tile_ids(cell[idx], (nr, nz), tiling)
    dest, placed, fidx, fcnt, nun = allocate_slots(
        state.free_idx, state.free_cnt, idx, ok, new_t,
        state.tile_id[idx], n_tot, int(np.prod(tiling.n_tiles((nr, nz)))))
    (position, velocity, alive), valid = relocate(
        (position, velocity, alive), state.valid, idx, dest, placed,
        (position[idx], velocity[idx], alive[idx]), n_tot)
    extra = dict(free_idx=fidx, free_cnt=fcnt,
                 unplaced=state.unplaced + nun)
    return position, velocity, alive, valid, extra


def padded_size(spec, tiling: Tiling2D) -> int:
    """Static layout length: real count rounded to the block, plus the
    worst-case per-tile padding budget."""
    n_tiles = int(np.prod(tiling.n_tiles((spec.nr, spec.nz))))
    n0 = -(-spec.n_total // tiling.block) * tiling.block
    return n0 + n_tiles * tiling.block


def make_sorted_resort_fn(spec, tiling: Tiling2D, reserve: bool = False):
    nr, nz = spec.nr, spec.nz
    shape = (nr, nz)

    @jax.jit
    def resort(state: SortedPusherState) -> SortedPusherState:
        n_state = state.position.shape[0]
        cell = _cell_coords(state.position, nr, nz)
        # derive_valid: the slot-validity flag comes back from the sort key
        # (one fewer f32 operand through the sort network); `alive` is the
        # PHYSICS respawn flag (empic.js:719) and must ride as payload
        out = build_padded_layout(
            cell, shape, tiling,
            *[state.position[:, a] for a in range(3)],
            *[state.velocity[:, a] for a in range(3)],
            state.alive,
            valid=state.valid, reserve=reserve, spread=reserve,
            derive_valid=True)
        tid = out[0]
        pos_cols = out[2:5]
        vel_cols = out[5:8]
        alive_s, valid_s = out[8], out[9]
        valid_out = valid_s[:n_state]
        pos = jnp.stack([c[:n_state] for c in pos_cols], axis=-1)
        pos = jnp.where(valid_out[:, None], pos, FILLER)
        vel = jnp.stack([c[:n_state] for c in vel_cols], axis=-1)
        vel = jnp.where(valid_out[:, None], vel, 0.0)
        return state._replace(
            position=pos, velocity=vel,
            alive=jnp.where(valid_out, alive_s[:n_state], 1.0),
            valid=valid_out, tile_id=tid[:n_state])

    return resort


def make_sorted_step_fn(spec, tiling: Tiling2D, spill_capacity: int = 16384,
                        backend: str = "xla", repair: bool = False,
                        respawn_capacity: int | None = None,
                        spill_tiers: tuple[int, ...] = ()):
    """Jitted full step (two half-steps) on the padded sorted layout.

    ``backend``: 'xla' (windowed MXU gathers), 'pallas' (Mosaic gather
    kernel), or 'fused' (ONE Mosaic kernel per half-step covering gather +
    rotation + drift + sink sample — ops/pallas_pusher.py).  ``repair``
    relocates margin out-drifters/respawns into their new tile each substep
    (ops/repair.py) so the full resort never runs.

    ``respawn_capacity`` sizes the per-substep respawn compaction
    separately from the out-of-window patch: the respawn flux is the
    scenario's absorption RATE (~50 rows/substep at 1M on the default
    scenario — examples/probe_pusher_flux.py) while the patch flux is the
    accumulated out-of-window population (~650); ``None`` uses
    ``min(spill_capacity, 2048)``.  Respawn overflow surfaces in
    ``state.dropped`` (rows stay absorbed one more substep and retry);
    patch overflow surfaces in ``state.dropped_over`` — those rows FREEZE
    for the substep (position/velocity restored, no absorb/respawn) on
    every backend and retry, so under-capacity costs latency, never silent
    corruption."""
    if respawn_capacity is None:
        respawn_capacity = min(spill_capacity, 2048)
    nr, nz = spec.nr, spec.nz
    shape = (nr, nz)
    step_factor = spec.step_factor
    use_pallas = backend == "pallas"
    if use_pallas:
        from ..ops.pallas_gather import gather_sorted_2d_pallas
    if backend == "fused":
        return _make_fused_step_fn(spec, tiling, spill_capacity, repair,
                                   respawn_capacity, spill_tiers)
    interpret = jax.default_backend() != "tpu"

    def window_gather(grid, cell, tile_id):
        if use_pallas:
            return gather_sorted_2d_pallas(grid, cell, tile_id, shape, tiling,
                                           mode="nearest",
                                           interpret=interpret)
        return gather_sorted_2d(grid, cell, tile_id, shape, tiling,
                                mode="nearest")

    def substep(fields, state: SortedPusherState, packed):
        n_tot = state.position.shape[0]
        v_mask = state.valid
        rand, key = substep_uniforms(state.key, n_tot)

        # --- velocity: windowed 12-channel NEAREST gather + exact patch ---
        cell = _cell_coords(state.position, nr, nz)
        rows, g_inw = window_gather(packed, cell, state.tile_id)
        g_mask = jnp.logical_and(jnp.logical_not(g_inw), state.valid)
        n_g = jnp.sum(g_mask)
        idx, _ = spill_rows_cond(g_mask, n_g, spill_capacity, n_tot)
        pk = state.position[idx]
        rk = jnp.sqrt(pk[:, 0] ** 2 + pk[:, 1] ** 2)
        rows_k = gather_nearest(packed, rk, pk[:, 2])
        rows = rows.at[idx].set(rows_k, mode="drop")
        velocity = velocity_from_rows(state.position, state.velocity,
                                      state.alive, rand, rows)

        # --- position: drift, windowed sink sample + exact patch ----------
        next_pos = state.position + jnp.float32(step_factor) * velocity
        cell1 = _cell_coords(next_pos, nr, nz)
        sink, s_inw = window_gather(fields.sink_mask[..., None], cell1,
                                    state.tile_id)
        sink = sink[..., 0] if sink.ndim == 2 else sink
        s_mask = jnp.logical_and(jnp.logical_not(s_inw), state.valid)
        n_s = jnp.sum(s_mask)
        idx2, _ = spill_rows_cond(s_mask, n_s, spill_capacity, n_tot)
        pk2 = next_pos[idx2]
        rk2 = jnp.sqrt(pk2[:, 0] ** 2 + pk2[:, 1] ** 2)
        sink_k = gather_nearest(fields.sink_mask[..., None], rk2,
                                pk2[:, 2])[..., 0]
        sink = sink.at[idx2].set(sink_k, mode="drop")
        sink = jnp.where(v_mask, sink, 1.0)  # fillers never absorb/respawn

        # patch-capacity overflow: out-of-window rows past `spill_capacity`
        # were NOT patched — their gather rows / sink samples came from the
        # clamped window edge and are wrong.  FREEZE them for this substep
        # (no move, no absorb/respawn — same semantics as the fused
        # kernel's frozen lanes) so under-capacity surfaces as retry
        # latency in ``dropped_over``, never as silent physics corruption.
        frozen = jnp.zeros((n_tot,), bool)
        n_over = (jnp.maximum(n_g.astype(jnp.int32) - spill_capacity, 0)
                  + jnp.maximum(n_s.astype(jnp.int32) - spill_capacity, 0))
        if spill_capacity < n_tot:  # capacity >= N can never overflow
            patched_g = frozen.at[idx].set(True, mode="drop")
            patched_s = frozen.at[idx2].set(True, mode="drop")
            frozen = jnp.logical_or(
                jnp.logical_and(g_mask, jnp.logical_not(patched_g)),
                jnp.logical_and(s_mask, jnp.logical_not(patched_s)))
            sink = jnp.where(frozen, 1.0, sink)
        position, alive, n_drop = sink_respawn(
            next_pos, sink, rand, fields.inv_cdf,
            respawn_capacity=respawn_capacity)
        if spill_capacity < n_tot:
            position = jnp.where(frozen[:, None], state.position, position)
            velocity = jnp.where(frozen[:, None], state.velocity, velocity)
            alive = jnp.where(frozen, state.alive, alive)

        # --- repair + freeze fillers (inert, no NaNs, zero weight) --------
        extra = {}
        v = state.valid
        if repair:
            position, velocity, alive, v, extra = _relocate_out_rows(
                state, position, velocity, alive, nr, nz, tiling,
                spill_capacity)
            extra["valid"] = v
        position = jnp.where(v[:, None], position, FILLER)
        velocity = jnp.where(v[:, None], velocity, 0.0)
        alive = jnp.where(v, alive, 1.0)
        return state._replace(
            position=position, velocity=velocity, alive=alive, key=key,
            spill=state.spill + (n_g + n_s).astype(jnp.int32),
            dropped=state.dropped + n_drop,
            dropped_over=state.dropped_over + n_over, **extra)

    @jax.jit
    def step(fields, state: SortedPusherState) -> SortedPusherState:
        packed = jnp.concatenate(
            [fields.coeffs.r1, fields.coeffs.r2, fields.coeffs.r3,
             fields.coeffs.a], axis=-1)
        state = substep(fields, state, packed)
        state = substep(fields, state, packed)
        return state

    # multi-step: scan k steps in ONE dispatch (utils/stepping.py — the
    # per-step dispatch round-trip otherwise dominates cheap steps);
    # window = k steps + the resort, one dispatch per resort window
    multi_cache: dict = {}

    def _scan_fn(k: int, resort=None):
        @jax.jit
        def fn(fields, state):
            packed = jnp.concatenate(
                [fields.coeffs.r1, fields.coeffs.r2, fields.coeffs.r3,
                 fields.coeffs.a], axis=-1)

            def body(s, _):
                s = substep(fields, s, packed)
                s = substep(fields, s, packed)
                return s, None

            out, _ = jax.lax.scan(body, state, None, length=k)
            return out if resort is None else resort(out)

        return fn

    def multi(fields, state: SortedPusherState, k: int) -> SortedPusherState:
        fn = multi_cache.get(k)
        if fn is None:
            fn = multi_cache[k] = _scan_fn(k)
        return fn(fields, state)

    def window(fields, state: SortedPusherState, k: int,
               resort) -> SortedPusherState:
        fn = multi_cache.get(("w", k))
        if fn is None:
            fn = multi_cache[("w", k)] = _scan_fn(k, resort)
        return fn(fields, state)

    step.multi = multi
    step.window = window
    return step


def _make_fused_step_fn(spec, tiling: Tiling2D, spill_capacity: int,
                        repair: bool = False,
                        respawn_capacity: int | None = None,
                        spill_tiers: tuple[int, ...] = ()):
    """Full step via the fused Mosaic substep kernel (ops/pallas_pusher.py);
    RNG, respawn replacement, and the exact spill patch stay in XLA.

    The streamed per-tile windows depend only on the field coefficients
    (static between field edits), so they are built once per field set and
    cached host-side (keyed on the coefficient array identity)."""
    from ..ops.pallas_pusher import (build_pusher_windows,
                                     fused_pusher_substep)

    if respawn_capacity is None:
        respawn_capacity = min(spill_capacity, 2048)
    tier_caps = (*spill_tiers, spill_capacity)
    nr, nz = spec.nr, spec.nz
    step_factor = spec.step_factor
    interpret = jax.default_backend() != "tpu"
    win_cache: dict = {}

    def substep(fields, state: SortedPusherState, packed13, windows):
        n_tot = state.position.shape[0]
        rand, key = substep_uniforms(state.key, n_tot)
        cell = _cell_coords(state.position, nr, nz)
        pos1, vel1, sink, inw = fused_pusher_substep(
            packed13, state.position, state.velocity, state.alive, rand,
            cell, state.tile_id, nr, nz, tiling, step_factor,
            windows=windows, interpret=interpret)

        # exact re-push of out-of-window rows (compacted).  The whole K-row
        # chain (13-channel NEAREST gather + rotation + drift + sink sample)
        # rides a lax.cond per ``spill_tiers`` capacity — each substep runs
        # exactly ONE chain, the smallest tier covering this substep's
        # spill count, so the common low-spill substep pays a small-buffer
        # chain instead of the capacity-sized latency-bound ops (the
        # `spill > 0` cond alone almost never skips: respawns and outlier
        # drifters spill a few rows every substep).  Branch outputs are
        # lane-major (d, cap) — no T(8,128) minor-dim blowup.
        mask = jnp.logical_and(jnp.logical_not(inw), state.valid)
        n_sp = jnp.sum(mask)
        from ..ops.boris import velocity_from_rows

        for i, cap_i in enumerate(tier_caps):
            lo = 0 if i == 0 else tier_caps[i - 1]
            if i == len(tier_caps) - 1:
                hot = n_sp > lo    # top tier also handles overflow
            else:
                hot = (n_sp > lo) & (n_sp <= cap_i)
            idx, _ = spill_rows_cond(mask, jnp.where(hot, n_sp, 0), cap_i,
                                     n_tot)

            def _patch_hot(idx=idx):
                pk = state.position[idx]
                rk = jnp.sqrt(pk[:, 0] ** 2 + pk[:, 1] ** 2)
                rows_k = gather_nearest(packed13[..., :12], rk, pk[:, 2])
                vel_k = velocity_from_rows(pk, state.velocity[idx],
                                           state.alive[idx], rand[idx],
                                           rows_k)
                pos_k = pk + jnp.float32(step_factor) * vel_k
                rk2 = jnp.sqrt(pos_k[:, 0] ** 2 + pos_k[:, 1] ** 2)
                sink_k = gather_nearest(packed13[..., 12:13], rk2,
                                        pos_k[:, 2])[..., 0]
                return pos_k.T, vel_k.T, sink_k

            def _patch_cold(cap_i=cap_i):
                z = jnp.zeros((3, cap_i), jnp.float32)
                return z, z, jnp.ones((cap_i,), jnp.float32)

            pos_kT, vel_kT, sink_k = jax.lax.cond(hot, _patch_hot,
                                                  _patch_cold)
            pos1 = pos1.at[idx].set(pos_kT.T, mode="drop")
            vel1 = vel1.at[idx].set(vel_kT.T, mode="drop")
            sink = sink.at[idx].set(sink_k, mode="drop")

        # sink/respawn (shared exact path; fillers never absorb)
        sink = jnp.where(state.valid, sink, 1.0)
        position, alive, n_drop = sink_respawn(
            pos1, sink, rand, fields.inv_cdf,
            respawn_capacity=respawn_capacity)

        extra = {}
        v = state.valid
        velocity = vel1
        if repair:
            position, velocity, alive, v, extra = _relocate_out_rows(
                state, position, velocity, alive, spec.nr, spec.nz, tiling,
                spill_capacity)
            extra["valid"] = v
        position = jnp.where(v[:, None], position, FILLER)
        velocity = jnp.where(v[:, None], velocity, 0.0)
        alive = jnp.where(v, alive, 1.0)
        # patch-capacity overflow: rows past `spill_capacity` come back
        # frozen from the kernel and retry until the next resort — count
        # them separately from the respawn backlog so the under-sized
        # buffer (spill_capacity vs respawn_capacity) is identifiable
        n_over = jnp.maximum(n_sp.astype(jnp.int32) - spill_capacity, 0)
        return state._replace(
            position=position, velocity=velocity, alive=alive, key=key,
            spill=state.spill + n_sp.astype(jnp.int32),
            dropped=state.dropped + n_drop,
            dropped_over=state.dropped_over + n_over, **extra)

    @jax.jit
    def _step_inner(fields, state, packed13, windows):
        state = substep(fields, state, packed13, windows)
        state = substep(fields, state, packed13, windows)
        return state

    def _windows(fields):
        ck = (id(fields.coeffs.r1), id(fields.sink_mask))
        if win_cache.get("key") != ck:
            packed13 = jnp.concatenate(
                [fields.coeffs.r1, fields.coeffs.r2, fields.coeffs.r3,
                 fields.coeffs.a, fields.sink_mask[..., None]], axis=-1)
            win_cache.update(
                key=ck, packed13=packed13,
                windows=build_pusher_windows(packed13, nr, nz, tiling))
        return win_cache["packed13"], win_cache["windows"]

    def step(fields, state: SortedPusherState) -> SortedPusherState:
        packed13, windows = _windows(fields)
        return _step_inner(fields, state, packed13, windows)

    # multi-step: scan k steps in ONE dispatch (utils/stepping.py — the
    # per-step dispatch round-trip otherwise dominates the fused kernel);
    # window = k steps + the resort, one dispatch per resort window
    multi_cache: dict = {}

    def _scan_fn(k: int, resort=None):
        @jax.jit
        def fn(fields, state, packed13, windows):
            def body(s, _):
                s = substep(fields, s, packed13, windows)
                s = substep(fields, s, packed13, windows)
                return s, None

            out, _ = jax.lax.scan(body, state, None, length=k)
            return out if resort is None else resort(out)

        return fn

    def multi(fields, state: SortedPusherState, k: int) -> SortedPusherState:
        packed13, windows = _windows(fields)
        fn = multi_cache.get(k)
        if fn is None:
            fn = multi_cache[k] = _scan_fn(k)
        return fn(fields, state, packed13, windows)

    def window(fields, state: SortedPusherState, k: int,
               resort) -> SortedPusherState:
        packed13, windows = _windows(fields)
        fn = multi_cache.get(("w", k))
        if fn is None:
            fn = multi_cache[("w", k)] = _scan_fn(k, resort)
        return fn(fields, state, packed13, windows)

    step.multi = multi
    step.window = window
    return step


def make_sorted_density_fn(spec):
    """Density/render pass over the padded layout (filler weight 0)."""
    from ..ops.deposit import deposit_moments, ema_moments, normalize_moments
    from ..utils.render import render_bmag, render_density_overlay

    @jax.jit
    def density(fields, state: SortedPusherState):
        moments = deposit_moments(state.position, state.velocity,
                                  spec.nr, spec.nz,
                                  weights=state.valid.astype(jnp.float32))
        norm = normalize_moments(moments)
        avg = ema_moments(norm, state.moments_avg)
        background = render_bmag(fields.b)
        frame = render_density_overlay(background, avg)
        return state._replace(moments_avg=avg), frame

    return density


def to_sorted_state(state, spec, tiling: Tiling2D,
                    reserve: bool = False) -> SortedPusherState:
    """PusherState -> padded sorted layout (order not preserved)."""
    n = spec.n_total
    n_p = padded_size(spec, tiling)
    n0 = -(-n // tiling.block) * tiling.block

    def pad(a, fill=0.0):
        widths = [(0, n0 - n)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    pos = pad(state.position)
    base = SortedPusherState(
        position=jnp.concatenate(
            [pos, jnp.broadcast_to(FILLER, (n_p - n0, 3))]),
        velocity=jnp.concatenate(
            [pad(state.velocity), jnp.zeros((n_p - n0, 3), jnp.float32)]),
        alive=jnp.concatenate(
            [pad(state.alive, 1.0), jnp.ones((n_p - n0,), jnp.float32)]),
        valid=jnp.arange(n_p) < n,
        tile_id=jnp.zeros((n_p,), jnp.int32),
        key=state.key,
        moments_avg=state.moments_avg,
        spill=jnp.int32(0),
        dropped=jnp.int32(0),
        dropped_over=jnp.int32(0),
    )
    return make_sorted_resort_fn(spec, tiling, reserve=reserve)(base)


def from_sorted_state(sorted_state: SortedPusherState, spec, state_cls):
    """Padded sorted layout -> PusherState (live rows, layout order)."""
    n = spec.n_total
    order = jnp.argsort(~sorted_state.valid, stable=True)[:n]
    return state_cls(
        position=sorted_state.position[order],
        velocity=sorted_state.velocity[order],
        alive=sorted_state.alive[order],
        key=sorted_state.key,
        moments_avg=sorted_state.moments_avg,
    )
