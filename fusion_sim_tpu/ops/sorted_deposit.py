"""Sorted tile-window deposition via digit-factorized matmuls.

The fastest TPU deposition path measured in this framework (PERFORMANCE.md):
XLA scatter-adds cost ~25-40 ns per row, but for particles *sorted by grid
tile* the CIC deposit factorizes per block of P particles into

    window(h, l) = sum_p  Ar[p, h] * Bz[p, l]      (separable CIC!)

with Ar/Bz the per-axis weighted corner one-hots — i.e. ONE batched matmul
per particle block with contraction over particles (K = P = 1024, the
MXU-friendly orientation).  Windows then land on the grid without any big
scatter: a tiny segment-sum over blocks (one row per block) followed by a
dense reshape/roll assembly, because windows align to the regular tile
partition.

Measured on v5e at 10M particles, 512^2 grid: 17.7 ms vs 186 ms for the
packed scatter path (10.5x).  Multi-payload sort costs ~80 ms at 10M and
amortizes over ~2M/TR steps with the ``margin`` parameter (particles may
drift ``margin`` cells from their sort-time tile before any mass is
dropped; the returned ``spill`` counts what was).

Usage pattern (the caller owns the sort cadence):

    tid, pos, w, _ = build_padded_layout(position, shape, tiling, weights)
    ... keep particle arrays in the padded sorted layout; rebuild every K steps ...
    rho, spill, spill_mask = deposit_sorted_2d(pos, w, tid, shape, tiling)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Tiling2D:
    """Static tile geometry: tile_r x tile_z cells, P particles per block,
    margin cells of drift tolerance on every side."""

    tile_r: int = 32
    tile_z: int = 32
    block: int = 1024
    margin: int = 4
    # matmul element type for the one-hot factors: float32 is exact (CIC
    # weights at full precision); bfloat16 is ~1.4x faster with ~0.4%
    # weight rounding (visible as slow numerical heating in long runs).
    dtype: str = "float32"

    def __post_init__(self):
        # the window extract/fold machinery reaches at most ONE neighboring
        # tile per side: the window [-margin, tile + margin + 1) must stay
        # within [-tile, 2*tile)
        if self.margin + 1 > min(self.tile_r, self.tile_z):
            raise ValueError(
                f"margin {self.margin} needs margin + 1 <= tile "
                f"({self.tile_r}, {self.tile_z}) — windows may overhang at "
                f"most one neighboring tile per side")

    def n_tiles(self, shape: tuple[int, int]) -> tuple[int, int]:
        nr, nz = shape
        if nr % self.tile_r or nz % self.tile_z:
            raise ValueError(f"grid {shape} not divisible by tile "
                             f"({self.tile_r}, {self.tile_z})")
        return nr // self.tile_r, nz // self.tile_z


def tile_ids(position: jax.Array, shape: tuple[int, int],
             tiling: Tiling2D) -> jax.Array:
    """Flat tile id per particle (periodic grid units)."""
    ntr, ntz = tiling.n_tiles(shape)
    base = jnp.floor(position).astype(jnp.int32)
    tr = jnp.clip(base[:, 0] // tiling.tile_r, 0, ntr - 1)
    tz = jnp.clip(base[:, 1] // tiling.tile_z, 0, ntz - 1)
    return tr * ntz + tz


def sort_by_tile(position: jax.Array, shape: tuple[int, int],
                 tiling: Tiling2D, *payloads: jax.Array):
    """Sort particles (and payloads) by tile id.

    Returns ``(tile_sorted, position_sorted, *payloads_sorted)``.  Payload
    arrays must be 1D or have their leading axis = N (2D arrays are sorted
    column-wise through lax.sort operands).
    """
    tid = tile_ids(position, shape, tiling)
    operands = [tid, position[:, 0], position[:, 1]]
    splits = []
    for p in payloads:
        if p.ndim == 1:
            operands.append(p)
            splits.append(1)
        else:
            for c in range(p.shape[1]):
                operands.append(p[:, c])
            splits.append(p.shape[1])
    out = jax.lax.sort(tuple(operands), num_keys=1)
    tid_s = out[0]
    pos_s = jnp.stack([out[1], out[2]], axis=-1)
    rest = []
    i = 3
    for p, k in zip(payloads, splits):
        if k == 1:
            rest.append(out[i])
        else:
            rest.append(jnp.stack(out[i:i + k], axis=-1))
        i += k
    return (tid_s, pos_s, *rest)


def build_padded_layout(position: jax.Array, shape: tuple[int, ...],
                        tiling, *payloads: jax.Array,
                        valid: jax.Array | None = None,
                        reserve: bool = False,
                        spread: bool = False,
                        derive_valid: bool = False):
    """Sort particles by tile AND pad every tile's segment to a multiple of
    ``tiling.block`` with dead filler rows (weight handling is the caller's:
    fillers carry position 0 and payload 0 — give weights as a payload and
    they become zero-weight).

    This is the layout the sorted deposits assume: each block then lies
    entirely inside one tile, so spill stays zero until particles drift
    further than ``margin`` cells (resort cadence).  Works for 2D
    (``Tiling2D``) and 3D (``Tiling3D``) grids.

    ``valid`` (optional, (N,) bool): rows marked invalid are treated as dead
    — they keep their payload values but sort into the trailing dead region
    with ``tile_id = n_tiles`` (the sharded models resort fixed-capacity
    slots without compacting on the host).

    ``reserve``: guarantee EVERY tile at least ONE filler row — tiles whose
    count would pad to zero (empty tiles, and tiles landing exactly on a
    block multiple) get a full extra block of fillers instead.  The
    incremental-repair paths (ops/repair.py) need this: without it a tile
    with no particles has no segment, hence no dead slots, and arrivals
    into it can never be relocated (fatal for strongly non-uniform layouts
    like the pusher's source-concentrated default scenario).  The total
    layout length is unchanged — the per-tile reserve consumes the same
    ``n_tiles * block`` budget the trailing dead region otherwise absorbs.

    ``spread``: additionally distribute ALL surplus dead blocks round-robin
    over the tile segments instead of leaving them in the trailing region —
    maximizes the repair stacks' per-tile inventory at zero extra cost for
    the single-chip models (the sharded models keep the trailing region:
    migration spare slots live there).

    Returns ``(tile_id, position, *payloads, n_valid)`` arrays of fixed
    length ``N + n_tiles*block`` (fillers sorted to the end of their tile's
    segment; surplus fillers and invalid rows at the global end carry
    tile_id = n_tiles, consumed as trailing all-dead blocks).  ``n_valid``
    counts the real + per-tile-filler prefix.

    ``derive_valid``: additionally return the post-sort row-validity mask,
    inserted before ``n_valid`` — i.e. ``(tile_id, position, *payloads,
    valid_sorted, n_valid)``.  Valid rows are exactly the real (non-filler)
    rows whose ``valid`` input was True: derived from the sort key alone
    (real rows carry even keys; invalid real rows were re-keyed to the
    trailing tile), so callers that only need the flag back SKIP sorting a
    whole f32 validity column — one fewer 10M-row operand through the sort
    network (~12 ms/operand measured on v5e, examples/bench_resort.py).
    """
    n_dim = len(shape)
    n_tiles = int(np.prod(tiling.n_tiles(shape)))
    p_blk = tiling.block
    n = position.shape[0]
    if n % p_blk:
        raise ValueError(f"N={n} must be a multiple of block={p_blk} "
                         "(append dead rows first)")
    total_pad = n_tiles * p_blk

    tid = (tile_ids(position, shape, tiling) if n_dim == 2
           else tile_ids_3d(position, shape, tiling))
    if valid is not None:
        tid = jnp.where(valid, tid, n_tiles)
    tid_sorted = jnp.sort(tid)
    # per-tile counts via boundaries in the sorted ids
    bounds = jnp.searchsorted(tid_sorted, jnp.arange(n_tiles + 1))
    counts = bounds[1:] - bounds[:-1]
    pads = (-counts) % p_blk
    if reserve:
        # every tile keeps >= 1 filler block of free slots (see docstring);
        # per-tile pad <= p_blk so the n_tiles*p_blk budget always covers it
        pads = jnp.where(pads == 0, p_blk, pads)
    if spread:
        # distribute the surplus (would-be trailing) dead blocks round-robin
        # over the tile segments: identical layout length and block count —
        # trailing blocks are processed (and skipped as dead) either way —
        # but every dead slot now sits where the repair free stacks
        # (ops/repair.py) can hand it to an arrival.  Without this, tiles
        # whose count lands just under a block multiple start with almost
        # no inventory and relocation fails into `unplaced` churn.
        extra_blocks = (total_pad - jnp.sum(pads)) // p_blk
        base_e = extra_blocks // n_tiles
        rem_e = extra_blocks % n_tiles
        # the remainder blocks go to the thinnest tiles (smallest pad), not
        # the lowest indices — otherwise high-index tiles with counts just
        # under a block multiple keep near-zero inventory
        rank = jnp.argsort(jnp.argsort(pads))
        pads = pads + (base_e + (rank < rem_e)) * p_blk
    cum_pads = jnp.cumsum(pads)
    # filler j gets the tile whose cumulative pad range contains j; the
    # surplus beyond cum_pads[-1] sorts to the global end (tile = n_tiles)
    j = jnp.arange(total_pad)
    filler_tile = jnp.searchsorted(cum_pads, j, side="right")
    filler_tile = jnp.where(j < cum_pads[-1], filler_tile, n_tiles)

    # sort (real + filler) by (tile, realness) — fillers after real rows
    key = tid * 2
    filler_key = filler_tile * 2 + 1
    all_keys = jnp.concatenate([key, filler_key]).astype(jnp.int32)
    all_pos = jnp.concatenate([position,
                               jnp.zeros((total_pad, n_dim), position.dtype)])
    operands = [all_keys] + [all_pos[:, a] for a in range(n_dim)]
    widths = []
    for p in payloads:
        if p.ndim == 1:
            operands.append(jnp.concatenate([p, jnp.zeros((total_pad,), p.dtype)]))
            widths.append(1)
        else:
            padp = jnp.concatenate([p, jnp.zeros((total_pad, p.shape[1]), p.dtype)])
            for c in range(p.shape[1]):
                operands.append(padp[:, c])
            widths.append(p.shape[1])
    out = jax.lax.sort(tuple(operands), num_keys=1)
    tid_out = out[0] // 2
    pos_out = jnp.stack(out[1:1 + n_dim], axis=-1)
    rest = []
    i = 1 + n_dim
    for w in widths:
        if w == 1:
            rest.append(out[i])
        else:
            rest.append(jnp.stack(out[i:i + w], axis=-1))
        i += w
    n_eff = n if valid is None else jnp.sum(valid)
    if derive_valid:
        # real rows have even keys; invalid real rows were re-keyed to the
        # trailing tile (key = 2*n_tiles) and fillers carry odd keys
        valid_out = jnp.logical_and(out[0] % 2 == 0, out[0] < 2 * n_tiles)
        return (tid_out, pos_out, *rest, valid_out, n_eff + cum_pads[-1])
    return (tid_out, pos_out, *rest, n_eff + cum_pads[-1])


@functools.partial(jax.jit, static_argnames=("shape", "tiling"))
def deposit_sorted_2d(
    position: jax.Array,
    weights: jax.Array,
    tile_id: jax.Array,
    shape: tuple[int, int],
    tiling: Tiling2D,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """CIC deposit of tile-sorted particles; returns
    ``(grid, spill_count, spill_mask)``.

    ``position`` (N, 2) grid units, sorted so equal ``tile_id`` runs are
    contiguous (N must be a multiple of ``tiling.block``; pad with
    weight-0 particles).  ``spill`` counts particles outside their block's
    window (drifted past ``margin`` since the sort) whose mass was dropped —
    callers resort before this becomes nonzero.
    """
    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    p_blk = tiling.block
    m = tiling.margin
    tr_t, tz_t = tiling.tile_r, tiling.tile_z
    wr = tr_t + 2 * m + 1
    wz = tz_t + 2 * m + 1

    n = position.shape[0]
    if n % p_blk:
        raise ValueError(f"N={n} not a multiple of block={p_blk}")
    nb = n // p_blk

    base = jnp.floor(position).astype(jnp.int32)
    frac = position - base

    blk_tile = tile_id[::p_blk]
    blk_tr = (blk_tile // ntz) * tr_t - m   # window origin (may be negative)
    blk_tz = (blk_tile % ntz) * tz_t - m

    # window-relative offsets modulo the grid: periodic wraps land back in
    # the window (a particle wrapped across the domain edge stays depositable)
    dr = jnp.mod(base[:, 0].reshape(nb, p_blk) - blk_tr[:, None], nr)
    dz = jnp.mod(base[:, 1].reshape(nb, p_blk) - blk_tz[:, None], nz)
    in_win = (dr >= 0) & (dr < wr - 1) & (dz >= 0) & (dz < wz - 1)
    wb = jnp.where(in_win, weights.reshape(nb, p_blk), 0.0)
    fr = frac[:, 0].reshape(nb, p_blk)
    fz = frac[:, 1].reshape(nb, p_blk)
    drc = jnp.clip(dr, 0, wr - 2)
    dzc = jnp.clip(dz, 0, wz - 2)

    hr = jnp.arange(wr, dtype=jnp.int32)
    hz = jnp.arange(wz, dtype=jnp.int32)
    ar = ((wb * (1 - fr))[..., None] * (drc[..., None] == hr)
          + (wb * fr)[..., None] * (drc[..., None] + 1 == hr))
    bz = ((1 - fz)[..., None] * (dzc[..., None] == hz)
          + fz[..., None] * (dzc[..., None] + 1 == hz))
    mm_dtype = jnp.bfloat16 if tiling.dtype == "bfloat16" else jnp.float32
    precision = (jax.lax.Precision.DEFAULT if tiling.dtype == "bfloat16"
                 else jax.lax.Precision.HIGHEST)
    win = jnp.einsum("bph,bpl->bhl", ar.astype(mm_dtype), bz.astype(mm_dtype),
                     preferred_element_type=jnp.float32, precision=precision)

    g = _assemble_tile_windows(win, blk_tile, shape, tiling, wr, wz)

    # only weight-carrying particles count as spill (filler rows from the
    # padded layout land in trailing out-of-range blocks with weight 0)
    spill_mask = (~in_win) & (weights.reshape(nb, p_blk) != 0)
    return g, jnp.sum(spill_mask), spill_mask.reshape(-1)


@dataclasses.dataclass(frozen=True)
class Tiling3D:
    """3D tile geometry for the sorted deposition (see Tiling2D).

    Defaults are the best measured configuration at config[3] scale
    (PERFORMANCE.md: 8^3 tiles, margin 1, block 512 -> 1609 ms/step at 3e7
    particles, 128^3); margin 1 implies a short resort cadence, but
    out-drifters fall back exactly by default (spill_fallback)."""

    tile: tuple[int, int, int] = (8, 8, 8)
    block: int = 512
    margin: int = 1
    dtype: str = "float32"

    def __post_init__(self):
        if self.margin + 1 > min(self.tile):  # see Tiling2D.__post_init__
            raise ValueError(
                f"margin {self.margin} needs margin + 1 <= tile "
                f"{self.tile} — windows may overhang at most one "
                f"neighboring tile per side")

    def n_tiles(self, shape: tuple[int, int, int]) -> tuple[int, int, int]:
        out = []
        for n, t in zip(shape, self.tile):
            if n % t:
                raise ValueError(f"grid {shape} not divisible by tile {self.tile}")
            out.append(n // t)
        return tuple(out)


def tile_ids_3d(position: jax.Array, shape: tuple[int, int, int],
                tiling: Tiling3D) -> jax.Array:
    nts = tiling.n_tiles(shape)
    base = jnp.floor(position).astype(jnp.int32)
    tid = 0
    for a in range(3):
        t = jnp.clip(base[:, a] // tiling.tile[a], 0, nts[a] - 1)
        tid = tid * nts[a] + t
    return tid


@functools.partial(jax.jit, static_argnames=("shape", "tiling"))
def deposit_sorted_3d(
    position: jax.Array,
    weights: jax.Array,
    tile_id: jax.Array,
    shape: tuple[int, int, int],
    tiling: Tiling3D,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """3D CIC deposit of tile-sorted particles (digit-matmul form);
    returns ``(grid, spill_count, spill_mask)``.

    The 3D CIC weight is a rank-1 triple product Ar (x) Ay (x) Az; two axes
    fold into one outer-product factor per particle, leaving one batched
    matmul per block:  win (wx, wy*wz) = Ax^T @ (Ay (x) Az).
    Same layout contract as deposit_sorted_2d (build the padded layout with
    per-tile block padding keyed on ``tile_ids_3d``).
    """
    nts = tiling.n_tiles(shape)
    p_blk = tiling.block
    m = tiling.margin
    wins = tuple(t + 2 * m + 1 for t in tiling.tile)
    wx, wy, wz = wins

    n = position.shape[0]
    nb = n // p_blk
    base = jnp.floor(position).astype(jnp.int32)
    frac = position - base

    blk_tile = tile_id[::p_blk]
    t_idx = []
    rem = blk_tile
    for a in (2, 1, 0):
        t_idx.append(rem % nts[a])
        rem = rem // nts[a]
    t_idx = t_idx[::-1]  # (tx, ty, tz) per block
    origins = [t_idx[a] * tiling.tile[a] - m for a in range(3)]

    db = []
    in_win = True
    for a in range(3):
        d = jnp.mod(base[:, a].reshape(nb, p_blk) - origins[a][:, None], shape[a])
        in_win = in_win & (d < wins[a] - 1)
        db.append(jnp.minimum(d, wins[a] - 2))
    wb = jnp.where(in_win, weights.reshape(nb, p_blk), 0.0)

    def axis_factor(a, weighted):
        f = frac[:, a].reshape(nb, p_blk)
        h = jnp.arange(wins[a], dtype=jnp.int32)
        w1 = (wb * (1 - f)) if weighted else (1 - f)
        w2 = (wb * f) if weighted else f
        return (w1[..., None] * (db[a][..., None] == h)
                + w2[..., None] * (db[a][..., None] + 1 == h))

    ax = axis_factor(0, weighted=True)                     # (nb, P, wx)
    ay = axis_factor(1, weighted=False)                    # (nb, P, wy)
    az = axis_factor(2, weighted=False)                    # (nb, P, wz)
    ayz = (ay[..., :, None] * az[..., None, :]).reshape(nb, p_blk, wy * wz)

    mm = jnp.bfloat16 if tiling.dtype == "bfloat16" else jnp.float32
    precision = (jax.lax.Precision.DEFAULT if tiling.dtype == "bfloat16"
                 else jax.lax.Precision.HIGHEST)
    win = jnp.einsum("bph,bpl->bhl", ax.astype(mm), ayz.astype(mm),
                     preferred_element_type=jnp.float32, precision=precision)
    win = win.reshape(nb, wx, wy, wz)

    # segment blocks into tile windows, then fold the 3x3x3 tile overlap
    g = _assemble_tile_windows_3d(win, blk_tile, shape, tiling)

    spill_mask = (~in_win) & (weights.reshape(nb, p_blk) != 0)
    return g, jnp.sum(spill_mask), spill_mask.reshape(-1)


@functools.partial(jax.jit, static_argnames=("shape", "tiling", "dt", "cell_size"))
def esirkepov_sorted_3d(
    x0: jax.Array,
    x1: jax.Array,
    charge: jax.Array,
    tile_id: jax.Array,
    dt: float,
    shape: tuple[int, int, int],
    cell_size: tuple[float, float, float],
    tiling: Tiling3D,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """3D charge-conserving current deposition for tile-sorted particles.

    Esirkepov's 3D weight for component a (axes b, c the other two) is
    W_a = dS_a * [S0_b S0_c + (dS_b S0_c + S0_b dS_c)/2 + dS_b dS_c/3],
    whose bracket splits into two separable pairs (same pairing as the 2D
    Jz):  (S0_b + dS_b/2) (x) S0_c  +  (S0_b/2 + dS_b/3) (x) dS_c.
    Each J component is then ONE matmul per block:
    [coef * cumsum(dS_a)]^T @ [pair1 + pair2 outer products].

    The (P, w_b*w_c) outer-product factor is large at scale, so blocks are
    processed in scanned groups with a tile-window accumulator.
    """
    nts = tiling.n_tiles(shape)
    n_tiles = int(np.prod(nts))
    p_blk = tiling.block
    m = tiling.margin
    wins = tuple(t + 2 * m + 1 for t in tiling.tile)
    d_cell = cell_size
    vol = d_cell[0] * d_cell[1] * d_cell[2]

    n = x0.shape[0]
    nb = n // p_blk
    q = jnp.broadcast_to(jnp.asarray(charge, jnp.float32), (n,)).reshape(nb, p_blk)

    def shapes_1d(x, base):
        k = jnp.arange(3, dtype=jnp.float32)
        d = jnp.abs(x[..., None] - (base[..., None].astype(jnp.float32) + k))
        return jnp.maximum(0.0, 1.0 - d)

    s0, ds, db = [], [], []
    blk_tile = tile_id[::p_blk]
    rem = blk_tile
    t_idx = []
    for a in (2, 1, 0):
        t_idx.append(rem % nts[a])
        rem = rem // nts[a]
    t_idx = t_idx[::-1]
    in_win = True
    for a in range(3):
        base_a = jnp.floor(jnp.minimum(x0[:, a], x1[:, a])).astype(jnp.int32).reshape(nb, p_blk)
        s0_a = shapes_1d(x0[:, a].reshape(nb, p_blk), base_a)
        s1_a = shapes_1d(x1[:, a].reshape(nb, p_blk), base_a)
        origin = t_idx[a] * tiling.tile[a] - m
        d_a = jnp.mod(base_a - origin[:, None], shape[a])
        in_win = in_win & (d_a <= wins[a] - 3)
        s0.append(s0_a)
        ds.append(s1_a - s0_a)
        db.append(jnp.minimum(d_a, wins[a] - 3))
    qm = jnp.where(in_win, q, 0.0)

    mm = jnp.bfloat16 if tiling.dtype == "bfloat16" else jnp.float32
    precision = (jax.lax.Precision.DEFAULT if tiling.dtype == "bfloat16"
                 else jax.lax.Precision.HIGHEST)

    # scanned block groups: bound the (P, w_b*w_c) outer-product memory
    group = max(1, min(nb, int(5e8 // (p_blk * max(w1 * w2 for w1 in wins
                                                   for w2 in wins) * 4))))
    n_groups = (nb + group - 1) // group
    pad_blocks = n_groups * group - nb

    def pad_g(arr):
        if pad_blocks:
            arr = jnp.concatenate(
                [arr, jnp.zeros((pad_blocks, *arr.shape[1:]), arr.dtype)])
        return arr.reshape(n_groups, group, *arr.shape[1:])

    s0_g = [pad_g(a) for a in s0]
    ds_g = [pad_g(a) for a in ds]
    db_g = [pad_g(a) for a in db]
    qm_g = pad_g(qm)
    # group padding targets tile 0 with zero weights — contributes nothing
    blk_tile_g = pad_g(blk_tile)

    def group_body(tw_acc, xs):
        s0x, s0y, s0z, dsx, dsy, dsz, dbx, dby, dbz, qb, bt = xs
        s0_l = [s0x, s0y, s0z]
        ds_l = [dsx, dsy, dsz]
        db_l = [dbx, dby, dbz]
        wins_l = wins
        out_wins = []
        for a in range(3):
            b_ax, c_ax = [ax for ax in range(3) if ax != a]
            coef = -(d_cell[a] / (vol * dt))
            fa = _expand_window((qb * coef)[..., None] * jnp.cumsum(ds_l[a], axis=-1),
                                db_l[a], wins_l[a])
            p1b = _expand_window(s0_l[b_ax] + 0.5 * ds_l[b_ax], db_l[b_ax], wins_l[b_ax])
            p1c = _expand_window(s0_l[c_ax], db_l[c_ax], wins_l[c_ax])
            p2b = _expand_window(0.5 * s0_l[b_ax] + ds_l[b_ax] / 3.0, db_l[b_ax], wins_l[b_ax])
            p2c = _expand_window(ds_l[c_ax], db_l[c_ax], wins_l[c_ax])
            mix = (p1b[..., :, None] * p1c[..., None, :]
                   + p2b[..., :, None] * p2c[..., None, :])
            mix = mix.reshape(group, p_blk, wins_l[b_ax] * wins_l[c_ax])
            win_a = jnp.einsum("bph,bpl->bhl", fa.astype(mm), mix.astype(mm),
                               preferred_element_type=jnp.float32,
                               precision=precision)
            # axes of win_a: (a-window, b-window x c-window); reorder to
            # (x, y, z) window order
            win_a = win_a.reshape(group, wins_l[a], wins_l[b_ax], wins_l[c_ax])
            win_a = jnp.moveaxis(win_a, 1, 1 + a)
            out_wins.append(win_a)
        win = jnp.stack(out_wins, axis=-1)  # (group, wx, wy, wz, 3)
        tw_acc = tw_acc + jax.ops.segment_sum(
            win.reshape(group, -1), bt, num_segments=n_tiles)
        return tw_acc, None

    # + 0*qm keeps the carry 'varying' under shard_map (a bare zeros carry
    # is replicated and scan rejects the carry-type mismatch)
    tw0 = (jnp.zeros((n_tiles, int(np.prod(wins)) * 3), jnp.float32)
           + 0.0 * qm_g.ravel()[0])
    tw, _ = jax.lax.scan(group_body, tw0,
                         (*s0_g, *ds_g, *db_g, qm_g, blk_tile_g))
    tw = tw.reshape(*nts, *wins, 3)

    # dense 3x3x3 tile assembly (channelled)
    full = jnp.zeros((*nts, *[3 * t for t in tiling.tile], 3), jnp.float32)
    sl = tuple(slice(t - m, t - m + w) for t, w in zip(tiling.tile, wins))
    full = full.at[(slice(None),) * 3 + sl].set(tw)
    g = jnp.zeros((*shape, 3), jnp.float32)
    tx, ty, tz = tiling.tile
    for si in range(3):
        for sj in range(3):
            for sk in range(3):
                part = full[:, :, :, si * tx:(si + 1) * tx,
                            sj * ty:(sj + 1) * ty, sk * tz:(sk + 1) * tz, :]
                part = jnp.roll(part, (si - 1, sj - 1, sk - 1), axis=(0, 1, 2))
                g = g + part.transpose(0, 3, 1, 4, 2, 5, 6).reshape(*shape, 3)

    spill_mask = (~in_win) & (q != 0)
    return g, jnp.sum(spill_mask), spill_mask.reshape(-1)


def _assemble_tile_windows(win: jax.Array, blk_tile: jax.Array,
                           shape: tuple[int, int], tiling: Tiling2D,
                           wr: int, wz: int) -> jax.Array:
    """Fold per-block windows onto the periodic grid (no large scatter).

    ``win``: (nb, wr, wz[, C]) block windows anchored at
    (tile_r*i - margin, tile_z*j - margin).  Segment-sums blocks into tile
    windows, then accumulates the up-to-3x3 tile overlap with dense rolls.
    """
    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    tr_t, tz_t = tiling.tile_r, tiling.tile_z
    m = tiling.margin
    nb = win.shape[0]
    channels = win.shape[3:]

    tw = jax.ops.segment_sum(win.reshape(nb, -1), blk_tile,
                             num_segments=ntr * ntz)
    tw = tw.reshape(ntr * ntz, wr, wz, *channels)
    return fold_tile_windows(tw, shape, tiling, wr, wz)


def fold_tile_windows(tw: jax.Array, shape: tuple[int, int],
                      tiling: Tiling2D, wr: int, wz: int) -> jax.Array:
    """Fold per-TILE windows onto the periodic grid (the roll half of
    ``_assemble_tile_windows``, for kernels that already accumulated their
    blocks per tile in VMEM — ops/pallas_pic.py, ops/pallas_em.py).

    ``tw``: (ntr*ntz, wr, wz[, C]) tile windows anchored at
    (tile_r*i - margin, tile_z*j - margin)."""
    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    tr_t, tz_t = tiling.tile_r, tiling.tile_z
    m = tiling.margin
    channels = tw.shape[3:]
    tw = tw.reshape(ntr, ntz, wr, wz, *channels)

    full = jnp.zeros((ntr, ntz, 3 * tr_t, 3 * tz_t, *channels), jnp.float32)
    full = full.at[:, :, tr_t - m: tr_t - m + wr,
                   tz_t - m: tz_t - m + wz].set(tw)
    g = jnp.zeros((nr, nz, *channels), jnp.float32)
    for si in range(3):
        for sj in range(3):
            part = full[:, :, si * tr_t:(si + 1) * tr_t,
                        sj * tz_t:(sj + 1) * tz_t]
            part = jnp.roll(part, (si - 1, sj - 1), axis=(0, 1))
            perm = (0, 2, 1, 3) + tuple(range(4, 4 + len(channels)))
            g = g + part.transpose(perm).reshape(nr, nz, *channels)
    return g


def extract_tile_windows(grid: jax.Array, shape: tuple[int, int],
                         tiling: Tiling2D, wr: int, wz: int) -> jax.Array:
    """Per-tile periodic windows of ``grid`` — the inverse of
    ``_assemble_tile_windows`` (dense rolls + concats, no gather).

    ``grid``: (nr, nz[, C]).  Returns (ntr, ntz, wr, wz[, C]) where window
    [i, j] is anchored at (i*tile_r - margin, j*tile_z - margin), wrapping
    periodically.
    """
    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    tr_t, tz_t = tiling.tile_r, tiling.tile_z
    m = tiling.margin
    channels = grid.shape[2:]
    g = grid.reshape(ntr, tr_t, ntz, tz_t, *channels)
    g = jnp.moveaxis(g, 2, 1)  # (ntr, ntz, tr, tz, C)

    rows = jnp.concatenate([
        jnp.roll(g, 1, axis=0)[:, :, tr_t - m:],
        g,
        jnp.roll(g, -1, axis=0)[:, :, : wr - tr_t - m],
    ], axis=2)  # (ntr, ntz, wr, tz, C)
    win = jnp.concatenate([
        jnp.roll(rows, 1, axis=1)[:, :, :, tz_t - m:],
        rows,
        jnp.roll(rows, -1, axis=1)[:, :, :, : wz - tz_t - m],
    ], axis=3)  # (ntr, ntz, wr, wz, C)
    return win


def extract_tile_windows_3d(grid: jax.Array, shape: tuple[int, int, int],
                            tiling: Tiling3D) -> jax.Array:
    """Per-tile periodic windows of a 3D ``grid`` — (n_tiles, wx, wy, wz[, C])
    where window t is anchored at (t_a*tile_a - margin) per axis, wrapping
    periodically (3D analogue of ``extract_tile_windows``; dense rolls +
    concats, no gather)."""
    nts = tiling.n_tiles(shape)
    m = tiling.margin
    wins = tuple(t + 2 * m + 1 for t in tiling.tile)
    channels = grid.shape[3:]
    c = int(np.prod(channels)) if channels else 1
    g = grid.reshape(nts[0], tiling.tile[0], nts[1], tiling.tile[1],
                     nts[2], tiling.tile[2], c)
    g = g.transpose(0, 2, 4, 1, 3, 5, 6)  # (ntx, nty, ntz, tx, ty, tz, c)
    for a in range(3):
        t_a = tiling.tile[a]
        w_a = wins[a]
        lead = tuple([slice(None)] * (3 + a))
        g = jnp.concatenate([
            jnp.roll(g, 1, axis=a)[lead + (slice(t_a - m, None),)],
            g,
            jnp.roll(g, -1, axis=a)[lead + (slice(0, w_a - t_a - m),)],
        ], axis=3 + a)
    win = g.reshape(int(np.prod(nts)), *wins, c)
    if not channels:
        win = win.reshape(int(np.prod(nts)), *wins)
    return win


def _assemble_tile_windows_3d(win: jax.Array, blk_tile: jax.Array,
                              shape: tuple[int, int, int],
                              tiling: Tiling3D) -> jax.Array:
    """Fold per-block 3D windows onto the periodic grid (no large scatter).

    ``win``: (nb, wx, wy, wz[, C]) block windows anchored at
    (tile_a*i - margin) per axis.  Segment-sums blocks into tile windows,
    then accumulates the up-to-3x3x3 tile overlap with dense rolls (3D
    analogue of ``_assemble_tile_windows``)."""
    nts = tiling.n_tiles(shape)
    m = tiling.margin
    wins = win.shape[1:4]
    channels = win.shape[4:]
    nb = win.shape[0]
    tw = jax.ops.segment_sum(win.reshape(nb, -1), blk_tile,
                             num_segments=int(np.prod(nts)))
    tw = tw.reshape(*nts, *wins, *channels)
    full = jnp.zeros((*nts, *[3 * t for t in tiling.tile], *channels),
                     jnp.float32)
    sl = tuple(slice(t - m, t - m + w) for t, w in zip(tiling.tile, wins))
    full = full.at[(slice(None),) * 3 + sl].set(tw)
    g = jnp.zeros((*shape, *channels), jnp.float32)
    tx, ty, tz = tiling.tile
    nc = len(channels)
    for si in range(3):
        for sj in range(3):
            for sk in range(3):
                part = full[:, :, :, si * tx:(si + 1) * tx,
                            sj * ty:(sj + 1) * ty, sk * tz:(sk + 1) * tz]
                part = jnp.roll(part, (si - 1, sj - 1, sk - 1), axis=(0, 1, 2))
                perm = (0, 3, 1, 4, 2, 5) + tuple(range(6, 6 + nc))
                g = g + part.transpose(perm).reshape(*shape, *channels)
    return g


def _placement_x(n: int, n_t: int, tile: int, w: int, margin: int,
                 w_pad: int | None = None, dtype=jnp.float32) -> jax.Array:
    """One-hot fold matrix P[X, t, a] = [X == (t*tile + a - margin) mod n].

    Encodes the periodic placement of per-tile window offsets onto the grid
    axis; contraction with it folds (or, transposed, extracts) one axis.
    ``w_pad`` (>= w) zero-extends the window-offset axis so padded window
    storage (DMA-aligned shapes) folds/extracts exactly."""
    wp = w if w_pad is None else w_pad
    x = jax.lax.broadcasted_iota(jnp.int32, (n, n_t, wp), 0)
    t = jax.lax.broadcasted_iota(jnp.int32, (n, n_t, wp), 1)
    a = jax.lax.broadcasted_iota(jnp.int32, (n, n_t, wp), 2)
    hit = ((t * tile + a - margin) % n == x) & (a < w)
    return hit.astype(dtype)


def _placement_y_lanes(ny: int, nty: int, tile: int, wy: int, wz: int,
                       margin: int, wyz_pad: int | None = None,
                       dtype=jnp.float32) -> jax.Array:
    """One-hot lane-space fold matrix P[t, l, m] for the flattened (b, cz)
    lane pair: l = b*wz + cz  ->  m = cz*ny + Y,  Y = (t*tile + b - margin)
    mod ny.  Folds the y axis without ever splitting the lane dimension at a
    non-128 boundary (m splits as (wz, ny) with ny on lanes).  ``wyz_pad``
    zero-extends the flattened lane axis for padded window storage."""
    lp = wy * wz if wyz_pad is None else wyz_pad
    shape = (nty, lp, wz * ny)
    t = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    l = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    mm = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    b, cz = l // wz, l % wz
    cz_m, y_m = mm // ny, mm % ny
    hit = ((cz_m == cz) & (((t * tile + b - margin) % ny) == y_m)
           & (b < wy))
    return hit.astype(dtype)


def _onehot_dot(a, b, dims, precision, placement="a"):
    """dot_general where one operand is an exact 0/1 placement matrix.

    ``precision='2term'`` runs two bf16 passes on the hi/lo split of the
    value operand (the 0/1 placement is exact in bf16), ~2^-17 relative —
    used by the bf16/exact_bf16 paths; any other value is passed straight
    through as an XLA precision (``'highest'`` is the f32-exact default).
    ``placement`` names which operand ('a' or 'b') is the 0/1 matrix."""
    if precision == "2term":
        x = b if placement == "a" else a
        oh = (a if placement == "a" else b).astype(jnp.bfloat16)
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        def d(p, q):
            return jax.lax.dot_general(p, q, dims,
                                       preferred_element_type=jnp.float32)
        if placement == "a":
            return d(oh, hi) + d(oh, lo)
        return d(hi, oh) + d(lo, oh)
    return jax.lax.dot_general(a, b, dims, precision=precision,
                               preferred_element_type=jnp.float32)


def _padded_window_dims(tiling: Tiling3D) -> tuple[int, int, int, int]:
    """(wx, wyz, wx_pad, wyz_pad): logical 3D window dims and their
    DMA-aligned padded storage (sublanes to 8, lanes to 128) — Mosaic HBM
    slices must align to the (8, 128) tiling, so streamed window arrays are
    stored pre-padded with exact zeros."""
    m = tiling.margin
    wx, wy, wz = (t + 2 * m + 1 for t in tiling.tile)
    wyz = wy * wz
    return wx, wyz, -(-wx // 8) * 8, -(-wyz // 128) * 128


def extract_tile_windows_3d_flat(grid: jax.Array,
                                 shape: tuple[int, int, int],
                                 tiling: Tiling3D,
                                 precision: str = "highest",
                                 padded: bool = False) -> jax.Array:
    """Per-tile periodic windows in the MXU/DMA-friendly flat layout
    ``(n_tiles, C, wx, wy*wz)``.

    Functionally ``extract_tile_windows_3d`` reshaped, but built with three
    one-hot placement matmuls so no intermediate ever exposes a tiny minor
    dimension: the naive ``(n_tiles, wx, wy, wz, C)`` form is assigned an
    XLA T(8,128) layout that pads 12x in HBM (~110 ms at 128^3; measured,
    PERFORMANCE.md) while this form stays within ~1.5x padding.  Window t
    spans ``(t_a*tile_a - margin .. + tile_a + margin)`` per axis with
    periodic wrap; lane index l = b*wz + cz (y-offset major).
    ``padded=True`` returns the DMA-aligned ``(n_tiles, C, wx_pad,
    wyz_pad)`` storage (exact zeros in the pad region) for the streamed
    Pallas kernels — Mosaic HBM slices must align to the (8, 128) tiling."""
    nx, ny, nz = shape
    ntx, nty, ntz = tiling.n_tiles(shape)
    m = tiling.margin
    wx, wy, wz = (t + 2 * m + 1 for t in tiling.tile)
    _, wyz, wx_p, wyz_p = _padded_window_dims(tiling)
    wx_out = wx_p if padded else wx
    wyz_out = wyz_p if padded else wyz
    channels = grid.shape[3:]
    c = int(np.prod(channels)) if channels else 1
    g1 = grid.reshape(nx, ny, nz, c).transpose(2, 0, 3, 1)  # (nz, nx, C, ny)
    pz = _placement_x(nz, ntz, tiling.tile[2], wz, m)
    # z-extract: (ntz, wz, nx, C, ny)
    t1 = _onehot_dot(pz, g1, (((0,), (0,)), ((), ())), precision, placement='a')
    # merge (wz, ny) -> lanes m = cz*ny + Y (128-aligned split point)
    t1 = t1.transpose(0, 2, 3, 1, 4).reshape(ntz, nx, c, wz * ny)
    py = _placement_y_lanes(ny, nty, tiling.tile[1], wy, wz, m,
                            wyz_pad=wyz_out if padded else None)
    # y-extract: contract lane space m -> (ntz, nx, C, nty, wyz[_p])
    t2 = _onehot_dot(t1, py, (((3,), (2,)), ((), ())), precision, placement='b')
    px = _placement_x(nx, ntx, tiling.tile[0], wx, m,
                      w_pad=wx_out if padded else None)
    # x-extract: (ntx, wx[_p], ntz, C, nty, wyz[_p])
    t3 = _onehot_dot(px, t2, (((0,), (1,)), ((), ())), precision, placement='a')
    win = t3.transpose(0, 4, 2, 3, 1, 5).reshape(
        ntx * nty * ntz, c, wx_out, wyz_out)
    return win


def fold_tile_windows_3d_flat(win: jax.Array, shape: tuple[int, int, int],
                              tiling: Tiling3D,
                              precision: str = "highest") -> jax.Array:
    """Adjoint of ``extract_tile_windows_3d_flat``: overlap-add per-tile
    windows ``(n_tiles, C, wx, wy*wz)`` onto the periodic grid
    ``(nx, ny, nz, C)`` via the same three one-hot placement matmuls
    (replaces segment-sum + 27-term roll assembly for the fused 3D
    kernels).  Padded ``(n_tiles, C, wx_pad, wyz_pad)`` input (the streamed
    kernels' flush layout) is detected from the trailing dims and folded
    exactly (pad rows carry zero placement)."""
    nx, ny, nz = shape
    ntx, nty, ntz = tiling.n_tiles(shape)
    m = tiling.margin
    wx, wy, wz = (t + 2 * m + 1 for t in tiling.tile)
    c = win.shape[1]
    wyz = wy * wz
    wx_in, wyz_in = win.shape[2], win.shape[3]
    t0 = win.reshape(ntx, nty, ntz, c, wx_in, wyz_in)
    px = _placement_x(nx, ntx, tiling.tile[0], wx, m,
                      w_pad=wx_in if wx_in != wx else None)
    # fold x: (nx, nty, ntz, C, wyz)
    t1 = _onehot_dot(px, t0, (((1, 2), (0, 4)), ((), ())), precision, placement='a')
    py = _placement_y_lanes(ny, nty, tiling.tile[1], wy, wz, m,
                            wyz_pad=wyz_in if wyz_in != wyz else None)
    # fold y (lane space): (nx, ntz, C, wz*ny)
    t2 = _onehot_dot(t1, py, (((1, 4), (0, 1)), ((), ())), precision, placement='b')
    t2 = t2.reshape(nx, ntz, c, wz, ny)
    pz = _placement_x(nz, ntz, tiling.tile[2], wz, m)
    # fold z: (nz, nx, C, ny)
    t3 = _onehot_dot(pz, t2, (((1, 2), (1, 3)), ((), ())), precision, placement='a')
    return t3.transpose(1, 3, 0, 2)  # (nx, ny, nz, C)


def _axis_gather_factors(d: jax.Array, frac: jax.Array, width: int,
                         mode: str) -> jax.Array:
    """(nb, P, width) interpolation row per particle for one axis.

    ``mode='cic'``: linear weights at d and d+1; ``mode='nearest'``: one-hot
    at round-to-cell NEAREST (the texture-sampling semantics — the caller
    passes d already floored to the sample cell and frac is ignored).
    """
    h = jnp.arange(width, dtype=jnp.int32)
    if mode == "nearest":
        return (d[..., None] == h).astype(jnp.float32)
    return ((1.0 - frac)[..., None] * (d[..., None] == h)
            + frac[..., None] * (d[..., None] + 1 == h))


@functools.partial(jax.jit, static_argnames=("shape", "tiling", "mode"))
def gather_sorted_2d(
    grid: jax.Array,
    position: jax.Array,
    tile_id: jax.Array,
    shape: tuple[int, int],
    tiling: Tiling2D,
    mode: str = "cic",
) -> tuple[jax.Array, jax.Array]:
    """Tile-window gather for tile-sorted particles — the MXU answer to the
    ~25-40 ns/row XLA gather floor (the hot gather of empic.js:749-773 and of
    the self-consistent loop).

    CIC gather is separable like the deposit:  value_p = ar_p @ W_b @ az_p^T
    with W_b the block's (wr, wz) window — so a whole block is two batched
    matmuls (az @ W^T then a row-reduction against ar) with NO per-row
    latency.  Windows come from ``extract_tile_windows`` (dense rolls) and
    one tiny (n_blocks,)-row lookup.

    ``grid``: (nr, nz[, C]); ``position``: (N, 2) grid units, tile-sorted
    with ``tile_id`` (N a multiple of ``tiling.block``).  Returns
    ``(values (N[, C]), in_win (N,) bool)`` — out-of-window particles (past
    the sort margin) get clamped-window values; callers patch them with the
    exact slow path when ``~in_win`` has any survivors with weight.
    """
    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    p_blk = tiling.block
    m = tiling.margin
    wr = tiling.tile_r + 2 * m + 1
    wz = tiling.tile_z + 2 * m + 1
    channels = grid.shape[2:]
    n = position.shape[0]
    nb = n // p_blk

    base = jnp.floor(position).astype(jnp.int32)
    frac = position - base

    blk_tile = tile_id[::p_blk]
    blk_tr = (blk_tile // ntz) * tiling.tile_r - m
    blk_tz = (blk_tile % ntz) * tiling.tile_z - m
    dr = jnp.mod(base[:, 0].reshape(nb, p_blk) - blk_tr[:, None], nr)
    dz = jnp.mod(base[:, 1].reshape(nb, p_blk) - blk_tz[:, None], nz)
    in_win = (dr < wr - 1) & (dz < wz - 1)
    drc = jnp.clip(dr, 0, wr - 2)
    dzc = jnp.clip(dz, 0, wz - 2)

    ar = _axis_gather_factors(drc, frac[:, 0].reshape(nb, p_blk), wr, mode)
    az = _axis_gather_factors(dzc, frac[:, 1].reshape(nb, p_blk), wz, mode)

    win = extract_tile_windows(grid, shape, tiling, wr, wz)
    win_b = win.reshape(ntr * ntz, wr, wz, *channels)[blk_tile]
    if not channels:
        win_b = win_b[..., None]

    # value = ar . (W @ az):  t (nb, P, wr, C) then reduce over wr with ar
    t = jnp.einsum("bpl,bhlc->bphc", az, win_b,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bph,bphc->bpc", ar, t,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(n, *channels) if channels else out.reshape(n)
    return out, in_win.reshape(-1)


@functools.partial(jax.jit, static_argnames=("shape", "tiling", "mode"))
def gather_sorted_3d(
    grid: jax.Array,
    position: jax.Array,
    tile_id: jax.Array,
    shape: tuple[int, int, int],
    tiling: Tiling3D,
    mode: str = "cic",
) -> tuple[jax.Array, jax.Array]:
    """3D tile-window gather (see gather_sorted_2d).

    The triple product folds pairwise like the 3D deposit:  the (y, z) axes
    combine into one outer-product factor per particle, leaving two batched
    contractions per block group.  Block groups are scanned to bound the
    (P, wy*wz) intermediate.
    """
    nts = tiling.n_tiles(shape)
    n_tiles = int(np.prod(nts))
    p_blk = tiling.block
    m = tiling.margin
    wins = tuple(t + 2 * m + 1 for t in tiling.tile)
    wx, wy, wz = wins
    channels = grid.shape[3:]
    c = int(np.prod(channels)) if channels else 1
    n = position.shape[0]
    nb = n // p_blk

    base = jnp.floor(position).astype(jnp.int32)
    frac = position - base

    blk_tile = tile_id[::p_blk]
    rem = blk_tile
    t_idx = []
    for a in (2, 1, 0):
        t_idx.append(rem % nts[a])
        rem = rem // nts[a]
    t_idx = t_idx[::-1]

    db, fr, in_win = [], [], True
    for a in range(3):
        origin = t_idx[a] * tiling.tile[a] - m
        d = jnp.mod(base[:, a].reshape(nb, p_blk) - origin[:, None], shape[a])
        in_win = in_win & (d < wins[a] - 1)
        db.append(jnp.minimum(d, wins[a] - 2))
        fr.append(frac[:, a].reshape(nb, p_blk))

    ax = _axis_gather_factors(db[0], fr[0], wx, mode)
    ay = _axis_gather_factors(db[1], fr[1], wy, mode)
    az = _axis_gather_factors(db[2], fr[2], wz, mode)

    # per-tile windows by pairwise axis concat of rolls (dense, no gather)
    win = extract_tile_windows_3d(grid.reshape(*shape, c), shape, tiling)

    # scan block groups to bound the (P, wy*wz) pairwise factor.  Precision
    # follows tiling.dtype like the deposit: float32 = exact (6-pass MXU,
    # larger groups amortize better: 165 -> 119 ms at 1e7 measured);
    # bfloat16 = single-pass (~2.2x faster, ~4e-3 relative field error).
    exact = tiling.dtype != "bfloat16"
    mm_prec = (jax.lax.Precision.HIGHEST if exact
               else jax.lax.Precision.DEFAULT)
    group = max(1, min(nb, int((6e8 if exact else 2e8)
                               // (p_blk * wy * wz * 4))))
    n_groups = (nb + group - 1) // group
    pad_blocks = n_groups * group - nb

    def pad_g(arr):
        if pad_blocks:
            arr = jnp.concatenate(
                [arr, jnp.zeros((pad_blocks, *arr.shape[1:]), arr.dtype)])
        return arr.reshape(n_groups, group, *arr.shape[1:])

    ax_g, ay_g, az_g = pad_g(ax), pad_g(ay), pad_g(az)
    bt_g = pad_g(blk_tile)

    def group_body(_, xs):
        axb, ayb, azb, bt = xs
        win_b = win[bt]  # (group, wx, wy, wz, c)
        ayz = (ayb[..., :, None] * azb[..., None, :]).reshape(
            group, p_blk, wy * wz)
        t = jnp.einsum("bpm,bxmc->bpxc", ayz,
                       win_b.reshape(group, wx, wy * wz, c),
                       preferred_element_type=jnp.float32,
                       precision=mm_prec)
        out = jnp.einsum("bpx,bpxc->bpc", axb, t,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return None, out

    _, vals = jax.lax.scan(group_body, None, (ax_g, ay_g, az_g, bt_g))
    vals = vals.reshape(n_groups * group * p_blk, c)[: n]
    out = vals.reshape(n, *channels) if channels else vals.reshape(n)
    return out, in_win.reshape(-1)


def _expand_window(factors: jax.Array, db: jax.Array, width: int) -> jax.Array:
    """Expand per-particle 3-node stencil factors onto window rows.

    ``factors``: (nb, P, 3) values at stencil offsets {0, 1, 2} relative to
    the particle's base node; ``db``: (nb, P) base offset within the window.
    Returns (nb, P, width) with F[p, db+k] = factors[p, k].
    """
    h = jnp.arange(width, dtype=jnp.int32)
    out = 0.0
    for k in range(3):
        out = out + factors[..., k:k + 1] * (db[..., None] + k == h)
    return out


@functools.partial(jax.jit, static_argnames=("shape", "tiling", "dt", "cell_size"))
def esirkepov_sorted_2d(
    x0: jax.Array,
    x1: jax.Array,
    vz: jax.Array,
    charge: jax.Array,
    tile_id: jax.Array,
    dt: float,
    shape: tuple[int, int],
    cell_size: tuple[float, float],
    tiling: Tiling2D,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Charge-conserving current deposition for tile-sorted particles.

    The digit-matmul form of ops/esirkepov.esirkepov_deposit_2d: every
    Esirkepov weight is a sum of separable (r-factor x z-factor) terms, so
    each current component's window is one batched matmul:

        Jx: [-q dx/(V dt) cumsum(dSx)] (x) [S0z + dSz/2]
        Jy: [S0x + dSx/2]              (x) [-q dz/(V dt) cumsum(dSz)]
        Jz: q vz/V { [S0x + dSx/2] (x) S0z  +  [S0x/2 + dSx/3] (x) dSz }

    (the Jz pairing combines Esirkepov's four terms into two separable
    ones).  Same layout contract as deposit_sorted_2d; ``charge`` must be 0
    on filler rows.  Returns ``(j_grid (nr, nz, 3), spill_count, spill_mask)``.
    """
    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    p_blk = tiling.block
    m = tiling.margin
    wr = tiling.tile_r + 2 * m + 1
    wz = tiling.tile_z + 2 * m + 1
    dx, dy = cell_size
    vol = dx * dy

    n = x0.shape[0]
    nb = n // p_blk
    q = jnp.broadcast_to(jnp.asarray(charge, jnp.float32), (n,)).reshape(nb, p_blk)

    def shapes_1d(x, base):
        k = jnp.arange(3, dtype=jnp.float32)
        d = jnp.abs(x[..., None] - (base[..., None].astype(jnp.float32) + k))
        return jnp.maximum(0.0, 1.0 - d)

    base_r = jnp.floor(jnp.minimum(x0[:, 0], x1[:, 0])).astype(jnp.int32).reshape(nb, p_blk)
    base_z = jnp.floor(jnp.minimum(x0[:, 1], x1[:, 1])).astype(jnp.int32).reshape(nb, p_blk)
    s0r = shapes_1d(x0[:, 0].reshape(nb, p_blk), base_r)
    s1r = shapes_1d(x1[:, 0].reshape(nb, p_blk), base_r)
    s0z = shapes_1d(x0[:, 1].reshape(nb, p_blk), base_z)
    s1z = shapes_1d(x1[:, 1].reshape(nb, p_blk), base_z)
    dsr = s1r - s0r
    dsz = s1z - s0z

    blk_tile = tile_id[::p_blk]
    blk_tr = (blk_tile // ntz) * tiling.tile_r - m
    blk_tz = (blk_tile % ntz) * tiling.tile_z - m
    dbr = jnp.mod(base_r - blk_tr[:, None], nr)
    dbz = jnp.mod(base_z - blk_tz[:, None], nz)
    in_win = (dbr <= wr - 3) & (dbz <= wz - 3)
    qm = jnp.where(in_win, q, 0.0)
    dbr = jnp.minimum(dbr, wr - 3)
    dbz = jnp.minimum(dbz, wz - 3)

    coef_x = -(dx / (vol * dt))
    coef_z = -(dy / (vol * dt))
    mm = jnp.bfloat16 if tiling.dtype == "bfloat16" else jnp.float32
    precision = (jax.lax.Precision.DEFAULT if tiling.dtype == "bfloat16"
                 else jax.lax.Precision.HIGHEST)

    def mmul(a, b):
        return jnp.einsum("bph,bpl->bhl", a.astype(mm), b.astype(mm),
                          preferred_element_type=jnp.float32,
                          precision=precision)

    ax = _expand_window((qm * coef_x)[..., None] * jnp.cumsum(dsr, axis=-1), dbr, wr)
    bx = _expand_window(s0z + 0.5 * dsz, dbz, wz)
    win_jx = mmul(ax, bx)

    ay = _expand_window(s0r + 0.5 * dsr, dbr, wr)
    by = _expand_window((qm * coef_z)[..., None] * jnp.cumsum(dsz, axis=-1), dbz, wz)
    win_jy = mmul(ay, by)

    qvz = (qm * vz.reshape(nb, p_blk) / vol)
    a1 = _expand_window(qvz[..., None] * (s0r + 0.5 * dsr), dbr, wr)
    b1 = _expand_window(s0z, dbz, wz)
    a2 = _expand_window(qvz[..., None] * (0.5 * s0r + dsr / 3.0), dbr, wr)
    b2 = _expand_window(dsz, dbz, wz)
    win_jz = mmul(jnp.concatenate([a1, a2], axis=1),
                  jnp.concatenate([b1, b2], axis=1))

    win = jnp.stack([win_jx, win_jy, win_jz], axis=-1)  # (nb, wr, wz, 3)
    grid = _assemble_tile_windows(win, blk_tile, shape, tiling, wr, wz)
    spill_mask = (~in_win) & (q != 0)
    return grid, jnp.sum(spill_mask), spill_mask.reshape(-1)
