"""Tile-window extraction/fold as exact one-hot placement MATMULS.

STATUS (round 5): MEASURED NEGATIVE for the in-jit fused-step use — kept
as documentation and as a correctness oracle.  Standalone, the roll/
concat forms cost 3.4-3.5 ms each at 512^2 (probe_kernel_floor
--xla-parts); in-jit, swapping them for these matmul forms made the
fused ES substep SLOWER (15.31-15.41 ms vs 15.01 roll, same-session
A/B at the 10M headline rung) — the standalone cost was dispatch-chain
latency that XLA already hides inside the step jit, while the matmul
form's long chain of small ops (3-way splits, 6 matmuls, reshapes) is
latency-bound and fuses worse.  The kernels use the roll forms
(sorted_deposit.extract/fold_tile_windows).

The fused 2D PIC kernels (ops/pallas_pic.py, ops/pallas_em.py) consume
per-tile field windows in a channel-stacked, z-major layout and emit
per-tile deposit windows to be folded back onto the periodic grid.  The
roll/concat extraction (`sorted_deposit.extract_tile_windows`) plus the
minor-dim-2 channel transpose measured 3.4 ms at 512^2/tile 32 on v5e,
and the 9-part roll/add fold (`fold_tile_windows`) another 3.5 ms
standalone (examples/probe_kernel_floor.py --xla-parts, round 5) — both
dominated by XLA relayouts, not arithmetic.  This module replaces them
with the 3D kernels' recipe (`extract/fold_tile_windows_3d_flat`): the
window map is LINEAR, so it is two one-hot placement matmuls

    win = P_z @ grid @ P_r      /      grid = P_r^T-fold @ win @ P_z^T-fold

with the channel interleave folded into the z placement matrix (so the
(nr, nz, C) grid is consumed as its FREE (nr, nz*C) reshape — no strided
channel slice, no minor-dim-2 transpose anywhere).  Exactness: operands
are decomposed with ``mxu.split_bf16_3_exact`` (bit-exact 3-way bf16
truncation), one-hot entries are exact in bf16, and bf16 x bf16 products
are exact in the f32 accumulator — extraction (single source per output)
is bit-exact; the fold's overlap summation is exact up to f32 addition
reassociation (same class of rounding as the roll/add form it replaces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mxu import split_bf16_3_exact


@functools.lru_cache(maxsize=None)
def _placement_np(n: int, nt: int, tile: int, w_used: int, w_pad: int,
                  m: int, c: int = 1) -> np.ndarray:
    """One-hot placement matrix (n*c, nt*c*w_pad): column
    (j, ch, v) -> source row c*mod(j*tile - m + v, n) + ch for v < w_used
    (zero column for the v >= w_used padding).  c > 1 interleaves channels
    the way a free (n, nz*C) reshape of (n, nz, C) lays them out."""
    a = np.zeros((n * c, nt * c * w_pad), np.float32)
    for j in range(nt):
        for ch in range(c):
            for v in range(w_used):
                src = (j * tile - m + v) % n
                a[c * src + ch, (j * c + ch) * w_pad + v] = 1.0
    return a


def _placement(n, nt, tile, w_used, w_pad, m, c=1) -> jax.Array:
    return jnp.asarray(_placement_np(n, nt, tile, w_used, w_pad, m, c),
                       jnp.bfloat16)


def _mm3(a_bf16: jax.Array, x_f32: jax.Array, dn) -> jax.Array:
    """Exact one-hot contraction of f32 ``x`` with a 0/1 bf16 matrix:
    3-way bit-exact split of x, three bf16 MXU matmuls, f32 accumulate."""
    parts = split_bf16_3_exact(x_f32)
    out = None
    for p in parts:
        t = jax.lax.dot_general(a_bf16, p, dn,
                                preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    return out


def _mm3_r(x_f32: jax.Array, a_bf16: jax.Array, dn) -> jax.Array:
    parts = split_bf16_3_exact(x_f32)
    out = None
    for p in parts:
        t = jax.lax.dot_general(p, a_bf16, dn,
                                preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    return out


def extract_windows_mm(grid: jax.Array, shape: tuple[int, int], tiling,
                       wr: int, wz: int, wr_pad: int, wz_pad: int
                       ) -> jax.Array:
    """Per-tile periodic windows of ``grid`` (nr, nz[, C]) directly in the
    fused kernels' operand layout (ntr*ntz, C*wz_pad, wr_pad): channel-
    stacked z-major rows, r on lanes, padded rows/lanes zero.  Bit-exact
    equal to extract_tile_windows + transpose + pad (tests)."""
    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    ch = grid.shape[2:]
    c = int(np.prod(ch)) if ch else 1
    g2 = grid.reshape(nr, nz * c)                       # free view
    az = _placement(nz, ntz, tiling.tile_z, wz, wz_pad, tiling.margin, c)
    ar = _placement(nr, ntr, tiling.tile_r, wr, wr_pad, tiling.margin)
    # (ntz*C*wz_pad, nr): select z/channel rows
    s1 = _mm3(az, g2, (((0,), (1,)), ((), ())))
    # (ntz*C*wz_pad, ntr*wr_pad): select r columns
    s2 = _mm3_r(s1, ar, (((1,), (0,)), ((), ())))
    win = s2.reshape(ntz, c * wz_pad, ntr, wr_pad)
    return win.transpose(2, 0, 1, 3).reshape(ntr * ntz, c * wz_pad, wr_pad)


def fold_windows_mm(tw: jax.Array, shape: tuple[int, int], tiling,
                    wr: int, wz: int) -> jax.Array:
    """Fold per-tile deposit windows (ntr*ntz, wr_pad, >=wz_pad) onto the
    periodic (nr, nz) grid — the adjoint of extract_windows_mm
    (overlapping windows ADD; the same placement matrices contract on
    their window axis).  Rows >= wr / lanes >= wz of ``tw`` are ignored
    (zero placement), so callers can pass the kernels' lane-padded
    accumulators unsliced."""
    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    wr_pad = tw.shape[1]
    wz_pad = -(-wz // 8) * 8
    if tw.shape[2] != wz_pad:
        tw = tw[:, :, :wz_pad]
    az = _placement(nz, ntz, tiling.tile_z, wz, wz_pad, tiling.margin)
    ar = _placement(nr, ntr, tiling.tile_r, wr, wr_pad, tiling.margin)
    m1 = (tw.reshape(ntr, ntz, wr_pad, wz_pad)
          .transpose(0, 2, 1, 3).reshape(ntr * wr_pad, ntz * wz_pad))
    # (nr, ntz*wz_pad): fold r (overlaps sum in the contraction)
    s1 = _mm3(ar, m1, (((1,), (0,)), ((), ())))
    # (nr, nz): fold z
    return _mm3_r(s1, az, (((1,), (1,)), ((), ())))
