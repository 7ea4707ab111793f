"""Pallas TPU kernel: per-block tile-window gather for sorted particles.

The XLA form (ops/sorted_deposit.gather_sorted_2d) materializes the
(nb, P, wr, C) intermediate in HBM; this kernel keeps everything per-block in
VMEM, so the whole gather is MXU matmuls + VPU tents with zero HBM
intermediates beyond the windows themselves.

Per block b (P particles, one (wr, wz) window W):

    value_p = sum_{h,l} ar[p,h] az[p,l] W[h,l]        (separable CIC)
            = rowsum( ar * (az @ W^T) )               (two 2D ops, MXU+VPU)

with ar/az the CIC tent weights  max(0, 1 - |local - iota|)  — built as 2D
(P, w) arrays only (the (P, wr, wz) broadcast that Mosaic rejects is never
formed; round-1 negative result, PERFORMANCE.md).

Mosaic tiling rules (block last-two dims divisible by (8, 128) or equal to
the array dims) shape the data layout: particle rows are fed as
(P/128, 128) blocks of an (nb*P/128, 128) array, block origins ride the
scalar-prefetch channel, and windows/outputs use whole-dim blocks.

Gather of the reference's hot loop: empic.js:749-773 samples 4 coefficient
textures per particle; the sorted-window form replaces its per-particle
texture fetches with block matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather2d_kernel(origin_ref, pos_r_ref, pos_z_ref, win_ref, out_ref,
                     *, nr, nz, wr, wz, n_c, mode):
    sub, lanes = pos_r_ref.shape
    p = sub * lanes
    b = pl.program_id(0)
    orr = origin_ref[b, 0].astype(jnp.float32)
    orz = origin_ref[b, 1].astype(jnp.float32)

    lr = jnp.mod(pos_r_ref[...].reshape(p, 1) - orr, float(nr))
    lz = jnp.mod(pos_z_ref[...].reshape(p, 1) - orz, float(nz))

    iota_r = jax.lax.broadcasted_iota(jnp.float32, (p, wr), 1)
    iota_z = jax.lax.broadcasted_iota(jnp.float32, (p, wz), 1)
    if mode == "cic":
        # CIC = tent: covers both corners, zero outside the window
        ar = jnp.maximum(0.0, 1.0 - jnp.abs(lr - iota_r))
        az = jnp.maximum(0.0, 1.0 - jnp.abs(lz - iota_z))
    else:  # nearest: box at floor(local)
        dr = lr - iota_r
        dz = lz - iota_z
        ar = ((dr >= 0.0) & (dr < 1.0)).astype(jnp.float32)
        az = ((dz >= 0.0) & (dz < 1.0)).astype(jnp.float32)

    for c in range(n_c):
        w = win_ref[0, c]  # (wz, wr)
        t = jnp.dot(az, w, preferred_element_type=jnp.float32)  # (P, wr)
        out_ref[0, c, :] = jnp.sum(ar * t, axis=1)


@functools.partial(jax.jit, static_argnames=("shape", "tiling", "mode", "interpret"))
def gather_sorted_2d_pallas(
    grid: jax.Array,
    position: jax.Array,
    tile_id: jax.Array,
    shape: tuple[int, int],
    tiling,
    mode: str = "cic",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in Pallas replacement for gather_sorted_2d (same contract:
    returns ``(values (N[, C]), in_win (N,))``; out-of-window values are 0
    here — callers already patch ``~in_win`` rows via the exact path).

    Requires ``tiling.block`` to be a multiple of 128 (lane width)."""
    from .sorted_deposit import extract_tile_windows

    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    p_blk = tiling.block
    if p_blk % 128:
        raise ValueError(f"pallas path needs block % 128 == 0, got {p_blk}")
    sub = p_blk // 128
    m = tiling.margin
    wr = tiling.tile_r + 2 * m + 1
    wz = tiling.tile_z + 2 * m + 1
    channels = grid.shape[2:]
    n_c = int(np.prod(channels)) if channels else 1
    n = position.shape[0]
    nb = n // p_blk

    blk_tile = tile_id[::p_blk]
    blk_tr = (blk_tile // ntz) * tiling.tile_r - m
    blk_tz = (blk_tile % ntz) * tiling.tile_z - m
    origins = jnp.stack([blk_tr, blk_tz], axis=-1).astype(jnp.int32)  # (nb, 2)

    win = extract_tile_windows(grid.reshape(nr, nz, n_c), shape, tiling, wr, wz)
    win_b = win.reshape(ntr * ntz, wr, wz, n_c)[blk_tile]      # (nb, wr, wz, C)
    win_b = win_b.transpose(0, 3, 2, 1)                        # (nb, C, wz, wr)

    pos_r = position[:, 0].reshape(nb * sub, 128)
    pos_z = position[:, 1].reshape(nb * sub, 128)

    kernel = functools.partial(_gather2d_kernel, nr=nr, nz=nz, wr=wr, wz=wz,
                               n_c=n_c, mode=mode)
    row_spec = pl.BlockSpec((sub, 128), lambda b, *_: (b, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            row_spec, row_spec,
            pl.BlockSpec((1, n_c, wz, wr), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_c, p_blk), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, n_c, p_blk), jnp.float32),
        interpret=interpret,
    )(origins, pos_r, pos_z, win_b)

    vals = out.transpose(0, 2, 1).reshape(n, n_c)
    vals = vals.reshape(n, *channels) if channels else vals.reshape(n)

    # in_win (XLA, cheap dense): same criterion as gather_sorted_2d
    base = jnp.floor(position).astype(jnp.int32)
    dr = jnp.mod(base[:, 0].reshape(nb, p_blk) - blk_tr[:, None], nr)
    dz = jnp.mod(base[:, 1].reshape(nb, p_blk) - blk_tz[:, None], nz)
    in_win = (dr < wr - 1) & (dz < wz - 1)
    return vals, in_win.reshape(-1)
