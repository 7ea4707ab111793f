"""Pallas TPU kernel: per-block tile-window gather for sorted particles.

The XLA form (ops/sorted_deposit.gather_sorted_2d) materializes the
(nb, P, wr, C) intermediate in HBM; this kernel keeps everything per-block in
VMEM, so the whole gather is MXU matmuls + VPU tents with zero HBM
intermediates beyond the windows themselves.

Layout rules this kernel was tuned around (measured on v5e, see
PERFORMANCE.md "Pallas lowering pitfalls"):

- particles ride the LANE axis; window offsets ride SUBLANES.  Per block
  (P particles, one (wr, wz) window W):

      ar[h, p] = tent(lr_p - h)            (wr, P)  sublane-iota broadcast
      az[l, p] = tent(lz_p - l)            (wz, P)
      u        = W^T @ ar                  (wz, P)  one MXU matmul
      value_p  = sum_l az[l, p] * u[l, p]  (1,  P)  sublane reduce

- G blocks share one grid step ((1, G, P) row blocks) to amortize per-step
  pipeline overhead (~7 us/step measured);
- per-g results are CONCATENATED and written once per step — single-sublane
  ref reads/writes lower to scalar loops (~10 us/block measured!);
- the whole per-tile window set stays RESIDENT in VMEM (a few MB) and each
  block fetches its window by dynamic leading-dim indexing (measured free);
- window-relative (local) coordinates are precomputed in XLA — no per-g
  scalar origin reads in the kernel;
- scalar prefetch operands are 1D (2D SMEM operands row-pad to 512 B and
  overflow the 1 MiB SMEM at ~10k blocks);
- tpu.iota is integer-only: build int32, convert on the VPU.

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


def _gather2d_kernel(tile_ref, lr_ref, lz_ref, win_ref, out_ref,
                     *, wr, wz, n_c, n_g, mode, precision):
    s = pl.program_id(0)
    p = lr_ref.shape[-1]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (wr, p), 0).astype(jnp.float32)
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (wz, p), 0).astype(jnp.float32)
    lr_all = lr_ref[0]  # (G, P) — read whole rows once
    lz_all = lz_ref[0]
    rows = [[] for _ in range(n_c)]
    for g in range(n_g):
        t = tile_ref[s * n_g + g]
        lr = jax.lax.slice(lr_all, (g, 0), (g + 1, p))
        lz = jax.lax.slice(lz_all, (g, 0), (g + 1, p))
        if mode == "cic":
            # CIC = tent: covers both corners, zero outside the window
            ar = jnp.maximum(0.0, 1.0 - jnp.abs(lr - iota_r))  # (wr, P)
            az = jnp.maximum(0.0, 1.0 - jnp.abs(lz - iota_z))  # (wz, P)
        else:  # nearest: box at floor(local)
            dr = lr - iota_r
            dz = lz - iota_z
            ar = ((dr >= 0.0) & (dr < 1.0)).astype(jnp.float32)
            az = ((dz >= 0.0) & (dz < 1.0)).astype(jnp.float32)
        for c in range(n_c):
            u = jax.lax.dot_general(
                win_ref[t, c], ar, (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            rows[c].append(jnp.sum(az * u, axis=0, keepdims=True))
    for c in range(n_c):
        out_ref[0, c] = jnp.concatenate(rows[c], axis=0)


def _local_coords(position, tile_id, shape, tiling, p_blk):
    """Window-relative coordinates per particle (XLA side, fully vectorized).

    Periodic wrap folds domain-edge crossings back into the window, exactly
    like the XLA sorted paths (sorted_deposit.py)."""
    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    m = tiling.margin
    n = position.shape[0]
    nb = n // p_blk
    blk_tile = tile_id[::p_blk].astype(jnp.int32)
    blk_tr = (blk_tile // ntz) * tiling.tile_r - m
    blk_tz = (blk_tile % ntz) * tiling.tile_z - m
    lr = jnp.mod(position[:, 0].reshape(nb, p_blk) - blk_tr[:, None].astype(position.dtype), nr)
    lz = jnp.mod(position[:, 1].reshape(nb, p_blk) - blk_tz[:, None].astype(position.dtype), nz)
    return blk_tile, blk_tr, blk_tz, lr, lz


@functools.partial(jax.jit, static_argnames=("shape", "tiling", "mode",
                                             "precision", "interpret"))
def gather_sorted_2d_pallas(
    grid: jax.Array,
    position: jax.Array,
    tile_id: jax.Array,
    shape: tuple[int, int],
    tiling,
    mode: str = "cic",
    precision: str = "highest",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in Pallas replacement for gather_sorted_2d (same contract:
    returns ``(values (N[, C]), in_win (N,))``; out-of-window values are
    garbage here — callers already patch ``~in_win`` rows via the exact
    path).  ``precision='default'`` uses single-pass bf16 MXU matmuls
    (~20% faster, ~1e-3 relative error); 'highest' is f32-exact.

    Requires ``tiling.block`` to be a multiple of 128 (lane width)."""
    from .sorted_deposit import extract_tile_windows

    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    p_blk = tiling.block
    if p_blk % 128:
        raise ValueError(f"pallas path needs block % 128 == 0, got {p_blk}")
    m = tiling.margin
    wr = tiling.tile_r + 2 * m + 1
    wz = tiling.tile_z + 2 * m + 1
    channels = grid.shape[2:]
    n_c = int(np.prod(channels)) if channels else 1
    n = position.shape[0]
    nb = n // p_blk
    n_g = 32                     # blocks per grid step (amortizes ~7us/step)
    nb_pad = -(-nb // n_g) * n_g
    nsteps = nb_pad // n_g

    blk_tile, blk_tr, blk_tz, lr, lz = _local_coords(
        position, tile_id, shape, tiling, p_blk)
    if nb_pad != nb:
        # dead filler blocks: tile 0 with far-out local coords -> zero tents
        blk_tile = jnp.concatenate(
            [blk_tile, jnp.zeros((nb_pad - nb,), jnp.int32)])
        fill = jnp.full((nb_pad - nb, p_blk), 1e9, lr.dtype)
        lr = jnp.concatenate([lr, fill])
        lz = jnp.concatenate([lz, fill])

    win = extract_tile_windows(grid.reshape(nr, nz, n_c), shape, tiling, wr, wz)
    win_t = win.reshape(ntr * ntz, wr, wz, n_c).transpose(0, 3, 2, 1)

    kernel = functools.partial(_gather2d_kernel, wr=wr, wz=wz, n_c=n_c,
                               n_g=n_g, mode=mode, precision=precision)
    row_spec = pl.BlockSpec((1, n_g, p_blk), lambda s, *_: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            row_spec, row_spec,
            # whole window set resident in VMEM; blocks index it dynamically
            pl.BlockSpec((ntr * ntz, n_c, wz, wr), lambda s, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_c, n_g, p_blk), lambda s, *_: (s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsteps, n_c, n_g, p_blk), jnp.float32),
        # resident window set lane-pads each (wz, wr) window to (wz, 128);
        # give the kernel headroom over the 16 MB default (v5e: 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(blk_tile, lr.reshape(nsteps, n_g, p_blk), lz.reshape(nsteps, n_g, p_blk),
      win_t)

    vals = out.transpose(0, 2, 3, 1).reshape(nb_pad * p_blk, n_c)[:n]
    vals = vals.reshape(n, *channels) if channels else vals.reshape(n)

    # in_win (XLA, cheap dense): same criterion as gather_sorted_2d
    base = jnp.floor(position).astype(jnp.int32)
    dr = jnp.mod(base[:, 0].reshape(nb, p_blk) - blk_tr[:, None], nr)
    dz = jnp.mod(base[:, 1].reshape(nb, p_blk) - blk_tz[:, None], nz)
    in_win = (dr < wr - 1) & (dz < wz - 1)
    return vals, in_win.reshape(-1)
