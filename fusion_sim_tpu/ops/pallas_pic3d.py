"""Fused Pallas ES-PIC substep in 3D: gather + kick + drift + deposit.

Generalizes ops/pallas_pic.py to 3D with the flattened-lane window layout
(PERFORMANCE.md headroom #2): a 3D tile window (wx, wy, wz) cannot keep all
three axes on hardware dims, so the (y, z) pair is flattened onto the LANE
axis (wyz = wy*wz) and x rides SUBLANES —

    window  W_c : (wx, wyz)         one MXU operand per channel
    U_c         = W_c^T @ ax        (wyz, P)  contraction over x (MXU)
    E_c         = sum_yz(ayz * U_c) (1, P)    sublane reduce (VPU)
    deposit     = axn @ (ayzn * w)^T  -> (wx, wyz) window (MXU, K=P)

``ayz`` is built directly on (wyz, P) from a flattened iota (y = i // wz,
z = i % wz) — no cross-tile reshapes, which Mosaic rejects.

Window streaming (round 3, same as ops/pallas_em3d.py): the 3D window set
cannot be VMEM-resident, and the XLA per-block pre-gather / per-block rho
segment-sum that round 2 used were the measured bottleneck (~300 ms of a
~400 ms substep at 1e7/128^3).  The kernel now DMAs each block's tile
window from the flat per-tile array (extract_tile_windows_3d_flat,
(n_tiles, 3, wx, wyz)) by scalar-prefetched tile index, double-buffered one
grid step ahead, and accumulates rho per TILE in VMEM, flushing once per
tile to the (n_tiles+1, wx, wyz) output (row n_tiles = filler trash slot);
the caller folds tiles onto the grid with fold_tile_windows_3d_flat.

Out-of-window rows come back frozen with no deposit, exactly like the 2D
kernel; the model's compacted spill patch re-pushes them (same contract as
SortedElectrostaticPIC's 2D pallas backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import dot3, dot3_split, split_bf16
from .pallas_stream import make_window_streamer


def _es3d_kernel(bt_ref, lx_ref, ly_ref, lz_ref, vx_ref, vy_ref, vz_ref,
                 w_ref, *refs, wx, wy, wz, wx_pad, wyz_pad, n_g, n_tiles, qm_dt, c_x, c_y,
                 c_z, precision, dep_precision):
    three_term = precision in ("exact_bf16", "exact_bf16_pack")
    if three_term:
        win_hi_hbm, win_lo_hbm = refs[0], refs[1]
        (nlx_ref, nly_ref, nlz_ref, nvx_ref, nvy_ref, nvz_ref, rho_ref,
         inw_ref, scr_hi, scr_lo, sem_hi, sem_lo, acc_ref,
         acc_sem) = refs[2:]
        hbm_scr_sem = ((win_hi_hbm, scr_hi, sem_hi),
                       (win_lo_hbm, scr_lo, sem_lo))
    else:
        win_hbm = refs[0]
        (nlx_ref, nly_ref, nlz_ref, nvx_ref, nvy_ref, nvz_ref, rho_ref,
         inw_ref, scr, sem, acc_ref, acc_sem) = refs[1:]
        hbm_scr_sem = ((win_hbm, scr, sem),)

    s = pl.program_id(0)
    ns = pl.num_programs(0)
    p = lx_ref.shape[-1]

    wait_get = make_window_streamer(bt_ref, hbm_scr_sem, s, ns, n_g, n_tiles)
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (wx_pad, p), 0).astype(jnp.float32)
    i_yz = jax.lax.broadcasted_iota(jnp.int32, (wyz_pad, p), 0)
    iota_y = (i_yz // wz).astype(jnp.float32)
    iota_z = (i_yz % wz).astype(jnp.float32)
    lx_all, ly_all, lz_all = lx_ref[0], ly_ref[0], lz_ref[0]   # (n_g, P)
    vx_all, vy_all, vz_all = vx_ref[0], vy_ref[0], vz_ref[0]
    w_all = w_ref[0]
    o = {k: [] for k in ("lx", "ly", "lz", "vx", "vy", "vz", "inw")}
    for g in range(n_g):
        win_ops = wait_get(g)
        sl = lambda a: jax.lax.slice(a, (g, 0), (g + 1, p))
        lx, ly, lz = sl(lx_all), sl(ly_all), sl(lz_all)
        ayz = (jnp.maximum(0.0, 1.0 - jnp.abs(ly - iota_y))
               * jnp.maximum(0.0, 1.0 - jnp.abs(lz - iota_z)))       # (wyz, P)
        g_inw = ((lx < float(wx - 1)) & (ly < float(wy - 1))
                 & (lz < float(wz - 1)))                             # (1, P)

        # 3-channel CIC gather: ONE channel-stacked matmul contracting the
        # flattened (y, z) lane pair (K = wyz_pad, full MXU tiles), then the
        # x tent select + per-channel sublane reduce on the VPU — ~6x fewer
        # MXU passes than per-channel K=wx dots
        dn_yz = (((1,), (0,)), ((), ()))
        if three_term:
            ayz_hi, ayz_lo = split_bf16(ayz)
            t_all = dot3(win_ops[0], win_ops[1],
                         ayz_hi, ayz_lo, dn_yz)            # (3*wx_pad, P)
        else:
            t_all = jax.lax.dot_general(
                win_ops[0], ayz, dn_yz,
                precision=precision, preferred_element_type=jnp.float32)
        ax_p = jnp.maximum(0.0, 1.0 - jnp.abs(lx - iota_x))
        pt = t_all * jnp.concatenate([ax_p] * 3, axis=0)
        e = [jnp.sum(jax.lax.slice(pt, (c * wx_pad, 0),
                                   ((c + 1) * wx_pad, p)),
                     axis=0, keepdims=True) for c in range(3)]
        ex, ey, ez = e

        w = sl(w_all)
        valid = w != 0.0
        nvx = jnp.where(valid, sl(vx_all) + qm_dt * ex, 0.0)
        nvy = jnp.where(valid, sl(vy_all) + qm_dt * ey, 0.0)
        nvz = jnp.where(valid, sl(vz_all) + qm_dt * ez, 0.0)
        nlx = lx + c_x * nvx
        nly = ly + c_y * nvy
        nlz = lz + c_z * nvz

        # deposit at the new (local) position — next step's rho
        axn = jnp.maximum(0.0, 1.0 - jnp.abs(nlx - iota_x))
        ayzn = (jnp.maximum(0.0, 1.0 - jnp.abs(nly - iota_y))
                * jnp.maximum(0.0, 1.0 - jnp.abs(nlz - iota_z)))
        d_inw = ((nlx >= 0.0) & (nlx < float(wx - 1))
                 & (nly >= 0.0) & (nly < float(wy - 1))
                 & (nlz >= 0.0) & (nlz < float(wz - 1)))
        inw = g_inw & d_inw
        wm = jnp.where(inw, w, 0.0)
        nlx = jnp.where(inw, nlx, lx)
        nly = jnp.where(inw, nly, ly)
        nlz = jnp.where(inw, nlz, lz)
        nvx = jnp.where(inw, nvx, sl(vx_all))
        nvy = jnp.where(inw, nvy, sl(vy_all))
        nvz = jnp.where(inw, nvz, sl(vz_all))
        dn_dep = (((1,), (1,)), ((), ()))
        # NOTE: the 2D kernels' M-packed deposit (ops/mxu.dot3_mpack) was
        # tried here under 'exact_bf16_pack' and measured a CATASTROPHIC
        # Mosaic lowering on v5e — 11.9 s/step at config[3] vs 256 ms for
        # the 3-term form (2026-08-21, PERFORMANCE.md round-5b) — so the
        # 3D 'exact_bf16_pack' aliases to the 3-term deposit
        if dep_precision == "exact_bf16":
            rho_g = dot3_split(axn, ayzn * wm, dn_dep)
        else:
            rho_g = jax.lax.dot_general(
                axn, ayzn * wm, dimension_numbers=dn_dep,
                precision=dep_precision, preferred_element_type=jnp.float32)

        # per-tile rho accumulation, flushed once per tile (blocks are
        # tile-contiguous in the sorted layout — see module docstring)
        i = s * n_g + g
        t_cur = bt_ref[i]
        prev = bt_ref[jnp.maximum(i - 1, 0)]
        changed = t_cur != prev
        new_tile = (changed | (s == 0)) if g == 0 else changed

        @pl.when(changed)
        def _():
            cp = pltpu.make_async_copy(acc_ref, rho_ref.at[prev], acc_sem)
            cp.start()
            cp.wait()

        @pl.when(new_tile)
        def _():
            acc_ref[...] = rho_g

        @pl.when(jnp.logical_not(new_tile))
        def _():
            acc_ref[...] += rho_g

        if g == n_g - 1:
            @pl.when(s == ns - 1)
            def _():
                cp = pltpu.make_async_copy(acc_ref, rho_ref.at[t_cur],
                                           acc_sem)
                cp.start()
                cp.wait()

        for k, v in (("lx", nlx), ("ly", nly), ("lz", nlz), ("vx", nvx),
                     ("vy", nvy), ("vz", nvz),
                     ("inw", inw.astype(jnp.float32))):
            o[k].append(v)
    nlx_ref[0] = jnp.concatenate(o["lx"], axis=0)
    nly_ref[0] = jnp.concatenate(o["ly"], axis=0)
    nlz_ref[0] = jnp.concatenate(o["lz"], axis=0)
    nvx_ref[0] = jnp.concatenate(o["vx"], axis=0)
    nvy_ref[0] = jnp.concatenate(o["vy"], axis=0)
    nvz_ref[0] = jnp.concatenate(o["vz"], axis=0)
    inw_ref[0] = jnp.concatenate(o["inw"], axis=0)


def _local_coords_3d(position, tile_id, shape, tiling, p_blk):
    """Window-relative 3D coordinates per particle (XLA side).

    Periodic wrap folds domain-edge crossings back into the window, exactly
    like the XLA sorted 3D paths (sorted_deposit.py)."""
    nts = tiling.n_tiles(shape)
    m = tiling.margin
    n = position.shape[0]
    nb = n // p_blk
    blk_tile = tile_id[::p_blk].astype(jnp.int32)
    rem = blk_tile
    t_idx = []
    for a in (2, 1, 0):
        t_idx.append(rem % nts[a])
        rem = rem // nts[a]
    t_idx = t_idx[::-1]
    origins, locals_ = [], []
    for a in range(3):
        o_a = t_idx[a] * tiling.tile[a] - m
        origins.append(o_a)
        locals_.append(jnp.mod(
            position[:, a].reshape(nb, p_blk)
            - o_a[:, None].astype(position.dtype), shape[a]))
    return blk_tile, origins, locals_


@functools.partial(jax.jit, static_argnames=("shape", "tiling", "qm_dt",
                                             "c_x", "c_y", "c_z", "precision",
                                             "n_g", "interpret"))
def fused_es3d_substep(
    e_grid: jax.Array,
    position: jax.Array,
    velocity: jax.Array,
    weights: jax.Array,
    tile_id: jax.Array,
    shape: tuple[int, int, int],
    tiling,
    qm_dt: float,
    c_x: float,
    c_y: float,
    c_z: float,
    precision: str = "highest",
    n_g: int = 16,
    interpret: bool = False,
):
    """One fused particle substep for tile-sorted 3D ES PIC.

    ``e_grid``: (nx, ny, nz, 3); particle arrays in the padded sorted layout
    (N = nb * tiling.block, weights 0 on fillers, block % 128 == 0).
    Returns ``(position', velocity', rho', in_win)`` with the same contract
    as ``fused_es2d_substep`` (rho' deposited at the NEW positions; ~in_win
    rows frozen with no deposit, patched exactly by the caller).
    ``precision``: 'highest' | 'exact_bf16' | 'default' as in 2D, plus
    'exact_bf16_pack' = accepted for config uniformity with the 2D
    kernels but ALIASES to 'exact_bf16' here: the M-packed deposit that
    wins in 2D measured a catastrophic Mosaic lowering in this kernel
    (11.9 s/step vs 256 ms at config[3] — PERFORMANCE.md round-5b).
    """
    from .sorted_deposit import (extract_tile_windows_3d_flat,
                                 fold_tile_windows_3d_flat)

    p_blk = tiling.block
    if p_blk % 128:
        raise ValueError(f"pallas path needs block % 128 == 0, got {p_blk}")
    m = tiling.margin
    wx, wy, wz = (t + 2 * m + 1 for t in tiling.tile)
    from .sorted_deposit import _padded_window_dims
    _, wyz, wx_pad, wyz_pad = _padded_window_dims(tiling)
    n_tiles = int(np.prod(tiling.n_tiles(shape)))
    n = position.shape[0]
    nb = n // p_blk
    nb_pad = -(-nb // n_g) * n_g
    nsteps = nb_pad // n_g
    n_pad = nb_pad * p_blk

    blk_tile, origins, (lx, ly, lz) = _local_coords_3d(
        position, tile_id, shape, tiling, p_blk)
    if nb_pad != nb:
        # filler blocks: sentinel tile (rho flushes to the trash row), zero
        # weight, far-out local coords
        blk_tile = jnp.concatenate(
            [blk_tile, jnp.full((nb_pad - nb,), n_tiles, jnp.int32)])
        fill = jnp.full((nb_pad - nb, p_blk), 1e9, lx.dtype)
        lx = jnp.concatenate([lx, fill])
        ly = jnp.concatenate([ly, fill])
        lz = jnp.concatenate([lz, fill])

    three_term = precision in ("exact_bf16", "exact_bf16_pack")
    ext_prec = ("2term" if three_term
                or getattr(tiling, "dtype", "float32") == "bfloat16"
                else "highest")
    win_flat = extract_tile_windows_3d_flat(e_grid, shape, tiling,
                                            precision=ext_prec, padded=True)
    # channel-stacked rows for the merged gather matmul (same HBM bytes)
    win_flat = win_flat.reshape(n_tiles, 3 * wx_pad, wyz_pad)
    if three_term:
        win_args = split_bf16(win_flat)
        wdtype = jnp.bfloat16
    else:
        win_args = (win_flat,)
        wdtype = jnp.float32

    def rows(v):
        if v.shape[0] != n_pad:
            v = jnp.concatenate([v, jnp.zeros((n_pad - v.shape[0],), v.dtype)])
        return v.reshape(nsteps, n_g, p_blk)

    if three_term:
        dep_precision = "exact_bf16"
    else:
        dep_precision = ("default" if getattr(tiling, "dtype", "float32")
                         == "bfloat16" else "highest")
    kernel = functools.partial(_es3d_kernel, wx=wx, wy=wy, wz=wz, wx_pad=wx_pad, wyz_pad=wyz_pad, n_g=n_g,
                               n_tiles=n_tiles, qm_dt=qm_dt, c_x=c_x,
                               c_y=c_y, c_z=c_z, precision=precision,
                               dep_precision=dep_precision)
    row_spec = pl.BlockSpec((1, n_g, p_blk), lambda s, bt: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((nsteps, n_g, p_blk), jnp.float32)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = []
    for _ in win_args:
        scratch.append(pltpu.VMEM((2, n_g, 3 * wx_pad, wyz_pad), wdtype))
    for _ in win_args:
        scratch.append(pltpu.SemaphoreType.DMA((2, n_g)))
    scratch.append(pltpu.VMEM((wx_pad, wyz_pad), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA(()))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[row_spec] * 7 + [any_spec] * len(win_args),
        out_specs=(
            row_spec, row_spec, row_spec, row_spec, row_spec, row_spec,
            any_spec,
            row_spec,
        ),
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            row_shape, row_shape, row_shape, row_shape, row_shape, row_shape,
            jax.ShapeDtypeStruct((n_tiles + 1, wx_pad, wyz_pad), jnp.float32),
            row_shape,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(blk_tile,
      rows(lx.reshape(-1)), rows(ly.reshape(-1)), rows(lz.reshape(-1)),
      rows(velocity[:, 0]), rows(velocity[:, 1]), rows(velocity[:, 2]),
      rows(weights), *win_args)
    nlx, nly, nlz, nvx, nvy, nvz, rho_tiles, inw = outs

    # back to global coordinates (periodic); drop filler rows
    pos_cols = []
    for a, nl in zip(range(3), (nlx, nly, nlz)):
        orig = jnp.repeat(origins[a].astype(jnp.float32), p_blk)
        pos_cols.append(jnp.mod(nl.reshape(n_pad)[:n] + orig, shape[a]))
    position_out = jnp.stack(pos_cols, axis=-1)
    velocity_out = jnp.stack([nvx.reshape(n_pad)[:n], nvy.reshape(n_pad)[:n],
                              nvz.reshape(n_pad)[:n]], axis=-1)
    # tiles with no blocks were never flushed -> mask uninitialized rows
    present = jnp.zeros((n_tiles + 1,), jnp.bool_).at[blk_tile].set(
        True, mode="drop")
    rho_tiles = jnp.where(present[:n_tiles, None, None],
                          rho_tiles[:n_tiles], 0.0)
    rho = fold_tile_windows_3d_flat(rho_tiles[:, None], shape, tiling,
                                    precision=ext_prec)[..., 0]
    return position_out, velocity_out, rho, inw.reshape(n_pad)[:n] > 0.5
