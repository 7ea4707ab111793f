"""Fused Pallas EM-PIC substep in 3D: gather + Boris + drift + Esirkepov.

One Mosaic kernel covers the whole per-particle work of a 3D3V EM step
(BASELINE configs[3]: "fused push+deposit+FDTD step"); only the Yee update
and the compacted exact spill patch stay in XLA.  Layout follows
ops/pallas_pic3d.py: particles on LANES, the x window axis on SUBLANES, the
(y, z) window pair flattened onto lanes (wyz = wy*wz) via a flattened iota
(y = i // wz, z = i % wz) — no cross-tile reshapes.

Window streaming (round 3): the per-block XLA window pre-gather
(win[blk_tile] + transpose, 207 ms at 1e7/128^3) and the per-block J
segment-sum assembly (108 ms) were the measured bottleneck — 80% of the
substep.  Both are replaced by in-kernel DMA against per-TILE flat windows
(sorted_deposit.extract_tile_windows_3d_flat, (n_tiles, C, wx, wyz)):

  * field windows are fetched per block by tile index (scalar-prefetched
    block->tile map) into a double-buffered VMEM scratch, prefetched one
    grid step ahead — HBM traffic is one 50 KB contiguous window per block
    instead of a 1 GB materialized gather;
  * J windows are accumulated in a VMEM scratch across the consecutive
    same-tile blocks (the layout sorts blocks by tile) and flushed ONCE per
    tile straight to the (n_tiles+1, 3, wx, wyz) output (row n_tiles is the
    filler-block trash slot) — the caller folds tiles onto the grid with
    fold_tile_windows_3d_flat (one-hot placement matmuls, no scatter).

The 3D Esirkepov windows (sorted_deposit.esirkepov_sorted_3d term for term:
W_a = dS_a (x) [S0_b S0_c + (dS_b S0_c + S0_b dS_c)/2 + dS_b dS_c/3], the
bracket split into two separable pairs) are built with CLOSED-FORM
cumulative tents instead of triangular cumsum matmuls:

    cumsum_{i' <= i} tent(l - i') = clip(i - l + 1, 0, 1)

so each J component is 1-2 MXU matmuls contracting the particle axis:

    J_x = [(q c_x) K_x] @ [(S0y + dSy/2) S0z + (S0y/2 + dSy/3) dSz]^T
    J_y = (S0x + dSx/2) @ [(q c_y) K_y S0z]^T + (S0x/2 + dSx/3) @ [(q c_y) K_y dSz]^T
    J_z = (S0x + dSx/2) @ [(q c_z) K_z S0y]^T + (S0x/2 + dSx/3) @ [(q c_z) K_z dSy]^T

with K_a = clip(i - l1_a + 1, 0, 1) - clip(i - l0_a + 1, 0, 1) and
c_a = -cell_a / (vol dt).  All J windows share the (wx, wyz) output layout.
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


def _em3d_kernel(bt_ref, lx_ref, ly_ref, lz_ref, vx_ref, vy_ref, vz_ref,
                 q_ref, *refs, wx, wy, wz, wx_pad, wyz_pad, n_g, n_tiles, qm_half_dt, inv_dx,
                 inv_dy, inv_dz, dt, coef_x, coef_y, coef_z, c_light,
                 relativistic, precision, dep_precision):
    three_term = precision in ("exact_bf16", "exact_bf16_pack")
    if three_term:
        win_hi_hbm, win_lo_hbm = refs[0], refs[1]
        (olx_ref, oly_ref, olz_ref, ovx_ref, ovy_ref, ovz_ref, j_ref,
         inw_ref, scr_hi, scr_lo, sem_hi, sem_lo, acc_ref,
         acc_sem) = refs[2:]
        hbm_scr_sem = ((win_hi_hbm, scr_hi, sem_hi),
                       (win_lo_hbm, scr_lo, sem_lo))
    else:
        win_hbm = refs[0]
        (olx_ref, oly_ref, olz_ref, ovx_ref, ovy_ref, ovz_ref, j_ref,
         inw_ref, scr, sem, acc_ref, acc_sem) = refs[1:]
        hbm_scr_sem = ((win_hbm, scr, sem),)

    s = pl.program_id(0)
    ns = pl.num_programs(0)
    p = lx_ref.shape[-1]

    wait_get = make_window_streamer(bt_ref, hbm_scr_sem, s, ns, n_g, n_tiles)
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (wx_pad, p), 0).astype(jnp.float32)
    i_yz = jax.lax.broadcasted_iota(jnp.int32, (wyz_pad, p), 0)
    iota_yf = (i_yz // wz).astype(jnp.float32)
    iota_zf = (i_yz % wz).astype(jnp.float32)
    lx_all, ly_all, lz_all = lx_ref[0], ly_ref[0], lz_ref[0]
    vx_all, vy_all, vz_all = vx_ref[0], vy_ref[0], vz_ref[0]
    q_all = q_ref[0]
    outs = [[] for _ in range(7)]
    for g in range(n_g):
        win_ops = wait_get(g)
        sl = lambda a: jax.lax.slice(a, (g, 0), (g + 1, p))
        l0x, l0y, l0z = sl(lx_all), sl(ly_all), sl(lz_all)
        ax0 = jnp.maximum(0.0, 1.0 - jnp.abs(l0x - iota_x))    # (wx, P)
        ay0 = jnp.maximum(0.0, 1.0 - jnp.abs(l0y - iota_yf))   # (wyz, P)
        az0 = jnp.maximum(0.0, 1.0 - jnp.abs(l0z - iota_zf))   # (wyz, P)
        ayz0 = ay0 * az0
        g_inw = ((l0x >= 0.0) & (l0x < float(wx - 1))
                 & (l0y >= 0.0) & (l0y < float(wy - 1))
                 & (l0z >= 0.0) & (l0z < float(wz - 1)))

        # 6-channel CIC gather (Ex, Ey, Ez, Bx, By, Bz at the node table):
        # ONE channel-stacked matmul contracting the flattened (y, z) lane
        # pair (K = wyz_pad, full MXU tiles), then the x tent select +
        # per-channel sublane reduce on the VPU — ~6x fewer MXU passes than
        # per-channel K=wx dots
        dn_yz = (((1,), (0,)), ((), ()))
        if three_term:
            ayz_hi, ayz_lo = split_bf16(ayz0)
            t_all = dot3(win_ops[0], win_ops[1],
                         ayz_hi, ayz_lo, dn_yz)            # (6*wx_pad, P)
        else:
            t_all = jax.lax.dot_general(
                win_ops[0], ayz0, dn_yz,
                precision=precision, preferred_element_type=jnp.float32)
        ax_c = jnp.concatenate([ax0] * 6, axis=0)
        pt = t_all * ax_c
        eb = [jnp.sum(jax.lax.slice(pt, (c * wx_pad, 0),
                                    ((c + 1) * wx_pad, p)),
                      axis=0, keepdims=True) for c in range(6)]
        ex, ey, ez, bx, by, bz = eb

        # Boris kick (matches models.electromagnetic.boris_kick, on lanes)
        vx, vy, vz = sl(vx_all), sl(vy_all), sl(vz_all)
        vmx = vx + qm_half_dt * ex
        vmy = vy + qm_half_dt * ey
        vmz = vz + qm_half_dt * ez
        if relativistic:
            inv_c2 = 1.0 / (c_light * c_light)
            gamma = jnp.sqrt(1.0 + (vmx * vmx + vmy * vmy + vmz * vmz)
                             * inv_c2)
            tx = qm_half_dt * bx / gamma
            ty = qm_half_dt * by / gamma
            tz = qm_half_dt * bz / gamma
        else:
            tx = qm_half_dt * bx
            ty = qm_half_dt * by
            tz = qm_half_dt * bz
        t2 = tx * tx + ty * ty + tz * tz
        sfac = 2.0 / (1.0 + t2)
        sx, sy, sz = tx * sfac, ty * sfac, tz * sfac
        vpx = vmx + (vmy * tz - vmz * ty)
        vpy = vmy + (vmz * tx - vmx * tz)
        vpz = vmz + (vmx * ty - vmy * tx)
        nvx = vmx + (vpy * sz - vpz * sy) + qm_half_dt * ex
        nvy = vmy + (vpz * sx - vpx * sz) + qm_half_dt * ey
        nvz = vmz + (vpx * sy - vpy * sx) + qm_half_dt * ez

        # drift (coordinate velocity = u/gamma when relativistic)
        if relativistic:
            inv_c2 = 1.0 / (c_light * c_light)
            gamma1 = jnp.sqrt(1.0 + (nvx * nvx + nvy * nvy + nvz * nvz)
                              * inv_c2)
            cvx, cvy, cvz = nvx / gamma1, nvy / gamma1, nvz / gamma1
        else:
            cvx, cvy, cvz = nvx, nvy, nvz
        l1x = l0x + dt * cvx * inv_dx
        l1y = l0y + dt * cvy * inv_dy
        l1z = l0z + dt * cvz * inv_dz

        # Esirkepov windows, closed-form cumulative tents (module docstring)
        ax1 = jnp.maximum(0.0, 1.0 - jnp.abs(l1x - iota_x))
        ay1 = jnp.maximum(0.0, 1.0 - jnp.abs(l1y - iota_yf))
        az1 = jnp.maximum(0.0, 1.0 - jnp.abs(l1z - iota_zf))
        dsx = ax1 - ax0
        dsy = ay1 - ay0
        dsz = az1 - az0
        d_inw = ((l1x >= 0.0) & (l1x < float(wx - 1))
                 & (l1y >= 0.0) & (l1y < float(wy - 1))
                 & (l1z >= 0.0) & (l1z < float(wz - 1)))
        inw = g_inw & d_inw
        qm = jnp.where(inw, sl(q_all), 0.0)

        kx = (jnp.clip(iota_x - l1x + 1.0, 0.0, 1.0)
              - jnp.clip(iota_x - l0x + 1.0, 0.0, 1.0))
        ky = (jnp.clip(iota_yf - l1y + 1.0, 0.0, 1.0)
              - jnp.clip(iota_yf - l0y + 1.0, 0.0, 1.0))
        kz = (jnp.clip(iota_zf - l1z + 1.0, 0.0, 1.0)
              - jnp.clip(iota_zf - l0z + 1.0, 0.0, 1.0))

        dn_dep = (((1,), (1,)), ((), ()))
        # 'exact_bf16_pack' aliases to the 3-term deposits here: the 2D
        # M-packed form measured a catastrophic Mosaic lowering in the 3D
        # ES kernel on v5e (11.9 s/step vs 256 ms — PERFORMANCE.md r5b)
        if dep_precision == "exact_bf16":
            mm = lambda a, b: dot3_split(a, b, dn_dep)
        else:
            mm = lambda a, b: jax.lax.dot_general(
                a, b, dn_dep, precision=dep_precision,
                preferred_element_type=jnp.float32)

        p1x = ax0 + 0.5 * dsx                          # (wx, P)
        p2x = 0.5 * ax0 + dsx / 3.0
        mix_x = ((ay0 + 0.5 * dsy) * az0
                 + (0.5 * ay0 + dsy / 3.0) * dsz)      # (wyz, P)
        jx = mm((qm * coef_x) * kx, mix_x)
        kyq = (qm * coef_y) * ky
        jy = mm(p1x, kyq * az0) + mm(p2x, kyq * dsz)
        kzq = (qm * coef_z) * kz
        jz = mm(p1x, kzq * ay0) + mm(p2x, kzq * dsy)

        # per-tile J accumulation: blocks are tile-contiguous, so flush the
        # accumulator straight to j_ref[tile] whenever the tile changes
        i = s * n_g + g
        t_cur = bt_ref[i]
        # i == 0 only at (s == 0, g == 0); bt[max(i-1, 0)] then equals t_cur,
        # so do_flush is naturally False there, but new_tile must still
        # initialize the accumulator
        prev = bt_ref[jnp.maximum(i - 1, 0)]
        changed = t_cur != prev
        do_flush = changed
        new_tile = (changed | (s == 0)) if g == 0 else changed

        @pl.when(do_flush)
        def _():
            cp = pltpu.make_async_copy(acc_ref, j_ref.at[prev], acc_sem)
            cp.start()
            cp.wait()

        @pl.when(new_tile)
        def _():
            acc_ref[0] = jx
            acc_ref[1] = jy
            acc_ref[2] = jz

        @pl.when(jnp.logical_not(new_tile))
        def _():
            acc_ref[0] += jx
            acc_ref[1] += jy
            acc_ref[2] += jz

        if g == n_g - 1:
            @pl.when(s == ns - 1)
            def _():
                cp = pltpu.make_async_copy(acc_ref, j_ref.at[t_cur], acc_sem)
                cp.start()
                cp.wait()

        # freeze out-of-window rows (exact re-push happens in the model)
        vals = (jnp.where(inw, l1x, l0x), jnp.where(inw, l1y, l0y),
                jnp.where(inw, l1z, l0z),
                jnp.where(inw, nvx, vx), jnp.where(inw, nvy, vy),
                jnp.where(inw, nvz, vz), inw.astype(jnp.float32))
        for k, v in enumerate(vals):
            outs[k].append(v)
    for ref, acc in zip((olx_ref, oly_ref, olz_ref, ovx_ref, ovy_ref,
                         ovz_ref, inw_ref), outs):
        ref[0] = jnp.concatenate(acc, axis=0)


@functools.partial(jax.jit, static_argnames=("shape", "tiling", "qm_half_dt",
                                             "dt", "cell_size", "c_light",
                                             "relativistic", "charge",
                                             "precision", "n_g", "interpret"))
def fused_em3d_substep(
    table: jax.Array,
    position: jax.Array,
    velocity: jax.Array,
    valid: jax.Array,
    tile_id: jax.Array,
    shape: tuple[int, int, int],
    tiling,
    qm_half_dt: float,
    dt: float,
    cell_size: tuple[float, float, float],
    charge: float,
    c_light: float = 1.0,
    relativistic: bool = False,
    precision: str = "highest",
    n_g: int = 16,
    interpret: bool = False,
):
    """One fused EM particle substep for the tile-sorted 3D3V layout.

    ``table``: (nx, ny, nz, 6) node-centered (Ex, Ey, Ez, Bx, By, Bz).
    Returns ``(position', velocity', j (nx, ny, nz, 3), in_win)`` —
    positions in global grid units, ``~in_win`` rows frozen at their inputs
    with no deposit (the model re-pushes them exactly via its compacted
    patch).  Same ``precision`` contract as fused_em2d_substep.
    """
    from .pallas_pic3d import _local_coords_3d
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
    dx, dy, dz = cell_size
    vol = dx * dy * dz

    blk_tile, origins, (lx, ly, lz) = _local_coords_3d(
        position, tile_id, shape, tiling, p_blk)
    if nb_pad != nb:
        # filler blocks carry the sentinel tile (n_tiles): their (zero) J
        # flushes land in the trash row and never touch a real tile
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
    win_flat = extract_tile_windows_3d_flat(table, shape, tiling,
                                            precision=ext_prec, padded=True)
    # channel-stacked rows for the merged gather matmul (same HBM bytes)
    win_flat = win_flat.reshape(n_tiles, 6 * wx_pad, wyz_pad)
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

    q_row = jnp.where(valid, jnp.float32(charge), 0.0)
    if three_term:
        dep_precision = "exact_bf16"
    else:
        dep_precision = ("default" if getattr(tiling, "dtype", "float32")
                         == "bfloat16" else "highest")
    kernel = functools.partial(
        _em3d_kernel, wx=wx, wy=wy, wz=wz, wx_pad=wx_pad, wyz_pad=wyz_pad, n_g=n_g, n_tiles=n_tiles,
        qm_half_dt=float(qm_half_dt), inv_dx=float(1.0 / dx),
        inv_dy=float(1.0 / dy), inv_dz=float(1.0 / dz), dt=float(dt),
        coef_x=float(-dx / (vol * dt)), coef_y=float(-dy / (vol * dt)),
        coef_z=float(-dz / (vol * dt)), c_light=float(c_light),
        relativistic=relativistic, precision=precision,
        dep_precision=dep_precision)
    row_spec = pl.BlockSpec((1, n_g, p_blk), lambda s, bt: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((nsteps, n_g, p_blk), jnp.float32)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = []
    for _ in win_args:
        scratch.append(pltpu.VMEM((2, n_g, 6 * wx_pad, wyz_pad), wdtype))
    for _ in win_args:
        scratch.append(pltpu.SemaphoreType.DMA((2, n_g)))
    scratch.append(pltpu.VMEM((3, wx_pad, wyz_pad), jnp.float32))
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
            jax.ShapeDtypeStruct((n_tiles + 1, 3, wx_pad, wyz_pad), jnp.float32),
            row_shape,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(blk_tile,
      rows(lx.reshape(-1)), rows(ly.reshape(-1)), rows(lz.reshape(-1)),
      rows(velocity[:, 0]), rows(velocity[:, 1]), rows(velocity[:, 2]),
      rows(q_row), *win_args)
    nlx, nly, nlz, nvx, nvy, nvz, j_tiles, inw = outs

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
    j_tiles = jnp.where(present[:n_tiles, None, None, None],
                        j_tiles[:n_tiles], 0.0)
    j = fold_tile_windows_3d_flat(j_tiles, shape, tiling, precision=ext_prec)
    return position_out, velocity_out, j, inw.reshape(n_pad)[:n] > 0.5
