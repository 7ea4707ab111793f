"""Fused Pallas EM-PIC substep: gather + Boris kick + drift + Esirkepov
deposit in one kernel (2D3V, tile-sorted layout).

The XLA sorted Esirkepov (ops/sorted_deposit.esirkepov_sorted_2d) spends
most of its time materializing eight (N, w)-expanded factor arrays in HBM
(~60 ms at 10M); here every factor lives as a (w, P) VMEM register tile:

    eb_c  = sublane-reduce(az * (W_c^T @ ar))        6-channel CIC gather
    v'    = Boris(v, E, B)                           VPU (cross products)
    l1    = l0 + dt v' / dx                          drift
    cum   = L @ (S1 - S0)                            cumsum = triangular MXU
    J_a   = A_a @ (B_a * q)^T                        one matmul per component

The Yee update, spill patch, and migration-free shell stay in XLA
(models/electromagnetic.SortedElectromagneticPIC backend='fused').
Factor math matches esirkepov_sorted_2d term for term (the 3-node shapes
anchored at base = floor(min(x0, x1)) expand to exactly the window tents
tent(l - h), and cumsum(dS) telescopes to zero outside the motion's span).

Kernel layout follows the tuned recipe of ops/pallas_gather.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import dot3, dot3_split, dot4_quad, split_bf16
from .pallas_pic import accumulate_tile_2d
from .pallas_stream import (make_window_streamer, resolve_stream,
                            stream_scratch_shapes)


def _em2d_kernel(tile_ref, pr_ref, pz_ref, vx_ref, vy_ref, vz_ref, q_ref,
                 *refs, wr, wz, wr_pad, n_g, n_tiles, ntz, tile_r, tile_z,
                 margin, nr, nz, qm_half_dt, inv_dx,
                 inv_dz, dt, coef_x, coef_z, inv_vol, c_light, relativistic,
                 precision, dep_precision, stream):
    three_term = precision in ("exact_bf16", "exact_bf16_pack",
                               "exact_bf16_pack2")
    pack = precision in ("exact_bf16_pack", "exact_bf16_pack2")
    pack_dep = precision == "exact_bf16_pack2"
    # pack: hi/lo window halves share ONE operand on the lane (wr) axis —
    # the packed cross-term matmul contracts K = 2*wr_pad (ops/pallas_pic.py)
    n_win = 2 if (three_term and not pack) else 1
    k_win = 2 * wr_pad if pack else wr_pad
    wins = refs[:n_win]
    (olr_ref, olz_ref, ovx_ref, ovy_ref, ovz_ref, j_ref,
     inw_ref, acc_ref, acc_sem) = refs[n_win:n_win + 9]
    s = pl.program_id(0)
    ns = pl.num_programs(0)
    p = pr_ref.shape[-1]

    if stream:
        # HBM window set, per-block DMA by prefetched tile index, double-
        # buffered one grid step ahead (ops/pallas_stream.py).  Streamed
        # storage is lane-padded to 128 (Mosaic HBM slices must align to
        # the (8, 128) tiling); slice the view back to wr_pad so the gather
        # matmul K stays small (the pad was physical anyway).
        scrs = refs[n_win + 9:n_win + 9 + n_win]
        sems = refs[n_win + 9 + n_win:]
        _wait_get = make_window_streamer(
            tile_ref, list(zip(wins, scrs, sems)), s, ns, n_g, n_tiles)

        def wait_get(g):
            return [jax.lax.slice(w, (0, 0), (w.shape[0], k_win))
                    for w in _wait_get(g)]
    # r tents on the sublane-padded range (rows >= wr are zero in-window)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (wr_pad, p),
                                      0).astype(jnp.float32)
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (wz, p), 0).astype(jnp.float32)
    pr_all, pz_all = pr_ref[0], pz_ref[0]          # (G, P) global coords
    vx_all, vy_all, vz_all = vx_ref[0], vy_ref[0], vz_ref[0]
    q_all = q_ref[0]
    wz_pad = -(-wz // 8) * 8
    iota_zp = jax.lax.broadcasted_iota(jnp.int32, (wz_pad, p),
                                       0).astype(jnp.float32)
    outs = [[] for _ in range(6)]
    for g in range(n_g):
        t_raw = tile_ref[s * n_g + g]
        if stream:
            win_ops = wait_get(g)
        else:
            t = jnp.minimum(t_raw, n_tiles - 1)
            win_ops = [w_ref_[t] for w_ref_ in wins]
        sl = lambda a: jax.lax.slice(a, (g, 0), (g + 1, p))
        # window-local coordinates IN-KERNEL from the prefetched tile id
        # (bit-identical to pallas_gather._local_coords — see
        # ops/pallas_pic.py; the XLA lr/lz chain measured 3.5 ms at 10M)
        otr = ((t_raw // ntz) * tile_r - margin).astype(jnp.float32)
        otz = ((t_raw % ntz) * tile_z - margin).astype(jnp.float32)
        l0r = jnp.mod(sl(pr_all) - otr, float(nr))
        l0z = jnp.mod(sl(pz_all) - otz, float(nz))
        ar = jnp.maximum(0.0, 1.0 - jnp.abs(l0r - iota_r))   # (wr, P)
        az = jnp.maximum(0.0, 1.0 - jnp.abs(l0z - iota_z))   # (wz, P)
        g_inw = ((l0r >= 0.0) & (l0r < float(wr - 1))
                 & (l0z >= 0.0) & (l0z < float(wz - 1)))

        # 6-channel CIC gather (Ex, Ey, Ez, Bx, By, Bz at the node
        # table): ONE channel-stacked matmul (rows c*wz_pad + z; the padded
        # window rows are zero so the stray tent past wz is inert), then
        # the z tent select + per-channel sublane reduce on the VPU — ~6x
        # fewer MXU passes than the per-channel form
        dn = (((1,), (0,)), ((), ()))
        if pack:
            # full-K packing (see ops/pallas_pic.py): cross terms
            # Whi@ar_lo + Wlo@ar_hi in ONE matmul, K = 2*wr_pad
            wp = win_ops[0]
            ar_hi, ar_lo = split_bf16(ar)
            ar_cat = jnp.concatenate([ar_lo, ar_hi], axis=0)
            w_hi = jax.lax.slice(wp, (0, 0), (wp.shape[0], wr_pad))
            d_ = lambda a, b: jax.lax.dot_general(
                a, b, dn, preferred_element_type=jnp.float32)
            t_all = d_(w_hi, ar_hi) + d_(wp, ar_cat)
        elif three_term:
            # 3 bf16 passes instead of 'highest''s ~6 (ops/mxu.py);
            # windows were split once in XLA
            ar_hi, ar_lo = split_bf16(ar)
            t_all = dot3(win_ops[0], win_ops[1], ar_hi, ar_lo, dn)
        else:
            t_all = jax.lax.dot_general(
                win_ops[0], ar, dn,
                precision=precision, preferred_element_type=jnp.float32)
        az_p = jnp.maximum(0.0, 1.0 - jnp.abs(l0z - iota_zp))
        pt = t_all * jnp.concatenate([az_p] * 6, axis=0)
        eb = [jnp.sum(jax.lax.slice(pt, (c * wz_pad, 0),
                                    ((c + 1) * wz_pad, p)),
                      axis=0, keepdims=True) for c in range(6)]
        ex, ey, ez, bx, by, bz = eb

        # Boris kick (electromagnetic.boris_kick, on lanes)
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
        # v' = v- + v- x t ; v+ = v- + v' x s
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
        l1r = l0r + dt * cvx * inv_dx
        l1z = l0z + dt * cvy * inv_dz

        # Esirkepov windows (matches esirkepov_sorted_2d term for term)
        s1r = jnp.maximum(0.0, 1.0 - jnp.abs(l1r - iota_r))
        s1z = jnp.maximum(0.0, 1.0 - jnp.abs(l1z - iota_z))
        dsr = s1r - ar
        dsz = s1z - az
        d_inw = ((l1r >= 0.0) & (l1r < float(wr - 1))
                 & (l1z >= 0.0) & (l1z < float(wz - 1)))
        inw = g_inw & d_inw
        qm = jnp.where(inw, sl(q_all), 0.0)

        def win_mm(a, b):
            dnums = (((1,), (1,)), ((), ()))
            if pack_dep:
                # deposit cross terms packed along the particle (K) axis —
                # one matmul instruction fewer per call (ops/pallas_pic.py)
                a_hi, a_lo = split_bf16(a)
                b_hi, b_lo = split_bf16(b)
                a_cat = jnp.concatenate([a_hi, a_lo], axis=1)
                b_cat = jnp.concatenate([b_lo, b_hi], axis=1)
                d2_ = lambda x, y: jax.lax.dot_general(
                    x, y, dnums, preferred_element_type=jnp.float32)
                return d2_(a_hi, b_hi) + d2_(a_cat, b_cat)
            if pack:
                # M/N quadrant packing (ops/mxu.dot4_quad): every deposit
                # contraction's four split products ride ONE matmul whose
                # packed output still fits one MXU tile (2*wr_pad <= 128,
                # 2*wz <= 128) — a third of dot3_split's passes per J
                # component, at better accuracy (free lo@lo term)
                return dot4_quad(a, b)
            if dep_precision == "exact_bf16":
                return dot3_split(a, b, dnums)
            return jax.lax.dot_general(
                a, b, dnums,
                precision=dep_precision, preferred_element_type=jnp.float32)

        # Esirkepov cumsum along the window axis in CLOSED FORM: the
        # cumulative CIC tent is the hockey-stick clip
        #     sum_{i' <= i} tent(l - i') = clip(i - l + 1, 0, 1)
        # so K = cumsum(dS) = clip(.., l1) - clip(.., l0) — no triangular
        # matmuls (ops/pallas_em3d.py derivation)
        kr = (jnp.clip(iota_r - l1r + 1.0, 0.0, 1.0)
              - jnp.clip(iota_r - l0r + 1.0, 0.0, 1.0))
        kz = (jnp.clip(iota_z - l1z + 1.0, 0.0, 1.0)
              - jnp.clip(iota_z - l0z + 1.0, 0.0, 1.0))
        j0 = win_mm((qm * coef_x) * kr, az + 0.5 * dsz)
        j1 = win_mm(ar + 0.5 * dsr, (qm * coef_z) * kz)
        qvz = qm * cvz * inv_vol  # coordinate velocity (= u_z/gamma if rel.)
        # two J_y contractions share the P axis: stack along lanes -> one
        # matmul of the same total FLOPs, half the pass overhead
        j2 = win_mm(
            jnp.concatenate([qvz * (ar + 0.5 * dsr),
                             qvz * (0.5 * ar + dsr / 3.0)], axis=1),
            jnp.concatenate([az, dsz], axis=1))
        j_g = jnp.concatenate([j0, j1, j2], axis=0)   # (3*wr_pad, wz)
        # lane-pad to the accumulator width (the flush DMA target must be
        # 128-aligned; (3*wr_pad, wz) already occupies these lanes)
        wz_lane = -(-wz // 128) * 128
        j_g = jnp.pad(j_g, ((0, 0), (0, wz_lane - wz)))

        # per-tile J accumulation in VMEM, flushed once per tile
        accumulate_tile_2d(tile_ref, acc_ref, j_ref, acc_sem, j_g,
                           s, g, ns, n_g)

        # freeze out-of-window rows (exact re-push happens in the model);
        # positions go back to GLOBAL periodic coordinates in-kernel
        # (same f32 ops the XLA epilogue used — bit-identical)
        vals = (jnp.mod(jnp.where(inw, l1r, l0r) + otr, float(nr)),
                jnp.mod(jnp.where(inw, l1z, l0z) + otz, float(nz)),
                jnp.where(inw, nvx, vx), jnp.where(inw, nvy, vy),
                jnp.where(inw, nvz, vz), inw.astype(jnp.float32))
        for i_v, v in enumerate(vals):
            outs[i_v].append(v)
    for ref, acc in zip((olr_ref, olz_ref, ovx_ref, ovy_ref, ovz_ref,
                         inw_ref), outs):
        ref[0] = jnp.concatenate(acc, axis=0)


@functools.partial(jax.jit, static_argnames=("shape", "tiling", "qm_half_dt",
                                             "dt", "cell_size", "c_light",
                                             "relativistic", "charge",
                                             "precision", "n_g", "stream",
                                             "interpret"))
def fused_em2d_substep(
    table: jax.Array,
    position: jax.Array,
    velocity: jax.Array,
    valid: jax.Array,
    tile_id: jax.Array,
    shape: tuple[int, int],
    tiling,
    qm_half_dt: float,
    dt: float,
    cell_size: tuple[float, float],
    charge: float,
    c_light: float = 1.0,
    relativistic: bool = False,
    precision: str = "highest",
    n_g: int = 32,
    stream: bool | None = None,
    interpret: bool = False,
):
    """One fused EM particle substep for the tile-sorted 2D3V layout.

    ``table``: the (nr, nz, 6) node-centered E|B field table
    (ops/fdtd.center_fields); particle arrays in the padded sorted layout.
    Returns ``(position', velocity', j (nr, nz, 3), in_win)`` — positions in
    global grid units, ``~in_win`` rows frozen at their inputs with no
    deposit (the model re-pushes them exactly via its compacted patch).
    ``precision`` selects the 6-channel gather matmul strategy: 'highest'
    (Mosaic multi-pass f32), 'exact_bf16' (3-term hi/lo bf16, ops/mxu.py,
    ~2x fewer MXU passes at ~2^-18 relative error), 'exact_bf16_pack'
    (gather cross terms K-packed into one matmul AND every Esirkepov
    deposit contraction M-packed via ops/mxu.dot3_mpack — 2 pumps each
    instead of 3; ops/pallas_pic.py), 'exact_bf16_pack2' (the K-axis
    deposit packing — measured wash, kept for documentation), or
    'default' (single-pass bf16).

    ``stream`` selects the window-set memory strategy: False keeps all
    tile windows VMEM-resident (indexed dynamically per block), True keeps
    them in HBM and DMAs each block's window by its scalar-prefetched tile
    index, double-buffered one grid step ahead.  None (default) resolves
    statically at trace time: stream once the lane-padded resident set
    would exceed ~48 MB of VMEM.  Both forms are bit-identical.  ``n_g`` is
    the number of particle blocks per Pallas grid step (amortizes the
    ~7 us/step pipeline overhead; tests shrink it to exercise multi-step
    prefetching on small layouts).
    """
    from .sorted_deposit import extract_tile_windows, fold_tile_windows

    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    n_tiles = ntr * ntz
    p_blk = tiling.block
    if p_blk % 128:
        raise ValueError(f"pallas path needs block % 128 == 0, got {p_blk}")
    m = tiling.margin
    wr = tiling.tile_r + 2 * m + 1
    wz = tiling.tile_z + 2 * m + 1
    wr_pad = -(-wr // 8) * 8
    dx, dz_cell = cell_size
    n = position.shape[0]
    nb = n // p_blk
    # n_g = blocks per grid step (amortizes ~7us/step pipeline overhead)
    nb_pad = -(-nb // n_g) * n_g
    nsteps = nb_pad // n_g
    n_pad = nb_pad * p_blk

    # per-block tile ids; window-local coordinates are computed IN-KERNEL
    # from these (ops/pallas_pic.py rationale)
    blk_tile = tile_id[::p_blk].astype(jnp.int32)
    if nb_pad != nb:
        # filler blocks: sentinel tile (J flushes to the trash row)
        blk_tile = jnp.concatenate(
            [blk_tile, jnp.full((nb_pad - nb,), n_tiles, jnp.int32)])

    # channel-stacked rows (c*wz_pad + z), zero-padded to sublane multiples
    # so the merged gather matmul can slice per channel at aligned offsets
    # (the one-hot placement-matmul extraction measured slower in-jit —
    # ops/window_mm.py, ops/pallas_pic.py rationale)
    wz_pad = -(-wz // 8) * 8
    ewin = extract_tile_windows(table, shape, tiling, wr, wz)
    ewin_t = ewin.reshape(ntr * ntz, wr, wz, 6).transpose(0, 3, 2, 1)
    ewin_t = jnp.pad(ewin_t, ((0, 0), (0, 0), (0, wz_pad - wz),
                              (0, wr_pad - wr)))
    ewin_t = ewin_t.reshape(ntr * ntz, 6 * wz_pad, wr_pad)
    three_term = precision in ("exact_bf16", "exact_bf16_pack",
                               "exact_bf16_pack2")
    pack = precision in ("exact_bf16_pack", "exact_bf16_pack2")
    # stream=None: resident while the 6-channel window set fits VMEM
    # comfortably, HBM-streamed by prefetched tile index otherwise
    stream = resolve_stream((ewin_t,), wr_pad, stream)
    k_win = 2 * wr_pad if pack else wr_pad
    if pack:
        # K-packed layout: hi/lo bf16 halves side by side on the lane axis
        # (no extra VMEM — see ops/pallas_pic.py)
        w_hi, w_lo = split_bf16(ewin_t)
        ewin_t = jnp.concatenate([w_hi, w_lo], axis=2)
    k_lane = -(-k_win // 128) * 128
    if stream and k_lane != k_win:
        # Mosaic HBM slices must align to the (8, 128) tiling: pre-pad the
        # streamed storage lanes (physically present anyway); the kernel
        # slices the view back to k_win
        ewin_t = jnp.pad(ewin_t, ((0, 0), (0, 0), (0, k_lane - k_win)))
    ewin_args = (split_bf16(ewin_t) if three_term and not pack
                 else (ewin_t,))

    def rows(v):
        if v.shape[0] != n_pad:
            v = jnp.concatenate([v, jnp.zeros((n_pad - n,), v.dtype)])
        return v.reshape(nsteps, n_g, p_blk)

    q_row = jnp.where(valid, jnp.float32(charge), 0.0)
    vol = dx * dz_cell
    if three_term:
        dep_precision = "exact_bf16"
    else:
        dep_precision = ("default" if getattr(tiling, "dtype", "float32")
                         == "bfloat16" else "highest")
    kernel = functools.partial(
        _em2d_kernel, wr=wr, wz=wz, wr_pad=wr_pad, n_g=n_g, n_tiles=n_tiles,
        ntz=ntz, tile_r=tiling.tile_r, tile_z=tiling.tile_z, margin=m,
        nr=nr, nz=nz,
        qm_half_dt=float(qm_half_dt), inv_dx=float(1.0 / dx),
        inv_dz=float(1.0 / dz_cell), dt=float(dt),
        coef_x=float(-dx / (vol * dt)), coef_z=float(-dz_cell / (vol * dt)),
        inv_vol=float(1.0 / vol), c_light=float(c_light),
        relativistic=relativistic, precision=precision,
        dep_precision=dep_precision, stream=stream)
    row_spec = pl.BlockSpec((1, n_g, p_blk), lambda s, *_: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((nsteps, n_g, p_blk), jnp.float32)
    if stream:
        win_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        win_spec = pl.BlockSpec(ewin_args[0].shape,
                                lambda s, *_: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    wz_lane = -(-wz // 128) * 128
    scratch = [
        pltpu.VMEM((3 * wr_pad, wz_lane), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if stream:
        scratch += stream_scratch_shapes(ewin_args, n_g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[row_spec] * 6 + [win_spec] * len(ewin_args),
        out_specs=(
            row_spec, row_spec, row_spec, row_spec, row_spec,
            # per-TILE J (row n_tiles = filler trash slot), flushed once
            # per tile by async copy
            pl.BlockSpec(memory_space=pl.ANY),
            row_spec,
        ),
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            row_shape, row_shape, row_shape, row_shape, row_shape,
            jax.ShapeDtypeStruct((n_tiles + 1, 3 * wr_pad, wz_lane),
                                 jnp.float32),
            row_shape,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(blk_tile, rows(position[:, 0]), rows(position[:, 1]),
      rows(velocity[:, 0]), rows(velocity[:, 1]), rows(velocity[:, 2]),
      rows(q_row), *ewin_args)
    ngr, ngz, nvx, nvy, nvz, j_tiles, inw = outs

    # the kernel already wrapped positions back to global periodic coords
    position_out = jnp.stack(
        [ngr.reshape(n_pad)[:n], ngz.reshape(n_pad)[:n]], axis=-1)
    velocity_out = jnp.stack([nvx.reshape(n_pad)[:n],
                              nvy.reshape(n_pad)[:n],
                              nvz.reshape(n_pad)[:n]], axis=-1)
    # tiles with no blocks were never flushed -> mask uninitialized rows
    present = jnp.zeros((n_tiles + 1,), jnp.bool_).at[blk_tile].set(
        True, mode="drop")
    tw = jnp.where(present[:n_tiles, None, None], j_tiles[:n_tiles], 0.0)
    tw = tw.reshape(n_tiles, 3, wr_pad, wz_lane)[:, :, :wr, :wz]
    tw = tw.transpose(0, 2, 3, 1)
    j = fold_tile_windows(tw, shape, tiling, wr, wz)
    return position_out, velocity_out, j, inw.reshape(n_pad)[:n] > 0.5
