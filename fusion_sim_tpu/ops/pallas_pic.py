"""Fused Pallas ES-PIC substep: gather + kick + drift + deposit in one kernel.

This is the north-star shape (BASELINE: "push+deposit+solve fused in one
jit"): per particle block, everything between two field solves happens in
VMEM —

    E_p   = sublane-reduce(az * (W_c^T @ ar))   gather (separable CIC, MXU)
    v'    = v + (q dt / m) E_p                  kick   (VPU)
    x'    = x + dt v' / dx                      drift  (VPU)
    W_rho = arn @ (azn * w)^T                   deposit at x' (MXU, K=P)

The field solve (FFT Poisson) stays in XLA between kernels; the step carries
rho across steps (solve this step's E from last step's deposit — the same
deposit->solve->gather->push sequence, re-cut so one kernel spans the
particle work).

Kernel layout follows the tuned recipe in ops/pallas_gather.py: particles on
lanes / window offsets on sublanes, G blocks per grid step, value-slice
reads + concat-once writes (single-sublane ref accesses lower to scalar
loops), resident VMEM window set with dynamic per-block indexing, 1D scalar
prefetch, XLA-precomputed local coordinates.  The whole substep runs in the
block's LOCAL window frame; positions map back to global in XLA afterwards.

Out-of-window rows (drifted past the sort margin since the last resort, or
pushed out this substep) contribute NO deposit and are flagged; the model
patches them with the exact packed path under its spill_fallback cond —
identical semantics to the XLA sorted model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import dot3, dot3_mpack, dot3_split, split_bf16
from .pallas_stream import (make_window_streamer, resolve_stream,
                            stream_scratch_shapes)


def accumulate_tile_2d(tile_ref, acc_ref, out_ref, acc_sem, val,
                       s, g, ns, n_g):
    """Per-tile VMEM accumulation with flush-on-tile-change, shared by the
    2D fused kernels (ES rho here, EM J in ops/pallas_em.py).

    Blocks are tile-contiguous in the sorted layout; ``val`` is this block's
    contribution.  When block ``i``'s tile differs from block ``i-1``'s the
    accumulator is flushed to ``out_ref[prev]`` by async copy and restarted;
    the last block of the last grid step flushes to its own tile (filler
    blocks carry the sentinel tile = the trash row)."""
    i = s * n_g + g
    t_cur = tile_ref[i]
    prev = tile_ref[jnp.maximum(i - 1, 0)]
    changed = t_cur != prev
    # i == 0 only at (s == 0, g == 0): bt[max(i-1,0)] == t_cur there, so
    # changed is naturally False, but the accumulator must still initialize
    new_tile = (changed | (s == 0)) if g == 0 else changed

    @pl.when(changed)
    def _():
        cp = pltpu.make_async_copy(acc_ref, out_ref.at[prev], acc_sem)
        cp.start()
        cp.wait()

    @pl.when(new_tile)
    def _():
        acc_ref[...] = val

    @pl.when(jnp.logical_not(new_tile))
    def _():
        acc_ref[...] += val

    if g == n_g - 1:
        @pl.when(s == ns - 1)
        def _():
            cp = pltpu.make_async_copy(acc_ref, out_ref.at[t_cur], acc_sem)
            cp.start()
            cp.wait()


def _es2d_kernel(tile_ref, pr_ref, pz_ref, velr_ref, velz_ref, w_ref,
                 *refs, wr, wz, wr_pad, n_g, n_tiles, ntz, tile_r, tile_z,
                 margin, nr, nz, qm_dt, c_r, c_z,
                 precision, dep_precision, stream, ablate=None):
    three_term = precision in ("exact_bf16", "exact_bf16_pack",
                               "exact_bf16_pack2")
    pack = precision in ("exact_bf16_pack", "exact_bf16_pack2")
    pack_dep = precision == "exact_bf16_pack2"
    # pack: hi and lo window halves ride ONE operand, concatenated on the
    # lane (wr) axis — K of the packed cross-term matmul is 2*wr_pad
    n_win = 2 if (three_term and not pack) else 1
    k_win = 2 * wr_pad if pack else wr_pad
    wins = refs[:n_win]
    (nlr_ref, nlz_ref, nvelr_ref, nvelz_ref, rho_ref,
     inw_ref, acc_ref, acc_sem) = refs[n_win:n_win + 8]
    s = pl.program_id(0)
    ns = pl.num_programs(0)
    p = pr_ref.shape[-1]

    if stream:
        # windows live in HBM; DMA each block's window by its scalar-
        # prefetched tile index, double-buffered one grid step ahead
        # (ops/pallas_stream.py) — no VMEM-resident window-set size limit.
        # Streamed storage is lane-padded to 128 (Mosaic HBM slices must
        # align to the (8, 128) tiling); slice the view back to wr_pad so
        # the gather matmul K stays small (the pad was physical anyway).
        scrs = refs[n_win + 8:n_win + 8 + n_win]
        sems = refs[n_win + 8 + n_win:]
        _wait_get = make_window_streamer(
            tile_ref, list(zip(wins, scrs, sems)), s, ns, n_g, n_tiles)

        def wait_get(g):
            return [jax.lax.slice(w, (0, 0), (w.shape[0], k_win))
                    for w in _wait_get(g)]
    # r tents on the sublane-padded range: rows wr..wr_pad-1 are zero for
    # every in-window coordinate, so the padded gather columns / deposit
    # rows they touch are inert
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (wr_pad, p),
                                      0).astype(jnp.float32)
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (wz, p), 0).astype(jnp.float32)
    pr_all, pz_all = pr_ref[0], pz_ref[0]          # (G, P) global coords
    vr_all, vz_all = velr_ref[0], velz_ref[0]
    w_all = w_ref[0]
    o_lr, o_lz, o_vr, o_vz, o_inw = [], [], [], [], []
    wz_pad = -(-wz // 8) * 8
    iota_zp = jax.lax.broadcasted_iota(jnp.int32, (wz_pad, p),
                                       0).astype(jnp.float32)
    for g in range(n_g):
        t_raw = tile_ref[s * n_g + g]
        if stream:
            win_ops = wait_get(g)
        else:
            t = jnp.minimum(t_raw, n_tiles - 1)
            win_ops = [w_ref_[t] for w_ref_ in wins]
        sl = lambda a: jax.lax.slice(a, (g, 0), (g + 1, p))
        # window-local coordinates IN-KERNEL from the prefetched tile id
        # (same int arithmetic + f32 mod as pallas_gather._local_coords,
        # so results are bit-identical) — the standalone XLA lr/lz chain
        # measured 3.5 ms at 10M (probe_kernel_floor --xla-parts, r5)
        otr = ((t_raw // ntz) * tile_r - margin).astype(jnp.float32)
        otz = ((t_raw % ntz) * tile_z - margin).astype(jnp.float32)
        lr = jnp.mod(sl(pr_all) - otr, float(nr))
        lz = jnp.mod(sl(pz_all) - otz, float(nz))
        ar = jnp.maximum(0.0, 1.0 - jnp.abs(lr - iota_r))  # (wr_pad, P)
        g_inw = (lr < float(wr - 1)) & (lz < float(wz - 1))  # (1, P)

        # gather E: ONE channel-stacked matmul (rows c*wz_pad + z; the
        # padded window rows are zero so the stray tent past wz is inert),
        # then the z tent select + per-channel sublane reduce on the VPU —
        # half the MXU passes of the per-channel form
        dn = (((1,), (0,)), ((), ()))
        if ablate in ("no_gather", "no_both"):
            t_all = jnp.zeros((2 * wz_pad, p), jnp.float32)
        elif pack:
            # full-K packing (VERDICT r4 #1): the two cross terms
            # Whi@ar_lo + Wlo@ar_hi contract in ONE matmul
            # [Whi | Wlo] @ [ar_lo ; ar_hi] with K = 2*wr_pad <= 128 —
            # 2 MXU pumps instead of dot3's 3 at the same ~2^-18 error
            # (the summation of the cross terms moves into the matmul's
            # f32 accumulator).  The packed window costs no extra VMEM:
            # a lone (.., wr_pad) window already lane-pads to 128.
            wp = win_ops[0]                      # (2*wz_pad, 2*wr_pad) bf16
            ar_hi, ar_lo = split_bf16(ar)
            ar_cat = jnp.concatenate([ar_lo, ar_hi], axis=0)
            w_hi = jax.lax.slice(wp, (0, 0), (wp.shape[0], wr_pad))
            d_ = lambda a, b: jax.lax.dot_general(
                a, b, dn, preferred_element_type=jnp.float32)
            t_all = d_(w_hi, ar_hi) + d_(wp, ar_cat)
        elif three_term:
            # 3 bf16 MXU passes (~2x fewer than 'highest', ~2^-18 relative
            # error — ops/mxu.py); the window set was split once in XLA,
            # only the tents split per block
            ar_hi, ar_lo = split_bf16(ar)
            t_all = dot3(win_ops[0], win_ops[1], ar_hi, ar_lo, dn)
        else:
            t_all = jax.lax.dot_general(win_ops[0], ar, dn,
                                        precision=precision,
                                        preferred_element_type=jnp.float32)
        # z tents once on (wz_pad, P); per-channel multiply on slices of
        # t_all (no 2*wz_pad concat copy — the tent broadcasts per channel)
        az_p = jnp.maximum(0.0, 1.0 - jnp.abs(lz - iota_zp))
        tx = jax.lax.slice(t_all, (0, 0), (wz_pad, p))
        tz = jax.lax.slice(t_all, (wz_pad, 0), (2 * wz_pad, p))
        ex = jnp.sum(tx * az_p, axis=0, keepdims=True)    # (1, P)
        ez = jnp.sum(tz * az_p, axis=0, keepdims=True)

        w = sl(w_all)
        valid = w != 0.0
        nvr = jnp.where(valid, sl(vr_all) + qm_dt * ex, 0.0)
        nvz = jnp.where(valid, sl(vz_all) + qm_dt * ez, 0.0)
        nlr = lr + c_r * nvr
        nlz = lz + c_z * nvz

        # deposit at the new (local) position — next step's rho
        arn = jnp.maximum(0.0, 1.0 - jnp.abs(nlr - iota_r))
        azn = jnp.maximum(0.0, 1.0 - jnp.abs(nlz - iota_z))
        d_inw = ((nlr >= 0.0) & (nlr < float(wr - 1))
                 & (nlz >= 0.0) & (nlz < float(wz - 1)))
        inw = g_inw & d_inw
        wm = jnp.where(inw, w, 0.0)
        # freeze out-of-window rows at their inputs: their gathered E is
        # window-clamped garbage; the model re-pushes them exactly via its
        # compacted spill patch (free here vs ~6 ms of (N,2) selects in XLA)
        nlr = jnp.where(inw, nlr, lr)
        nlz = jnp.where(inw, nlz, lz)
        nvr = jnp.where(inw, nvr, sl(vr_all))
        nvz = jnp.where(inw, nvz, sl(vz_all))
        if ablate in ("no_deposit", "no_both"):
            rho_g = jnp.zeros((wr_pad, wz), jnp.float32)
        elif pack_dep:
            # the deposit's two cross terms also contract in ONE matmul,
            # concatenated along the particle (K) axis: same K-tile count
            # (K was already full), but one matmul instruction fewer —
            # measured win comes from Mosaic's per-matmul setup of the
            # lane-lane contraction, not from pump count
            dn2 = (((1,), (1,)), ((), ()))
            bzw = azn * wm
            a_hi, a_lo = split_bf16(arn)
            b_hi, b_lo = split_bf16(bzw)
            a_cat = jnp.concatenate([a_hi, a_lo], axis=1)
            b_cat = jnp.concatenate([b_lo, b_hi], axis=1)
            d2_ = lambda a, b: jax.lax.dot_general(
                a, b, dn2, preferred_element_type=jnp.float32)
            rho_g = d2_(a_hi, b_hi) + d2_(a_cat, b_cat)
        elif pack:
            # M-packed 3-term deposit (ops/mxu.dot3_mpack): the hi@hi and
            # lo@hi terms ride ONE matmul whose stacked output
            # (2*wr_pad <= 128 rows) still fits one MXU tile — 2 pumps
            # instead of dot3_split's 3, with the concat and both output
            # slices sublane-aligned.  (The full M/N quadrant form
            # measured SLOWER — see dot4_quad's docstring.)
            rho_g = dot3_mpack(arn, azn * wm)
        elif dep_precision == "exact_bf16":
            rho_g = dot3_split(arn, azn * wm, (((1,), (1,)), ((), ())))
        else:
            rho_g = jax.lax.dot_general(
                arn, azn * wm, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=dep_precision, preferred_element_type=jnp.float32)
        # lane-pad to the accumulator width (the flush DMA target must be
        # 128-aligned; (wr_pad, wz) already occupies these lanes physically)
        wz_lane = -(-wz // 128) * 128
        rho_g = jnp.pad(rho_g, ((0, 0), (0, wz_lane - wz)))

        # per-tile rho accumulation in VMEM, flushed once per tile
        accumulate_tile_2d(tile_ref, acc_ref, rho_ref, acc_sem, rho_g,
                           s, g, ns, n_g)

        # back to GLOBAL periodic coordinates in-kernel (same f32 ops the
        # XLA epilogue used, so bit-identical; kills the O(N) origin
        # repeat + mod chain outside the kernel)
        o_lr.append(jnp.mod(nlr + otr, float(nr)))
        o_lz.append(jnp.mod(nlz + otz, float(nz)))
        o_vr.append(nvr)
        o_vz.append(nvz)
        o_inw.append(inw.astype(jnp.float32))
    nlr_ref[0] = jnp.concatenate(o_lr, axis=0)
    nlz_ref[0] = jnp.concatenate(o_lz, axis=0)
    nvelr_ref[0] = jnp.concatenate(o_vr, axis=0)
    nvelz_ref[0] = jnp.concatenate(o_vz, axis=0)
    inw_ref[0] = jnp.concatenate(o_inw, axis=0)


@functools.partial(jax.jit, static_argnames=("shape", "tiling", "qm_dt",
                                             "c_r", "c_z", "precision",
                                             "n_g", "stream", "interpret",
                                             "ablate"))
def fused_es2d_substep(
    e_grid: jax.Array,
    position: jax.Array,
    velocity: jax.Array,
    weights: jax.Array,
    tile_id: jax.Array,
    shape: tuple[int, int],
    tiling,
    qm_dt: float,
    c_r: float,
    c_z: float,
    precision: str = "highest",
    n_g: int = 32,
    stream: bool | None = None,
    interpret: bool = False,
    ablate: str | None = None,
):
    """One fused particle substep for tile-sorted 2D ES PIC.

    ``e_grid``: (nr, nz, 2); particle arrays in the padded sorted layout
    (N = nb * tiling.block, weights 0 on fillers, block % 128 == 0).
    Returns ``(position', velocity', rho', in_win)`` where rho' is the
    charge deposited at the NEW positions (feeds the next step's solve) and
    in_win flags rows whose gather AND deposit stayed inside their block
    window.  ``~in_win`` rows come back FROZEN at their input position/
    velocity with no deposit — the caller re-pushes them exactly (see
    SortedElectrostaticPIC's compacted spill patch).  ``precision`` selects
    the matmul strategy: 'default' = single-pass bf16 (~1e-3 relative field
    error), 'highest' = Mosaic's multi-pass f32 emulation, 'exact_bf16' =
    the 3-term hi/lo bf16 decomposition (ops/mxu.py, ~2^-18 relative — half
    the MXU passes of 'highest') applied to BOTH the gather and the deposit,
    'exact_bf16_pack' = the same three terms with the gather's two cross
    terms contracted in ONE K-packed matmul (K = 2*wr_pad <= 128 — 2
    gather pumps instead of 3, VERDICT r4 #1 full-K packing) AND the
    deposit's hi@hi/lo@hi terms M-packed into one matmul
    (ops/mxu.dot3_mpack — 2 deposit pumps instead of 3), same accuracy.
    With 'default'/'highest' the deposit matmul follows ``tiling.dtype``
    (charge conservation is more rounding-sensitive than the gathered
    field).  ``ablate`` (None | 'no_gather' | 'no_deposit' | 'no_both')
    zeroes matmul families for floor attribution
    (examples/probe_kernel_floor.py) — NOT a production option: outputs
    are physically wrong.

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
    n = position.shape[0]
    nb = n // p_blk
    # n_g = blocks per grid step (amortizes ~7us/step pipeline overhead)
    nb_pad = -(-nb // n_g) * n_g
    nsteps = nb_pad // n_g
    n_pad = nb_pad * p_blk

    # per-block tile ids; window-local coordinates are computed IN-KERNEL
    # from these (the standalone XLA lr/lz chain measured 3.5 ms at 10M —
    # probe_kernel_floor --xla-parts, round 5)
    blk_tile = tile_id[::p_blk].astype(jnp.int32)
    if nb_pad != nb:
        # dead filler blocks: sentinel tile (rho flushes to the trash row,
        # and the kernel's weight/validity masks make their rows inert)
        blk_tile = jnp.concatenate(
            [blk_tile, jnp.full((nb_pad - nb,), n_tiles, jnp.int32)])

    # channel-stacked rows (c*wz_pad + z), zero-padded to sublane multiples
    # so the merged gather matmul can slice per channel at aligned offsets;
    # the gather K dim is padded wr -> wr_pad (zero columns) to match the
    # sublane-padded r tents the deposit needs.  (The one-hot placement-
    # matmul form of this extraction — ops/window_mm.py — measured SLOWER
    # in-jit on v5e despite winning standalone: the r5 A/B at the 10M
    # headline rung put roll-extraction at 15.01 ms vs 15.31-15.41 for the
    # mm forms; the small-matmul chain is latency-bound where XLA fuses
    # the rolls into the surrounding jit.)
    wz_pad = -(-wz // 8) * 8
    from .sorted_deposit import extract_tile_windows, fold_tile_windows
    ewin = extract_tile_windows(e_grid, shape, tiling, wr, wz)
    ewin_t = ewin.reshape(ntr * ntz, wr, wz, 2).transpose(0, 3, 2, 1)
    ewin_t = jnp.pad(ewin_t, ((0, 0), (0, 0), (0, wz_pad - wz),
                              (0, wr_pad - wr)))
    ewin_t = ewin_t.reshape(ntr * ntz, 2 * wz_pad, wr_pad)
    three_term = precision in ("exact_bf16", "exact_bf16_pack",
                               "exact_bf16_pack2")
    pack = precision in ("exact_bf16_pack", "exact_bf16_pack2")
    # stream=None: keep the window set VMEM-resident while it fits
    # comfortably (dynamic indexing is free); stream it from HBM by
    # prefetched tile index once it would crowd the ~100 MB scoped VMEM
    stream = resolve_stream((ewin_t,), wr_pad, stream)
    k_win = 2 * wr_pad if pack else wr_pad
    if pack:
        # K-packed layout: hi and lo bf16 halves side by side on the lane
        # axis — the packed cross-term matmul contracts K = 2*wr_pad wide
        # in one pump; no extra VMEM (a lone wr_pad window lane-pads to
        # 128 anyway, and 2 x bf16 = 1 x f32 bytes)
        w_hi, w_lo = split_bf16(ewin_t)
        ewin_t = jnp.concatenate([w_hi, w_lo], axis=2)
    k_lane = -(-k_win // 128) * 128
    if stream and k_lane != k_win:
        # Mosaic HBM slices must align to the (8, 128) tiling: pre-pad the
        # streamed storage lanes (physically present anyway); the kernel
        # slices the view back to k_win
        ewin_t = jnp.pad(ewin_t, ((0, 0), (0, 0), (0, k_lane - k_win)))
    if three_term and not pack:
        # split the resident window set ONCE in XLA; the kernel only splits
        # the per-block tents (same total window VMEM: 2 x bf16 = 1 x f32)
        ewin_args = split_bf16(ewin_t)
    else:
        ewin_args = (ewin_t,)

    def rows(v):
        if v.shape[0] != n_pad:
            v = jnp.concatenate([v, jnp.zeros((n_pad - n,), v.dtype)])
        return v.reshape(nsteps, n_g, p_blk)

    velr, velz = rows(velocity[:, 0]), rows(velocity[:, 1])
    w = rows(weights)

    if three_term:
        dep_precision = "exact_bf16"
    else:
        dep_precision = ("default" if getattr(tiling, "dtype", "float32")
                         == "bfloat16" else "highest")
    kernel = functools.partial(_es2d_kernel, wr=wr, wz=wz, wr_pad=wr_pad,
                               n_g=n_g, n_tiles=n_tiles, ntz=ntz,
                               tile_r=tiling.tile_r, tile_z=tiling.tile_z,
                               margin=m, nr=nr, nz=nz,
                               qm_dt=qm_dt, c_r=c_r, c_z=c_z,
                               precision=precision,
                               dep_precision=dep_precision, stream=stream,
                               ablate=ablate)
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
        pltpu.VMEM((wr_pad, wz_lane), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if stream:
        scratch += stream_scratch_shapes(ewin_args, n_g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            row_spec, row_spec, row_spec, row_spec, row_spec,
            *([win_spec] * len(ewin_args)),
        ],
        out_specs=(
            row_spec, row_spec, row_spec, row_spec,
            # per-TILE rho (row n_tiles = filler trash slot), flushed once
            # per tile by async copy — no per-block HBM windows, no XLA
            # segment-sum
            pl.BlockSpec(memory_space=pl.ANY),
            row_spec,
        ),
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            row_shape, row_shape, row_shape, row_shape,
            jax.ShapeDtypeStruct((n_tiles + 1, wr_pad, wz_lane), jnp.float32),
            row_shape,
        ),
        # the resident window set lane-pads each (wz, wr) window to
        # (wz, 128) -> ~12.6 MB at 512^2/tile 32; the default 16 MB scoped
        # VMEM limit is too tight with the row operands on top (v5e has
        # 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(blk_tile, rows(position[:, 0]), rows(position[:, 1]), velr, velz, w,
      *ewin_args)
    ngr, ngz, nvelr, nvelz, rho_tiles, inw = outs

    # the kernel already wrapped positions back to global periodic
    # coordinates; drop filler rows
    position_out = jnp.stack(
        [ngr.reshape(n_pad)[:n], ngz.reshape(n_pad)[:n]], axis=-1)
    velocity_out = jnp.stack([nvelr.reshape(n_pad)[:n],
                              nvelz.reshape(n_pad)[:n]], axis=-1)
    # tiles with no blocks were never flushed -> mask uninitialized rows
    present = jnp.zeros((n_tiles + 1,), jnp.bool_).at[blk_tile].set(
        True, mode="drop")
    tw = jnp.where(present[:n_tiles, None, None], rho_tiles[:n_tiles], 0.0)
    rho = fold_tile_windows(tw[:, :wr, :wz], shape, tiling, wr, wz)
    return position_out, velocity_out, rho, inw.reshape(n_pad)[:n] > 0.5
