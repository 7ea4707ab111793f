"""Fused Pallas substep for the tile-sorted grid-parity pusher.

One kernel covers the whole per-particle work of a leapfrog half-step
(empic.js:1436-1469): the 12-channel R1/R2/R3/A coefficient sample at the
particle's (r, z) cell (``step_velocity_frag``, empic.js:749-773), the
cylindrical-frame Boris rotation, the thermal respawn re-init, the position
drift, and the sink-mask sample at the drifted cell (``step_position_frag``,
empic.js:712-720) — NEAREST/CLAMP semantics throughout, bit-compatible with
the split XLA path.

Round-3 design (replaces the round-2 resident-window kernel, which was
forced onto coarse 63^2 windows by VMEM and measured SLOWER than the XLA
sorted path):

* **Streamed windows** — per-tile windows live in HBM as
  ``(n_tiles, 3, 13*wr_pad, wz_pad)`` and each block's window is DMA'd in
  by its scalar-prefetched tile index, double-buffered one grid step ahead
  (same machinery as ops/pallas_em3d.py).  Tiles can then be SMALL (e.g.
  8 x 100 on the 400x800 default -> (21, 113) windows), cutting the MXU
  work per sample ~9x vs 63^2 windows.
* **Bit-exact 3-pass bf16 sampling** — the 13 channels are stored as an
  exact mantissa-truncation split (ops/mxu.split_bf16_3_exact): NEAREST
  selection through three single-pass bf16 matmuls reconstructs the f32
  values BIT-EXACTLY (one-hot selection, disjoint mantissa windows), vs ~6
  passes for Mosaic's ``highest`` f32 emulation.
* **Channel-stacked matmuls** — the 12 coefficient channels ride the M
  axis of ONE matmul per pass (rows c*wr_pad + a), so the MXU runs
  (12*wr_pad, wz_pad) @ (wz_pad, P) at full K instead of 12 separate
  M=wz matmuls; the r-selection is a per-channel sublane reduce (VPU).

Windows depend only on the (static) field coefficients, so the model
builds them ONCE per field set with ``build_pusher_windows`` and streams
them every substep.  The respawn replacement (inverse-CDF table) and RNG
stay outside (ops/push.sink_respawn); rows whose sample windows were
out-of-range come back FROZEN with sink = 1 and ``in_win = False`` — the
model re-pushes them exactly through the compacted spill patch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import split_bf16_3_exact
from .pallas_stream import make_window_streamer


def _pusher_window_dims(tiling) -> tuple[int, int, int, int]:
    """(wr, wz, wr_pad, wz_pad): logical window dims and DMA-aligned
    padded storage (sublanes to 8, lanes to 128)."""
    m = tiling.margin
    wr = tiling.tile_r + 2 * m + 1
    wz = tiling.tile_z + 2 * m + 1
    return wr, wz, -(-wr // 8) * 8, -(-wz // 128) * 128


@functools.partial(jax.jit, static_argnames=("nr", "nz", "tiling"))
def build_pusher_windows(packed13: jax.Array, nr: int, nz: int,
                         tiling) -> jax.Array:
    """Streamable per-tile window array for the fused pusher kernel.

    ``packed13``: (nr, nz, 13) = R1|R2|R3|A channels 0-11 + sink at 12.
    Returns ``(n_tiles, 3, 13*wr_pad, wz_pad)`` bfloat16 — per tile, the
    exact 3-way bf16 split (ops/mxu.split_bf16_3_exact) of the 13 channel
    windows, channel-stacked along sublanes (rows c*wr_pad + a) with
    periodic wrap and zero padding.  Fields are static, so the model builds
    this once per field set and streams it every substep."""
    ntr, ntz = tiling.n_tiles((nr, nz))
    m = tiling.margin
    wr, wz, wr_pad, wz_pad = _pusher_window_dims(tiling)
    g = packed13.transpose(2, 0, 1)  # (13, nr, nz)

    tz_i, b_i = np.meshgrid(np.arange(ntz), np.arange(wz_pad), indexing="ij")
    zidx = (tz_i * tiling.tile_z + b_i - m) % nz
    zmask = (b_i < wz).astype(np.float32)
    t1 = jnp.take(g, jnp.asarray(zidx.reshape(-1)), axis=2)
    t1 = t1 * jnp.asarray(zmask.reshape(1, 1, -1))   # (13, nr, ntz*wz_pad)

    tr_i, a_i = np.meshgrid(np.arange(ntr), np.arange(wr_pad), indexing="ij")
    ridx = (tr_i * tiling.tile_r + a_i - m) % nr
    rmask = (a_i < wr).astype(np.float32)
    t2 = jnp.take(t1, jnp.asarray(ridx.reshape(-1)), axis=1)
    t2 = t2 * jnp.asarray(rmask.reshape(1, -1, 1))   # (13, ntr*wr_pad, Z)

    t2 = t2.reshape(13, ntr, wr_pad, ntz, wz_pad)
    t2 = t2.transpose(1, 3, 0, 2, 4).reshape(ntr * ntz, 13 * wr_pad, wz_pad)
    h1, h2, h3 = split_bf16_3_exact(t2)
    return jnp.stack([h1, h2, h3], axis=1)  # (n_tiles, 3, 13*wr_pad, wz_pad)


def _pusher_kernel(bt_ref, lcr_ref, lcz_ref, x_ref, y_ref, z_ref,
                   vx_ref, vy_ref, vz_ref, alive_ref, r0_ref, r1_ref, r2_ref,
                   win_hbm,
                   ox_ref, oy_ref, oz_ref, ovx_ref, ovy_ref, ovz_ref,
                   sink_ref, inw_ref, scr, sem,
                   *, wr, wz, wr_pad, wz_pad, n_g, n_tiles, nr, nz, ntz,
                   tile_r, tile_z, margin, step_factor):
    s = pl.program_id(0)
    ns = pl.num_programs(0)
    p = lcr_ref.shape[-1]
    rows12 = 12 * wr_pad

    wait_get = make_window_streamer(bt_ref, ((win_hbm, scr, sem),),
                                    s, ns, n_g, n_tiles)
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (wz_pad, p), 0).astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (wr_pad, p), 0).astype(jnp.float32)
    lcr_all, lcz_all = lcr_ref[0], lcz_ref[0]
    x_all, y_all, z_all = x_ref[0], y_ref[0], z_ref[0]
    vx_all, vy_all, vz_all = vx_ref[0], vy_ref[0], vz_ref[0]
    al_all = alive_ref[0]
    r0_all, r1_all, r2_all = r0_ref[0], r1_ref[0], r2_ref[0]
    outs = [[] for _ in range(8)]
    for g in range(n_g):
        win = wait_get(g)[0]
        sl = lambda a: jax.lax.slice(a, (g, 0), (g + 1, p))
        lcr, lcz = sl(lcr_all), sl(lcz_all)

        # one-hot NEAREST boxes for the coefficient sample at the OLD cell
        dz = lcz - iota_z
        az = ((dz >= 0.0) & (dz < 1.0)).astype(jnp.bfloat16)  # (wz_pad, P)
        g_inw = ((lcr >= 0.0) & (lcr < float(wr - 1))
                 & (lcz >= 0.0) & (lcz < float(wz - 1)))

        # 12-channel sample: ONE channel-stacked matmul per exact-split
        # part (bit-exact f32 selection), then per-channel sublane reduce
        dn = (((1,), (0,)), ((), ()))
        t12 = None
        for part in range(3):
            u = jax.lax.dot_general(
                win[part, :rows12], az, dn,
                preferred_element_type=jnp.float32)
            t12 = u if t12 is None else t12 + u            # (rows12, P)
        dr1 = lcr - iota_r
        ar1 = ((dr1 >= 0.0) & (dr1 < 1.0)).astype(jnp.float32)  # (wr_pad, P)
        p6 = t12 * jnp.concatenate([ar1] * 12, axis=0)
        rows = [jnp.sum(jax.lax.slice(p6, (c * wr_pad, 0),
                                      ((c + 1) * wr_pad, p)),
                        axis=0, keepdims=True) for c in range(12)]

        # cylindrical rotation (step_velocity_frag math, empic.js:749-773)
        x, y, z = sl(x_all), sl(y_all), sl(z_all)
        vx, vy, vz = sl(vx_all), sl(vy_all), sl(vz_all)
        r = jnp.sqrt(x * x + y * y)
        dir_x = x / r
        dir_y = y / r
        vr = vx * dir_x + vy * dir_y
        va = vy * dir_x - vx * dir_y
        rot_r = rows[0] * vr + rows[1] * va + rows[2] * vz + rows[9]
        rot_a = rows[3] * vr + rows[4] * va + rows[5] * vz + rows[10]
        rot_z = rows[6] * vr + rows[7] * va + rows[8] * vz + rows[11]
        nvx = rot_r * dir_x - rot_a * dir_y
        nvy = rot_r * dir_y + rot_a * dir_x
        nvz = rot_z
        # fresh respawns (w ~ 0) thermal re-init (empic.js:771-772)
        fresh = sl(al_all) <= 0.5
        nvx = jnp.where(fresh, 0.001 * (2.0 * sl(r0_all) - 1.0), nvx)
        nvy = jnp.where(fresh, 0.001 * (2.0 * sl(r1_all) - 1.0), nvy)
        nvz = jnp.where(fresh, 0.001 * (2.0 * sl(r2_all) - 1.0), nvz)

        # drift + sink sample at the NEW cell (step_position_frag)
        nx_ = x + step_factor * nvx
        ny_ = y + step_factor * nvy
        nz_ = z + step_factor * nvz
        nr_ = jnp.sqrt(nx_ * nx_ + ny_ * ny_)
        t = bt_ref[s * n_g + g]
        org_r = ((t // ntz) * tile_r - margin).astype(jnp.float32)
        org_z = ((t % ntz) * tile_z - margin).astype(jnp.float32)
        cu = jnp.clip(nr_ * nr, 0.0, nr - 1e-3) - org_r
        cv = jnp.clip(nz_ * nz, 0.0, nz - 1e-3) - org_z
        s_inw = ((cu >= 0.0) & (cu < float(wr - 1))
                 & (cv >= 0.0) & (cv < float(wz - 1)))
        dz2 = cv - iota_z
        az2 = ((dz2 >= 0.0) & (dz2 < 1.0)).astype(jnp.bfloat16)
        ts = None
        for part in range(3):
            u = jax.lax.dot_general(
                win[part, rows12:], az2, dn,
                preferred_element_type=jnp.float32)
            ts = u if ts is None else ts + u               # (wr_pad, P)
        dr2 = cu - iota_r
        ar2 = ((dr2 >= 0.0) & (dr2 < 1.0)).astype(jnp.float32)
        sink = jnp.sum(ts * ar2, axis=0, keepdims=True)

        # freeze out-of-window rows (inputs back, sink=keep); the model
        # re-pushes them exactly through the compacted spill patch
        inw = g_inw & s_inw
        vals = (jnp.where(inw, nx_, x), jnp.where(inw, ny_, y),
                jnp.where(inw, nz_, z), jnp.where(inw, nvx, vx),
                jnp.where(inw, nvy, vy), jnp.where(inw, nvz, vz),
                jnp.where(inw, sink, 1.0), inw.astype(jnp.float32))
        for i, v in enumerate(vals):
            outs[i].append(v)
    for ref, acc in zip((ox_ref, oy_ref, oz_ref, ovx_ref, ovy_ref, ovz_ref,
                         sink_ref, inw_ref), outs):
        ref[0] = jnp.concatenate(acc, axis=0)


@functools.partial(jax.jit, static_argnames=("nr", "nz", "tiling",
                                             "step_factor", "n_g",
                                             "interpret"))
def fused_pusher_substep(
    packed13: jax.Array,
    position: jax.Array,
    velocity: jax.Array,
    alive: jax.Array,
    rand: jax.Array,
    cell: jax.Array,
    tile_id: jax.Array,
    nr: int,
    nz: int,
    tiling,
    step_factor: float,
    windows: jax.Array | None = None,
    n_g: int = 32,
    interpret: bool = False,
):
    """One fused pusher half-step on the padded tile-sorted layout.

    ``packed13``: (nr, nz, 13) = R1|R2|R3|A channels 0-11 + sink mask at 12;
    ``cell``: the (N, 2) clamped sample-cell coordinates of ``position``
    (models/pusher_sorted._cell_coords); ``rand``: (N, >=3) this substep's
    uniforms; ``windows``: optional precomputed ``build_pusher_windows``
    output (fields are static — pass it to skip the rebuild).  Returns
    ``(position', velocity', sink, in_win)`` with ``~in_win`` rows frozen at
    their inputs (sink = 1).
    """
    from .pallas_gather import _local_coords

    shape = (nr, nz)
    ntr, ntz = tiling.n_tiles(shape)
    n_tiles = ntr * ntz
    p_blk = tiling.block
    if p_blk % 128:
        raise ValueError(f"pallas path needs block % 128 == 0, got {p_blk}")
    m = tiling.margin
    wr, wz, wr_pad, wz_pad = _pusher_window_dims(tiling)
    n = position.shape[0]
    nb = n // p_blk
    nb_pad = -(-nb // n_g) * n_g
    nsteps = nb_pad // n_g
    n_pad = nb_pad * p_blk

    blk_tile, blk_tr, blk_tz, lcr, lcz = _local_coords(
        cell, tile_id, shape, tiling, p_blk)
    if nb_pad != nb:
        blk_tile = jnp.concatenate(
            [blk_tile, jnp.zeros((nb_pad - nb,), jnp.int32)])
        fill = jnp.full((nb_pad - nb, p_blk), 1e9, lcr.dtype)
        lcr = jnp.concatenate([lcr, fill])
        lcz = jnp.concatenate([lcz, fill])

    if windows is None:
        windows = build_pusher_windows(packed13, nr, nz, tiling)

    def rows(v):
        if v.shape[0] != n_pad:
            v = jnp.concatenate([v, jnp.zeros((n_pad - n,), v.dtype)])
        return v.reshape(nsteps, n_g, p_blk)

    ins = [rows(lcr.reshape(-1)), rows(lcz.reshape(-1)),
           rows(position[:, 0]), rows(position[:, 1]), rows(position[:, 2]),
           rows(velocity[:, 0]), rows(velocity[:, 1]), rows(velocity[:, 2]),
           rows(alive), rows(rand[:, 0]), rows(rand[:, 1]), rows(rand[:, 2])]

    kernel = functools.partial(
        _pusher_kernel, wr=wr, wz=wz, wr_pad=wr_pad, wz_pad=wz_pad, n_g=n_g,
        n_tiles=n_tiles, nr=nr, nz=nz, ntz=ntz,
        tile_r=tiling.tile_r, tile_z=tiling.tile_z, margin=m,
        step_factor=float(step_factor))
    row_spec = pl.BlockSpec((1, n_g, p_blk), lambda s, *_: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((nsteps, n_g, p_blk), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[row_spec] * 12 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(row_spec,) * 8,
        scratch_shapes=[
            pltpu.VMEM((2, n_g, 3, 13 * wr_pad, wz_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, n_g)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(row_shape,) * 8,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(blk_tile, *ins, windows)
    ox, oy, oz, ovx, ovy, ovz, sink, inw = [o.reshape(n_pad)[:n] for o in outs]
    pos_out = jnp.stack([ox, oy, oz], axis=-1)
    vel_out = jnp.stack([ovx, ovy, ovz], axis=-1)
    return pos_out, vel_out, sink, inw > 0.5


def tile50_for(nr: int, nz: int, margin: int = 6):
    """A coarse tiling whose windows suit the round-2 resident-window
    design; kept for API compatibility (prefer ``stream_tiling_for``)."""
    from .sorted_deposit import Tiling2D

    candidates = (64, 50, 40, 32, 25, 20, 16, 8)
    divs_r = [t for t in candidates if nr % t == 0]
    divs_z = [t for t in candidates if nz % t == 0]
    if not divs_r or not divs_z:
        raise ValueError(
            f"no tile size in {candidates} divides the {nr}x{nz} grid — "
            "pass an explicit Tiling2D whose tiles divide it")
    return Tiling2D(tile_r=max(divs_r), tile_z=max(divs_z), block=1024,
                    margin=margin)


def stream_tiling_for(nr: int, nz: int, margin: int = 6):
    """The streamed fused kernel's preferred tiling: narrow r tiles (small
    M per channel) and the widest z tile whose window fits one 128-lane
    tile (e.g. 400x800 -> 8 x 100 tiles, (21, 113) windows)."""
    from .sorted_deposit import Tiling2D

    div_z = [t for t in range(1, nz + 1)
             if nz % t == 0 and t + 2 * margin + 1 <= 128]
    div_r = [t for t in range(8, nr + 1) if nr % t == 0]
    if not div_z or not div_r:
        raise ValueError(
            f"no streaming tiling divides the {nr}x{nz} grid with margin "
            f"{margin} — pass an explicit Tiling2D")
    return Tiling2D(tile_r=min(div_r), tile_z=max(div_z), block=1024,
                    margin=margin)
