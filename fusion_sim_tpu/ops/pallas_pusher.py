"""Fused Pallas substep for the tile-sorted grid-parity pusher.

One kernel covers the whole per-particle work of a leapfrog half-step
(empic.js:1436-1469): the 12-channel R1/R2/R3/A coefficient sample at the
particle's (r, z) cell (``step_velocity_frag``, empic.js:749-773), the
cylindrical-frame Boris rotation, the thermal respawn re-init, the position
drift, and the sink-mask sample at the drifted cell (``step_position_frag``,
empic.js:712-720) — NEAREST/CLAMP semantics throughout, bit-compatible with
the split XLA path (one-hot window matmuls at HIGHEST precision select
exact f32 values; the rotation runs on the VPU in f32).

The respawn replacement (inverse-CDF table) and the RNG stay outside
(ops/push.sink_respawn with its compacted respawn patch); rows whose sample
windows were out-of-range come back FROZEN with sink = 1 and
``in_win = False`` — the model re-pushes them exactly through the compacted
spill patch.

Kernel layout follows the tuned recipe of ops/pallas_gather.py (particles
on lanes, G blocks per grid step, concat-once writes, resident VMEM window
set with dynamic per-block indexing, 1D scalar prefetch, XLA-precomputed
local coordinates).  The 13-channel window set (12 coefficients + sink)
lane-pads each (wz, wr) window to (wz, 128); tile the grid coarsely
(e.g. 50x50 on the 400x800 default) so the set stays a few tens of MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pusher_kernel(tile_ref, lcr_ref, lcz_ref, x_ref, y_ref, z_ref,
                   vx_ref, vy_ref, vz_ref, alive_ref, r0_ref, r1_ref, r2_ref,
                   win_ref,
                   ox_ref, oy_ref, oz_ref, ovx_ref, ovy_ref, ovz_ref,
                   sink_ref, inw_ref,
                   *, wr, wz, n_g, nr, nz, ntz, tile_r, tile_z, margin,
                   step_factor, precision):
    s = pl.program_id(0)
    p = lcr_ref.shape[-1]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (wr, p), 0).astype(jnp.float32)
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (wz, p), 0).astype(jnp.float32)
    lcr_all, lcz_all = lcr_ref[0], lcz_ref[0]
    x_all, y_all, z_all = x_ref[0], y_ref[0], z_ref[0]
    vx_all, vy_all, vz_all = vx_ref[0], vy_ref[0], vz_ref[0]
    al_all = alive_ref[0]
    r0_all, r1_all, r2_all = r0_ref[0], r1_ref[0], r2_ref[0]
    outs = [[] for _ in range(8)]
    for g in range(n_g):
        t = tile_ref[s * n_g + g]
        org_r = ((t // ntz) * tile_r - margin).astype(jnp.float32)
        org_z = ((t % ntz) * tile_z - margin).astype(jnp.float32)
        sl = lambda a: jax.lax.slice(a, (g, 0), (g + 1, p))
        lcr, lcz = sl(lcr_all), sl(lcz_all)

        # one-hot NEAREST boxes for the coefficient sample at the OLD cell
        dr = lcr - iota_r
        dz = lcz - iota_z
        ar = ((dr >= 0.0) & (dr < 1.0)).astype(jnp.float32)   # (wr, P)
        az = ((dz >= 0.0) & (dz < 1.0)).astype(jnp.float32)   # (wz, P)
        g_inw = ((lcr >= 0.0) & (lcr < float(wr - 1))
                 & (lcz >= 0.0) & (lcz < float(wz - 1)))

        # 12-channel coefficient rows: u_c = sum_l az * (W_c^T @ ar)
        rows = []
        for c in range(12):
            u = jax.lax.dot_general(
                win_ref[t, c], ar, (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            rows.append(jnp.sum(az * u, axis=0, keepdims=True))  # (1, P)

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
        cu = jnp.clip(nr_ * nr, 0.0, nr - 1e-3) - org_r
        cv = jnp.clip(nz_ * nz, 0.0, nz - 1e-3) - org_z
        s_inw = ((cu >= 0.0) & (cu < float(wr - 1))
                 & (cv >= 0.0) & (cv < float(wz - 1)))
        dr2 = cu - iota_r
        dz2 = cv - iota_z
        ar2 = ((dr2 >= 0.0) & (dr2 < 1.0)).astype(jnp.float32)
        az2 = ((dz2 >= 0.0) & (dz2 < 1.0)).astype(jnp.float32)
        u = jax.lax.dot_general(
            win_ref[t, 12], ar2, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        sink = jnp.sum(az2 * u, axis=0, keepdims=True)

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
                                             "step_factor", "interpret"))
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
    interpret: bool = False,
):
    """One fused pusher half-step on the padded tile-sorted layout.

    ``packed13``: (nr, nz, 13) = R1|R2|R3|A channels 0-11 + sink mask at 12;
    ``cell``: the (N, 2) clamped sample-cell coordinates of ``position``
    (models/pusher_sorted._cell_coords); ``rand``: (N, >=3) this substep's
    uniforms.  Returns ``(position', velocity', sink, in_win)`` with
    ``~in_win`` rows frozen at their inputs (sink = 1).
    """
    from .pallas_gather import _local_coords
    from .sorted_deposit import extract_tile_windows

    shape = (nr, nz)
    ntr, ntz = tiling.n_tiles(shape)
    p_blk = tiling.block
    if p_blk % 128:
        raise ValueError(f"pallas path needs block % 128 == 0, got {p_blk}")
    m = tiling.margin
    wr = tiling.tile_r + 2 * m + 1
    wz = tiling.tile_z + 2 * m + 1
    n = position.shape[0]
    nb = n // p_blk
    n_g = 32
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

    win = extract_tile_windows(packed13, shape, tiling, wr, wz)
    win_t = win.reshape(ntr * ntz, wr, wz, 13).transpose(0, 3, 2, 1)

    def rows(v):
        if v.shape[0] != n_pad:
            v = jnp.concatenate([v, jnp.zeros((n_pad - n,), v.dtype)])
        return v.reshape(nsteps, n_g, p_blk)

    ins = [rows(lcr.reshape(-1)), rows(lcz.reshape(-1)),
           rows(position[:, 0]), rows(position[:, 1]), rows(position[:, 2]),
           rows(velocity[:, 0]), rows(velocity[:, 1]), rows(velocity[:, 2]),
           rows(alive), rows(rand[:, 0]), rows(rand[:, 1]), rows(rand[:, 2])]

    kernel = functools.partial(
        _pusher_kernel, wr=wr, wz=wz, n_g=n_g, nr=nr, nz=nz, ntz=ntz,
        tile_r=tiling.tile_r, tile_z=tiling.tile_z, margin=m,
        step_factor=float(step_factor), precision="highest")
    row_spec = pl.BlockSpec((1, n_g, p_blk), lambda s, *_: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((nsteps, n_g, p_blk), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[row_spec] * 12 + [
            pl.BlockSpec((ntr * ntz, 13, wz, wr), lambda s, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=(row_spec,) * 8,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(row_shape,) * 8,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(blk_tile, *ins, win_t)
    ox, oy, oz, ovx, ovy, ovz, sink, inw = [o.reshape(n_pad)[:n] for o in outs]
    pos_out = jnp.stack([ox, oy, oz], axis=-1)
    vel_out = jnp.stack([ovx, ovy, ovz], axis=-1)
    return pos_out, vel_out, sink, inw > 0.5


def tile50_for(nr: int, nz: int, margin: int = 6):
    """A coarse tiling that keeps the 13-channel window set VMEM-resident
    (e.g. 400x800 -> 8x16 tiles of (63, 63) windows ~ 55 MB)."""
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
