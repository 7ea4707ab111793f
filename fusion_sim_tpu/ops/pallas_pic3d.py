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

Unlike the 2D kernel, the per-tile window set is NOT VMEM-resident (a 128^3
grid at tile 8^3 has 4096 windows x ~16 KB x C — far beyond VMEM).  Instead
XLA pre-gathers each block's tile window (``win[blk_tile]``) and the kernel
streams (n_g, C, wx, wyz) window blocks per grid step through Pallas's
double-buffered pipeline.  Duplicate windows of same-tile neighbour blocks
cost HBM bandwidth only (~2x logical traffic at config[3] density), not
VMEM.

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


def _es3d_kernel(lx_ref, ly_ref, lz_ref, vx_ref, vy_ref, vz_ref, w_ref,
                 *refs, wx, wy, wz, n_g, qm_dt, c_x, c_y, c_z, precision,
                 dep_precision):
    three_term = precision == "exact_bf16"
    if three_term:
        win_hi_ref, win_lo_ref = refs[0], refs[1]
        (nlx_ref, nly_ref, nlz_ref, nvx_ref, nvy_ref, nvz_ref, rho_ref,
         inw_ref) = refs[2:]
    else:
        win_ref = refs[0]
        (nlx_ref, nly_ref, nlz_ref, nvx_ref, nvy_ref, nvz_ref, rho_ref,
         inw_ref) = refs[1:]
    p = lx_ref.shape[-1]
    wyz = wy * wz
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (wx, p), 0).astype(jnp.float32)
    i_yz = jax.lax.broadcasted_iota(jnp.int32, (wyz, p), 0)
    iota_y = (i_yz // wz).astype(jnp.float32)
    iota_z = (i_yz % wz).astype(jnp.float32)
    lx_all, ly_all, lz_all = lx_ref[0], ly_ref[0], lz_ref[0]   # (n_g, P)
    vx_all, vy_all, vz_all = vx_ref[0], vy_ref[0], vz_ref[0]
    w_all = w_ref[0]
    o = {k: [] for k in ("lx", "ly", "lz", "vx", "vy", "vz", "inw")}
    for g in range(n_g):
        sl = lambda a: jax.lax.slice(a, (g, 0), (g + 1, p))
        lx, ly, lz = sl(lx_all), sl(ly_all), sl(lz_all)
        ax = jnp.maximum(0.0, 1.0 - jnp.abs(lx - iota_x))            # (wx, P)
        ayz = (jnp.maximum(0.0, 1.0 - jnp.abs(ly - iota_y))
               * jnp.maximum(0.0, 1.0 - jnp.abs(lz - iota_z)))       # (wyz, P)
        g_inw = ((lx < float(wx - 1)) & (ly < float(wy - 1))
                 & (lz < float(wz - 1)))                             # (1, P)

        # 3-channel CIC gather: contract x on the MXU, reduce yz on sublanes
        e = []
        if three_term:
            ax_hi, ax_lo = split_bf16(ax)
            dn = (((0,), (0,)), ((), ()))
            for c in range(3):
                u = dot3(win_hi_ref[0, g, c], win_lo_ref[0, g, c],
                         ax_hi, ax_lo, dn)
                e.append(jnp.sum(ayz * u, axis=0, keepdims=True))
        else:
            for c in range(3):
                u = jax.lax.dot_general(
                    win_ref[0, g, c], ax, (((0,), (0,)), ((), ())),
                    precision=precision, preferred_element_type=jnp.float32)
                e.append(jnp.sum(ayz * u, axis=0, keepdims=True))
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
        if dep_precision == "exact_bf16":
            rho_ref[0, g] = dot3_split(axn, ayzn * wm, dn_dep)
        else:
            rho_ref[0, g] = jax.lax.dot_general(
                axn, ayzn * wm, dimension_numbers=dn_dep,
                precision=dep_precision, preferred_element_type=jnp.float32)

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
    ``precision``: 'highest' | 'exact_bf16' | 'default' as in 2D.
    """
    from .sorted_deposit import (_assemble_tile_windows_3d,
                                 extract_tile_windows_3d)

    nts = tiling.n_tiles(shape)
    p_blk = tiling.block
    if p_blk % 128:
        raise ValueError(f"pallas path needs block % 128 == 0, got {p_blk}")
    m = tiling.margin
    wx, wy, wz = (t + 2 * m + 1 for t in tiling.tile)
    wyz = wy * wz
    n = position.shape[0]
    nb = n // p_blk
    nb_pad = -(-nb // n_g) * n_g
    nsteps = nb_pad // n_g
    n_pad = nb_pad * p_blk

    blk_tile, origins, (lx, ly, lz) = _local_coords_3d(
        position, tile_id, shape, tiling, p_blk)
    if nb_pad != nb:
        # dead filler blocks: tile 0, zero weight, far-out local coords
        blk_tile = jnp.concatenate(
            [blk_tile, jnp.zeros((nb_pad - nb,), jnp.int32)])
        fill = jnp.full((nb_pad - nb, p_blk), 1e9, lx.dtype)
        lx = jnp.concatenate([lx, fill])
        ly = jnp.concatenate([ly, fill])
        lz = jnp.concatenate([lz, fill])

    # per-block tile windows, streamed per grid step (not VMEM-resident):
    # (n_tiles, wx, wy, wz, 3) -> gather -> (nsteps, n_g, 3, wx, wyz)
    win = extract_tile_windows_3d(e_grid, shape, tiling)
    win_b = win[blk_tile].reshape(nb_pad, wx, wyz, 3).transpose(0, 3, 1, 2)
    three_term = precision == "exact_bf16"
    if three_term:
        win_args = split_bf16(win_b.reshape(nsteps, n_g, 3, wx, wyz))
    else:
        win_args = (win_b.reshape(nsteps, n_g, 3, wx, wyz),)

    def rows(v):
        if v.shape[0] != n_pad:
            v = jnp.concatenate([v, jnp.zeros((n_pad - v.shape[0],), v.dtype)])
        return v.reshape(nsteps, n_g, p_blk)

    if three_term:
        dep_precision = "exact_bf16"
    else:
        dep_precision = ("default" if getattr(tiling, "dtype", "float32")
                         == "bfloat16" else "highest")
    kernel = functools.partial(_es3d_kernel, wx=wx, wy=wy, wz=wz, n_g=n_g,
                               qm_dt=qm_dt, c_x=c_x, c_y=c_y, c_z=c_z,
                               precision=precision,
                               dep_precision=dep_precision)
    row_spec = pl.BlockSpec((1, n_g, p_blk), lambda s: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((nsteps, n_g, p_blk), jnp.float32)
    win_spec = pl.BlockSpec((1, n_g, 3, wx, wyz), lambda s: (s, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(nsteps,),
        in_specs=[row_spec] * 7 + (
            [win_spec, win_spec] if three_term else [win_spec]),
        out_specs=(
            row_spec, row_spec, row_spec, row_spec, row_spec, row_spec,
            pl.BlockSpec((1, n_g, wx, wyz), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
        ),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            row_shape, row_shape, row_shape, row_shape, row_shape, row_shape,
            jax.ShapeDtypeStruct((nsteps, n_g, wx, wyz), jnp.float32),
            row_shape,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(rows(lx.reshape(-1)), rows(ly.reshape(-1)), rows(lz.reshape(-1)),
      rows(velocity[:, 0]), rows(velocity[:, 1]), rows(velocity[:, 2]),
      rows(weights), *win_args)
    nlx, nly, nlz, nvx, nvy, nvz, rho_win, inw = outs

    # back to global coordinates (periodic); drop filler rows
    pos_cols = []
    for a, nl in zip(range(3), (nlx, nly, nlz)):
        orig = jnp.repeat(origins[a].astype(jnp.float32), p_blk)
        pos_cols.append(jnp.mod(nl.reshape(n_pad)[:n] + orig, shape[a]))
    position_out = jnp.stack(pos_cols, axis=-1)
    velocity_out = jnp.stack([nvx.reshape(n_pad)[:n], nvy.reshape(n_pad)[:n],
                              nvz.reshape(n_pad)[:n]], axis=-1)
    rho = _assemble_tile_windows_3d(
        rho_win.reshape(nb_pad, wx, wy, wz)[:nb], blk_tile[:nb], shape,
        tiling)
    return position_out, velocity_out, rho, inw.reshape(n_pad)[:n] > 0.5
