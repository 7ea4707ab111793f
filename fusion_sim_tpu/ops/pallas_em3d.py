"""Fused Pallas EM-PIC substep in 3D: gather + Boris + drift + Esirkepov.

One Mosaic kernel covers the whole per-particle work of a 3D3V EM step
(BASELINE configs[3]: "fused push+deposit+FDTD step"); only the Yee update
and the compacted exact spill patch stay in XLA.  Layout follows
ops/pallas_pic3d.py: particles on LANES, the x window axis on SUBLANES, the
(y, z) window pair flattened onto lanes (wyz = wy*wz) via a flattened iota
(y = i // wz, z = i % wz) — no cross-tile reshapes.

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

Per-block field windows are pre-gathered in XLA and streamed per grid step
(the 3D window set cannot be VMEM-resident — see pallas_pic3d.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import dot3, dot3_split, split_bf16


def _em3d_kernel(lx_ref, ly_ref, lz_ref, vx_ref, vy_ref, vz_ref, q_ref,
                 *refs, wx, wy, wz, n_g, qm_half_dt, inv_dx, inv_dy, inv_dz,
                 dt, coef_x, coef_y, coef_z, c_light, relativistic,
                 precision, dep_precision):
    three_term = precision == "exact_bf16"
    if three_term:
        win_hi_ref, win_lo_ref = refs[0], refs[1]
        rest = refs[2:]
    else:
        win_ref = refs[0]
        rest = refs[1:]
    (olx_ref, oly_ref, olz_ref, ovx_ref, ovy_ref, ovz_ref, j_ref,
     inw_ref) = rest
    p = lx_ref.shape[-1]
    wyz = wy * wz
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (wx, p), 0).astype(jnp.float32)
    i_yz = jax.lax.broadcasted_iota(jnp.int32, (wyz, p), 0)
    iota_yf = (i_yz // wz).astype(jnp.float32)
    iota_zf = (i_yz % wz).astype(jnp.float32)
    lx_all, ly_all, lz_all = lx_ref[0], ly_ref[0], lz_ref[0]
    vx_all, vy_all, vz_all = vx_ref[0], vy_ref[0], vz_ref[0]
    q_all = q_ref[0]
    outs = [[] for _ in range(7)]
    for g in range(n_g):
        sl = lambda a: jax.lax.slice(a, (g, 0), (g + 1, p))
        l0x, l0y, l0z = sl(lx_all), sl(ly_all), sl(lz_all)
        ax0 = jnp.maximum(0.0, 1.0 - jnp.abs(l0x - iota_x))    # (wx, P)
        ay0 = jnp.maximum(0.0, 1.0 - jnp.abs(l0y - iota_yf))   # (wyz, P)
        az0 = jnp.maximum(0.0, 1.0 - jnp.abs(l0z - iota_zf))   # (wyz, P)
        ayz0 = ay0 * az0
        g_inw = ((l0x >= 0.0) & (l0x < float(wx - 1))
                 & (l0y >= 0.0) & (l0y < float(wy - 1))
                 & (l0z >= 0.0) & (l0z < float(wz - 1)))

        # 6-channel CIC gather (Ex, Ey, Ez, Bx, By, Bz at the node table)
        eb = []
        if three_term:
            ax_hi, ax_lo = split_bf16(ax0)
            dn = (((0,), (0,)), ((), ()))
            for c in range(6):
                u = dot3(win_hi_ref[0, g, c], win_lo_ref[0, g, c],
                         ax_hi, ax_lo, dn)
                eb.append(jnp.sum(ayz0 * u, axis=0, keepdims=True))
        else:
            for c in range(6):
                u = jax.lax.dot_general(
                    win_ref[0, g, c], ax0, (((0,), (0,)), ((), ())),
                    precision=precision, preferred_element_type=jnp.float32)
                eb.append(jnp.sum(ayz0 * u, axis=0, keepdims=True))
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
        j_ref[0, g, 0] = mm((qm * coef_x) * kx, mix_x)
        kyq = (qm * coef_y) * ky
        j_ref[0, g, 1] = mm(p1x, kyq * az0) + mm(p2x, kyq * dsz)
        kzq = (qm * coef_z) * kz
        j_ref[0, g, 2] = mm(p1x, kzq * ay0) + mm(p2x, kzq * dsy)

        # freeze out-of-window rows (exact re-push happens in the model)
        vals = (jnp.where(inw, l1x, l0x), jnp.where(inw, l1y, l0y),
                jnp.where(inw, l1z, l0z),
                jnp.where(inw, nvx, vx), jnp.where(inw, nvy, vy),
                jnp.where(inw, nvz, vz), inw.astype(jnp.float32))
        for i, v in enumerate(vals):
            outs[i].append(v)
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
    from .sorted_deposit import (_assemble_tile_windows_3d,
                                 extract_tile_windows_3d)

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
    dx, dy, dz = cell_size
    vol = dx * dy * dz

    blk_tile, origins, (lx, ly, lz) = _local_coords_3d(
        position, tile_id, shape, tiling, p_blk)
    if nb_pad != nb:
        blk_tile = jnp.concatenate(
            [blk_tile, jnp.zeros((nb_pad - nb,), jnp.int32)])
        fill = jnp.full((nb_pad - nb, p_blk), 1e9, lx.dtype)
        lx = jnp.concatenate([lx, fill])
        ly = jnp.concatenate([ly, fill])
        lz = jnp.concatenate([lz, fill])

    win = extract_tile_windows_3d(table, shape, tiling)
    win_b = win[blk_tile].reshape(nb_pad, wx, wyz, 6).transpose(0, 3, 1, 2)
    three_term = precision == "exact_bf16"
    if three_term:
        win_args = split_bf16(win_b.reshape(nsteps, n_g, 6, wx, wyz))
    else:
        win_args = (win_b.reshape(nsteps, n_g, 6, wx, wyz),)

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
        _em3d_kernel, wx=wx, wy=wy, wz=wz, n_g=n_g,
        qm_half_dt=float(qm_half_dt), inv_dx=float(1.0 / dx),
        inv_dy=float(1.0 / dy), inv_dz=float(1.0 / dz), dt=float(dt),
        coef_x=float(-dx / (vol * dt)), coef_y=float(-dy / (vol * dt)),
        coef_z=float(-dz / (vol * dt)), c_light=float(c_light),
        relativistic=relativistic, precision=precision,
        dep_precision=dep_precision)
    row_spec = pl.BlockSpec((1, n_g, p_blk), lambda s: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((nsteps, n_g, p_blk), jnp.float32)
    win_spec = pl.BlockSpec((1, n_g, 6, wx, wyz), lambda s: (s, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(nsteps,),
        in_specs=[row_spec] * 7 + (
            [win_spec, win_spec] if three_term else [win_spec]),
        out_specs=(
            row_spec, row_spec, row_spec, row_spec, row_spec, row_spec,
            pl.BlockSpec((1, n_g, 3, wx, wyz), lambda s: (s, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
        ),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            row_shape, row_shape, row_shape, row_shape, row_shape, row_shape,
            jax.ShapeDtypeStruct((nsteps, n_g, 3, wx, wyz), jnp.float32),
            row_shape,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(rows(lx.reshape(-1)), rows(ly.reshape(-1)), rows(lz.reshape(-1)),
      rows(velocity[:, 0]), rows(velocity[:, 1]), rows(velocity[:, 2]),
      rows(q_row), *win_args)
    nlx, nly, nlz, nvx, nvy, nvz, j_win, inw = outs

    # back to global coordinates (periodic); drop filler rows
    pos_cols = []
    for a, nl in zip(range(3), (nlx, nly, nlz)):
        orig = jnp.repeat(origins[a].astype(jnp.float32), p_blk)
        pos_cols.append(jnp.mod(nl.reshape(n_pad)[:n] + orig, shape[a]))
    position_out = jnp.stack(pos_cols, axis=-1)
    velocity_out = jnp.stack([nvx.reshape(n_pad)[:n], nvy.reshape(n_pad)[:n],
                              nvz.reshape(n_pad)[:n]], axis=-1)
    j_blocks = (j_win.reshape(nb_pad, 3, wx, wy, wz)[:nb]
                .transpose(0, 2, 3, 4, 1))
    j = _assemble_tile_windows_3d(j_blocks, blk_tile[:nb], shape, tiling)
    return position_out, velocity_out, j, inw.reshape(n_pad)[:n] > 0.5
