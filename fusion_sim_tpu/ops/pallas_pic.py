"""Fused Pallas ES-PIC substep: gather + kick + drift + deposit in one kernel.

This is the north-star shape (BASELINE: "push+deposit+solve fused in one
jit"): per particle block, everything between two field solves happens in
VMEM —

    E_p   = rowsum(ar * (az @ E_win_c))      gather (separable CIC, MXU)
    v'    = v + (q dt / m) E_p               kick   (VPU)
    x'    = x + dt v' / dx                   drift  (VPU)
    W_rho = ar'^T @ (az' * w)                deposit at x' (MXU, K=P)

The field solve (FFT Poisson) stays in XLA between kernels; the step carries
rho across steps (solve this step's E from last step's deposit — the same
deposit->solve->gather->push sequence, re-cut so one kernel spans the
particle work).

Out-of-window rows (drifted past the sort margin since the last resort, or
pushed out this substep) contribute NO deposit and are flagged; the model
patches them with the exact packed path under its spill_fallback cond —
identical semantics to the XLA sorted model.

Mosaic layout notes: particle rows are (P/128, 128) blocks of
(nb*P/128, 128) arrays; block origins ride the scalar-prefetch channel
(see ops/pallas_gather.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _es2d_kernel(origin_ref, posr_ref, posz_ref, velr_ref, velz_ref, w_ref,
                 ewin_ref,
                 nposr_ref, nposz_ref, nvelr_ref, nvelz_ref, rho_ref, inw_ref,
                 *, nr, nz, wr, wz, qm_dt, c_r, c_z):
    sub, lanes = posr_ref.shape
    p = sub * lanes
    b = pl.program_id(0)
    orr = origin_ref[b, 0].astype(jnp.float32)
    orz = origin_ref[b, 1].astype(jnp.float32)

    posr = posr_ref[...].reshape(p, 1)
    posz = posz_ref[...].reshape(p, 1)
    lr = jnp.mod(posr - orr, float(nr))
    lz = jnp.mod(posz - orz, float(nz))

    iota_r = jax.lax.broadcasted_iota(jnp.float32, (p, wr), 1)
    iota_z = jax.lax.broadcasted_iota(jnp.float32, (p, wz), 1)
    ar = jnp.maximum(0.0, 1.0 - jnp.abs(lr - iota_r))
    az = jnp.maximum(0.0, 1.0 - jnp.abs(lz - iota_z))
    g_inw = (lr < float(wr - 1)) & (lz < float(wz - 1))  # (p, 1)

    # gather E (2 channels), kick, drift
    tr_ = jnp.dot(az, ewin_ref[0, 0], preferred_element_type=jnp.float32)
    ex = jnp.sum(ar * tr_, axis=1, keepdims=True)
    tz_ = jnp.dot(az, ewin_ref[0, 1], preferred_element_type=jnp.float32)
    ez = jnp.sum(ar * tz_, axis=1, keepdims=True)

    w = w_ref[...].reshape(p, 1)
    valid = w != 0.0
    velr = velr_ref[...].reshape(p, 1)
    velz = velz_ref[...].reshape(p, 1)
    nvelr = jnp.where(valid, velr + qm_dt * ex, 0.0)
    nvelz = jnp.where(valid, velz + qm_dt * ez, 0.0)
    nposr = jnp.mod(posr + c_r * nvelr, float(nr))
    nposz = jnp.mod(posz + c_z * nvelz, float(nz))

    # deposit at the new position (next step's rho)
    nlr = jnp.mod(nposr - orr, float(nr))
    nlz = jnp.mod(nposz - orz, float(nz))
    arn = jnp.maximum(0.0, 1.0 - jnp.abs(nlr - iota_r))
    azn = jnp.maximum(0.0, 1.0 - jnp.abs(nlz - iota_z))
    d_inw = (nlr < float(wr - 1)) & (nlz < float(wz - 1))
    inw = g_inw & d_inw
    wm = jnp.where(inw, w, 0.0)
    rho_ref[0] = jax.lax.dot_general(
        arn, azn * wm, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (wr, wz)

    nposr_ref[...] = nposr.reshape(sub, lanes)
    nposz_ref[...] = nposz.reshape(sub, lanes)
    nvelr_ref[...] = nvelr.reshape(sub, lanes)
    nvelz_ref[...] = nvelz.reshape(sub, lanes)
    inw_ref[...] = inw.astype(jnp.float32).reshape(sub, lanes)


@functools.partial(jax.jit, static_argnames=("shape", "tiling", "qm_dt",
                                             "c_r", "c_z", "interpret"))
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
    interpret: bool = False,
):
    """One fused particle substep for tile-sorted 2D ES PIC.

    ``e_grid``: (nr, nz, 2); particle arrays in the padded sorted layout
    (N = nb * tiling.block, weights 0 on fillers, block % 128 == 0).
    Returns ``(position', velocity', rho', in_win)`` where rho' is the
    charge deposited at the NEW positions (feeds the next step's solve) and
    in_win flags rows whose gather AND deposit stayed inside their block
    window.
    """
    from .sorted_deposit import _assemble_tile_windows, extract_tile_windows

    nr, nz = shape
    ntr, ntz = tiling.n_tiles(shape)
    p_blk = tiling.block
    if p_blk % 128:
        raise ValueError(f"pallas path needs block % 128 == 0, got {p_blk}")
    sub = p_blk // 128
    m = tiling.margin
    wr = tiling.tile_r + 2 * m + 1
    wz = tiling.tile_z + 2 * m + 1
    n = position.shape[0]
    nb = n // p_blk

    blk_tile = tile_id[::p_blk]
    blk_tr = (blk_tile // ntz) * tiling.tile_r - m
    blk_tz = (blk_tile % ntz) * tiling.tile_z - m
    origins = jnp.stack([blk_tr, blk_tz], axis=-1).astype(jnp.int32)

    ewin = extract_tile_windows(e_grid, shape, tiling, wr, wz)
    ewin_b = ewin.reshape(ntr * ntz, wr, wz, 2)[blk_tile]  # (nb, wr, wz, 2)
    ewin_b = ewin_b.transpose(0, 3, 2, 1)                  # (nb, 2, wz, wr)

    rows = lambda v: v.reshape(nb * sub, 128)
    posr, posz = rows(position[:, 0]), rows(position[:, 1])
    velr, velz = rows(velocity[:, 0]), rows(velocity[:, 1])
    w = rows(weights)

    kernel = functools.partial(_es2d_kernel, nr=nr, nz=nz, wr=wr, wz=wz,
                               qm_dt=qm_dt, c_r=c_r, c_z=c_z)
    row_spec = pl.BlockSpec((sub, 128), lambda b, *_: (b, 0),
                            memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((nb * sub, 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            row_spec, row_spec, row_spec, row_spec, row_spec,
            pl.BlockSpec((1, 2, wz, wr), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            row_spec, row_spec, row_spec, row_spec,
            pl.BlockSpec((1, wr, wz), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
        ),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            row_shape, row_shape, row_shape, row_shape,
            jax.ShapeDtypeStruct((nb, wr, wz), jnp.float32),
            row_shape,
        ),
        interpret=interpret,
    )(origins, posr, posz, velr, velz, w, ewin_b)
    nposr, nposz, nvelr, nvelz, rho_win, inw = outs

    position_out = jnp.stack([nposr.reshape(n), nposz.reshape(n)], axis=-1)
    velocity_out = jnp.stack([nvelr.reshape(n), nvelz.reshape(n)], axis=-1)
    rho = _assemble_tile_windows(rho_win, blk_tile, shape, tiling, wr, wz)
    return position_out, velocity_out, rho, inw.reshape(n) > 0.5
