"""Electromagnetic (Yee-FDTD + Boris + Esirkepov) PIC on a TWO-AXIS spatial
device mesh.

The 2-D-mesh counterpart of models/electromagnetic_sharded.py's plain
composition, and the purest showcase of the 2-D decomposition: unlike the ES
model there is NO global solve — every phase of the step is collective-local
(ppermute halo/apron exchanges on both mesh axes + the dimension-ordered
particle migration), so surface/volume communication falls as 1/sqrt(n)
with device count and weak scaling has no gathered-solve term at all.

Per step, one shard_map over ``Mesh((Sx, Sy), ("sx", "sy"))``:

    field halos        with_halo_2d (corner ghosts ride two hops)
    -> CIC gather + Boris kick + drift
    -> Esirkepov current deposit into the two-axis apron-padded block
    -> accumulate_apron_2d
    -> Yee leapfrog (B half, E full, B half) with 1-cell two-axis curl halos
    -> migrate_grid    (x hop then y hop; diagonal crossers in two phases)

Ownership/invariants follow the 1-D model: global grid-unit positions,
fixed per-shard capacity with alive-flag dead slots (empic.js:719's
mechanism), per-step displacement < ``disp_bound``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import fdtd
from ..ops.esirkepov import esirkepov_deposit_2d, esirkepov_deposit_3d
from ..ops.interp import cic_gather_packed
from ..parallel import halo, migration
from .electromagnetic import EMConfig, boris_kick
from .electromagnetic_sharded import APRON_W, HALO_W, ShardedEMState


@dataclasses.dataclass(frozen=True)
class ShardedEMConfig2D:
    """2-D-mesh decomposition config (axes "sx" x "sy" over grid axes 0, 1)."""

    base: EMConfig
    mesh_shape: tuple[int, int]
    capacity: int
    migration_buffer: int
    # sorted-layout composition (tiling != None): per-shard tile-sorted
    # padded particles on a TWO-AXIS halo-padded pseudo-grid — the 2-D-mesh
    # lift of ShardedEMConfig's sorted options (VERDICT r4 #3).
    tiling: object | None = None
    resort_every: int = 6
    spill_capacity: int = 16384
    # sorted composition only: 'fused' runs each shard's gather + Boris +
    # drift + Esirkepov in ONE Mosaic kernel on the local pseudo-grid
    # windows (see ShardedEMConfig.gather_backend)
    gather_backend: str = "xla"
    pallas_precision: str | None = None
    debug_checks: bool = False

    @property
    def n_shards(self) -> int:
        return self.mesh_shape[0] * self.mesh_shape[1]

    @property
    def tile_xy(self) -> tuple[int, int]:
        t = self.tiling
        return ((t.tile_r, t.tile_z) if self.base.n_dim == 2
                else (t.tile[0], t.tile[1]))

    @property
    def halo_ws(self) -> tuple[int, int]:
        """Sorted-path halo/apron width per decomposed axis (two-axis form
        of ShardedEMConfig.halo_w): covers the gather window reach and the
        Esirkepov apron, tile-divisible, windows never wrapping onto real
        neighbor data."""
        out = []
        m = self.tiling.margin
        for t in self.tile_xy:
            need = max(m + 2, APRON_W)
            h = -(-need // t) * t
            if h < 2 * m + 1:
                h += t
            out.append(h)
        return tuple(out)

    @property
    def pseudo_shape(self) -> tuple[int, ...]:
        sx, sy = self.slabs
        tx, ty = self.tile_xy
        if sx % tx or sy % ty:
            raise ValueError(f"block {self.slabs} not divisible by tiles "
                             f"({tx}, {ty})")
        hx, hy = self.halo_ws
        return (sx + 2 * hx, sy + 2 * hy, *self.base.grid_shape[2:])

    @property
    def cap_padded(self) -> int:
        if self.capacity % self.tiling.block:
            raise ValueError(f"capacity {self.capacity} not a multiple of "
                             f"block {self.tiling.block}")
        n_tiles = int(np.prod(self.tiling.n_tiles(self.pseudo_shape)))
        return self.capacity + n_tiles * self.tiling.block

    @property
    def slabs(self) -> tuple[int, int]:
        out = []
        for a in range(2):
            n_a = self.base.grid_shape[a]
            s_a = self.mesh_shape[a]
            if n_a % s_a:
                raise ValueError(f"grid axis {a} ({n_a}) not divisible by "
                                 f"mesh axis {s_a}")
            slab = n_a // s_a
            if s_a > 1 and slab < APRON_W:
                raise ValueError(f"block width {slab} on axis {a} < "
                                 f"deposition apron {APRON_W}")
            out.append(slab)
        return tuple(out)

    @property
    def disp_bound(self) -> float:
        bound = float(APRON_W - 2)  # Esirkepov 3-node stencil reach
        for a in range(2):
            if self.mesh_shape[a] > 1:
                bound = min(bound, self.slabs[a] / 2.0)
        return bound


def distribute_2d(config: ShardedEMConfig2D, position: np.ndarray,
                  velocity: np.ndarray):
    """Bucket global particles into shard-major (ix * Sy + iy) slot blocks —
    the split order of ``P(("sx", "sy"), ...)`` on axis 0."""
    sx, sy = config.mesh_shape
    cap = config.capacity
    slab_x, slab_y = config.slabs
    d = config.base.n_dim
    pos = np.zeros((sx * sy * cap, d), np.float32)
    vel = np.zeros((sx * sy * cap, 3), np.float32)
    alive = np.zeros((sx * sy * cap,), bool)
    ox = np.minimum((position[:, 0] // slab_x).astype(int), sx - 1)
    oy = np.minimum((position[:, 1] // slab_y).astype(int), sy - 1)
    owner = ox * sy + oy
    for s in range(sx * sy):
        mine = np.where(owner == s)[0]
        if len(mine) > cap:
            raise ValueError(f"shard {s}: {len(mine)} particles > "
                             f"capacity {cap}")
        pos[s * cap: s * cap + len(mine)] = position[mine]
        vel[s * cap: s * cap + len(mine)] = velocity[mine]
        alive[s * cap: s * cap + len(mine)] = True
    return pos, vel, alive


def make_sharded_em_step_fn_2d(config: ShardedEMConfig2D, mesh: Mesh,
                               axes: tuple[str, str] = ("sx", "sy")):
    base = config.base
    ndim = base.n_dim
    grid_shape = base.grid_shape
    nx, ny = grid_shape[0], grid_shape[1]
    rest = grid_shape[2:]
    slab_x, slab_y = config.slabs
    dxv = jnp.asarray(base.cell_size, jnp.float32)
    dt = base.dt
    qm_half_dt = base.charge / base.mass * dt * 0.5
    pad_shape = (slab_x + 2 * APRON_W, slab_y + 2 * APRON_W, *rest)
    halo_shape = (slab_x + 2 * HALO_W, slab_y + 2 * HALO_W, *rest)
    e_off = fdtd.E_OFFSETS_2D if ndim == 2 else fdtd.E_OFFSETS_3D
    b_off = fdtd.B_OFFSETS_2D if ndim == 2 else fdtd.B_OFFSETS_3D
    grid_f = jnp.asarray(grid_shape, jnp.float32)
    widths1 = (1, 1)
    widths_h = (HALO_W, HALO_W)

    def _shift_xy(pos, off_x, off_y):
        return jnp.concatenate(
            [pos[:, :1] + off_x, pos[:, 1:2] + off_y, pos[:, 2:]], axis=1)

    def local_step(position, velocity, alive, e_local, b_local, overflow,
                   max_disp):
        ix = jax.lax.axis_index(axes[0])
        iy = jax.lax.axis_index(axes[1])
        x_lo = (ix * slab_x).astype(jnp.float32)
        y_lo = (iy * slab_y).astype(jnp.float32)

        # ---- field halos for the particle gather --------------------------
        e_pad = halo.with_halo_2d(e_local, axes, widths_h)
        b_pad = halo.with_halo_2d(b_local, axes, widths_h)
        # padded tables are NOT periodic on the decomposed axes; the CIC
        # corner and stagger-centering rolls only reach +/-1 which stays
        # inside the pad for in-block particles
        table = fdtd.center_fields(e_pad, b_pad, e_off, b_off)

        local_pos = _shift_xy(position, HALO_W - x_lo, HALO_W - y_lo)
        eb = cic_gather_packed(table, local_pos, halo_shape)
        e_at_p, b_at_p = eb[:, :3], eb[:, 3:]

        # ---- push ----------------------------------------------------------
        velocity = boris_kick(velocity, e_at_p, b_at_p, qm_half_dt,
                              base.relativistic, base.c)
        velocity = jnp.where(alive[:, None], velocity, 0.0)
        x0 = position
        # unwrapped until after deposition (Esirkepov reads true x0 -> x1)
        x1 = x0 + dt * velocity[:, :ndim] / dxv
        disp = jnp.max(jnp.where(alive, jnp.max(
            jnp.abs(dt * velocity[:, :ndim] / dxv), axis=1), 0.0))
        max_disp = jnp.maximum(max_disp, disp)

        # ---- deposition into the two-axis padded block + apron fold -------
        dep_x0 = _shift_xy(x0, APRON_W - x_lo, APRON_W - y_lo)
        dep_x1 = _shift_xy(x1, APRON_W - x_lo, APRON_W - y_lo)
        charge = jnp.where(alive, jnp.float32(base.charge), 0.0)
        if ndim == 2:
            j_pad = esirkepov_deposit_2d(dep_x0, dep_x1, velocity[:, 2],
                                         charge, dt, pad_shape,
                                         base.cell_size)
        else:
            j_pad = esirkepov_deposit_3d(dep_x0, dep_x1, charge, dt,
                                         pad_shape, base.cell_size)
        j_local = halo.accumulate_apron_2d(j_pad, axes, (APRON_W, APRON_W))

        # ---- Yee update with two-axis curl halos ---------------------------
        def curl_e_local(e):
            c = fdtd.curl_e(halo.with_halo_2d(e, axes, widths1),
                            base.cell_size)
            return c[1:-1, 1:-1]

        def curl_b_local(b):
            c = fdtd.curl_b(halo.with_halo_2d(b, axes, widths1),
                            base.cell_size)
            return c[1:-1, 1:-1]

        b_half = b_local - (0.5 * dt) * curl_e_local(e_local)
        e_new = e_local + dt * ((base.c ** 2) * curl_b_local(b_half)
                                - j_local / base.eps0)
        b_new = b_half - (0.5 * dt) * curl_e_local(e_new)

        # ---- wrap + dimension-ordered migration ----------------------------
        x1 = jnp.mod(x1, grid_f)

        mig_axes = tuple(ax for a, ax in enumerate(axes)
                         if config.mesh_shape[a] > 1)
        if mig_axes:
            slab_of = {axes[0]: (slab_x, nx, 0), axes[1]: (slab_y, ny, 1)}

            def mask_fn(arrays, k):
                p = arrays[0]
                ax = mig_axes[k]
                slab, n_a, col = slab_of[ax]
                lo = (jax.lax.axis_index(ax) * slab).astype(jnp.float32)
                g = p[:, col]
                d_lo = jnp.mod(lo - g, n_a)
                go_lo = jnp.logical_and(d_lo > 0, d_lo <= slab / 2)
                go_hi = jnp.mod(g - (lo + slab), n_a) < slab / 2
                return go_lo, go_hi

            res = migration.migrate_grid((x1, velocity), alive, mask_fn,
                                         mig_axes, config.migration_buffer)
            x1, velocity = res.arrays
            alive = res.alive
            overflow = overflow + res.overflow

        x1 = jnp.where(alive[:, None], x1, 0.0)
        velocity = jnp.where(alive[:, None], velocity, 0.0)
        return x1, velocity, alive, e_new, b_new, overflow, max_disp

    both = P(axes)
    fspec = P(axes[0], axes[1], *([None] * (ndim - 1)))  # (*grid, 3)
    spec = (P(axes, None), P(axes, None), both, fspec, fspec, both, both)
    mapped = shard_map(local_step, mesh=mesh, in_specs=spec, out_specs=spec)

    @jax.jit
    def step(state: ShardedEMState) -> ShardedEMState:
        pos, vel, alive, e, b, ov, md = mapped(
            state.position, state.velocity, state.alive, state.e, state.b,
            state.overflow, state.max_disp)
        return ShardedEMState(position=pos, velocity=vel, alive=alive,
                              e=e, b=b, overflow=ov, max_disp=md)

    return step


def make_sharded_sorted_em_step_fn_2d(config: ShardedEMConfig2D, mesh: Mesh,
                                      axes: tuple[str, str] = ("sx", "sy")):
    """Sorted-layout composition of the 2-D-mesh EM step (VERDICT r4 #3):
    per-shard tile-sorted padded particles with digit-matmul gather/
    Esirkepov (gather_backend='xla') or the fused Mosaic substep
    (gather_backend='fused') on the TWO-AXIS halo-padded pseudo-grid,
    two-axis apron folds, Yee curls over two-axis 1-cell halos, and
    dimension-ordered migration — the 2-D-mesh lift of
    electromagnetic_sharded.make_sharded_sorted_step_fn."""
    from ..ops.interp import cic_gather_packed, spill_rows_cond
    from ..ops.sorted_deposit import (esirkepov_sorted_2d, esirkepov_sorted_3d,
                                      gather_sorted_2d, gather_sorted_3d)
    from .electrostatic_sharded2d import _make_grid_mig, _make_to_local_2d

    base = config.base
    tiling = config.tiling
    ndim = base.n_dim
    nx, ny = base.grid_shape[:2]
    rest_f = jnp.asarray(base.grid_shape[2:], jnp.float32)
    slab_x, slab_y = config.slabs
    hx, hy = config.halo_ws
    widths_h = (hx, hy)
    widths1 = (1, 1)
    pseudo_shape = config.pseudo_shape
    pseudo_f = jnp.asarray(pseudo_shape, jnp.float32)
    capacity = config.spill_capacity
    dxv = jnp.asarray(base.cell_size, jnp.float32)
    dt = base.dt
    qm_half_dt = base.charge / base.mass * dt * 0.5
    e_off = fdtd.E_OFFSETS_2D if ndim == 2 else fdtd.E_OFFSETS_3D
    b_off = fdtd.B_OFFSETS_2D if ndim == 2 else fdtd.B_OFFSETS_3D
    n_tiles_ps = int(np.prod(tiling.n_tiles(pseudo_shape)))
    use_fused = config.gather_backend == "fused"
    if config.gather_backend not in ("xla", "fused"):
        raise ValueError(f"gather_backend {config.gather_backend!r} "
                         "(xla|fused)")
    interpret = jax.default_backend() != "tpu"
    to_local = _make_to_local_2d(config)
    migrate = _make_grid_mig(config, axes)

    def local_step(position, velocity, alive, tile_id, e_local, b_local,
                   overflow, spill, max_disp):
        ix = jax.lax.axis_index(axes[0])
        iy = jax.lax.axis_index(axes[1])
        x_lo = (ix * slab_x).astype(jnp.float32)
        y_lo = (iy * slab_y).astype(jnp.float32)
        n_tot = position.shape[0]

        # ---- two-axis field halos + sorted gather -------------------------
        e_pad = halo.with_halo_2d(e_local, axes, widths_h)
        b_pad = halo.with_halo_2d(b_local, axes, widths_h)
        table = fdtd.center_fields(e_pad, b_pad, e_off, b_off)
        lp0 = to_local(position, x_lo, y_lo)
        bad_block = tile_id >= n_tiles_ps
        charge = jnp.where(alive, jnp.float32(base.charge), 0.0)

        if use_fused:
            from ..ops.pallas_em import fused_em2d_substep
            from ..ops.pallas_em3d import fused_em3d_substep

            substep = fused_em2d_substep if ndim == 2 else fused_em3d_substep
            valid_k = jnp.logical_and(alive, jnp.logical_not(bad_block))
            vel0 = velocity
            lp1, velocity, j_pad, in_win = substep(
                table, lp0, velocity, valid_k, tile_id, pseudo_shape,
                tiling, qm_half_dt, dt, base.cell_size, base.charge,
                c_light=base.c, relativistic=base.relativistic,
                precision=config.pallas_precision or "highest",
                interpret=interpret)
            d_mask = jnp.logical_and(
                jnp.logical_or(jnp.logical_not(in_win), bad_block), alive)
            n_spill = jnp.sum(d_mask)
            d_idx, d_ok = spill_rows_cond(d_mask, n_spill, capacity, n_tot)
            lp0_k = jnp.mod(lp0[d_idx], pseudo_f)
            eb_k = cic_gather_packed(table, lp0_k, pseudo_shape)
            vel_k = boris_kick(vel0[d_idx], eb_k[:, :3], eb_k[:, 3:],
                               qm_half_dt, base.relativistic, base.c)
            if base.relativistic:
                gam_k = jnp.sqrt(1.0 + jnp.sum((vel_k / base.c) ** 2,
                                               axis=-1, keepdims=True))
                cv_k = vel_k / gam_k
            else:
                cv_k = vel_k
            lp1_k = lp0_k + dt * cv_k[:, :ndim] / dxv
            q_k = jnp.where(d_ok, charge[d_idx], 0.0)
            if ndim == 2:
                j_pad = j_pad + esirkepov_deposit_2d(
                    lp0_k, lp1_k, cv_k[:, 2], q_k, dt, pseudo_shape,
                    base.cell_size)
            else:
                j_pad = j_pad + esirkepov_deposit_3d(
                    lp0_k, lp1_k, q_k, dt, pseudo_shape, base.cell_size)
            lp1 = lp1.at[d_idx].set(lp1_k, mode="drop")
            velocity = velocity.at[d_idx].set(vel_k, mode="drop")
            velocity = jnp.where(alive[:, None], velocity, 0.0)
            if base.relativistic:
                gamma = jnp.sqrt(1.0 + jnp.sum((velocity / base.c) ** 2,
                                               axis=-1, keepdims=True))
                coord_v = velocity / gamma
            else:
                coord_v = velocity
        else:
            gather_fn = gather_sorted_2d if ndim == 2 else gather_sorted_3d
            eb, g_inw = gather_fn(table, lp0, tile_id, pseudo_shape, tiling)
            g_mask = jnp.logical_and(
                jnp.logical_or(jnp.logical_not(g_inw), bad_block), alive)
            g_idx, _ = spill_rows_cond(g_mask, jnp.sum(g_mask), capacity,
                                       n_tot)
            eb_k = cic_gather_packed(table, lp0[g_idx], pseudo_shape)
            eb = eb.at[g_idx].set(eb_k, mode="drop")

            velocity = boris_kick(velocity, eb[:, :3], eb[:, 3:], qm_half_dt,
                                  base.relativistic, base.c)
            velocity = jnp.where(alive[:, None], velocity, 0.0)
            if base.relativistic:
                gamma = jnp.sqrt(1.0 + jnp.sum((velocity / base.c) ** 2,
                                               axis=-1, keepdims=True))
                coord_v = velocity / gamma
            else:
                coord_v = velocity
            lp1 = lp0 + dt * coord_v[:, :ndim] / dxv

            charge_sorted = jnp.where(bad_block, 0.0, charge)
            if ndim == 2:
                j_pad, d_spill, d_mask = esirkepov_sorted_2d(
                    lp0, lp1, coord_v[:, 2], charge_sorted, tile_id, dt,
                    pseudo_shape, base.cell_size, tiling)
            else:
                j_pad, d_spill, d_mask = esirkepov_sorted_3d(
                    lp0, lp1, charge_sorted, tile_id, dt, pseudo_shape,
                    base.cell_size, tiling)
            d_mask = jnp.logical_and(jnp.logical_or(d_mask, bad_block), alive)
            n_spill = jnp.sum(d_mask)
            d_idx, d_ok = spill_rows_cond(d_mask, n_spill, capacity, n_tot)
            q_k = jnp.where(d_ok, charge[d_idx], 0.0)
            if ndim == 2:
                j_pad = j_pad + esirkepov_deposit_2d(
                    lp0[d_idx], lp1[d_idx], coord_v[d_idx, 2], q_k, dt,
                    pseudo_shape, base.cell_size)
            else:
                j_pad = j_pad + esirkepov_deposit_3d(
                    lp0[d_idx], lp1[d_idx], q_k, dt, pseudo_shape,
                    base.cell_size)

        disp = jnp.max(jnp.where(alive, jnp.max(
            jnp.abs(dt * coord_v[:, :ndim] / dxv), axis=1), 0.0))
        max_disp = jnp.maximum(max_disp, disp)
        j_local = halo.accumulate_apron_2d(j_pad, axes, widths_h)

        # ---- Yee update with two-axis curl halos ---------------------------
        def curl_e_local(e):
            c = fdtd.curl_e(halo.with_halo_2d(e, axes, widths1),
                            base.cell_size)
            return c[1:-1, 1:-1]

        def curl_b_local(b):
            c = fdtd.curl_b(halo.with_halo_2d(b, axes, widths1),
                            base.cell_size)
            return c[1:-1, 1:-1]

        b_half = b_local - (0.5 * dt) * curl_e_local(e_local)
        e_new = e_local + dt * ((base.c ** 2) * curl_b_local(b_half)
                                - j_local / base.eps0)
        b_new = b_half - (0.5 * dt) * curl_e_local(e_new)

        # ---- back to global + dimension-ordered migration ------------------
        gx = jnp.mod(lp1[:, 0] - hx + x_lo, nx)
        gy = jnp.mod(lp1[:, 1] - hy + y_lo, ny)
        tail = jnp.mod(lp1[:, 2:], rest_f)
        x1 = jnp.concatenate([gx[:, None], gy[:, None], tail], axis=1)
        (x1, velocity), alive, overflow = migrate((x1, velocity), alive,
                                                  overflow)
        spill = spill + n_spill.astype(jnp.int32)
        x1 = jnp.where(alive[:, None], x1, 0.0)
        velocity = jnp.where(alive[:, None], velocity, 0.0)
        return (x1, velocity, alive, tile_id, e_new, b_new, overflow, spill,
                max_disp)

    both = P(axes)
    fspec = P(axes[0], axes[1], *([None] * (ndim - 1)))
    spec = (P(axes, None), P(axes, None), both, both, fspec, fspec, both,
            both, both)
    mapped = shard_map(local_step, mesh=mesh, in_specs=spec, out_specs=spec,
                       check_vma=False)

    @jax.jit
    def step(state: ShardedEMState) -> ShardedEMState:
        pos, vel, alive, tid, e, b, ov, sp, md = mapped(
            state.position, state.velocity, state.alive, state.tile_id,
            state.e, state.b, state.overflow, state.spill, state.max_disp)
        return state._replace(position=pos, velocity=vel, alive=alive,
                              e=e, b=b, overflow=ov, max_disp=md,
                              tile_id=tid, spill=sp)

    return step


def make_sharded_em_resort_fn_2d(config: ShardedEMConfig2D, mesh: Mesh,
                                 axes: tuple[str, str] = ("sx", "sy")):
    """Per-shard local resort on the 2-D mesh (velocity carries 3
    components; see electrostatic_sharded2d's)."""
    from ..ops.sorted_deposit import build_padded_layout
    from .electrostatic_sharded2d import _make_to_local_2d

    base = config.base
    tiling = config.tiling
    ndim = base.n_dim
    slab_x, slab_y = config.slabs
    pseudo_shape = config.pseudo_shape
    cap_state = config.cap_padded
    to_local = _make_to_local_2d(config)

    def local_resort(position, velocity, alive, tile_id, overflow):
        ix = jax.lax.axis_index(axes[0])
        iy = jax.lax.axis_index(axes[1])
        lp = to_local(position, (ix * slab_x).astype(jnp.float32),
                      (iy * slab_y).astype(jnp.float32))
        payloads = [position[:, a] for a in range(ndim)]
        payloads += [velocity[:, c] for c in range(3)]
        out = build_padded_layout(lp, pseudo_shape, tiling, *payloads,
                                  valid=alive, derive_valid=True)
        tid_s = out[0]
        cols = out[2:2 + ndim]
        vels = out[2 + ndim:5 + ndim]
        alive_s = out[5 + ndim]
        lost = jnp.sum(alive_s[cap_state:])
        pos_out = jnp.stack([c[:cap_state] for c in cols], axis=-1)
        vel_out = jnp.stack([v[:cap_state] for v in vels], axis=-1)
        alive_out = alive_s[:cap_state]
        pos_out = jnp.where(alive_out[:, None], pos_out, 0.0)
        vel_out = jnp.where(alive_out[:, None], vel_out, 0.0)
        return (pos_out, vel_out, alive_out, tid_s[:cap_state],
                overflow + lost.astype(jnp.int32))

    both = P(axes)
    spec = (P(axes, None), P(axes, None), both, both, both)
    mapped = shard_map(local_resort, mesh=mesh, in_specs=spec,
                       out_specs=spec)

    @jax.jit
    def resort(state: ShardedEMState) -> ShardedEMState:
        pos, vel, alive, tid, ov = mapped(
            state.position, state.velocity, state.alive, state.tile_id,
            state.overflow)
        return state._replace(position=pos, velocity=vel, alive=alive,
                              tile_id=tid, overflow=ov)

    return resort


class ShardedElectromagneticPIC2D:
    """Stateful shell for the 2-D-mesh EM decomposition (mirrors
    ShardedElectromagneticPIC's plain-composition API)."""

    def __init__(self, config: ShardedEMConfig2D, mesh: Mesh, position,
                 velocity, e=None, b=None,
                 axes: tuple[str, str] = ("sx", "sy")):
        if tuple(mesh.devices.shape) != tuple(config.mesh_shape):
            raise ValueError(f"mesh shape {mesh.devices.shape} != config "
                             f"mesh_shape {config.mesh_shape}")
        self.config = config
        self.mesh = mesh
        base = config.base
        self.sorted = config.tiling is not None
        dist_cfg = (dataclasses.replace(config, capacity=config.cap_padded)
                    if self.sorted else config)
        pos, vel, alive = distribute_2d(dist_cfg,
                                        np.asarray(position, np.float32),
                                        np.asarray(velocity, np.float32))
        zero_f = np.zeros((*base.grid_shape, 3), np.float32)
        spec2 = NamedSharding(mesh, P(axes, None))
        spec1 = NamedSharding(mesh, P(axes))
        fspec = NamedSharding(
            mesh, P(axes[0], axes[1], *([None] * (base.n_dim - 1))))
        n_sh = config.n_shards
        n_slots = pos.shape[0]
        self.state = ShardedEMState(
            position=jax.device_put(jnp.asarray(pos), spec2),
            velocity=jax.device_put(jnp.asarray(vel), spec2),
            alive=jax.device_put(jnp.asarray(alive), spec1),
            e=jax.device_put(jnp.asarray(zero_f if e is None else e,
                                         jnp.float32), fspec),
            b=jax.device_put(jnp.asarray(zero_f if b is None else b,
                                         jnp.float32), fspec),
            overflow=jax.device_put(jnp.zeros((n_sh,), jnp.int32), spec1),
            max_disp=jax.device_put(jnp.zeros((n_sh,), jnp.float32), spec1),
            tile_id=(jax.device_put(jnp.zeros((n_slots,), jnp.int32), spec1)
                     if self.sorted else None),
            spill=(jax.device_put(jnp.zeros((n_sh,), jnp.int32), spec1)
                   if self.sorted else None),
        )
        if self.sorted:
            self._resort = make_sharded_em_resort_fn_2d(config, mesh, axes)
            self.state = self._resort(self.state)
            self._step = make_sharded_sorted_em_step_fn_2d(config, mesh,
                                                           axes)
            self._since_sort = 0
        else:
            self._step = make_sharded_em_step_fn_2d(config, mesh, axes)
        self._multi_cache: dict = {}

    def step(self, n: int = 1) -> None:
        from ..utils.stepping import (make_multi_step, make_window_step,
                                      pow2_chunk)

        cadence = self.config.resort_every if self.sorted else 10 ** 9
        done = 0
        while done < n:
            if self.sorted and self._since_sort >= cadence:
                self.state = self._resort(self.state)
                self._since_sort = 0
            since = self._since_sort if self.sorted else 0
            if (self.sorted and since == 0 and n - done >= cadence
                    and cadence <= 128):
                key = ("w", cadence)
                if key not in self._multi_cache:
                    self._multi_cache[key] = make_window_step(
                        self._step, self._resort, cadence)
                self.state = self._multi_cache[key](self.state)
                done += cadence
                continue
            k = pow2_chunk(min(n - done, min(cadence - since, 32)))
            if k <= 1:
                self.state = self._step(self.state)
                k = 1
            else:
                if k not in self._multi_cache:
                    self._multi_cache[k] = make_multi_step(self._step, k)
                self.state = self._multi_cache[k](self.state)
            if self.sorted:
                self._since_sort += k
            done += k
        if self.config.debug_checks:
            inv = self.check_invariants()
            if not inv["disp_bound_ok"]:
                raise RuntimeError(
                    f"migration invariant violated: max per-step "
                    f"displacement {inv['max_disp_cells']:.3f} cells >= "
                    f"bound {self.config.disp_bound:.3f} (blocks="
                    f"{self.config.slabs}, apron={APRON_W})")

    def gather_particles(self) -> tuple[np.ndarray, np.ndarray]:
        alive = np.asarray(self.state.alive)
        return (np.asarray(self.state.position)[alive],
                np.asarray(self.state.velocity)[alive])

    def check_invariants(self) -> dict[str, float]:
        md = float(jnp.max(self.state.max_disp))
        return {"max_disp_cells": md,
                "overflow": int(jnp.sum(self.state.overflow)),
                "disp_bound_ok": md < self.config.disp_bound}
