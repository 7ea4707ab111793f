"""Spatially-decomposed electromagnetic PIC (shard_map + halo + migration).

The production multi-chip EM PIC of BASELINE.json configs[4], in 2D3V and
full 3D: the grid is split into x-slabs across the ``space`` mesh axis;
every shard owns its field slab and the particles inside it.
Communication is neighbor-only, riding ICI (SURVEY.md §2.6/§5):

* field *halos* (lax.ppermute, parallel/halo.py) pad each slab for particle
  gathers and Yee curls;
* deposition *aprons* fold current deposited past slab edges back onto the
  owning neighbor (halo.accumulate_apron);
* particles crossing a slab boundary migrate through fixed-capacity ring
  buffers with overflow accounting (parallel/migration.py) — dead slots are
  masked out of every deposit (the alive-flag discipline of empic.js:719).

Everything runs inside ONE jitted shard_map step; XLA emits only the
ppermute collectives.  Contrast with the zero-communication auto-sharded
path (parallel/sharding.shard_em_state + the plain EM step), where XLA
inserts all-gathers: this model keeps particle data owner-local, the layout
that scales to the 1e9-particle stretch config.

Particle positions are stored in *global* grid units; each shard masks to
its slab [lo, hi).  Slab width must divide the grid and exceed one cell of
motion per step (guaranteed by the Yee CFL check).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import fdtd
from ..ops.esirkepov import esirkepov_deposit_2d, esirkepov_deposit_3d
from ..parallel import halo, migration
from .electromagnetic import EMConfig, boris_kick

HALO_W = 2     # field halo for gathers + curls (CIC corners + stagger shift)
APRON_W = 4    # deposition apron (Esirkepov 3-node stencil + 1 cell motion)


class ShardedEMState(NamedTuple):
    position: jax.Array   # (n_shards*cap, d) global grid units (dead: 0)
    velocity: jax.Array   # (n_shards*cap, 3)
    alive: jax.Array      # (n_shards*cap,) bool
    e: jax.Array          # (*grid, 3)
    b: jax.Array          # (*grid, 3)
    overflow: jax.Array   # (n_shards,) cumulative migration overflow
    max_disp: jax.Array   # (n_shards,) max per-step displacement seen (cells)
    # sorted-layout composition only:
    tile_id: jax.Array | None = None  # (n_shards*cap,) pseudo-grid tile per slot
    spill: jax.Array | None = None    # (n_shards,) cumulative out-of-window rows
    # incremental layout repair (repair=True) only (see
    # electrostatic_sharded.ShardedESState):
    free_idx: jax.Array | None = None   # (n_shards*n_tiles, F)
    free_cnt: jax.Array | None = None   # (n_shards*n_tiles,)
    spare_idx: jax.Array | None = None  # (n_shards, S)
    spare_cnt: jax.Array | None = None  # (n_shards,)
    unplaced: jax.Array | None = None   # (n_shards,) cumulative


@dataclasses.dataclass(frozen=True)
class ShardedEMConfig:
    base: EMConfig
    n_shards: int
    capacity: int          # particle slots per shard
    migration_buffer: int  # max migrants per direction per step
    # sorted-layout composition (tiling != None): per-shard tile-sorted
    # padded particle layout with digit-matmul gather/deposit; migrants land
    # in dead slots and self-flag as out-of-window spills (exact-patched up
    # to spill_capacity rows/step) until the next per-shard resort.
    tiling: object | None = None
    resort_every: int = 6
    spill_capacity: int = 16384
    # sorted composition only: 'fused' runs each shard's gather + Boris +
    # drift + Esirkepov in ONE Mosaic kernel on the local pseudo-grid
    # windows (ops/pallas_em.py in 2D3V, ops/pallas_em3d.py in 3D) — the
    # single-chip fused substep
    # composed with halo/apron/migration (VERDICT r2 next-step #3).
    gather_backend: str = "xla"
    # fused-kernel matmul strategy override ('highest' | 'exact_bf16' |
    # 'default'); None = 'highest' ('default' for bfloat16 tilings)
    pallas_precision: str | None = None
    # sorted composition only: incremental layout repair + stack-
    # coordinated migration (see electrostatic_sharded.ShardedESConfig)
    repair: bool = False
    repair_free_slots: int = 256
    # eager relocation (see ShardedESConfig.repair_eager); 0 = off
    repair_eager: int = 0
    eager_capacity: int | None = None
    spare_slots: int | None = None
    # True: the shell verifies after every step() call that the observed max
    # per-step displacement respects the migration/apron invariant (raises
    # RuntimeError instead of silently corrupting ownership) — costs one
    # host sync per step() call; leave False for production runs and poll
    # check_invariants() at your own cadence instead.
    debug_checks: bool = False

    @property
    def disp_bound(self) -> float:
        """Cells of per-step motion the decomposition tolerates: the
        migration ring predicates need < slab/2 and the deposition apron
        covers APRON_W - stencil-reach cells of motion."""
        return min(self.slab / 2.0, float(APRON_W - 2))

    @property
    def slab(self) -> int:
        nx = self.base.grid_shape[0]
        if nx % self.n_shards:
            raise ValueError(f"nx={nx} not divisible by {self.n_shards} shards")
        slab = nx // self.n_shards
        if slab < APRON_W:
            raise ValueError(
                f"slab width {slab} < deposition apron {APRON_W}; use fewer "
                "shards or a finer x-grid")
        return slab

    @property
    def tile_x(self) -> int:
        t = self.tiling
        return t.tile_r if self.base.n_dim == 2 else t.tile[0]

    @property
    def halo_w(self) -> int:
        """Sorted-path halo/apron width: covers the gather window reach
        (margin + CIC corner + field centering) and the Esirkepov apron,
        rounded so the pseudo-grid stays tile-divisible."""
        need = max(self.tiling.margin + 2, APRON_W)
        h = -(-need // self.tile_x) * self.tile_x
        # windows of halo tiles wrap the pseudo-grid edge; particles must
        # never reach the wrapped rows (they stay >= halo_w - margin - 1)
        if h < 2 * self.tiling.margin + 1:
            h += self.tile_x
        return h

    @property
    def pseudo_shape(self) -> tuple[int, ...]:
        """Per-shard halo-padded local grid the sorted ops tile."""
        if self.slab % self.tile_x:
            raise ValueError(f"slab {self.slab} not divisible by x-tile "
                             f"{self.tile_x}")
        return (self.slab + 2 * self.halo_w, *self.base.grid_shape[1:])

    @property
    def cap_padded(self) -> int:
        """Per-shard slot count for the sorted layout: capacity + worst-case
        per-tile block padding (resort output truncates back to this)."""
        import numpy as _np

        if self.capacity % self.tiling.block:
            raise ValueError(f"capacity {self.capacity} not a multiple of "
                             f"block {self.tiling.block}")
        n_tiles = int(_np.prod(self.tiling.n_tiles(self.pseudo_shape)))
        return self.capacity + n_tiles * self.tiling.block


def distribute(config: ShardedEMConfig, position: np.ndarray,
               velocity: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bucket global particles into per-shard fixed-capacity slots."""
    n_shards, cap = config.n_shards, config.capacity
    slab = config.slab
    d = config.base.n_dim
    pos = np.zeros((n_shards * cap, d), np.float32)
    vel = np.zeros((n_shards * cap, 3), np.float32)
    alive = np.zeros((n_shards * cap,), bool)
    owner = np.minimum((position[:, 0] // slab).astype(int), n_shards - 1)
    for s in range(n_shards):
        mine = np.where(owner == s)[0]
        if len(mine) > cap:
            raise ValueError(f"shard {s}: {len(mine)} particles > capacity {cap}")
        pos[s * cap: s * cap + len(mine)] = position[mine]
        vel[s * cap: s * cap + len(mine)] = velocity[mine]
        alive[s * cap: s * cap + len(mine)] = True
    return pos, vel, alive


def make_sharded_step_fn(config: ShardedEMConfig, mesh: Mesh,
                         axis: str = "space"):
    """Build the jitted shard_map step (2D3V or 3D)."""
    base = config.base
    ndim = base.n_dim
    grid_shape = base.grid_shape
    nx = grid_shape[0]
    rest = grid_shape[1:]
    slab = config.slab
    dxv = jnp.asarray(base.cell_size, jnp.float32)
    dt = base.dt
    qm_half_dt = base.charge / base.mass * dt * 0.5
    pad_shape = (slab + 2 * APRON_W, *rest)
    halo_shape = (slab + 2 * HALO_W, *rest)
    e_off = fdtd.E_OFFSETS_2D if ndim == 2 else fdtd.E_OFFSETS_3D
    b_off = fdtd.B_OFFSETS_2D if ndim == 2 else fdtd.B_OFFSETS_3D

    def _dist_left(gx, x_lo):
        # crossed the low edge: ring distance behind x_lo, capped at half a
        # slab so the left/right predicates are disjoint even at n_shards=2
        # (motion is < 1 cell/step << slab/2, enforced by slab >= APRON_W)
        d = jnp.mod(x_lo - gx, nx)
        return jnp.logical_and(d > 0, d <= slab / 2)

    def _dist_right(gx, x_hi):
        d = jnp.mod(gx - x_hi, nx)
        return d < slab / 2

    def _shift_x(pos, offset):
        return jnp.concatenate([pos[:, :1] + offset, pos[:, 1:]], axis=1)

    def local_step(position, velocity, alive, e_local, b_local, overflow,
                   max_disp):
        shard = jax.lax.axis_index(axis)
        x_lo = (shard * slab).astype(jnp.float32)

        # ---- field halos for the particle gather --------------------------
        e_pad = halo.with_halo(e_local, axis, HALO_W)
        b_pad = halo.with_halo(b_local, axis, HALO_W)
        # padded tables are NOT periodic in x; CIC corner rolls only touch
        # +1 which stays inside the pad for in-slab particles.
        table = fdtd.center_fields(e_pad, b_pad, e_off, b_off)

        local_pos = _shift_x(position, HALO_W - x_lo)
        from ..ops.interp import cic_gather_packed

        eb = cic_gather_packed(table, local_pos, halo_shape)
        e_at_p, b_at_p = eb[:, :3], eb[:, 3:]

        # ---- push ---------------------------------------------------------
        velocity = boris_kick(velocity, e_at_p, b_at_p, qm_half_dt,
                              base.relativistic, base.c)
        velocity = jnp.where(alive[:, None], velocity, 0.0)
        x0 = position
        # keep coordinates unwrapped until after deposition: Esirkepov
        # reads the actual x0 -> x1 motion (wrapping first would turn a
        # boundary crossing into an ~n-cell jump)
        x1 = x0 + dt * velocity[:, :ndim] / dxv
        disp = jnp.max(jnp.where(alive, jnp.max(
            jnp.abs(dt * velocity[:, :ndim] / dxv), axis=1), 0.0))
        max_disp = jnp.maximum(max_disp, disp)

        # ---- deposition into the padded slab + apron fold -----------------
        dep_x0 = _shift_x(x0, APRON_W - x_lo)
        dep_x1 = _shift_x(x1, APRON_W - x_lo)
        charge = jnp.where(alive, jnp.float32(base.charge), 0.0)
        if ndim == 2:
            j_pad = esirkepov_deposit_2d(dep_x0, dep_x1, velocity[:, 2],
                                         charge, dt, pad_shape, base.cell_size)
        else:
            j_pad = esirkepov_deposit_3d(dep_x0, dep_x1, charge, dt,
                                         pad_shape, base.cell_size)
        j_local = halo.accumulate_apron(j_pad, axis, APRON_W)

        # ---- Yee update with curl halos -----------------------------------
        def curl_e_local(e):
            return fdtd.curl_e(halo.with_halo(e, axis, 1), base.cell_size)[1:-1]

        def curl_b_local(b):
            return fdtd.curl_b(halo.with_halo(b, axis, 1), base.cell_size)[1:-1]

        b_half = b_local - (0.5 * dt) * curl_e_local(e_local)
        e_new = e_local + dt * ((base.c ** 2) * curl_b_local(b_half)
                                - j_local / base.eps0)
        b_new = b_half - (0.5 * dt) * curl_e_local(e_new)

        # ---- migration ----------------------------------------------------
        # the x-axis is globally periodic through the ring: positions wrap
        # modulo nx and the wrapped particle migrates to the edge neighbor.
        gx = jnp.mod(x1[:, 0], nx)
        wrapped = [gx[:, None]]
        for a, n_a in enumerate(rest, start=1):
            wrapped.append(jnp.mod(x1[:, a:a + 1], n_a))  # other axes periodic
        x1 = jnp.concatenate(wrapped, axis=1)
        if config.n_shards > 1:
            go_left = jnp.logical_and(alive, _dist_left(gx, x_lo))
            go_right = jnp.logical_and(alive, _dist_right(gx, x_lo + slab))
            res = migration.migrate_ring(
                (x1, velocity), alive, go_left, go_right, axis,
                config.migration_buffer)
            x1, velocity = res.arrays
            alive = res.alive
            overflow = overflow + res.overflow
        # n_shards == 1: the slab IS the periodic domain — the ring-distance
        # predicates would flag every upper-half particle as a crosser

        x1 = jnp.where(alive[:, None], x1, 0.0)
        velocity = jnp.where(alive[:, None], velocity, 0.0)
        return x1, velocity, alive, e_new, b_new, overflow, max_disp

    fspec = P(axis, *([None] * ndim))  # (*grid, 3) arrays
    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), fspec, fspec,
                  P(axis), P(axis)),
        out_specs=(P(axis, None), P(axis, None), P(axis), fspec, fspec,
                   P(axis), P(axis)),
    )

    @jax.jit
    def step(state: ShardedEMState) -> ShardedEMState:
        pos, vel, alive, e, b, ov, md = mapped(
            state.position, state.velocity, state.alive,
            state.e, state.b, state.overflow, state.max_disp)
        return ShardedEMState(position=pos, velocity=vel, alive=alive,
                              e=e, b=b, overflow=ov, max_disp=md)

    return step


def make_sharded_sorted_step_fn(config: ShardedEMConfig, mesh: Mesh,
                                axis: str = "space"):
    """Sorted-layout composition: per-shard tile-sorted padded particles with
    digit-matmul gather/deposit (ops/sorted_deposit) inside the shard_map
    step.  The sorted ops run on a halo-padded local "pseudo-grid"
    (slab + 2*halo_w in x, tile-divisible); edge-tile windows read real
    neighbor data from the halo, and the deposition apron folds back with
    the same width.  Migrants written into dead slots by migrate_ring keep
    the slot's block tile_id, self-flag as out-of-window rows, and take the
    compacted exact patch until the next per-shard resort
    (make_sharded_resort_fn)."""
    from ..ops.interp import cic_gather_packed, spill_rows_cond
    from ..ops.sorted_deposit import (esirkepov_sorted_2d, esirkepov_sorted_3d,
                                      gather_sorted_2d, gather_sorted_3d)

    base = config.base
    tiling = config.tiling
    ndim = base.n_dim
    nx = base.grid_shape[0]
    rest = base.grid_shape[1:]
    slab = config.slab
    H = config.halo_w
    pseudo_shape = config.pseudo_shape
    capacity = config.spill_capacity
    dxv = jnp.asarray(base.cell_size, jnp.float32)
    dt = base.dt
    qm_half_dt = base.charge / base.mass * dt * 0.5
    e_off = fdtd.E_OFFSETS_2D if ndim == 2 else fdtd.E_OFFSETS_3D
    b_off = fdtd.B_OFFSETS_2D if ndim == 2 else fdtd.B_OFFSETS_3D
    rest_f = jnp.asarray(rest, jnp.float32)
    n_tiles_ps = int(np.prod(tiling.n_tiles(pseudo_shape)))
    use_repair = config.repair
    use_fused = config.gather_backend == "fused"
    if config.gather_backend not in ("xla", "fused"):
        raise ValueError(f"gather_backend {config.gather_backend!r} "
                         "(xla|fused)")
    interpret = jax.default_backend() != "tpu"
    pseudo_f = jnp.asarray(pseudo_shape, jnp.float32)

    def _dist_left(gx, x_lo):
        d = jnp.mod(x_lo - gx, nx)
        return jnp.logical_and(d > 0, d <= slab / 2)

    def _dist_right(gx, x_hi):
        d = jnp.mod(gx - x_hi, nx)
        return d < slab / 2

    def to_local(position, x_lo):
        """Global -> pseudo-grid coordinates.  The wrap window is centered
        on the SLAB: owned x and near-edge arrivals map into [H-eps,
        H+slab+eps) for any shard count (centering on x_lo instead sends
        gx > x_lo + nx/2 negative — fatal when slab > nx/2, e.g. the
        1-shard case, where every upper-half particle would leave the
        pseudo-grid)."""
        off = (nx - slab) / 2
        lx = jnp.mod(position[:, 0] - x_lo + off, nx) - off + H
        return jnp.concatenate([lx[:, None], position[:, 1:]], axis=1)

    def local_step(position, velocity, alive, tile_id, e_local, b_local,
                   overflow, spill, max_disp, *repair_state):
        shard = jax.lax.axis_index(axis)
        x_lo = (shard * slab).astype(jnp.float32)
        n_tot = position.shape[0]

        # ---- fields + sorted gather --------------------------------------
        e_pad = halo.with_halo(e_local, axis, H)
        b_pad = halo.with_halo(b_local, axis, H)
        table = fdtd.center_fields(e_pad, b_pad, e_off, b_off)
        lp0 = to_local(position, x_lo)
        # rows in surplus dead blocks (tile_id = n_tiles, e.g. migrants
        # dropped there) index a clamped window and can spuriously pass the
        # in-window test — force them onto the exact patch
        bad_block = tile_id >= n_tiles_ps
        charge = jnp.where(alive, jnp.float32(base.charge), 0.0)

        if use_fused:
            # ONE Mosaic kernel: gather + Boris + drift + Esirkepov on this
            # shard's pseudo-grid windows (same kernel as the single-chip
            # fused backend — ops/pallas_em.py in 2D, ops/pallas_em3d.py
            # in 3D; both share a signature)
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
            # re-push from the ORIGINAL rows: the kernel freezes ~in_win rows
            # but bad-block rows can come back garbage-pushed
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

            # ---- push ------------------------------------------------------
            velocity = boris_kick(velocity, eb[:, :3], eb[:, 3:], qm_half_dt,
                                  base.relativistic, base.c)
            velocity = jnp.where(alive[:, None], velocity, 0.0)
            if base.relativistic:
                gamma = jnp.sqrt(1.0 + jnp.sum((velocity / base.c) ** 2,
                                               axis=-1, keepdims=True))
                coord_v = velocity / gamma
            else:
                coord_v = velocity
            lp1 = lp0 + dt * coord_v[:, :ndim] / dxv  # unwrapped pseudo coords

            # ---- sorted Esirkepov deposit + compacted exact patch ----------
            # bad-block rows must not deposit through a clamped window
            # either — zero them in the sorted pass, exact-patch them below
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
        j_local = halo.accumulate_apron(j_pad, axis, H)

        # ---- Yee update with curl halos ----------------------------------
        def curl_e_local(e):
            return fdtd.curl_e(halo.with_halo(e, axis, 1), base.cell_size)[1:-1]

        def curl_b_local(b):
            return fdtd.curl_b(halo.with_halo(b, axis, 1), base.cell_size)[1:-1]

        b_half = b_local - (0.5 * dt) * curl_e_local(e_local)
        e_new = e_local + dt * ((base.c ** 2) * curl_b_local(b_half)
                                - j_local / base.eps0)
        b_new = b_half - (0.5 * dt) * curl_e_local(e_new)

        # ---- back to global + migration ----------------------------------
        gx = jnp.mod(lp1[:, 0] - H + x_lo, nx)
        ly1_w = jnp.mod(lp1[:, 1:], rest_f)
        x1 = jnp.concatenate([gx[:, None], ly1_w], axis=1)
        go_left = jnp.logical_and(alive, _dist_left(gx, x_lo))
        go_right = jnp.logical_and(alive, _dist_right(gx, x_lo + slab))
        if use_repair:
            from ..ops.repair import sharded_repair_migrate

            def arrival_tiles(arrs):
                from ..ops.sorted_deposit import tile_ids, tile_ids_3d

                loc = to_local(arrs[0], x_lo)
                tid_fn = tile_ids if ndim == 2 else tile_ids_3d
                return tid_fn(loc, pseudo_shape, tiling)

            fidx, fcnt, sidx, scnt, unpl = repair_state
            (x1, velocity, alive, fidx, fcnt, sidx, scnt, unpl,
             overflow) = sharded_repair_migrate(
                x1, velocity, alive, tile_id, d_idx, d_ok, lp1[:, 0], ly1_w,
                go_left, go_right, fidx, fcnt, sidx, scnt, unpl, overflow,
                arrival_tiles, axis=axis, n_shards=config.n_shards,
                migration_buffer=config.migration_buffer,
                pseudo_shape=pseudo_shape, tiling=tiling,
                n_tiles=n_tiles_ps, slab=slab, halo_w=H,
                in_win=jnp.logical_not(d_mask),
                eager_keep=config.repair_eager,
                eager_cap=config.eager_capacity or config.spill_capacity)
            repair_out = (fidx, fcnt, sidx, scnt, unpl)
        elif config.n_shards > 1:
            res = migration.migrate_ring(
                (x1, velocity), alive, go_left, go_right, axis,
                config.migration_buffer)
            x1, velocity = res.arrays
            alive = res.alive
            overflow = overflow + res.overflow
            repair_out = ()
        else:
            # n_shards == 1: no boundaries — skip migration entirely
            repair_out = ()
        spill = spill + n_spill.astype(jnp.int32)

        x1 = jnp.where(alive[:, None], x1, 0.0)
        velocity = jnp.where(alive[:, None], velocity, 0.0)
        return (x1, velocity, alive, tile_id, e_new, b_new, overflow, spill,
                max_disp, *repair_out)

    fspec = P(axis, *([None] * ndim))
    repair_spec = ((P(axis, None), P(axis), P(axis, None), P(axis), P(axis))
                   if use_repair else ())
    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(axis),
                  fspec, fspec, P(axis), P(axis), P(axis)) + repair_spec,
        out_specs=(P(axis, None), P(axis, None), P(axis), P(axis),
                   fspec, fspec, P(axis), P(axis), P(axis)) + repair_spec,
        # pallas_call outputs carry no varying-mesh-axes metadata; the fused
        # backend would trip shard_map's vma check
        check_vma=False,
    )

    @jax.jit
    def step(state: ShardedEMState) -> ShardedEMState:
        rep_in = ((state.free_idx, state.free_cnt, state.spare_idx,
                   state.spare_cnt, state.unplaced) if use_repair else ())
        out = mapped(state.position, state.velocity, state.alive,
                     state.tile_id, state.e, state.b, state.overflow,
                     state.spill, state.max_disp, *rep_in)
        pos, vel, alive, tid, e, b, ov, sp, md = out[:9]
        extra = {}
        if use_repair:
            fidx, fcnt, sidx, scnt, unpl = out[9:]
            extra = dict(free_idx=fidx, free_cnt=fcnt, spare_idx=sidx,
                         spare_cnt=scnt, unplaced=unpl)
        return state._replace(position=pos, velocity=vel, alive=alive,
                              e=e, b=b, overflow=ov, max_disp=md,
                              tile_id=tid, spill=sp, **extra)

    return step


def make_sharded_resort_fn(config: ShardedEMConfig, mesh: Mesh,
                           axis: str = "space"):
    """Per-shard local resort: rebuild the padded tile-sorted layout from the
    fixed-capacity slots (no communication — each shard sorts its own slots;
    dead/invalid rows sink to the trailing dead region and the output
    truncates back to cap_padded)."""
    from ..ops.sorted_deposit import build_padded_layout

    base = config.base
    tiling = config.tiling
    ndim = base.n_dim
    nx = base.grid_shape[0]
    slab = config.slab
    H = config.halo_w
    pseudo_shape = config.pseudo_shape
    cap_state = config.cap_padded

    def to_local(position, x_lo):
        # slab-centered wrap — see make_sharded_sorted_step_fn.to_local
        off = (nx - slab) / 2
        lx = jnp.mod(position[:, 0] - x_lo + off, nx) - off + H
        return jnp.concatenate([lx[:, None], position[:, 1:]], axis=1)

    def local_resort(position, velocity, alive, tile_id, overflow):
        shard = jax.lax.axis_index(axis)
        x_lo = (shard * slab).astype(jnp.float32)
        lp = to_local(position, x_lo)
        payloads = [position[:, a] for a in range(ndim)]
        payloads += [velocity[:, c] for c in range(3)]
        out = build_padded_layout(lp, pseudo_shape, tiling, *payloads,
                                  valid=alive, reserve=config.repair,
                                  derive_valid=True)
        tid_s = out[0]
        cols = out[2:2 + ndim]          # global position columns
        vels = out[2 + ndim:5 + ndim]
        alive_s = out[5 + ndim]
        # truncate back to the static slot count; count any real rows lost
        # (only possible when a shard holds > capacity live particles)
        lost = jnp.sum(alive_s[cap_state:])
        pos_out = jnp.stack([c[:cap_state] for c in cols], axis=-1)
        vel_out = jnp.stack([v[:cap_state] for v in vels], axis=-1)
        alive_out = alive_s[:cap_state]
        pos_out = jnp.where(alive_out[:, None], pos_out, 0.0)
        vel_out = jnp.where(alive_out[:, None], vel_out, 0.0)
        return (pos_out, vel_out, alive_out, tid_s[:cap_state],
                overflow + lost.astype(jnp.int32))

    fspec_in = (P(axis, None), P(axis, None), P(axis), P(axis), P(axis))
    mapped = shard_map(local_resort, mesh=mesh, in_specs=fspec_in,
                       out_specs=fspec_in)

    @jax.jit
    def resort(state: ShardedEMState) -> ShardedEMState:
        pos, vel, alive, tid, ov = mapped(
            state.position, state.velocity, state.alive, state.tile_id,
            state.overflow)
        return state._replace(position=pos, velocity=vel, alive=alive,
                              tile_id=tid, overflow=ov)

    return resort


def make_sharded_em_free_init_fn(config: ShardedEMConfig, mesh: Mesh,
                                 axis: str = "space"):
    """Per-shard free-stack (re)build for the repair composition
    (ops/repair.make_sharded_free_init — shared with the other sharded
    model)."""
    from ..ops.repair import make_sharded_free_init

    S = config.spare_slots or max(config.repair_free_slots,
                                  2 * config.migration_buffer)
    local_init = make_sharded_free_init(
        config.tiling, config.pseudo_shape, config.tiling.block,
        config.repair_free_slots, S)

    mapped = shard_map(
        local_init, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=(P(axis, None), P(axis), P(axis, None), P(axis)))

    @jax.jit
    def init(state: ShardedEMState) -> ShardedEMState:
        fidx, fcnt, sidx, scnt = mapped(state.tile_id, state.alive)
        return state._replace(
            free_idx=fidx, free_cnt=fcnt, spare_idx=sidx, spare_cnt=scnt,
            unplaced=(state.unplaced if state.unplaced is not None
                      else jnp.zeros((config.n_shards,), jnp.int32)))

    return init


class ShardedElectromagneticPIC:
    """Stateful shell; mirrors ElectromagneticPIC for the sharded layout."""

    def __init__(self, config: ShardedEMConfig, mesh: Mesh, position,
                 velocity, e=None, b=None, axis: str = "space"):
        self.config = config
        if config.repair_eager:
            if not config.repair:
                raise ValueError("repair_eager requires repair=True")
            if config.tiling is None or not (
                    0 < config.repair_eager <= config.tiling.margin):
                raise ValueError(
                    f"repair_eager={config.repair_eager} needs a tiling and "
                    f"must be in 1..margin")
        self.mesh = mesh
        self.sorted = config.tiling is not None
        shape = config.base.grid_shape
        ndim = config.base.n_dim
        dist_cfg = (dataclasses.replace(config, capacity=config.cap_padded)
                    if self.sorted else config)
        pos, vel, alive = distribute(dist_cfg,
                                     np.asarray(position, np.float32),
                                     np.asarray(velocity, np.float32))
        zero_f = np.zeros((*shape, 3), np.float32)
        spec2 = NamedSharding(mesh, P(axis, None))
        spec1 = NamedSharding(mesh, P(axis))
        spec_f = NamedSharding(mesh, P(axis, *([None] * ndim)))
        n_slots = pos.shape[0]
        self.state = ShardedEMState(
            position=jax.device_put(jnp.asarray(pos), spec2),
            velocity=jax.device_put(jnp.asarray(vel), spec2),
            alive=jax.device_put(jnp.asarray(alive), spec1),
            e=jax.device_put(jnp.asarray(e if e is not None else zero_f), spec_f),
            b=jax.device_put(jnp.asarray(b if b is not None else zero_f), spec_f),
            overflow=jax.device_put(
                jnp.zeros((config.n_shards,), jnp.int32), spec1),
            max_disp=jax.device_put(
                jnp.zeros((config.n_shards,), jnp.float32), spec1),
            tile_id=(jax.device_put(jnp.zeros((n_slots,), jnp.int32), spec1)
                     if self.sorted else None),
            spill=(jax.device_put(jnp.zeros((config.n_shards,), jnp.int32),
                                  spec1) if self.sorted else None),
        )
        if config.repair and not self.sorted:
            raise ValueError("repair=True needs the sorted composition")
        if self.sorted:
            self._resort = make_sharded_resort_fn(config, mesh, axis)
            self.state = self._resort(self.state)  # establish the layout
            if config.repair:
                self._free_init = make_sharded_em_free_init_fn(config, mesh,
                                                               axis)
                self.state = self._free_init(self.state)
                self._unplaced_seen = 0
                self._need_resort = False
            self._step = make_sharded_sorted_step_fn(config, mesh, axis)
            self._since_sort = 0
        else:
            self._step = make_sharded_step_fn(config, mesh, axis)

    def step(self, n: int = 1) -> None:
        from ..utils.stepping import (make_multi_step, make_window_step,
                                      pow2_chunk)

        if not hasattr(self, "_multi_cache"):
            self._multi_cache: dict = {}
        cadence = self.config.resort_every if self.sorted else 10 ** 9
        done = 0
        while done < n:
            if self.sorted and (
                    self._since_sort >= cadence
                    or getattr(self, "_need_resort", False)):
                self.state = self._resort(self.state)
                if self.config.repair:
                    self.state = self._free_init(self.state)
                    self._need_resort = False
                self._since_sort = 0
            since = self._since_sort if self.sorted else 0
            if (self.sorted and not self.config.repair and since == 0
                    and n - done >= cadence and cadence <= 128):
                # one dispatch per resort window (scan + resort in one jit —
                # utils/stepping.py: per-step dispatch is tunnel round-trip)
                key = ("w", cadence)
                if key not in self._multi_cache:
                    self._multi_cache[key] = make_window_step(
                        self._step, self._resort, cadence)
                self.state = self._multi_cache[key](self.state)
                done += cadence
                continue
            k = pow2_chunk(min(n - done, min(cadence - since, 32)))
            if k <= 1 or self.config.repair:
                # repair mode stays per-step: drain_check samples unplaced
                # deltas and the free stacks evolve inside the step itself
                self.state = self._step(self.state)
                k = 1
            else:
                if k not in self._multi_cache:
                    self._multi_cache[k] = make_multi_step(self._step, k)
                self.state = self._multi_cache[k](self.state)
            if self.sorted:
                self._since_sort += k
            done += k
        if self.config.repair:
            from ..ops.repair import drain_check

            self._need_resort, self._unplaced_seen, self._overflow_seen = \
                drain_check(self.state, self._unplaced_seen,
                            getattr(self, "_overflow_seen", 0),
                            self.config.spill_capacity,
                            self.config.capacity, n)
        if self.config.debug_checks:
            inv = self.check_invariants()
            if not inv["disp_bound_ok"]:
                raise RuntimeError(
                    f"migration invariant violated: max per-step displacement "
                    f"{inv['max_disp_cells']:.3f} cells >= bound "
                    f"{self.config.disp_bound:.3f} (slab={self.config.slab}, "
                    f"apron={APRON_W}) — particle ownership/apron folding is "
                    f"no longer guaranteed; reduce dt or use wider slabs")

    def check_invariants(self) -> dict[str, float]:
        """Migration/apron preconditions actually observed (VERDICT r1 weak
        #6 / r2 weak #5): per-step displacement must stay under
        ``config.disp_bound`` for the ring-migration predicates and the
        deposition apron fold to be exact."""
        md = float(jnp.max(self.state.max_disp))
        return {"max_disp_cells": md,
                "overflow": int(jnp.sum(self.state.overflow)),
                "disp_bound_ok": md < self.config.disp_bound}

    def gather_particles(self) -> tuple[np.ndarray, np.ndarray]:
        """All live particles (global order unspecified)."""
        alive = np.asarray(self.state.alive)
        return (np.asarray(self.state.position)[alive],
                np.asarray(self.state.velocity)[alive])
