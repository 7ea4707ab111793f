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


@dataclasses.dataclass(frozen=True)
class ShardedEMConfig:
    base: EMConfig
    n_shards: int
    capacity: int          # particle slots per shard
    migration_buffer: int  # max migrants per direction per step

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

    def local_step(position, velocity, alive, e_local, b_local, overflow):
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
        go_left = jnp.logical_and(alive, _dist_left(gx, x_lo))
        go_right = jnp.logical_and(alive, _dist_right(gx, x_lo + slab))
        res = migration.migrate_ring(
            (x1, velocity), alive, go_left, go_right, axis,
            config.migration_buffer)
        x1, velocity = res.arrays
        alive = res.alive
        overflow = overflow + res.overflow

        x1 = jnp.where(alive[:, None], x1, 0.0)
        velocity = jnp.where(alive[:, None], velocity, 0.0)
        return x1, velocity, alive, e_new, b_new, overflow

    fspec = P(axis, *([None] * ndim))  # (*grid, 3) arrays
    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), fspec, fspec, P(axis)),
        out_specs=(P(axis, None), P(axis, None), P(axis), fspec, fspec, P(axis)),
    )

    @jax.jit
    def step(state: ShardedEMState) -> ShardedEMState:
        pos, vel, alive, e, b, ov = mapped(
            state.position, state.velocity, state.alive,
            state.e, state.b, state.overflow)
        return ShardedEMState(position=pos, velocity=vel, alive=alive,
                              e=e, b=b, overflow=ov)

    return step


class ShardedElectromagneticPIC:
    """Stateful shell; mirrors ElectromagneticPIC for the sharded layout."""

    def __init__(self, config: ShardedEMConfig, mesh: Mesh, position,
                 velocity, e=None, b=None, axis: str = "space"):
        self.config = config
        self.mesh = mesh
        shape = config.base.grid_shape
        ndim = config.base.n_dim
        pos, vel, alive = distribute(config, np.asarray(position, np.float32),
                                     np.asarray(velocity, np.float32))
        zero_f = np.zeros((*shape, 3), np.float32)
        spec2 = NamedSharding(mesh, P(axis, None))
        spec1 = NamedSharding(mesh, P(axis))
        spec_f = NamedSharding(mesh, P(axis, *([None] * ndim)))
        self.state = ShardedEMState(
            position=jax.device_put(jnp.asarray(pos), spec2),
            velocity=jax.device_put(jnp.asarray(vel), spec2),
            alive=jax.device_put(jnp.asarray(alive), spec1),
            e=jax.device_put(jnp.asarray(e if e is not None else zero_f), spec_f),
            b=jax.device_put(jnp.asarray(b if b is not None else zero_f), spec_f),
            overflow=jax.device_put(
                jnp.zeros((config.n_shards,), jnp.int32), spec1),
        )
        self._step = make_sharded_step_fn(config, mesh, axis)

    def step(self, n: int = 1) -> None:
        for _ in range(n):
            self.state = self._step(self.state)

    def gather_particles(self) -> tuple[np.ndarray, np.ndarray]:
        """All live particles (global order unspecified)."""
        alive = np.asarray(self.state.alive)
        return (np.asarray(self.state.position)[alive],
                np.asarray(self.state.velocity)[alive])
