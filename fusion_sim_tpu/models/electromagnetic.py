"""Electromagnetic particle-in-cell model (Yee FDTD + Esirkepov, 2D3V & 3D).

BASELINE.json configs[2-3]: the charge-conserving electromagnetic PIC loop,
fused into one jitted step:

    1. Boris velocity kick with E, B gathered at x^n (staggered CIC)
    2. drift x^n -> x^{n+1}
    3. Esirkepov current deposition from the motion (keeps Gauss's law)
    4. Yee field update: B half, E full (with J), B half

Units: natural (c = eps0 = mu0 = 1).  Fields live on the staggered Yee
lattice packed (*grid, 3); positions in grid units; velocities physical.
Non-relativistic Boris by default; ``relativistic=True`` switches the kick
to the gamma-corrected form.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fdtd
from ..ops.esirkepov import esirkepov_deposit_2d, esirkepov_deposit_3d
from ..ops.interp import cic_deposit
from ..ops.repair import repair_relocate as _repair_relocate


class EMState(NamedTuple):
    position: jax.Array   # (N, d) grid units
    velocity: jax.Array   # (N, 3) physical (c = 1)
    e: jax.Array          # (*grid, 3)
    b: jax.Array          # (*grid, 3)
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class EMConfig:
    grid_shape: tuple[int, ...]
    cell_size: tuple[float, ...]
    dt: float
    charge: float
    mass: float
    c: float = 1.0
    eps0: float = 1.0
    relativistic: bool = False
    # 'staggered': exact Yee-point gathers (6 gather rows/particle);
    # 'centered': fields averaged to nodes once per step, one 6-channel
    # gather row/particle (the uniform-centering fast variant).
    field_gather: str = "staggered"
    # Process particles in this many sequential chunks per step (lax.scan
    # with a current accumulator).  The packed gather/deposit intermediates
    # are O(N * stencil_channels); at 3e7+ particles in 3D they exceed HBM
    # unless chunked (e.g. chunks=8 at 3e7, 128^3).  1 = no chunking.
    particle_chunks: int = 1

    @property
    def n_dim(self) -> int:
        return len(self.grid_shape)

    @property
    def cell_volume(self) -> float:
        v = 1.0
        for d in self.cell_size:
            v *= d
        return v

    def __post_init__(self):
        # Courant condition for Yee + the Esirkepov < 1-cell-per-step support
        inv2 = sum(1.0 / d**2 for d in self.cell_size)
        courant = self.c * self.dt * np.sqrt(inv2)
        if courant >= 1.0:
            raise ValueError(f"Yee CFL violated: c*dt*sqrt(sum 1/dx^2) = {courant:.3f} >= 1")


def boris_kick(velocity: jax.Array, e: jax.Array, b: jax.Array,
               qm_half_dt: float, relativistic: bool, c: float) -> jax.Array:
    """Standard Boris rotation kick: half E, full B rotation, half E.

    This is the textbook form the reference's precomputed R/A matrices
    implement per grid cell (empic.js:506-659); here fields are per particle
    so the rotation is applied directly."""
    v_minus = velocity + qm_half_dt * e
    if relativistic:
        gamma = jnp.sqrt(1.0 + jnp.sum((v_minus / c) ** 2, axis=-1, keepdims=True))
        t = qm_half_dt * b / gamma
    else:
        t = qm_half_dt * b
    t2 = jnp.sum(t * t, axis=-1, keepdims=True)
    s = 2.0 * t / (1.0 + t2)
    v_prime = v_minus + jnp.cross(v_minus, t)
    v_plus = v_minus + jnp.cross(v_prime, s)
    return v_plus + qm_half_dt * e


def make_step_fn(config: EMConfig):
    shape = config.grid_shape
    dx = config.cell_size
    dxv = jnp.asarray(dx, jnp.float32)
    grid_f = jnp.asarray(shape, jnp.float32)
    qm_half_dt = config.charge / config.mass * config.dt * 0.5
    e_off = fdtd.E_OFFSETS_2D if config.n_dim == 2 else fdtd.E_OFFSETS_3D
    b_off = fdtd.B_OFFSETS_2D if config.n_dim == 2 else fdtd.B_OFFSETS_3D

    def push_and_deposit(e_field, b_field, position, velocity,
                         centered_table=None):
        """Gather -> kick -> drift -> deposit for one particle batch.

        ``centered_table`` lets the chunked path precompute the node-centered
        field table once per step instead of once per chunk."""
        if config.field_gather == "centered":
            from ..ops.interp import cic_gather_packed

            table = (centered_table if centered_table is not None
                     else fdtd.center_fields(e_field, b_field, e_off, b_off))
            eb = cic_gather_packed(table, position, shape)  # (N, 6)
            e_at_p, b_at_p = eb[:, :3], eb[:, 3:]
        else:
            e_at_p = fdtd.gather_staggered(e_field, position, e_off, shape)
            b_at_p = fdtd.gather_staggered(b_field, position, b_off, shape)
        velocity = boris_kick(velocity, e_at_p, b_at_p, qm_half_dt,
                              config.relativistic, config.c)

        if config.relativistic:
            # velocity stores the proper velocity u = gamma*v (the convention
            # boris_kick's gamma = sqrt(1 + |u/c|^2) implies); the coordinate
            # drift uses v = u/gamma, keeping |v| < c and the Esirkepov
            # <1-cell-per-step support intact
            gamma = jnp.sqrt(1.0 + jnp.sum((velocity / config.c) ** 2,
                                           axis=-1, keepdims=True))
            coord_v = velocity / gamma
        else:
            coord_v = velocity
        x1_unwrapped = position + config.dt * coord_v[:, : config.n_dim] / dxv
        x1 = jnp.mod(x1_unwrapped, grid_f)

        if config.n_dim == 2:
            j = esirkepov_deposit_2d(position, x1_unwrapped, coord_v[:, 2],
                                     config.charge, config.dt, shape, dx)
        else:
            j = esirkepov_deposit_3d(position, x1_unwrapped, config.charge,
                                     config.dt, shape, dx)
        return x1, velocity, j

    @jax.jit
    def step(state: EMState) -> EMState:
        chunks = config.particle_chunks
        if chunks <= 1:
            x1, velocity, j = push_and_deposit(state.e, state.b,
                                               state.position, state.velocity)
        else:
            n = state.position.shape[0]
            if n % chunks:
                raise ValueError(f"N={n} not divisible by particle_chunks={chunks}")
            pos_c = state.position.reshape(chunks, n // chunks, -1)
            vel_c = state.velocity.reshape(chunks, n // chunks, 3)
            table = (fdtd.center_fields(state.e, state.b, e_off, b_off)
                     if config.field_gather == "centered" else None)

            def body(j_acc, xs):
                p, v = xs
                x1_c, v_c, j_c = push_and_deposit(state.e, state.b, p, v,
                                                  centered_table=table)
                return j_acc + j_c, (x1_c, v_c)

            j0 = jnp.zeros((*shape, 3), jnp.float32)
            j, (x1_c, vel_out) = jax.lax.scan(body, j0, (pos_c, vel_c))
            x1 = x1_c.reshape(n, config.n_dim)
            velocity = vel_out.reshape(n, 3)

        b_half = fdtd.advance_b_half(state.b, state.e, config.dt, dx)
        e_new = fdtd.advance_e_full(state.e, b_half, j, config.dt, dx,
                                    c=config.c, eps0=config.eps0)
        b_new = fdtd.advance_b_half(b_half, e_new, config.dt, dx)
        return EMState(position=x1, velocity=velocity, e=e_new, b=b_new,
                       step=state.step + 1)

    return step


def make_multi_step_fn(config: EMConfig, n_steps: int):
    step = make_step_fn(config)

    @jax.jit
    def run(state: EMState) -> EMState:
        def body(s, _):
            return step(s), None
        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state

    return run


def charge_density(config: EMConfig, position: jax.Array) -> jax.Array:
    n = position.shape[0]
    w = jnp.full((n,), config.charge / config.cell_volume, jnp.float32)
    return cic_deposit(position, w, config.grid_shape)


def gauss_residual(config: EMConfig, state: EMState,
                   background_rho: jax.Array | None = None) -> jax.Array:
    """div_Yee E - rho/eps0 over the grid — stays at roundoff for all time
    with Esirkepov deposition (the point of charge conservation)."""
    e = state.e
    div = jnp.zeros(config.grid_shape, jnp.float32)
    for axis, d in enumerate(config.cell_size):
        comp = e[..., axis]
        div = div + (comp - jnp.roll(comp, 1, axis=axis)) / d
    rho = charge_density(config, state.position)
    if background_rho is not None:
        rho = rho + background_rho
    return div - rho / config.eps0


def field_energy(config: EMConfig, state: EMState) -> jax.Array:
    """(eps0/2)|E|^2 + |B|^2/(2 mu0), mu0 = 1/(eps0 c^2)."""
    mu0 = 1.0 / (config.eps0 * config.c**2)
    return (0.5 * config.eps0 * jnp.sum(state.e**2)
            + 0.5 / mu0 * jnp.sum(state.b**2)) * config.cell_volume


def kinetic_energy(config: EMConfig, state: EMState) -> jax.Array:
    if config.relativistic:
        # velocity stores proper velocity u = gamma*v; KE = m c^2 (gamma - 1)
        gamma = jnp.sqrt(1.0 + jnp.sum((state.velocity / config.c) ** 2, axis=-1))
        return config.mass * config.c**2 * jnp.sum(gamma - 1.0)
    return 0.5 * config.mass * jnp.sum(state.velocity**2)


class SortedEMState(NamedTuple):
    """Padded tile-sorted EM layout (fillers: valid=False, charge 0)."""

    position: jax.Array   # (Npad, 2)
    velocity: jax.Array   # (Npad, 3)
    tile_id: jax.Array
    valid: jax.Array
    e: jax.Array
    b: jax.Array
    step: jax.Array
    spill: jax.Array
    spill_dropped: jax.Array  # cumulative rows past spill_capacity (their
                              # deposits are lost even with the fallback on)
    # incremental layout repair (repair=True) only:
    free_idx: jax.Array | None = None  # (n_tiles, F) per-tile dead-slot stacks
    free_cnt: jax.Array | None = None  # (n_tiles,)
    unplaced: jax.Array | None = None  # cumulative spills left in place (no
                                       # free slot in their new tile yet)




class SortedElectromagneticPIC:
    """EM PIC (2D3V or 3D) with sorted digit-matmul Esirkepov deposition.

    Physics identical to ``ElectromagneticPIC(field_gather='centered')``;
    the current deposition runs via ops/sorted_deposit (windowed matmuls
    instead of the 27/81-channel scatter).  Same layout / resort contract
    as SortedElectrostaticPIC.
    """

    def __init__(self, config: EMConfig, position, velocity,
                 e=None, b=None, tiling=None, resort_every: int = 6,
                 check_spill: bool = True, spill_fallback: bool = True,
                 spill_capacity: int = 16384, gather_backend: str = "xla",
                 pallas_precision: str | None = None, repair: bool = False,
                 repair_free_slots: int = 256,
                 repair_eager: int = 0, eager_capacity: int | None = None):
        from ..ops.sorted_deposit import (Tiling2D, Tiling3D,
                                          build_padded_layout)

        # spill_fallback=True patches up to ``spill_capacity`` out-of-margin
        # rows per step with the exact deposit on compacted fixed-size
        # buffers (ops.interp.spill_rows_cond); False makes spilled rows
        # approximate — deposits dropped AND fields gathered from the
        # clamped sort window (warned via the spill counter).  Rows beyond
        # ``spill_capacity`` are unpatched either way and counted in
        # ``state.spill_dropped``.
        self.spill_fallback = spill_fallback
        self.spill_capacity = int(spill_capacity)
        # 'pallas' routes the 2D field gather through the Mosaic window
        # kernel (ops/pallas_gather.py); 'fused' runs the ENTIRE particle
        # substep — gather + Boris kick + drift + Esirkepov deposit — in one
        # Mosaic kernel (ops/pallas_em.py in 2D, ops/pallas_em3d.py in 3D).
        if gather_backend not in ("xla", "pallas", "fused"):
            raise ValueError(
                f"gather_backend {gather_backend!r} (xla|pallas|fused)")
        if gather_backend != "xla" and not spill_fallback:
            # the Mosaic kernels return garbage (not clamped values) for
            # out-of-window rows; the exact patch is what bounds them
            raise ValueError(
                f"gather_backend={gather_backend!r} requires spill_fallback")
        self.gather_backend = gather_backend
        # pallas_precision overrides the fused kernel's gather matmul
        # strategy: 'highest', 'exact_bf16' (3-term hi/lo bf16, ops/mxu.py),
        # 'exact_bf16_pack' (K-packed gather cross terms + M-packed
        # deposits in 2D; M-packed deposits in 3D), 'exact_bf16_pack2'
        # (K-packed deposits — 2D only, measured wash), or 'default'
        # (single-pass bf16).  None = 'highest' ('default' for bfloat16
        # tilings).
        if pallas_precision not in (None, "highest", "exact_bf16",
                                    "exact_bf16_pack", "exact_bf16_pack2",
                                    "default"):
            raise ValueError(f"pallas_precision {pallas_precision!r}")
        if pallas_precision == "exact_bf16_pack2" and config.n_dim != 2:
            raise ValueError("exact_bf16_pack2 is 2D-only")
        self.pallas_precision = pallas_precision
        # repair=True: spilled rows are RELOCATED each step into dead slots
        # of their new tile (ops/repair.py) instead of waiting for the full
        # resort — same contract as SortedElectrostaticPIC(repair=True);
        # kills the amortized multi-payload-sort cost of the resort cadence.
        if repair and not spill_fallback:
            raise ValueError("repair=True requires spill_fallback=True")
        self.repair = repair
        self.repair_free_slots = int(repair_free_slots)
        # repair_eager=k: also relocate rows within k cells of leaving their
        # window, carrying their own exact values (no patch) — see
        # SortedElectrostaticPIC(repair_eager) / ops/repair.near_band_mask
        self.repair_eager = int(repair_eager)
        self.eager_capacity = (int(spill_capacity) if eager_capacity is None
                               else int(eager_capacity))
        if self.repair_eager and self.eager_capacity <= 0:
            raise ValueError(f"eager_capacity={eager_capacity} must be > 0")
        self.config = config
        self.tiling = tiling or (Tiling2D() if config.n_dim == 2 else Tiling3D())
        if self.repair_eager:
            if not repair:
                raise ValueError("repair_eager requires repair=True")
            if not 0 < self.repair_eager <= self.tiling.margin:
                raise ValueError(
                    f"repair_eager={self.repair_eager} must be in "
                    f"1..margin ({self.tiling.margin})")
        self.resort_every = resort_every
        n = np.asarray(position).shape[0]
        if n % self.tiling.block:
            raise ValueError(f"particle count must be a multiple of "
                             f"{self.tiling.block}")
        self.n_real = n
        shape = config.grid_shape

        pos = jnp.asarray(position, jnp.float32).reshape(n, config.n_dim)
        vel = jnp.asarray(velocity, jnp.float32).reshape(n, 3)
        tid, pos_p, v0, v1, v2, valid_p, _ = build_padded_layout(
            pos, shape, self.tiling, vel[:, 0], vel[:, 1], vel[:, 2],
            reserve=repair, spread=repair, derive_valid=True)
        zero_f = jnp.zeros((*shape, 3), jnp.float32)
        self.state = SortedEMState(
            position=pos_p, velocity=jnp.stack([v0, v1, v2], axis=-1),
            tile_id=tid, valid=valid_p,
            e=zero_f if e is None else jnp.asarray(e, jnp.float32),
            b=zero_f if b is None else jnp.asarray(b, jnp.float32),
            step=jnp.int32(0), spill=jnp.int32(0),
            spill_dropped=jnp.int32(0))
        self._n_tiles = int(np.prod(self.tiling.n_tiles(shape)))
        if repair:
            self.state = self.state._replace(unplaced=jnp.int32(0))
            self._rebuild_free_list()
        self._step = (self._make_step_fused()
                      if gather_backend == "fused" else self._make_step())
        self._resort = self._make_resort()
        self._multi_cache: dict[int, object] = {}
        self._since_sort = 0
        self.check_spill = check_spill
        self._spill_seen = 0
        self._dropped_seen = 0
        self._unplaced_seen = 0
        self._need_resort = False

    def _rebuild_free_list(self):
        from ..ops.repair import init_free_list

        fidx, fcnt = init_free_list(self.state.tile_id, self.state.valid,
                                    self._n_tiles, self.tiling.block,
                                    self.repair_free_slots)
        self.state = self.state._replace(free_idx=fidx, free_cnt=fcnt)

    def _check_spill(self):
        # report the delta since the previous check, not the cumulative
        # counter (one spill event must not re-warn forever)
        spilled = int(self.state.spill) - self._spill_seen
        self._spill_seen += spilled
        dropped = int(self.state.spill_dropped) - self._dropped_seen
        self._dropped_seen += dropped
        if spilled or dropped:
            import warnings

            if not self.spill_fallback:
                msg = (f"{spilled} spilled rows are APPROXIMATE "
                       f"(spill_fallback=False: deposits dropped, fields "
                       f"gathered from the clamped window; charge "
                       f"conservation broken)")
            elif dropped:
                msg = (f"{dropped} spilled rows exceeded spill_capacity="
                       f"{self.spill_capacity} and were NOT patched (their "
                       f"deposits are lost; raise spill_capacity)")
            else:
                msg = (f"{spilled} particle-deposits took the slow exact "
                       f"fallback (out-drifted the sort margin)")
            warnings.warn(
                msg + f"; reduce resort_every (now {self.resort_every}) or "
                f"raise tiling.margin (now {self.tiling.margin})",
                RuntimeWarning, stacklevel=3)

    def _make_step_fused(self):
        """Step via the fused Mosaic substep (ops/pallas_em.py in 2D,
        ops/pallas_em3d.py in 3D): one kernel covers gather + kick + drift
        + Esirkepov; the Yee update and the compacted exact spill patch
        stay in XLA."""
        from ..ops.interp import cic_gather_packed, spill_rows_cond
        from ..ops.pallas_em import fused_em2d_substep
        from ..ops.pallas_em3d import fused_em3d_substep

        config = self.config
        tiling = self.tiling
        shape = config.grid_shape
        ndim = config.n_dim
        dxv = jnp.asarray(config.cell_size, jnp.float32)
        grid_f = jnp.asarray(shape, jnp.float32)
        qm_half_dt = config.charge / config.mass * config.dt * 0.5
        e_off = fdtd.E_OFFSETS_2D if ndim == 2 else fdtd.E_OFFSETS_3D
        b_off = fdtd.B_OFFSETS_2D if ndim == 2 else fdtd.B_OFFSETS_3D
        capacity = self.spill_capacity
        use_repair = self.repair
        eager_keep = self.repair_eager
        eager_cap = self.eager_capacity
        n_tiles = self._n_tiles
        interpret = jax.default_backend() != "tpu"

        @jax.jit
        def step(state: SortedEMState) -> SortedEMState:
            table = fdtd.center_fields(state.e, state.b, e_off, b_off)
            substep = fused_em2d_substep if ndim == 2 else fused_em3d_substep
            x1, velocity, j, in_win = substep(
                table, state.position, state.velocity, state.valid,
                state.tile_id, shape, tiling, qm_half_dt, config.dt,
                config.cell_size, config.charge, c_light=config.c,
                relativistic=config.relativistic,
                precision=self.pallas_precision or "highest",
                interpret=interpret)

            # exact re-push + deposit of out-of-window rows (compacted).
            # The K-row chain rides the same lax.cond as the compaction:
            # clean early-window steps skip the capacity-sized ops entirely
            # (VERDICT r3 #3b); branch outputs are lane-major (d, capacity).
            spill_mask = jnp.logical_and(jnp.logical_not(in_win), state.valid)
            spill = jnp.sum(spill_mask)
            idx, ok = spill_rows_cond(spill_mask, spill, capacity,
                                      x1.shape[0])

            def _patch_hot():
                x0_k = jnp.mod(state.position[idx], grid_f)
                eb_k = cic_gather_packed(table, x0_k, shape)
                vel_k = boris_kick(state.velocity[idx], eb_k[:, :3],
                                   eb_k[:, 3:], qm_half_dt,
                                   config.relativistic, config.c)
                if config.relativistic:
                    gamma_k = jnp.sqrt(1.0 + jnp.sum(
                        (vel_k / config.c) ** 2, axis=-1, keepdims=True))
                    cv_k = vel_k / gamma_k
                else:
                    cv_k = vel_k
                x1_k = x0_k + config.dt * cv_k[:, :ndim] / dxv
                q_k = jnp.where(ok, jnp.float32(config.charge), 0.0)
                if ndim == 2:
                    dj = esirkepov_deposit_2d(x0_k, x1_k, cv_k[:, 2], q_k,
                                              config.dt, shape,
                                              config.cell_size)
                else:
                    dj = esirkepov_deposit_3d(x0_k, x1_k, q_k, config.dt,
                                              shape, config.cell_size)
                return jnp.mod(x1_k, grid_f).T, vel_k.T, dj

            def _patch_cold():
                return (jnp.zeros((ndim, capacity), jnp.float32),
                        jnp.zeros((3, capacity), jnp.float32),
                        jnp.zeros((*shape, 3), jnp.float32))

            x1w_kT, vel_kT, dj = jax.lax.cond(spill > 0, _patch_hot,
                                              _patch_cold)
            x1w_k, vel_k = x1w_kT.T, vel_kT.T
            j = j + dj
            extra = {}
            valid = state.valid
            if use_repair:
                x1, velocity, valid, extra = _repair_relocate(
                    state, x1, velocity, idx, ok, x1w_k, vel_k,
                    shape, tiling, n_tiles, ndim,
                    in_win=~spill_mask, eager_keep=eager_keep,
                    eager_cap=eager_cap)
            else:
                x1 = x1.at[idx].set(x1w_k, mode="drop")
                velocity = velocity.at[idx].set(vel_k, mode="drop")

            # Yee update
            b_half = fdtd.advance_b_half(state.b, state.e, config.dt,
                                         config.cell_size)
            e_new = fdtd.advance_e_full(state.e, b_half, j, config.dt,
                                        config.cell_size, c=config.c,
                                        eps0=config.eps0)
            b_new = fdtd.advance_b_half(b_half, e_new, config.dt,
                                        config.cell_size)
            x1 = jnp.where(valid[:, None], x1, 0.0)
            velocity = jnp.where(valid[:, None], velocity, 0.0)
            dropped = jnp.maximum(spill.astype(jnp.int32) - capacity, 0)
            return state._replace(position=x1, velocity=velocity,
                                  e=e_new, b=b_new, step=state.step + 1,
                                  spill=state.spill + spill.astype(jnp.int32),
                                  spill_dropped=state.spill_dropped + dropped,
                                  **extra)

        return step

    def _make_step(self):
        from ..ops.interp import cic_gather_packed, spill_rows_cond
        from ..ops.sorted_deposit import (esirkepov_sorted_2d,
                                          esirkepov_sorted_3d,
                                          gather_sorted_2d, gather_sorted_3d)

        config = self.config
        tiling = self.tiling
        shape = config.grid_shape
        ndim = config.n_dim
        dxv = jnp.asarray(config.cell_size, jnp.float32)
        grid_f = jnp.asarray(shape, jnp.float32)
        qm_half_dt = config.charge / config.mass * config.dt * 0.5
        e_off = fdtd.E_OFFSETS_2D if ndim == 2 else fdtd.E_OFFSETS_3D
        b_off = fdtd.B_OFFSETS_2D if ndim == 2 else fdtd.B_OFFSETS_3D
        use_fallback = self.spill_fallback
        capacity = self.spill_capacity
        use_repair = self.repair
        eager_keep = self.repair_eager
        eager_cap = self.eager_capacity
        n_tiles = self._n_tiles
        use_pallas_gather = self.gather_backend == "pallas" and ndim == 2

        @jax.jit
        def step(state: SortedEMState) -> SortedEMState:
            table = fdtd.center_fields(state.e, state.b, e_off, b_off)
            # tile-window gather (MXU matmuls, no per-row latency); rows past
            # the sort margin get the exact packed gather via a compacted
            # fixed-capacity patch
            if use_pallas_gather:
                from ..ops.pallas_gather import gather_sorted_2d_pallas

                eb, g_inw = gather_sorted_2d_pallas(
                    table, state.position, state.tile_id, shape, tiling,
                    interpret=jax.default_backend() != "tpu")
            else:
                gather_fn = gather_sorted_2d if ndim == 2 else gather_sorted_3d
                eb, g_inw = gather_fn(table, state.position, state.tile_id,
                                      shape, tiling)
            if use_fallback:
                g_mask = (~g_inw) & state.valid
                g_idx, g_ok = spill_rows_cond(g_mask, jnp.sum(g_mask),
                                              capacity,
                                              state.position.shape[0])
                eb_k = cic_gather_packed(
                    table, jnp.mod(state.position[g_idx], grid_f), shape)
                eb = eb.at[g_idx].set(eb_k, mode="drop")
            velocity = boris_kick(state.velocity, eb[:, :3], eb[:, 3:],
                                  qm_half_dt, config.relativistic, config.c)
            velocity = jnp.where(state.valid[:, None], velocity, 0.0)
            if config.relativistic:
                # velocity stores proper velocity u = gamma*v (see make_step_fn)
                gamma = jnp.sqrt(1.0 + jnp.sum((velocity / config.c) ** 2,
                                               axis=-1, keepdims=True))
                coord_v = velocity / gamma
            else:
                coord_v = velocity
            x0 = state.position
            x1 = x0 + config.dt * coord_v[:, :ndim] / dxv  # unwrapped for deposit

            charge = jnp.where(state.valid, jnp.float32(config.charge), 0.0)
            if ndim == 2:
                j, spill, spill_mask = esirkepov_sorted_2d(
                    x0, x1, coord_v[:, 2], charge, state.tile_id, config.dt,
                    shape, config.cell_size, tiling)
            else:
                j, spill, spill_mask = esirkepov_sorted_3d(
                    x0, x1, charge, state.tile_id, config.dt,
                    shape, config.cell_size, tiling)

            if use_fallback:
                # exact patch for up to `capacity` margin out-drifters:
                # Esirkepov deposit on compacted (capacity,) buffers (charge
                # conservation holds while spill stays under capacity)
                idx, ok = spill_rows_cond(spill_mask, spill, capacity,
                                          x0.shape[0])
                q_k = jnp.where(ok, charge[idx], 0.0)
                if ndim == 2:
                    j = j + esirkepov_deposit_2d(
                        x0[idx], x1[idx], coord_v[idx, 2], q_k, config.dt,
                        shape, config.cell_size)
                else:
                    j = j + esirkepov_deposit_3d(
                        x0[idx], x1[idx], q_k, config.dt, shape,
                        config.cell_size)

            b_half = fdtd.advance_b_half(state.b, state.e, config.dt,
                                         config.cell_size)
            e_new = fdtd.advance_e_full(state.e, b_half, j, config.dt,
                                        config.cell_size, c=config.c,
                                        eps0=config.eps0)
            b_new = fdtd.advance_b_half(b_half, e_new, config.dt,
                                        config.cell_size)
            x1 = jnp.mod(x1, grid_f)
            extra = {}
            valid = state.valid
            if use_repair:
                # relocate margin out-drifters into dead slots of their new
                # tile (velocity was already exact-patched above; x1 is
                # exact for every row <= capacity)
                x1, velocity, valid, extra = _repair_relocate(
                    state, x1, velocity, idx, ok, x1[idx], velocity[idx],
                    shape, tiling, n_tiles, ndim,
                    in_win=~spill_mask, eager_keep=eager_keep,
                    eager_cap=eager_cap)
            x1 = jnp.where(valid[:, None], x1, 0.0)
            velocity = jnp.where(valid[:, None], velocity, 0.0)
            if use_fallback:
                dropped = jnp.maximum(spill.astype(jnp.int32) - capacity, 0)
            else:
                dropped = spill.astype(jnp.int32)
            return state._replace(position=x1, velocity=velocity,
                                  e=e_new, b=b_new, step=state.step + 1,
                                  spill=state.spill + spill.astype(jnp.int32),
                                  spill_dropped=state.spill_dropped + dropped,
                                  **extra)

        return step

    def _make_resort(self):
        from ..ops.sorted_deposit import build_padded_layout

        config = self.config
        tiling = self.tiling
        n_state = self.state.position.shape[0]
        reserve = self.repair

        @jax.jit
        def resort(state: SortedEMState) -> SortedEMState:
            # ONE sort: `valid` sinks filler rows to the trailing dead
            # region (the old compact-then-rebuild form paid two full
            # sorts); the truncation back to the state length drops only
            # dead rows (real count conserved — periodic, no sinks).
            # derive_valid recovers the flag from the sort key — one fewer
            # f32 operand through the 10M-row sort network.
            out = build_padded_layout(
                state.position, config.grid_shape, tiling,
                *[state.velocity[:, a] for a in range(3)],
                valid=state.valid,
                reserve=reserve, spread=reserve, derive_valid=True)
            tid, pos_p = out[0], out[1]
            v_cols = out[2:5]
            validp = out[5]
            return state._replace(
                position=pos_p[:n_state],
                velocity=jnp.stack([v[:n_state] for v in v_cols], axis=-1),
                tile_id=tid[:n_state], valid=validp[:n_state])

        return resort

    def step(self, n: int = 1) -> None:
        from ..utils.stepping import (make_multi_step, make_window_step,
                                      pow2_chunk)

        done = 0
        while done < n:
            if self._since_sort >= self.resort_every or self._need_resort:
                self.state = self._resort(self.state)
                if self.repair:
                    self._rebuild_free_list()
                self._since_sort = 0
                self._need_resort = False
            if (not self.repair and self._since_sort == 0
                    and n - done >= self.resort_every
                    and self.resort_every <= 128):
                # a full resort window in ONE dispatch (scan + resort)
                key = ("w", self.resort_every)
                if key not in self._multi_cache:
                    self._multi_cache[key] = make_window_step(
                        self._step, self._resort, self.resort_every)
                self.state = self._multi_cache[key](self.state)
                done += self.resort_every
                continue
            # one dispatch per resort window (see utils/stepping.py: a
            # per-step dispatch costs ~19 ms of tunnel round-trip)
            k = pow2_chunk(min(n - done, self.resort_every - self._since_sort))
            if k <= 1:
                self.state = self._step(self.state)
                k = 1
            else:
                if k not in self._multi_cache:
                    self._multi_cache[k] = make_multi_step(self._step, k)
                self.state = self._multi_cache[k](self.state)
            self._since_sort += k
            done += k
        if self.repair:
            # a small unplaced trickle is normal (a row whose target tile is
            # momentarily full stays exactly-patched and retries next step);
            # a large delta means stacks drained (net migration imbalance) —
            # schedule a full resort at the next step().  One host sync per
            # step() CALL, not per step.
            unplaced = int(self.state.unplaced)
            delta = unplaced - self._unplaced_seen
            self._unplaced_seen = unplaced
            # scale to whichever relocation buffer carries the flux —
            # eager configs intentionally shrink spill_capacity while the
            # equilibrium volume rides eager_capacity
            cap = max(self.spill_capacity,
                      self.eager_capacity if self.repair_eager else 0)
            if delta > max(64, min(cap, self.n_real) // 8) * max(1, n):
                self._need_resort = True
        if self.check_spill:
            self._check_spill()

    def energies(self) -> dict[str, float]:
        cfg = self.config
        mu0 = 1.0 / (cfg.eps0 * cfg.c ** 2)
        fe = float((0.5 * cfg.eps0 * jnp.sum(self.state.e ** 2)
                    + 0.5 / mu0 * jnp.sum(self.state.b ** 2)) * cfg.cell_volume)
        v = jnp.where(self.state.valid[:, None], self.state.velocity, 0.0)
        if cfg.relativistic:
            gamma = jnp.sqrt(1.0 + jnp.sum((v / cfg.c) ** 2, axis=-1))
            ke = float(cfg.mass * cfg.c ** 2
                       * jnp.sum(jnp.where(self.state.valid, gamma - 1.0, 0.0)))
        else:
            ke = 0.5 * cfg.mass * float(jnp.sum(v ** 2))
        return {"field": fe, "kinetic": ke, "total": fe + ke}


class ElectromagneticPIC:
    """Stateful shell over the functional EM PIC core."""

    def __init__(self, config: EMConfig, position, velocity,
                 e=None, b=None):
        self.config = config
        n = np.asarray(position).shape[0]
        shape = config.grid_shape
        self.state = EMState(
            position=jnp.asarray(position, jnp.float32).reshape(n, config.n_dim),
            velocity=jnp.asarray(velocity, jnp.float32).reshape(n, 3),
            e=(jnp.zeros((*shape, 3), jnp.float32) if e is None
               else jnp.asarray(e, jnp.float32)),
            b=(jnp.zeros((*shape, 3), jnp.float32) if b is None
               else jnp.asarray(b, jnp.float32)),
            step=jnp.int32(0),
        )
        self._step = make_step_fn(config)
        self._multi: dict[int, object] = {}

    def step(self, n: int = 1) -> None:
        if n == 1:
            self.state = self._step(self.state)
        else:
            if n not in self._multi:
                self._multi[n] = make_multi_step_fn(self.config, n)
            self.state = self._multi[n](self.state)

    def energies(self) -> dict[str, float]:
        fe = float(field_energy(self.config, self.state))
        ke = float(kinetic_energy(self.config, self.state))
        return {"field": fe, "kinetic": ke, "total": fe + ke}

    def get_state(self) -> dict[str, np.ndarray]:
        return {k: np.asarray(v) for k, v in self.state._asdict().items()}

    def set_state(self, blob: dict[str, np.ndarray]) -> None:
        self.state = EMState(**{k: jnp.asarray(v) for k, v in blob.items()})


def weibel(
    n_particles: int = 500_000,
    n_cells: int = 128,
    v0: float = 0.2,
    length: float = 32.0,
    noise: float = 1e-3,
    seed: int = 0,
    sorted_layout: bool = False,
) -> "ElectromagneticPIC | SortedElectromagneticPIC":
    """2D Weibel (filamentation) instability setup: two cold
    counter-streaming (out-of-plane) electron beams, omega_p = 1 / c = 1
    units; B-field energy grows at gamma ~ v0 * omega_p.  The standard EM
    PIC validation scenario (examples/weibel.py runs it end to end)."""
    d = length / n_cells
    vol = length * length
    config = EMConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                     dt=0.4 * d, charge=-vol / n_particles,
                     mass=vol / n_particles, field_gather="centered")
    rng = np.random.default_rng(seed)
    pos = rng.random((n_particles, 2)) * n_cells
    vel = np.zeros((n_particles, 3), np.float32)
    vel[: n_particles // 2, 2] = v0
    vel[n_particles // 2:, 2] = -v0
    vel[:, :2] = noise * rng.standard_normal((n_particles, 2))
    cls = SortedElectromagneticPIC if sorted_layout else ElectromagneticPIC
    return cls(config, pos, vel)
