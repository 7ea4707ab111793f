"""Electrostatic particle-in-cell model (periodic, 1D/2D/3D).

The self-consistent deposit -> field-solve -> gather -> push loop the
reference was evidently building toward but never wired (SURVEY.md §0: the
iterative solver exists but only feeds the dead spindle path; deposition is
rendering-only).  This model closes the loop the TPU-native way
(BASELINE.json configs[0-1]):

    rho  = CIC-deposit(q, x)              (ops/interp.cic_deposit)
    phi  = FFT Poisson solve              (ops/solvers.poisson_fft)
    E    = -grad(phi)                     (ops/solvers.gradient_periodic)
    v   += (q/m) E(x) dt                  (ops/interp.cic_gather)
    x   += v dt                           (periodic wrap)

Leapfrog time-staggering: velocities live at half-integer steps.  The whole
step is one jitted function (push+deposit+solve fused in a single XLA
computation — the BASELINE north-star structure), dimension-generic, with a
static neutralizing background (mean-rho subtraction).

Units: the model is unit-agnostic; the canonical setup (``two_stream``,
``landau`` factories) uses normalized plasma units where omega_p = 1,
eps0 = 1, m_e = 1, q_e = -1.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import cic_deposit_packed, cic_gather_packed
from ..ops.solvers import gradient_periodic, poisson_fft


class ESState(NamedTuple):
    """Particles at step n: position (N, d) in grid units, velocity (N, d)
    in physical units (grid-units/time via dx division happens in the push)."""

    position: jax.Array
    velocity: jax.Array
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class ESConfig:
    grid_shape: tuple[int, ...]     # cells per axis (periodic)
    cell_size: tuple[float, ...]    # dx per axis
    dt: float
    charge: float                   # per macro-particle
    mass: float                     # per macro-particle
    eps0: float = 1.0
    neutralizing_background: bool = True
    # 2D dense-DFT solve matmul strategy: 'highest' (Mosaic multi-pass
    # f32) or 'exact_bf16' (3-term hi/lo bf16 splits, ~2^-18 relative —
    # half the MXU passes; ops/solvers.poisson_dft2d)
    solver_precision: str = "highest"

    @property
    def n_dim(self) -> int:
        return len(self.grid_shape)

    @property
    def lengths(self) -> tuple[float, ...]:
        return tuple(n * d for n, d in zip(self.grid_shape, self.cell_size))

    @property
    def cell_volume(self) -> float:
        out = 1.0
        for d in self.cell_size:
            out *= d
        return out


def charge_density(config: ESConfig, position: jax.Array) -> jax.Array:
    """CIC charge density, optionally neutralized to zero mean.

    Follows ``position``'s dtype so float64 control runs (with
    jax_enable_x64) stay float64 end to end — see examples/drift_control.py.
    """
    n = position.shape[0]
    weights = jnp.full((n,), config.charge / config.cell_volume,
                       position.dtype)
    rho = cic_deposit_packed(position, weights, config.grid_shape)
    if config.neutralizing_background:
        rho = rho - jnp.mean(rho)
    return rho


def solve_fields(config: ESConfig, rho: jax.Array) -> tuple[jax.Array, jax.Array]:
    """phi and E = -grad(phi) on the grid; E has a trailing axis of size d.

    2D grids up to 2048^2 route through the dense-DFT matmul form
    (ops/solvers.poisson_dft2d) — XLA's emulated TPU FFT costs ~5 ms at
    512^2 where the MXU matmuls cost ~0.5 ms; identical spectral semantics
    (~1e-5 relative)."""
    if config.n_dim == 2 and max(config.grid_shape) <= 2048:
        from ..ops.solvers import poisson_dft2d
        phi = poisson_dft2d(rho, config.cell_size, eps0=config.eps0,
                            precision=config.solver_precision)
    else:
        phi = poisson_fft(rho, config.cell_size, eps0=config.eps0)
    grads = gradient_periodic(phi, config.cell_size)
    e = jnp.stack([-g for g in grads], axis=-1)
    return phi, e


def make_step_fn(config: ESConfig):
    """One fused leapfrog PIC step: deposit + solve + gather + push."""

    shape = config.grid_shape
    dx = jnp.asarray(config.cell_size, jnp.float32)
    grid_f = jnp.asarray(shape, jnp.float32)
    qm_dt = config.charge / config.mass * config.dt

    @jax.jit
    def step(state: ESState) -> ESState:
        rho = charge_density(config, state.position)
        _, e_grid = solve_fields(config, rho)
        e_at_p = cic_gather_packed(e_grid, state.position, shape)  # (N, d)
        velocity = state.velocity + qm_dt * e_at_p
        position = state.position + (config.dt * velocity) / dx
        position = jnp.mod(position, grid_f)
        return ESState(position=position, velocity=velocity, step=state.step + 1)

    return step


def make_multi_step_fn(config: ESConfig, n_steps: int):
    step = make_step_fn(config)

    @jax.jit
    def run(state: ESState) -> ESState:
        def body(s, _):
            return step(s), None
        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state

    return run


@functools.partial(jax.jit, static_argnums=(0,))
def energies(config: ESConfig, state: ESState) -> dict[str, jax.Array]:
    """Kinetic, field, and total energy (the BASELINE energy-drift metric)."""
    ke = 0.5 * config.mass * jnp.sum(state.velocity ** 2)
    rho = charge_density(config, state.position)
    _, e_grid = solve_fields(config, rho)
    fe = 0.5 * config.eps0 * jnp.sum(e_grid ** 2) * config.cell_volume
    return {"kinetic": ke, "field": fe, "total": ke + fe}


@functools.partial(jax.jit, static_argnums=(0,))
def momentum(config: ESConfig, state: ESState) -> jax.Array:
    return config.mass * jnp.sum(state.velocity, axis=0)


class ElectrostaticPIC:
    """Stateful shell over the functional core."""

    def __init__(self, config: ESConfig, position, velocity):
        self.config = config
        n = np.asarray(position).shape[0]
        self.state = ESState(
            position=jnp.asarray(position, jnp.float32).reshape(n, config.n_dim),
            velocity=jnp.asarray(velocity, jnp.float32).reshape(n, config.n_dim),
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
        return {k: float(v) for k, v in energies(self.config, self.state).items()}

    def fields(self) -> tuple[jax.Array, jax.Array]:
        rho = charge_density(self.config, self.state.position)
        return solve_fields(self.config, rho)

    def get_state(self) -> dict[str, np.ndarray]:
        return {k: np.asarray(v) for k, v in self.state._asdict().items()}

    def set_state(self, blob: dict[str, np.ndarray]) -> None:
        self.state = ESState(**{k: jnp.asarray(v) for k, v in blob.items()})


# ---------------------------------------------------------------------------
# Sorted-layout 2D variant: digit-matmul deposition (ops/sorted_deposit.py)
# ---------------------------------------------------------------------------

class SortedESState(NamedTuple):
    """Padded tile-sorted particle layout (fillers: valid=False, weight 0)."""

    position: jax.Array   # (Npad, 2) grid units
    velocity: jax.Array   # (Npad, 2)
    tile_id: jax.Array    # (Npad,) tile at last resort
    valid: jax.Array      # (Npad,) bool
    step: jax.Array
    spill: jax.Array      # cumulative out-of-margin rows (patched if
                          # spill_fallback, else dropped)
    spill_dropped: jax.Array  # cumulative rows past spill_capacity — these
                              # lose their deposit even with the fallback on
    rho: jax.Array | None = None  # pallas backend: charge at current positions
    # incremental layout repair (repair=True) only:
    free_idx: jax.Array | None = None  # (n_tiles, F) per-tile dead-slot stacks
    free_cnt: jax.Array | None = None  # (n_tiles,)
    unplaced: jax.Array | None = None  # cumulative spills left in place (no
                                       # free slot) — shell resorts when it grows


class SortedElectrostaticPIC:
    """ES PIC (2D or 3D) with the sorted digit-matmul deposition fast path.

    Physics identical to ``ElectrostaticPIC`` (same CIC/FFT/leapfrog, to
    bf16 deposit-weight rounding); deposition runs ~10x faster at 10M
    particles.  Particles live permanently in the padded tile-sorted layout
    of ops/sorted_deposit.build_padded_layout; the shell resorts every
    ``resort_every`` steps (size the cadence so drift stays under
    ``tiling.margin`` cells: margin / (v_max*dt/dx) steps), or repairs the
    layout incrementally every step with ``repair=True``.

    3D uses ``Tiling3D``; both backends work in 2D and 3D (XLA:
    deposit_sorted_3d / gather_sorted_3d; fused Pallas:
    ops/pallas_pic3d.py's flattened-lane window layout).
    """

    def __init__(self, config: ESConfig, position, velocity,
                 tiling=None, resort_every: int = 6,
                 check_spill: bool = True, spill_fallback: bool = True,
                 spill_capacity: int = 16384,
                 spill_tiers: tuple[int, ...] | None = None,
                 backend: str = "xla", repair: bool = False,
                 repair_free_slots: int = 256,
                 repair_eager: int = 0, eager_capacity: int | None = None,
                 pallas_precision: str | None = None):
        from ..ops.sorted_deposit import (Tiling2D, Tiling3D,
                                          build_padded_layout)

        if config.n_dim not in (2, 3):
            raise ValueError("sorted layout variant is 2D or 3D")
        if backend not in ("xla", "pallas"):
            raise ValueError(f"backend {backend!r} (xla|pallas)")
        self.backend = backend
        # spill_fallback=True patches up to ``spill_capacity`` out-of-margin
        # rows per step with the exact packed transfers on compacted
        # fixed-size buffers (ops.interp.spill_rows_cond); False makes
        # spilled rows fully approximate: their deposits are dropped AND
        # their gathered E comes from the clamped sort window instead of
        # their true cell (warned via the spill counter).  Rows beyond
        # ``spill_capacity`` are unpatched either way and counted in
        # ``state.spill_dropped``.
        self.spill_fallback = spill_fallback
        self.spill_capacity = int(spill_capacity)
        # spill_tiers: optional ascending intermediate patch capacities
        # below ``spill_capacity``.  The patch chain's cost scales with its
        # STATIC capacity (compaction gathers + packed transfers are
        # capacity-sized), while the spill sawtooth leaves most window
        # positions with only a handful of outlier spills — a `spill > 0`
        # cond alone almost never skips at 10M (measured: 58 spills on the
        # first post-resort step).  With tiers, each step runs exactly ONE
        # patch chain — the smallest tier whose capacity covers this step's
        # spill count — so early-window steps pay a ~1k-row chain instead
        # of the full one (measured ~9 ms -> ~1 ms at 10M / capacity
        # 16384).  Semantics are unchanged: every spilled row is patched
        # exactly; only the top tier (= spill_capacity) can drop.
        if spill_tiers is not None:
            ts = tuple(int(t) for t in spill_tiers)
            if list(ts) != sorted(set(ts)) or any(t <= 0 for t in ts) \
                    or (ts and ts[-1] >= self.spill_capacity):
                raise ValueError(
                    f"spill_tiers {spill_tiers!r} must be strictly "
                    f"ascending positives below spill_capacity "
                    f"{self.spill_capacity}")
            if repair and ts:
                raise ValueError("spill_tiers is incompatible with "
                                 "repair=True (the relocation chain is "
                                 "equilibrium-capacity-sized every step)")
            self.spill_tiers = ts
        else:
            self.spill_tiers = ()
        # repair=True: spilled rows are RELOCATED each step into dead slots
        # of their new tile (ops/repair.py) instead of waiting for the full
        # resort — the resort then runs only when a tile's free-slot stack
        # drains (state.unplaced grows), killing the ~95 ms/10M amortized
        # resort cost (VERDICT r2 next-step #1a).  Requires spill_fallback.
        if repair and not spill_fallback:
            raise ValueError("repair=True requires spill_fallback=True")
        self.repair = repair
        self.repair_free_slots = int(repair_free_slots)
        # repair_eager=k (1..margin): ALSO relocate rows that are within k
        # cells of leaving their window (ops/repair.near_band_mask) — their
        # kernel outputs are still exact, so the move is a payload copy
        # with no re-push patch, and true window exits (which DO need the
        # patch) drop to zero while per-step displacement stays < k cells.
        # ``eager_capacity`` sizes that relocation buffer (the equilibrium
        # band flux; defaults to spill_capacity).
        self.repair_eager = int(repair_eager)
        self.eager_capacity = (int(spill_capacity) if eager_capacity is None
                               else int(eager_capacity))
        if self.repair_eager and self.eager_capacity <= 0:
            raise ValueError(f"eager_capacity={eager_capacity} must be > 0")
        # pallas_precision overrides the fused kernel's matmul strategy:
        # 'highest' (Mosaic multi-pass f32), 'exact_bf16' (3-term hi/lo bf16,
        # ops/mxu.py), 'exact_bf16_pack' (same terms, gather cross terms
        # K-packed + deposit M-packed in 2D; deposit M-packed in 3D), or
        # 'default' (single-pass bf16).  None = follow tiling.dtype
        # ('default' for bfloat16 tilings, else 'highest').
        if pallas_precision not in (None, "highest", "exact_bf16",
                                    "exact_bf16_pack", "exact_bf16_pack2",
                                    "default"):
            raise ValueError(f"pallas_precision {pallas_precision!r}")
        if pallas_precision == "exact_bf16_pack2" and config.n_dim != 2:
            raise ValueError("exact_bf16_pack2 is 2D-only")
        self.pallas_precision = pallas_precision
        self.config = config
        self.tiling = tiling or (Tiling2D() if config.n_dim == 2
                                 else Tiling3D())
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

        ndim = config.n_dim
        pos = jnp.asarray(position, jnp.float32).reshape(n, ndim)
        vel = jnp.asarray(velocity, jnp.float32).reshape(n, ndim)
        valid = jnp.ones((n,), bool)
        del valid  # all input rows are real; derive_valid flags fillers
        out = build_padded_layout(
            pos, config.grid_shape, self.tiling,
            *[vel[:, a] for a in range(ndim)],
            reserve=repair, spread=repair, derive_valid=True)
        tid, pos_p = out[0], out[1]
        vel_cols = out[2:2 + ndim]
        valid_p = out[2 + ndim]
        self.state = SortedESState(
            position=pos_p,
            velocity=jnp.stack(vel_cols, axis=-1),
            tile_id=tid, valid=valid_p,
            step=jnp.int32(0), spill=jnp.int32(0),
            spill_dropped=jnp.int32(0))
        self._n_tiles = int(np.prod(self.tiling.n_tiles(config.grid_shape)))
        if repair:
            self.state = self.state._replace(unplaced=jnp.int32(0))
            self._rebuild_free_list()
        if backend == "pallas":
            self.state = self.state._replace(rho=self._initial_rho())
            self._step = self._make_step_pallas()
        else:
            self._step = self._make_step()
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
                       f"(spill_fallback=False: deposits dropped, E gathered "
                       f"from the clamped window; charge not conserved)")
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

    def _make_step(self):
        from ..ops.interp import cic_deposit_packed, spill_rows_cond
        from ..ops.sorted_deposit import (deposit_sorted_2d, deposit_sorted_3d,
                                          gather_sorted_2d, gather_sorted_3d)

        config = self.config
        tiling = self.tiling
        shape = config.grid_shape
        deposit_fn = deposit_sorted_2d if config.n_dim == 2 else deposit_sorted_3d
        gather_fn = gather_sorted_2d if config.n_dim == 2 else gather_sorted_3d
        dx = jnp.asarray(config.cell_size, jnp.float32)
        grid_f = jnp.asarray(shape, jnp.float32)
        qm_dt = config.charge / config.mass * config.dt
        w0 = config.charge / config.cell_volume
        use_fallback = self.spill_fallback
        use_repair = self.repair
        n_tiles = self._n_tiles
        capacity = self.spill_capacity
        eager_keep = self.repair_eager
        eager_cap = self.eager_capacity

        tier_caps = (*self.spill_tiers, capacity)

        @jax.jit
        def step(state: SortedESState) -> SortedESState:
            w = jnp.where(state.valid, jnp.float32(w0), 0.0)
            rho, spill, spill_mask = deposit_fn(
                state.position, w, state.tile_id, shape, tiling)
            n_total = state.position.shape[0]
            if use_fallback:
                # exact patch: past-the-margin rows deposit via the packed
                # scatter on compacted fixed-size buffers.  With
                # ``spill_tiers``, exactly one tier runs hot per step — the
                # smallest whose STATIC capacity covers this step's spill
                # count — so the common low-spill step pays a small chain
                # (see _make_step_pallas for the full rationale); inactive
                # tiers return sentinel indices and zero patches.
                idxs, hots = [], []
                for i, cap_i in enumerate(tier_caps):
                    lo = 0 if i == 0 else tier_caps[i - 1]
                    if i == len(tier_caps) - 1:
                        hot = spill > lo   # top tier also handles overflow
                    else:
                        hot = (spill > lo) & (spill <= cap_i)
                    idx, ok = spill_rows_cond(
                        spill_mask, jnp.where(hot, spill, 0), cap_i, n_total)

                    def _rho_hot(idx=idx, ok=ok):
                        return cic_deposit_packed(
                            jnp.mod(state.position[idx], grid_f),
                            jnp.where(ok, w[idx], 0.0), shape)

                    rho = rho + jax.lax.cond(
                        hot, _rho_hot,
                        lambda: jnp.zeros(shape, jnp.float32))
                    idxs.append(idx)
                    hots.append(hot)
            if config.neutralizing_background:
                # zero-mean over real charge (fillers carry none)
                rho = rho - jnp.sum(rho) / np.prod(shape)
            _, e_grid = solve_fields(config, rho)
            # tile-window gather (~5x the packed row gather's throughput);
            # gather and deposit share the window criterion at the same
            # positions, so the deposit's spill idx patches both
            e_at_p, _ = gather_fn(e_grid, state.position,
                                  state.tile_id, shape, tiling)
            if use_fallback:
                for idx_i, hot_i, cap_i in zip(idxs, hots, tier_caps):
                    def _e_hot(idx_i=idx_i):
                        return cic_gather_packed(
                            e_grid, jnp.mod(state.position[idx_i], grid_f),
                            shape).T

                    e_kT = jax.lax.cond(
                        hot_i, _e_hot,
                        lambda cap_i=cap_i: jnp.zeros(
                            (config.n_dim, cap_i), jnp.float32))
                    e_at_p = e_at_p.at[idx_i].set(e_kT.T, mode="drop")
                idx = jnp.concatenate(idxs) if len(idxs) > 1 else idxs[0]
                ok = idx < n_total
            velocity = state.velocity + qm_dt * e_at_p
            velocity = jnp.where(state.valid[:, None], velocity, 0.0)
            position = state.position + (config.dt * velocity) / dx
            position = jnp.mod(position, grid_f)
            if use_fallback:
                dropped = jnp.maximum(spill.astype(jnp.int32) - capacity, 0)
            else:
                dropped = spill.astype(jnp.int32)
            extra = {}
            if use_repair:
                from ..ops.repair import repair_relocate

                position, velocity, _, extra = repair_relocate(
                    state, position, velocity, idx, ok,
                    position[idx], velocity[idx], shape, tiling, n_tiles,
                    config.n_dim, in_win=~spill_mask,
                    eager_keep=eager_keep, eager_cap=eager_cap)
            return state._replace(position=position, velocity=velocity,
                                  step=state.step + 1,
                                  spill=state.spill + spill.astype(jnp.int32),
                                  spill_dropped=state.spill_dropped + dropped,
                                  **extra)

        return step

    def _initial_rho(self):
        """Deposit at the current (freshly sorted) positions — seeds the
        pallas backend's carried rho.

        Uses the packed scatter deposit: it is one-time (slow is fine) and,
        unlike the sorted einsum deposit, never tempts XLA into
        materializing the (nb, P, wy, wz) tent outer product (21.7 GB at
        3e7/128^3 — observed remat OOM)."""
        from ..ops.interp import cic_deposit_packed

        w = jnp.where(self.state.valid,
                      jnp.float32(self.config.charge / self.config.cell_volume),
                      0.0)
        pos = jnp.mod(self.state.position,
                      jnp.asarray(self.config.grid_shape, jnp.float32))
        return cic_deposit_packed(pos, w, self.config.grid_shape)

    def _make_step_pallas(self):
        """Fused-kernel step: solve E from the carried rho, then ONE Pallas
        kernel does gather + kick + drift + deposit (ops/pallas_pic.py in
        2D, ops/pallas_pic3d.py in 3D) — the BASELINE 'push+deposit+solve
        fused in one jit' shape."""
        from ..ops.pallas_pic import fused_es2d_substep
        from ..ops.pallas_pic3d import fused_es3d_substep

        config = self.config
        tiling = self.tiling
        shape = config.grid_shape
        grid_f = jnp.asarray(shape, jnp.float32)
        dx = jnp.asarray(config.cell_size, jnp.float32)
        qm_dt = float(config.charge / config.mass * config.dt)
        c_ax = tuple(float(config.dt / d) for d in config.cell_size)
        w0 = config.charge / config.cell_volume
        use_fallback = self.spill_fallback
        use_repair = self.repair
        n_tiles = self._n_tiles
        capacity = self.spill_capacity
        tier_caps = (*self.spill_tiers, capacity)
        eager_keep = self.repair_eager
        eager_cap = self.eager_capacity
        # Mosaic kernels need real TPU hardware; CPU (tests) interprets
        interpret = jax.default_backend() != "tpu"

        @jax.jit
        def step(state: SortedESState) -> SortedESState:
            from ..ops.interp import spill_rows_cond

            rho = state.rho
            if config.neutralizing_background:
                rho = rho - jnp.sum(rho) / np.prod(shape)
            _, e_grid = solve_fields(config, rho)
            w = jnp.where(state.valid, jnp.float32(w0), 0.0)
            precision = self.pallas_precision or (
                "default" if getattr(tiling, "dtype", "float32")
                == "bfloat16" else "highest")
            # out-of-window rows come back frozen (kernel-side select); the
            # exact patch below re-pushes up to `capacity` of them
            if config.n_dim == 2:
                pos, vel, rho_new, in_win = fused_es2d_substep(
                    e_grid, state.position, state.velocity, w, state.tile_id,
                    shape, tiling, qm_dt, c_ax[0], c_ax[1],
                    precision=precision, interpret=interpret)
            else:
                pos, vel, rho_new, in_win = fused_es3d_substep(
                    e_grid, state.position, state.velocity, w, state.tile_id,
                    shape, tiling, qm_dt, c_ax[0], c_ax[1], c_ax[2],
                    precision=precision, interpret=interpret)
            spill_mask = (~in_win) & state.valid
            spill = jnp.sum(spill_mask)
            if use_fallback:
                # compacted exact patch: the O(N) index compaction AND the
                # K-row gather/push/deposit chain run only on steps WITH
                # spill (lax.cond) — and, with ``spill_tiers``, at the
                # smallest STATIC capacity that covers this step's spill
                # count.  The spill sawtooth leaves most window positions
                # with only outlier spills (tens of rows at 10M), so the
                # common step pays a ~1k-row chain instead of the
                # capacity-sized one (VERDICT r3 #3b/r4).  Exactly one tier
                # runs hot per step (or none at spill == 0); inactive tiers
                # return sentinel indices and all-zero patches, so the
                # scatters/adds below are no-ops for them.  Branch outputs
                # are (d, cap) — lane-major, so the cond temporaries pad
                # sublanes 2->8, not lanes d->128 (PERFORMANCE.md "HBM
                # layout hazard").
                idxs, pos_ks, vel_ks = [], [], []
                for i, cap_i in enumerate(tier_caps):
                    lo = 0 if i == 0 else tier_caps[i - 1]
                    if i == len(tier_caps) - 1:
                        hot = spill > lo   # top tier also handles overflow
                    else:
                        hot = (spill > lo) & (spill <= cap_i)
                    idx, ok = spill_rows_cond(
                        spill_mask, jnp.where(hot, spill, 0), cap_i,
                        pos.shape[0])

                    def _patch_hot(idx=idx, ok=ok):
                        pos_k = jnp.mod(state.position[idx], grid_f)
                        e_k = cic_gather_packed(e_grid, pos_k, shape)
                        vel_k = state.velocity[idx] + qm_dt * e_k
                        pos_k = jnp.mod(pos_k + config.dt * vel_k / dx,
                                        grid_f)
                        drho = cic_deposit_packed(
                            pos_k, jnp.where(ok, w[idx], 0.0), shape)
                        return pos_k.T, vel_k.T, drho

                    def _patch_cold(cap_i=cap_i):
                        z = jnp.zeros((config.n_dim, cap_i), jnp.float32)
                        return z, z, jnp.zeros(shape, jnp.float32)

                    pos_kT, vel_kT, drho = jax.lax.cond(
                        hot, _patch_hot, _patch_cold)
                    rho_new = rho_new + drho
                    idxs.append(idx)
                    pos_ks.append(pos_kT.T)
                    vel_ks.append(vel_kT.T)
                idx = jnp.concatenate(idxs) if len(idxs) > 1 else idxs[0]
                pos_k = (jnp.concatenate(pos_ks) if len(pos_ks) > 1
                         else pos_ks[0])
                vel_k = (jnp.concatenate(vel_ks) if len(vel_ks) > 1
                         else vel_ks[0])
                if use_repair:
                    from ..ops.repair import repair_relocate

                    # spill rows get the recomputed exact patch values;
                    # band rows (eager) carry their own kernel outputs
                    # (repair is single-tier: tier_caps == (capacity,))
                    ok = idx < pos.shape[0]
                    pos, vel, _, extra = repair_relocate(
                        state, pos, vel, idx, ok, pos_k, vel_k,
                        shape, tiling, n_tiles, config.n_dim,
                        in_win=in_win, eager_keep=eager_keep,
                        eager_cap=eager_cap)
                else:
                    pos = pos.at[idx].set(pos_k, mode="drop")
                    vel = vel.at[idx].set(vel_k, mode="drop")
                    extra = {}
            else:
                extra = {}
            if use_fallback:
                dropped = jnp.maximum(spill.astype(jnp.int32) - capacity, 0)
            else:
                dropped = spill.astype(jnp.int32)
            return state._replace(position=pos, velocity=vel, rho=rho_new,
                                  step=state.step + 1,
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

        ndim = config.n_dim

        @jax.jit
        def resort(state: SortedESState) -> SortedESState:
            # ONE sort: build_padded_layout's `valid` mask sinks filler rows
            # to the trailing dead region directly (the old two-sort form —
            # compact then rebuild — doubled the dominant cost at 10M), and
            # derive_valid recovers the flag from the sort key instead of
            # dragging an f32 validity column through the sort network
            out = build_padded_layout(
                state.position, config.grid_shape, tiling,
                *[state.velocity[:, a] for a in range(ndim)],
                valid=state.valid,
                reserve=reserve, spread=reserve, derive_valid=True)
            tid, pos_p = out[0], out[1]
            v_cols = out[2:2 + ndim]
            validp = out[2 + ndim]
            # layout length is static: input N + n_tiles*block; the input
            # already carries n_tiles*block filler rows, all of which land
            # in the trailing dead region -> the truncation drops only dead
            # rows (real count is conserved in the periodic ES model)
            return SortedESState(
                position=pos_p[:n_state],
                velocity=jnp.stack([v[:n_state] for v in v_cols], axis=-1),
                tile_id=tid[:n_state], valid=validp[:n_state],
                step=state.step, spill=state.spill,
                spill_dropped=state.spill_dropped, rho=state.rho,
                free_idx=state.free_idx, free_cnt=state.free_cnt,
                unplaced=state.unplaced)

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
            # batch steps until the next resort into ONE dispatch (lax.scan
            # over the jitted step): per-step dispatch costs ~19 ms of host
            # round-trip on the tunneled backend — more than the fused step
            # itself (utils/stepping.py).  Power-of-two chunks bound the
            # number of compiled scan lengths.
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
        v = self.state.velocity
        ke = 0.5 * cfg.mass * float(jnp.sum(jnp.where(
            self.state.valid[:, None], v, 0.0) ** 2))
        from ..ops.interp import cic_deposit_packed
        from ..ops.sorted_deposit import deposit_sorted_2d, deposit_sorted_3d

        w = jnp.where(self.state.valid,
                      jnp.float32(cfg.charge / cfg.cell_volume), 0.0)
        deposit_fn = (deposit_sorted_2d if cfg.n_dim == 2
                      else deposit_sorted_3d)
        rho, spill, spill_mask = deposit_fn(
            self.state.position, w, self.state.tile_id,
            cfg.grid_shape, self.tiling)
        if self.spill_fallback and int(spill):
            # diagnostic consistency with the step's exact fallback (when the
            # step drops spill, the diagnostic must see the same rho)
            grid_f = jnp.asarray(cfg.grid_shape, jnp.float32)
            rho = rho + cic_deposit_packed(
                jnp.mod(self.state.position, grid_f),
                jnp.where(spill_mask, w, 0.0), cfg.grid_shape)
        if cfg.neutralizing_background:
            rho = rho - jnp.mean(rho)
        _, e_grid = solve_fields(cfg, rho)
        fe = 0.5 * cfg.eps0 * float(jnp.sum(e_grid ** 2)) * cfg.cell_volume
        return {"kinetic": ke, "field": fe, "total": ke + fe}


# ---------------------------------------------------------------------------
# Canonical validation scenarios (BASELINE configs[0-1])
# ---------------------------------------------------------------------------

def two_stream(
    n_particles: int = 100_000,
    n_cells: int = 512,
    v0: float = 0.2,
    perturbation: float = 1e-3,
    mode: int = 1,
    length: float | None = None,
    dt: float = 0.1,
    seed: int = 0,
) -> ElectrostaticPIC:
    """1D cold two-stream instability in normalized units (omega_p = 1 for
    the *total* electron population; each beam carries omega_b^2 = 1/2).

    Quiet start: particles evenly spaced, split into +/- v0 beams, with a
    sinusoidal position perturbation of the given ``mode`` seeded.
    """
    if length is None:
        # put the seeded mode near peak growth: k*v0 ~ sqrt(3)/2 * omega_b*sqrt(2)
        length = 2 * np.pi * mode * v0 / 0.6
    dx = length / n_cells
    # omega_p^2 = n q^2 / (eps0 m) = 1 with line density n = N/L
    q_over_m = -1.0
    n_density = n_particles / length
    charge = -1.0 / n_density        # q*n/(eps0) * (q/m) = -1 => omega_p = 1
    mass = charge * (1.0 / q_over_m)

    config = ESConfig(grid_shape=(n_cells,), cell_size=(dx,), dt=dt,
                      charge=charge, mass=mass)

    half = n_particles // 2
    x0 = (np.arange(half) + 0.5) / half * length
    x = np.concatenate([x0, x0])
    x = x + perturbation * length * np.sin(2 * np.pi * mode * x / length)
    v = np.concatenate([np.full(half, v0), np.full(half, -v0)])
    pos = (x / dx) % n_cells
    return ElectrostaticPIC(config, pos[:, None], v[:, None])


def landau(
    n_particles: int = 200_000,
    n_cells: int = 128,
    k_lambda_d: float = 0.5,
    v_thermal: float = 1.0,
    perturbation: float = 0.05,
    dt: float = 0.1,
    seed: int = 0,
) -> ElectrostaticPIC:
    """1D Landau damping setup: Maxwellian plasma with a density perturbation
    at k*lambda_D = ``k_lambda_d`` (normalized units, omega_p = 1,
    lambda_D = v_thermal)."""
    k = k_lambda_d / v_thermal
    length = 2 * np.pi / k
    dx = length / n_cells
    n_density = n_particles / length
    charge = -1.0 / n_density
    mass = -charge

    config = ESConfig(grid_shape=(n_cells,), cell_size=(dx,), dt=dt,
                      charge=charge, mass=mass)

    rng = np.random.default_rng(seed)
    # quiet start in x with the density perturbation imposed via inverse CDF
    u = (np.arange(n_particles) + 0.5) / n_particles
    x = u * length
    for _ in range(6):  # Newton iterations for x + (a/k) sin(kx) = u*L
        x = x - (x + perturbation / k * np.sin(k * x) - u * length) / (
            1 + perturbation * np.cos(k * x))
    v = rng.normal(0.0, v_thermal, n_particles)
    pos = (x / dx) % n_cells
    return ElectrostaticPIC(config, pos[:, None], v[:, None])
