"""CylindricalParticlePusher — the flagship test-particle model.

TPU-native re-creation of ``makeCylindricalParticlePusher``
(empic.js:30-1529): a charged-particle pusher in a cylindrically symmetric
magnetized plasma with static imposed E/B fields, Monte-Carlo sink/respawn,
grid moment deposition, and density/|B| rendering.

Architecture (vs the reference's 20 fragment-shader passes over float
textures):

* state is a ``PusherState`` PyTree of SoA arrays — functional updates
  replace the reference's A/B texture ping-pong (empic.js:666-672);
* one jitted ``step`` fuses both leapfrog half-steps (the reference's 6
  passes, empic.js:1436-1469) into a single XLA computation;
* one jitted ``density`` fuses deposit -> normalize -> EMA -> render
  (the reference's 6 passes, empic.js:1471-1526) and returns the frame;
* field construction (``add_current_loop`` etc.) runs on device at config
  time, accumulating into the B grid exactly like the reference's additive
  blending (empic.js:1352-1411).

Units/normalization follow the reference exactly: positions are Cartesian
(x, y, z) scaled per-axis by (1/radius, 1/radius, 1/height); velocities are
in units of c with the same per-axis scaling; h = q*dt/(2m)
(empic.js:44-46, 1202-1204).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Optional as OptionalSpec, validate_object
from ..constants import SPEED_OF_LIGHT
from ..ops import fields as field_ops
from ..ops.boris import BorisCoefficients, precompute_rotation, push_velocity
from ..ops.deposit import deposit_moments, ema_moments, normalize_moments
from ..ops.push import push_position
from ..ops.rng import substep_uniforms
from ..ops.sampling import build_inverse_cdf_table
from ..utils.render import render_bmag, render_density_overlay

SPEC_SCHEMA = {
    # Mirrors the validated spec of empic.js:31-41.
    "radius": "number",   # meters
    "height": "number",   # meters
    "nr": "number",
    "nz": "number",
    "dt": "number",       # seconds
    "nparticles": "number",  # particle count is nparticles^2 (empic.js:107)
    "particle_mass": "number",    # kg
    "particle_charge": "number",  # C
    # extension beyond the reference spec: coefficient sampling mode
    "interp": OptionalSpec("string"),  # 'nearest' (parity) | 'bilinear'
}


class PusherState(NamedTuple):
    """Dynamic (per-step) simulation state — a PyTree of device arrays."""

    position: jax.Array      # (N, 3) normalized Cartesian; empic.js:1202-1204
    velocity: jax.Array      # (N, 3) normalized (units of c, per-axis scaled)
    alive: jax.Array         # (N,) the position.w flag (empic.js:719)
    key: jax.Array           # PRNG key (replaces rand_A/rand_B textures)
    moments_avg: jax.Array   # (nr, nz, 4) EMA of normalized moments


class FieldState(NamedTuple):
    """Field-configuration state, changed only by setup APIs."""

    e: jax.Array             # (nr, nz, 3) V/m
    b: jax.Array             # (nr, nz, 3) T, components (B_r, B_theta, B_z)
    coeffs: BorisCoefficients
    sink_mask: jax.Array     # (nr, nz) 1 = keep, 0 = absorb
    inv_cdf: jax.Array       # (512, 512, 2) respawn sampler table


@dataclasses.dataclass(frozen=True)
class PusherSpec:
    """Static configuration (hashable, closed over by the jitted step)."""

    radius: float
    height: float
    nr: int
    nz: int
    dt: float
    nparticles: int          # per-side; total count is nparticles**2
    particle_mass: float
    particle_charge: float
    interp: str = "nearest"  # field sampling; 'nearest' is reference parity

    @property
    def n_total(self) -> int:
        return self.nparticles * self.nparticles

    @property
    def h(self) -> float:
        return self.particle_charge * self.dt / (2.0 * self.particle_mass)

    @property
    def factor_r(self) -> float:
        return 1.0 / self.radius

    @property
    def factor_z(self) -> float:
        return 1.0 / self.height

    @property
    def step_factor(self) -> float:
        return self.dt * SPEED_OF_LIGHT


def _substep(spec: PusherSpec, fields: FieldState, state: PusherState) -> PusherState:
    """One leapfrog half-step: rand -> velocity -> position.

    Mirrors one A->B (or B->A) pass triple of empic.js:1436-1469; the fresh
    uniforms play the role of the rand texture consumed by both the velocity
    pass (thermal re-init, empic.js:771-772) and the position pass (respawn
    location, empic.js:714-717).
    """
    rand, key = substep_uniforms(state.key, spec.n_total)
    velocity = push_velocity(state.position, state.velocity, state.alive, rand,
                             fields.coeffs, interp=spec.interp)
    position, alive = push_position(
        state.position, velocity, rand, fields.sink_mask, fields.inv_cdf, spec.step_factor
    )
    return state._replace(position=position, velocity=velocity, alive=alive, key=key)


def make_step_fn(spec: PusherSpec):
    """Build the jitted full step (two half-steps, empic.js:1436-1469)."""

    @jax.jit
    def step(fields: FieldState, state: PusherState) -> PusherState:
        state = _substep(spec, fields, state)
        state = _substep(spec, fields, state)
        return state

    return step


def make_multi_step_fn(spec: PusherSpec, n_steps: int):
    """A jitted ``lax.scan`` over ``n_steps`` full steps — the hot-loop form
    used by benchmarks and headless runs (no host round-trip per frame)."""

    @jax.jit
    def run(fields: FieldState, state: PusherState) -> PusherState:
        def body(s, _):
            s = _substep(spec, fields, s)
            s = _substep(spec, fields, s)
            return s, None

        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state

    return run


def make_density_fn(spec: PusherSpec):
    """Build the jitted density/render pass (empic.js:1471-1526).

    Returns ``(new_state, frame)`` where frame is the (nr, nz, 3) float RGB
    canvas (|B| background + density overlay).
    """

    @jax.jit
    def density(fields: FieldState, state: PusherState):
        moments = deposit_moments(state.position, state.velocity, spec.nr, spec.nz)
        norm = normalize_moments(moments)
        avg = ema_moments(norm, state.moments_avg)
        background = render_bmag(fields.b)
        frame = render_density_overlay(background, avg)
        return state._replace(moments_avg=avg), frame

    return density


class CylindricalParticlePusher:
    """Stateful shell with the reference's API surface.

    Mirrors the object returned by ``makeCylindricalParticlePusher``
    (empic.js:30-1529): ``set``, ``add_current_loop``, ``add_current_z``,
    ``add_bz``, ``add_btheta``, ``add_spindle_cusp_plasma_field``,
    ``precalc``, ``step``, ``density`` — plus symmetric ``get_state`` /
    ``set_state`` (the checkpoint upgrade mandated by SURVEY.md §5).
    """

    def __init__(self, spec: dict[str, Any] | PusherSpec, *, seed: int = 0,
                 loop_field_mode: str = "table"):
        if isinstance(spec, dict):
            validate_object(spec, SPEC_SCHEMA)
            spec = PusherSpec(
                radius=float(spec["radius"]), height=float(spec["height"]),
                nr=int(spec["nr"]), nz=int(spec["nz"]), dt=float(spec["dt"]),
                nparticles=int(spec["nparticles"]),
                particle_mass=float(spec["particle_mass"]),
                particle_charge=float(spec["particle_charge"]),
                interp=str(spec.get("interp", "nearest")),
            )
        self.spec = spec
        self.loop_field_mode = loop_field_mode
        nr, nz, n = spec.nr, spec.nz, spec.n_total

        # Shape tables precomputed eagerly, like empic.js:333-345.
        if loop_field_mode == "table":
            self._loop_half, self._loop_tenth = field_ops.make_loop_tables(nr, nz)
        else:
            self._loop_half = self._loop_tenth = None

        zeros_field = jnp.zeros((nr, nz, 3), dtype=jnp.float32)
        self.fields = FieldState(
            e=zeros_field,
            b=zeros_field,
            coeffs=precompute_rotation(zeros_field, zeros_field, spec.h,
                                       spec.factor_r, spec.factor_z),
            sink_mask=jnp.ones((nr, nz), dtype=jnp.float32),
            inv_cdf=jnp.zeros((512, 512, 2), dtype=jnp.float32),
        )
        self.state = PusherState(
            position=jnp.zeros((n, 3), dtype=jnp.float32),
            velocity=jnp.zeros((n, 3), dtype=jnp.float32),
            alive=jnp.ones((n,), dtype=jnp.float32),
            key=jax.random.key(seed),
            moments_avg=jnp.zeros((nr, nz, 4), dtype=jnp.float32),
        )
        self._step = make_step_fn(spec)
        self._density = make_density_fn(spec)
        self._multi: dict[int, object] = {}
        # Field sources recorded for the analytic fast path (ops/analytic.py)
        self._sources: list[tuple] = []
        self._fast_scenario = None
        self._fast_multi: dict[int, object] = {}

    # ------------------------------------------------------------------ setup
    def set(self, value: dict[str, Any]) -> None:
        """Upload state — parity with ``out.set`` (empic.js:1157-1350).

        Accepts any of: ``E``/``B`` (nr, nz, 3) physical fields; ``position``
        (N, 3) meters; ``velocity`` (N, 3) units of c; ``sink_mask``
        (nr, nz); ``source_pdf`` (nr, nz).  Positions/velocities are scaled
        per-axis like empic.js:1202-1231.
        """
        spec = self.spec
        scale = jnp.array([spec.factor_r, spec.factor_r, spec.factor_z], jnp.float32)
        if "E" in value:
            e = jnp.asarray(value["E"], dtype=jnp.float32).reshape(spec.nr, spec.nz, 3)
            self.fields = self.fields._replace(e=e)
            # grid E is not an analytic source; recorded so enable_fast_path
            # can refuse instead of silently dropping it
            self._sources.append(("grid_e",))
        if "B" in value:
            b = jnp.asarray(value["B"], dtype=jnp.float32).reshape(spec.nr, spec.nz, 3)
            self.fields = self.fields._replace(b=b)
            # grid B replaces any recorded analytic sources; marked so
            # enable_fast_path refuses instead of silently reconstructing B
            # from the recorded analytic sources alone
            self._sources.append(("grid_b",))
        if "position" in value:
            pos = jnp.asarray(value["position"], dtype=jnp.float32).reshape(spec.n_total, 3)
            self.state = self.state._replace(
                position=pos * scale,
                alive=jnp.ones((spec.n_total,), dtype=jnp.float32),
            )
        if "velocity" in value:
            vel = jnp.asarray(value["velocity"], dtype=jnp.float32).reshape(spec.n_total, 3)
            self.state = self.state._replace(velocity=vel * scale)
        if "sink_mask" in value:
            mask = jnp.asarray(value["sink_mask"], dtype=jnp.float32).reshape(spec.nr, spec.nz)
            self.fields = self.fields._replace(sink_mask=mask)
        if "source_pdf" in value:
            pdf = jnp.asarray(value["source_pdf"], dtype=jnp.float32).reshape(spec.nr, spec.nz)
            self.fields = self.fields._replace(inv_cdf=build_inverse_cdf_table(pdf))

    def add_current_loop(self, r: float, z: float, current: float) -> None:
        """Accumulate a current loop's B (empic.js:1352-1363).

        ``mode='table'`` replicates the two-table shader lookup;
        ``mode='exact'`` uses the elliptic-integral closed form on physical
        coordinates.
        """
        spec = self.spec
        if self.loop_field_mode == "table":
            delta = field_ops.current_loop_b_table(
                self._loop_half, self._loop_tenth,
                jnp.float32(r * spec.factor_r), jnp.float32(z * spec.factor_z),
                jnp.float32(current),
            )
        else:
            u, v = field_ops.grid_coords(spec.nr, spec.nz)
            r_phys = u * spec.radius
            z_phys = v * spec.height
            delta = field_ops.current_loop_b_exact(
                jnp.broadcast_to(r_phys, (spec.nr, spec.nz)),
                jnp.broadcast_to(z_phys, (spec.nr, spec.nz)),
                jnp.float32(r), jnp.float32(z), jnp.float32(current),
            )
        self.fields = self.fields._replace(b=self.fields.b + delta)
        self._sources.append(("loop", float(r), float(z), float(current)))

    def add_current_z(self, current: float) -> None:
        """Axial line current (empic.js:1380-1389)."""
        delta = field_ops.line_current_b(self.spec.nr, self.spec.nz, jnp.float32(current))
        self.fields = self.fields._replace(b=self.fields.b + delta)
        self._sources.append(("line", float(current)))

    def add_bz(self, bz: float) -> None:
        """Uniform B_z (empic.js:1391-1400)."""
        delta = field_ops.uniform_bz(self.spec.nr, self.spec.nz, bz)
        self.fields = self.fields._replace(b=self.fields.b + delta)
        self._sources.append(("bz", float(bz)))

    def add_btheta(self, btheta: float) -> None:
        """Uniform B_theta (empic.js:1402-1411)."""
        delta = field_ops.uniform_btheta(self.spec.nr, self.spec.nz, btheta)
        self.fields = self.fields._replace(b=self.fields.b + delta)
        self._sources.append(("btheta", float(btheta)))

    def add_spindle_cusp_plasma_field(self, coil_current: float, n_power: int = 3) -> None:
        """Spindle-cusp conductor boundary solve (empic.js:1369-1378).

        Completed per the reference's evident intent (its spindle.js is
        broken/dead — SURVEY.md §2.4); delegates to the BEM model and
        accumulates the resulting surface-current field into B.
        """
        from .spindle import spindle_cusp_field  # local import: optional path

        delta = spindle_cusp_field(
            radius=self.spec.radius, height=self.spec.height,
            nr=self.spec.nr, nz=self.spec.nz,
            coil_current=coil_current, n_power=n_power,
        )
        self.fields = self.fields._replace(b=self.fields.b + delta)
        self._sources.append(("spindle",))  # grid-only: blocks the fast path

    # ------------------------------------------------------------- fast path
    def enable_fast_path(self, sink_box=None, source_box=None,
                         uniform_e=(0.0, 0.0, 0.0),
                         rng_impl: str = "rbg") -> None:
        """Switch stepping to the analytic gather-free fast path
        (ops/analytic.py): fields are recomputed per particle from the
        recorded sources instead of gathered from the grid — measured >1e9
        pushes/s/chip vs a few 1e7 in grid mode.

        ``sink_box`` = (r_max, z_min, z_max) and ``source_box`` =
        (r_lo, r_hi, z_lo, z_hi) in meters; defaults reproduce the default
        scenario's wall sinks and source box (fusionsim.js:94-122).
        ``rng_impl='rbg'`` uses the TPU-native counter RNG (deterministic;
        distributionally equivalent to threefry for this MC use).
        """
        from ..ops.analytic import AnalyticScenario

        spec = self.spec
        loops = tuple((s[1], s[2], s[3]) for s in self._sources if s[0] == "loop")
        bz = sum(s[1] for s in self._sources if s[0] == "bz")
        btheta = sum(s[1] for s in self._sources if s[0] == "btheta")
        line = sum(s[1] for s in self._sources if s[0] == "line")
        if any(s[0] == "grid_e" for s in self._sources) and not any(uniform_e):
            raise ValueError(
                "a grid E field was set; the fast path cannot sample it — "
                "pass uniform_e=(Er, Etheta, Ez) if the field is uniform, or "
                "stay in grid mode")
        if any(s[0] == "grid_b" for s in self._sources):
            raise ValueError(
                "a grid B field was set via set({'B': ...}); the fast path "
                "recomputes B analytically from recorded sources and would "
                "silently drop it — stay in grid mode")
        if any(s[0] not in ("loop", "bz", "btheta", "line", "grid_e")
               for s in self._sources):
            raise ValueError("fast path supports analytic sources only")
        if sink_box is None:
            sink_box = ((spec.nr - 1) / spec.nr * spec.radius,
                        spec.height / spec.nz,
                        (spec.nz - 1) / spec.nz * spec.height)
        if source_box is None:
            source_box = (0.0, spec.radius / 8,
                          7 * spec.height / 16, 9 * spec.height / 16)
        self._fast_scenario = AnalyticScenario(
            loops=loops, bz=bz, btheta=btheta, line_current=line,
            uniform_e=tuple(float(v) for v in uniform_e),
            sink_box=tuple(float(v) for v in sink_box),
            source_box=tuple(float(v) for v in source_box),
            # default grid mask keeps the on-axis column at the z walls
            # (fusionsim.js:104-112: z-wall rows run r-cells 1..nr-2)
            axis_keep_r=spec.radius / spec.nr)
        self._fast_multi = {}
        if rng_impl:
            self.state = self.state._replace(
                key=jax.random.key(0, impl=rng_impl))

    def disable_fast_path(self) -> None:
        self._fast_scenario = None

    # -------------------------------------------------------- sorted fast path
    def enable_sorted_path(self, tiling=None, resort_every: int = 8,
                           spill_capacity: int | None = None,
                           backend: str = "xla",
                           rng_impl: str | None = None,
                           repair: bool = False,
                           repair_free_slots: int = 256,
                           respawn_capacity: int | None = None,
                           spill_tiers: tuple[int, ...] = ()) -> None:
        """Switch grid-parity stepping to the tile-sorted windowed-gather
        layout (models/pusher_sorted.py): the reference's per-particle
        texture fetches (empic.js:749-773, :712-720) become MXU window
        matmuls.  Identical per-particle math; particle ORDER is not
        preserved.  ``backend='pallas'`` uses the fused Pallas gather
        kernel on TPU.

        ``spill_capacity=None`` auto-sizes the per-substep exact-patch
        buffer to the LATE-WINDOW PEAK flux, not the mean: out-of-window
        flux through a resort window is a sawtooth — near zero for the
        first ~margin/drift substeps after a resort, then ballistic growth
        (PERFORMANCE.md "spill discipline") — so the last substeps before
        a resort see ~`2 * resort_every / margin`x the mean flux.  The
        default budgets ~0.4% of N per substep scaled by
        ``resort_every/12``, floored at 4096 (the compaction/patch chain's
        cost scales with the CAPACITY, so gross oversizing costs ~ms/step
        of dead patch work at 1M).  Patch overflow is counted in
        ``state.dropped_over`` and those rows FREEZE for the substep
        (position/velocity restored, sink skipped — all backends) and
        retry, so an under-sized buffer surfaces as retry latency rather
        than corrupting physics; respawn backlog is counted separately in
        ``state.dropped``.  Pass an explicit capacity for unusually
        absorptive or fast-drift scenarios.

        ``spill_tiers``: ascending intermediate patch capacities below
        ``spill_capacity`` (fused backend; same exactness semantics).  Each
        substep runs exactly ONE patch chain — the smallest tier covering
        that substep's spill count — so the early-window substeps (tens to
        hundreds of spills: respawns plus outlier drifters) pay a small
        compaction/patch instead of the capacity-sized one, whose cost
        scales with the static buffer size."""
        from .pusher_sorted import (Tiling2D, make_sorted_density_fn,
                                    make_sorted_resort_fn,
                                    make_sorted_step_fn, to_sorted_state)

        spec = self.spec
        if tiling is None:
            if backend == "fused":
                # streamed-window kernel: narrow r tiles, wide z tiles
                from ..ops.pallas_pusher import stream_tiling_for
                tiling = stream_tiling_for(spec.nr, spec.nz, margin=6)
            else:
                # nr/nz must divide by the tiles; 400x800 -> 25x32 tiles
                candidates = (8, 16, 20, 25, 32, 40, 50)
                divs_r = [t for t in candidates if spec.nr % t == 0]
                divs_z = [t for t in candidates if spec.nz % t == 0]
                if not divs_r or not divs_z:
                    raise ValueError(
                        f"no default tile size in {candidates} divides the "
                        f"{spec.nr}x{spec.nz} grid — pass an explicit "
                        "Tiling2D(tile_r=..., tile_z=...) whose tiles divide it")
                tiling = Tiling2D(tile_r=max(divs_r), tile_z=max(divs_z),
                                  block=1024, margin=4)
        self._sorted_tiling = tiling
        self._sorted_resort_every = resort_every
        if rng_impl is not None:
            # e.g. 'rbg' — ~5x cheaper uniforms than threefry on TPU; a
            # fresh stream (distributional RNG parity, like the fast path's
            # rng_impl option)
            self.state = self.state._replace(
                key=jax.random.key(0, impl=rng_impl))
        self._sorted_state = to_sorted_state(self.state, spec, tiling,
                                             reserve=repair)
        # repair=True: relocate out-drifters/respawns into their new tile
        # each substep (ops/repair.py) — the full resort then runs only when
        # per-tile free stacks drain (same contract as the ES/EM models)
        self._sorted_repair = repair
        if spill_capacity is None:
            # size to the late-window PEAK of the spill sawtooth (flux is
            # ~zero for the first ~margin/drift substeps after a resort,
            # then ballistic — BENCH_r03 showed the mean-sized buffer
            # dropping 9k rows at 1M): ~0.4% of N per substep at the
            # default cadence, scaled linearly with the cadence,
            # pow2-rounded for stable compiled shapes
            frac = max(1, int(128 * 12 / max(1, resort_every)))
            spill_capacity = int(max(
                4096, 1 << int(np.ceil(np.log2(max(1, spec.n_total // frac))))))
        self._sorted_capacity = spill_capacity
        if repair:
            from ..ops.repair import init_free_list

            n_tiles = int(np.prod(tiling.n_tiles((spec.nr, spec.nz))))
            self._sorted_n_tiles = n_tiles
            self._sorted_free_slots = int(repair_free_slots)
            fidx, fcnt = init_free_list(
                self._sorted_state.tile_id, self._sorted_state.valid,
                n_tiles, tiling.block, self._sorted_free_slots)
            self._sorted_state = self._sorted_state._replace(
                free_idx=fidx, free_cnt=fcnt, unplaced=jnp.int32(0))
        ts = tuple(int(t) for t in spill_tiers)
        if ts and (list(ts) != sorted(set(ts)) or any(t <= 0 for t in ts)
                   or ts[-1] >= spill_capacity):
            raise ValueError(
                f"spill_tiers {spill_tiers!r} must be strictly ascending "
                f"positives below spill_capacity {spill_capacity}")
        self._sorted_step = make_sorted_step_fn(
            spec, tiling, spill_capacity, backend, repair=repair,
            respawn_capacity=respawn_capacity, spill_tiers=ts)
        self._sorted_density = make_sorted_density_fn(spec)
        self._sorted_resort = make_sorted_resort_fn(spec, tiling,
                                                    reserve=repair)
        self._sorted_since = 0
        self._sorted_unplaced_seen = 0
        self._sorted_need_resort = False

    def disable_sorted_path(self) -> None:
        """Return to the plain layout (live rows in layout order)."""
        from .pusher_sorted import from_sorted_state

        if getattr(self, "_sorted_state", None) is not None:
            self.state = from_sorted_state(self._sorted_state, self.spec,
                                           PusherState)
            self._sorted_state = None

    def _step_sorted(self, n: int) -> None:
        from ..utils.stepping import pow2_chunk

        done = 0
        while done < n:
            if (self._sorted_since >= self._sorted_resort_every
                    or self._sorted_need_resort):
                self._sorted_state = self._sorted_resort(self._sorted_state)
                if self._sorted_repair:
                    from ..ops.repair import init_free_list

                    st = self._sorted_state
                    fidx, fcnt = init_free_list(
                        st.tile_id, st.valid, self._sorted_n_tiles,
                        self._sorted_tiling.block, self._sorted_free_slots)
                    self._sorted_state = st._replace(free_idx=fidx,
                                                     free_cnt=fcnt)
                self._sorted_since = 0
                self._sorted_need_resort = False
            cadence = self._sorted_resort_every
            if (not self._sorted_repair and self._sorted_since == 0
                    and n - done >= cadence and cadence <= 128):
                # a full resort window in ONE dispatch: scan(cadence steps)
                # + the relayout resort inside the same jit
                self._sorted_state = self._sorted_step.window(
                    self.fields, self._sorted_state, cadence,
                    self._sorted_resort)
                done += cadence
                continue
            # batch steps until the next resort into ONE dispatch (scan over
            # the jitted step — utils/stepping.py: a per-step dispatch costs
            # ~19 ms of tunnel round-trip vs 2.7 ms for the fused step)
            k = pow2_chunk(min(n - done,
                               self._sorted_resort_every - self._sorted_since))
            if k <= 1:
                self._sorted_state = self._sorted_step(self.fields,
                                                       self._sorted_state)
                k = 1
            else:
                self._sorted_state = self._sorted_step.multi(
                    self.fields, self._sorted_state, k)
            self._sorted_since += k
            done += k
        if self._sorted_repair:
            # schedule a full resort only when free stacks drain (large
            # unplaced delta); one host sync per step() call, not per step
            unplaced = int(self._sorted_state.unplaced)
            delta = unplaced - self._sorted_unplaced_seen
            self._sorted_unplaced_seen = unplaced
            if delta > max(64, min(self._sorted_capacity,
                                   self.spec.n_total) // 8) * max(1, n):
                self._sorted_need_resort = True

    def _step_fast(self, n: int) -> None:
        from ..ops.analytic import FastState, make_fast_multi_step_fn

        if n not in self._fast_multi:
            self._fast_multi[n] = make_fast_multi_step_fn(
                self.spec, self._fast_scenario, n)
        fs = FastState(position=self.state.position,
                       velocity=self.state.velocity,
                       alive=self.state.alive, key=self.state.key)
        fs = self._fast_multi[n](fs)
        self.state = self.state._replace(
            position=fs.position, velocity=fs.velocity,
            alive=fs.alive, key=fs.key)

    # ------------------------------------------------------------ simulation
    def precalc(self) -> None:
        """Recompute R1/R2/R3/A from E and B (empic.js:1413-1434)."""
        spec = self.spec
        coeffs = precompute_rotation(self.fields.b, self.fields.e, spec.h,
                                     spec.factor_r, spec.factor_z)
        self.fields = self.fields._replace(coeffs=coeffs)

    def step(self, n: int = 1) -> None:
        """Advance n full steps (each = two half-steps, empic.js:1436-1469)."""
        if self._fast_scenario is not None:
            self._step_fast(n)
        elif getattr(self, "_sorted_state", None) is not None:
            self._step_sorted(n)
        elif n == 1:
            self.state = self._step(self.fields, self.state)
        else:
            if n not in self._multi:
                self._multi[n] = make_multi_step_fn(self.spec, n)
            self.state = self._multi[n](self.fields, self.state)

    def density(self) -> jax.Array:
        """Deposit moments, update the EMA, render the frame
        (empic.js:1471-1526).  Returns (nr, nz, 3) float RGB."""
        if getattr(self, "_sorted_state", None) is not None:
            self._sorted_state, frame = self._sorted_density(
                self.fields, self._sorted_state)
            return frame
        self.state, frame = self._density(self.fields, self.state)
        return frame

    # ---------------------------------------------------------- checkpointing
    def get_state(self) -> dict[str, np.ndarray]:
        """Full symmetric state download (the readback API the reference
        lacks — SURVEY.md §5 'Checkpoint/resume')."""
        state = {f"state.{k}": np.asarray(v) for k, v in self.state._asdict().items()
                 if k != "key"}
        state["state.key"] = np.asarray(jax.random.key_data(self.state.key))
        for k, v in self.fields._asdict().items():
            if k == "coeffs":
                for ck, cv in v._asdict().items():
                    state[f"fields.coeffs.{ck}"] = np.asarray(cv)
            else:
                state[f"fields.{k}"] = np.asarray(v)
        return state

    def set_state(self, blob: dict[str, np.ndarray]) -> None:
        """Restore from ``get_state`` output."""
        self.state = PusherState(
            position=jnp.asarray(blob["state.position"]),
            velocity=jnp.asarray(blob["state.velocity"]),
            alive=jnp.asarray(blob["state.alive"]),
            key=jax.random.wrap_key_data(jnp.asarray(blob["state.key"])),
            moments_avg=jnp.asarray(blob["state.moments_avg"]),
        )
        self.fields = FieldState(
            e=jnp.asarray(blob["fields.e"]),
            b=jnp.asarray(blob["fields.b"]),
            coeffs=BorisCoefficients(
                r1=jnp.asarray(blob["fields.coeffs.r1"]),
                r2=jnp.asarray(blob["fields.coeffs.r2"]),
                r3=jnp.asarray(blob["fields.coeffs.r3"]),
                a=jnp.asarray(blob["fields.coeffs.a"]),
            ),
            sink_mask=jnp.asarray(blob["fields.sink_mask"]),
            inv_cdf=jnp.asarray(blob["fields.inv_cdf"]),
        )


def make_cylindrical_particle_pusher(spec: dict[str, Any], **kwargs) -> CylindricalParticlePusher:
    """Factory with the reference's name (empic.js:30)."""
    return CylindricalParticlePusher(spec, **kwargs)
