"""Analytic (gather-free) fast path for the static-field pusher.

The grid-mode pusher is bound by XLA TPU gather latency (~25-40 ns/row
measured on v5e: coefficient + sink + respawn-table lookups cap it at a few
1e7 pushes/s).  For *static* externally-imposed fields — the reference's
only live mode (SURVEY.md §0) — the TPU-idiomatic answer is to recompute
instead of gather: evaluate B in closed form at each particle every substep
(elliptic-integral loop fields + uniform/line terms), test the sink
geometrically, and sample the source box directly from uniforms.  The whole
substep is then pure elementwise VPU math that XLA fuses into one kernel:
no gathers, no scatters, ~400 flops/push.

Physics notes vs grid mode:

* B is evaluated at the exact particle position instead of NEAREST cell
  centers — strictly more accurate, same Boris algebra (the per-cell
  R1/R2/R3/A precompute of empic.js:506-659 is algebraically identical to
  computing the rotation from the gathered B per particle, which is what we
  do here, metric corrections included).
* Supports the analytic field sources of the engine (current loops via
  ops/fields.current_loop_b_exact, uniform B_z/B_theta, axial line current)
  and box sink/source geometry (the default scenario's walls and source box,
  fusionsim.js:94-122).  Arbitrary grid masks/PDFs need grid mode.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import MU_0, PI, SPEED_OF_LIGHT
from .fields import current_loop_b_exact


@dataclasses.dataclass(frozen=True)
class AnalyticScenario:
    """Closed-form scenario description (all lengths in meters).

    ``loops``: tuple of (R, Z, I) current loops.
    ``sink_box``: (r_max, z_min, z_max) — particles absorbed outside
    (the default wall sinks, fusionsim.js:103-112).
    ``source_box``: (r_lo, r_hi, z_lo, z_hi) — uniform respawn box
    (fusionsim.js:114-122).
    """

    loops: tuple[tuple[float, float, float], ...] = ()
    bz: float = 0.0
    btheta: float = 0.0
    line_current: float = 0.0
    uniform_e: tuple[float, float, float] = (0.0, 0.0, 0.0)  # (E_r, E_th, E_z) V/m
    sink_box: tuple[float, float, float] = (1.0, 0.0, 2.0)
    source_box: tuple[float, float, float, float] = (0.0, 0.125, 0.875, 1.125)
    # Parity detail of the default grid mask (fusionsim.js:103-112): the
    # z-wall sink rows run r-cells 1..nr-2, so the on-axis column (r cell 0)
    # is NOT absorbed at the z extremes.  axis_keep_r > 0 reproduces that:
    # particles with r < axis_keep_r survive the z walls (still absorbed at
    # the r wall).
    axis_keep_r: float = 0.0


def b_field_at(scenario: AnalyticScenario, r: jax.Array, z: jax.Array) -> jax.Array:
    """(B_r, B_theta, B_z) at physical (r, z) — superposition of sources."""
    total = jnp.zeros(r.shape + (3,), jnp.float32)
    for loop_r, loop_z, current in scenario.loops:
        total = total + current_loop_b_exact(r, z, loop_r, loop_z, current)
    if scenario.bz:
        total = total.at[..., 2].add(jnp.float32(scenario.bz))
    btheta = jnp.float32(scenario.btheta)
    if scenario.line_current:
        btheta = btheta + scenario.line_current * MU_0 / (2.0 * PI * jnp.maximum(r, 1e-9))
    if scenario.btheta or scenario.line_current:
        total = total.at[..., 1].add(btheta)
    return total


class FastState(NamedTuple):
    position: jax.Array  # (N, 3) normalized (like PusherState)
    velocity: jax.Array
    alive: jax.Array
    key: jax.Array


def _substep(spec, scenario: AnalyticScenario, state: FastState) -> FastState:
    """One half-step, all elementwise: rand -> velocity -> position.

    Mirrors ops.boris.push_velocity + ops.push.push_position with the grid
    lookups replaced by closed forms.  ``spec`` is a PusherSpec.
    """
    n = state.position.shape[0]
    key, sub = jax.random.split(state.key)
    rand = jax.random.uniform(sub, (n, 4), dtype=jnp.float32)

    x, y, z = state.position[..., 0], state.position[..., 1], state.position[..., 2]
    r = jnp.sqrt(x * x + y * y)
    dir_x = x / r
    dir_y = y / r

    # --- velocity push (Boris rotation from analytic B) -------------------
    b = b_field_at(scenario, r * spec.radius, z * spec.height)
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    h = jnp.float32(spec.h)
    hb2 = h * h * (bx * bx + by * by + bz * bz)
    f = 2.0 / (1.0 + hb2)
    diag = 1.0 - hb2 * f
    rz = jnp.float32(spec.factor_r / spec.factor_z)
    zr = jnp.float32(spec.factor_z / spec.factor_r)

    vx, vy, vz = state.velocity[..., 0], state.velocity[..., 1], state.velocity[..., 2]
    vr = vx * dir_x + vy * dir_y
    va = vy * dir_x - vx * dir_y

    nvr = (diag + f * h * h * bx * bx) * vr \
        + (f * h * (bz + h * bx * by)) * va \
        + (f * h * (-by + h * bx * bz) * rz) * vz
    nva = (f * h * (-bz + h * by * bx)) * vr \
        + (diag + f * h * h * by * by) * va \
        + (f * h * (bx + h * by * bz) * rz) * vz
    nvz = (f * h * (by + h * bz * bx) * zr) * vr \
        + (f * h * (-bx + h * bz * by) * zr) * va \
        + (diag + f * h * h * bz * bz) * vz

    if any(scenario.uniform_e):
        # acceleration vector A of programPreA (empic.js:625-659), with the
        # reference's scalar h*(E.B) broadcast quirk reproduced
        ex, ey, ez_ = (jnp.float32(v) for v in scenario.uniform_e)
        e_dot_b = ex * bx + ey * by + ez_ * bz
        exb_r = ey * bz - ez_ * by
        exb_a = ez_ * bx - ex * bz
        exb_z = ex * by - ey * bx
        pref = h * (2.0 - hb2 * f)
        ar = (pref * ex + h * h * f * (exb_r + h * e_dot_b)) / SPEED_OF_LIGHT
        aa = (pref * ey + h * h * f * (exb_a + h * e_dot_b)) / SPEED_OF_LIGHT
        az = (pref * ez_ + h * h * f * (exb_z + h * e_dot_b)) / SPEED_OF_LIGHT
        nvr = nvr + ar * jnp.float32(spec.factor_r)
        nva = nva + aa * jnp.float32(spec.factor_r)
        nvz = nvz + az * jnp.float32(spec.factor_z)

    new_vx = nvr * dir_x - nva * dir_y
    new_vy = nvr * dir_y + nva * dir_x

    # just-respawned particles get thermal velocities (empic.js:771-772)
    fresh = state.alive <= 0.5
    thermal = 0.001 * (2.0 * rand[:, :3] - 1.0)
    new_vx = jnp.where(fresh, thermal[:, 0], new_vx)
    new_vy = jnp.where(fresh, thermal[:, 1], new_vy)
    nvz = jnp.where(fresh, thermal[:, 2], nvz)

    # --- position push + geometric sink + box-source respawn --------------
    sf = jnp.float32(spec.step_factor)
    px = x + sf * new_vx
    py = y + sf * new_vy
    pz = z + sf * nvz
    pr = jnp.sqrt(px * px + py * py)

    r_max, z_min, z_max = scenario.sink_box
    r_phys_new = pr * spec.radius
    z_phys_new = pz * spec.height
    keep_z = (z_phys_new > z_min) & (z_phys_new < z_max)
    if scenario.axis_keep_r > 0.0:
        keep_z = keep_z | (r_phys_new < scenario.axis_keep_r)
    keep = (r_phys_new < r_max) & keep_z

    r_lo, r_hi, z_lo, z_hi = scenario.source_box
    # normalized respawn coordinates (the inv-CDF of a uniform box is affine)
    new_r = (r_lo + (r_hi - r_lo) * rand[:, 0]) * spec.factor_r
    new_z = (z_lo + (z_hi - z_lo) * rand[:, 1]) * spec.factor_z

    out_x = jnp.where(keep, px, new_r)
    out_y = jnp.where(keep, py, 0.0)
    out_z = jnp.where(keep, pz, new_z)
    alive = keep.astype(jnp.float32)

    return FastState(
        position=jnp.stack([out_x, out_y, out_z], axis=-1),
        velocity=jnp.stack([new_vx, new_vy, nvz], axis=-1),
        alive=alive,
        key=key,
    )


def make_fast_multi_step_fn(spec, scenario: AnalyticScenario, n_steps: int):
    """Jitted scan of n_steps full steps (2 substeps each) on the fast path."""

    @jax.jit
    def run(state: FastState) -> FastState:
        def body(s, _):
            s = _substep(spec, scenario, s)
            s = _substep(spec, scenario, s)
            return s, None

        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state

    return run


def default_scenario(radius: float = 1.0, height: float = 2.0,
                     nr: int = 400, nz: int = 800) -> AnalyticScenario:
    """The reference's default scenario as closed forms
    (fusionsim.js:94-138): wall sinks one cell inside the r/z extremes,
    source box r-cells [0,50), z-cells [350,450) of the 400x800 grid,
    mirror coils at r=0.8, z in {0, height}."""
    return AnalyticScenario(
        loops=((0.8 * radius, height, -1e7), (0.8 * radius, 0.0, 1e7)),
        sink_box=((nr - 1) / nr * radius, height / nz, (nz - 1) / nz * height),
        source_box=(0.0, 50 / 400 * radius, 350 / 800 * height, 450 / 800 * height),
        axis_keep_r=radius / nr,
    )
