"""Boris rotation precompute and velocity push.

The reference trades memory for per-step FLOPs by precomputing, per grid cell,
the three rows R1, R2, R3 of the Boris rotation matrix plus the acceleration
vector A whenever the fields change (``programPre1/2/3/A``,
empic.js:506-659), so the per-particle velocity update is a nearest-cell
gather plus three dot products (``step_velocity_frag``, empic.js:729-778).
We keep that exact design: ``precompute_rotation`` runs once per field
change (one fused jit over the grid), ``push_velocity`` runs every substep
(vmapped/fused over particles by XLA).

All quantities follow the reference normalization: particle positions and
velocities carry per-axis scale factors (x, y by 1/radius, z by 1/height;
velocity additionally in units of c — empic.js:45-46, 645-646, 852), and the
rotation rows carry the anisotropic metric corrections factor_r/factor_z on
the z-coupling entries (empic.js:527, 566, 606) with A scaled per-axis and
divided by c (empic.js:645-653).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import SPEED_OF_LIGHT


class BorisCoefficients(NamedTuple):
    """Per-cell pusher coefficients, each ``(nr, nz, 3)``.

    r1, r2, r3: rows of the Boris rotation matrix (cylindrical frame).
    a: acceleration vector (normalized units).
    """

    r1: jax.Array
    r2: jax.Array
    r3: jax.Array
    a: jax.Array


def precompute_rotation(
    b_field: jax.Array,
    e_field: jax.Array,
    h: float,
    factor_r: float,
    factor_z: float,
) -> BorisCoefficients:
    """Build R1, R2, R3, A from the grid fields.

    Parity target: ``programPre1`` (empic.js:506-542), ``programPre2``
    (:545-581), ``programPre3`` (:585-620), ``programPreA`` (:625-659) with
    h = q*dt/(2m) (empic.js:44).  The formulas below are transcribed from the
    shader math:

        hB2    = h^2 |B|^2
        f      = 2 / (1 + hB2)
        R_ii   = (1 - hB2*f) + f*h^2*B_i^2
        R_ij   = f*h*(±B_k + h*B_i*B_j)
        A      = (h*(2 - hB2*f)*E + h^2*f*(E×B + h*(E·B))) / c

    with metric corrections: R1/R2 third entries × factor_r/factor_z,
    R3 first/second entries × factor_z/factor_r, A scaled per-axis by
    (factor_r, factor_r, factor_z).

    Note the reference's A formula adds the *scalar* h*(E·B) to the E×B
    vector (empic.js:652) — a GLSL scalar-broadcast; replicated faithfully.
    """
    b = b_field.astype(jnp.float32)
    e = e_field.astype(jnp.float32)
    h = jnp.float32(h)
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    bmag2 = bx * bx + by * by + bz * bz
    hb2 = h * h * bmag2
    factor = 2.0 / (1.0 + hb2)
    diag = 1.0 - hb2 * factor

    rz = jnp.float32(factor_r / factor_z)
    zr = jnp.float32(factor_z / factor_r)

    r11 = diag + factor * h * h * bx * bx
    r12 = factor * h * (bz + h * bx * by)
    r13 = factor * h * (-by + h * bx * bz) * rz
    r21 = factor * h * (-bz + h * by * bx)
    r22 = diag + factor * h * h * by * by
    r23 = factor * h * (bx + h * by * bz) * rz
    r31 = factor * h * (by + h * bz * bx) * zr
    r32 = factor * h * (-bx + h * bz * by) * zr
    r33 = diag + factor * h * h * bz * bz

    e_cross_b = jnp.cross(e, b)
    e_dot_b = jnp.sum(e * b, axis=-1, keepdims=True)
    a = (h * (2.0 - hb2 * factor)[..., None] * e
         + (h * h * factor)[..., None] * (e_cross_b + h * e_dot_b)) / SPEED_OF_LIGHT
    scale = jnp.array([factor_r, factor_r, factor_z], dtype=jnp.float32)
    a = a * scale

    return BorisCoefficients(
        r1=jnp.stack([r11, r12, r13], axis=-1),
        r2=jnp.stack([r21, r22, r23], axis=-1),
        r3=jnp.stack([r31, r32, r33], axis=-1),
        a=a,
    )


def gather_nearest(field: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Gather ``(nr, nz, C)`` field values at normalized (u, v) per particle.

    NEAREST/CLAMP sampling — matches the reference's texture filtering of the
    R1/R2/R3/A framebuffers (utilities.js:556-560).
    """
    nr, nz = field.shape[0], field.shape[1]
    iu = jnp.clip(jnp.floor(u * nr).astype(jnp.int32), 0, nr - 1)
    iv = jnp.clip(jnp.floor(v * nz).astype(jnp.int32), 0, nz - 1)
    return field[iu, iv]


def gather_bilinear(field: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Bilinear/CLAMP gather of ``(nr, nz, C)`` at normalized (u, v).

    The opt-in "exacter variant" of the reference's NEAREST sampling
    (utilities.js:556-560): texel-center LINEAR filtering with clamp-to-edge,
    i.e. what the reference would do with gl.LINEAR on its coefficient
    textures.  Smooths the per-cell staircase in R1/R2/R3/A at the cost of
    four gather rows folded into one packed row (same trick as the deposit).
    """
    nr, nz = field.shape[0], field.shape[1]
    tu = u * nr - 0.5
    tv = v * nz - 0.5
    iu0 = jnp.clip(jnp.floor(tu).astype(jnp.int32), 0, nr - 1)
    iv0 = jnp.clip(jnp.floor(tv).astype(jnp.int32), 0, nz - 1)
    iu1 = jnp.minimum(iu0 + 1, nr - 1)
    iv1 = jnp.minimum(iv0 + 1, nz - 1)
    fu = jnp.clip(tu - jnp.floor(tu), 0.0, 1.0)[..., None]
    fv = jnp.clip(tv - jnp.floor(tv), 0.0, 1.0)[..., None]
    f00 = field[iu0, iv0]
    f01 = field[iu0, iv1]
    f10 = field[iu1, iv0]
    f11 = field[iu1, iv1]
    return ((1 - fu) * (1 - fv) * f00 + (1 - fu) * fv * f01
            + fu * (1 - fv) * f10 + fu * fv * f11)


def push_velocity(
    position: jax.Array,
    velocity: jax.Array,
    alive: jax.Array,
    rand: jax.Array,
    coeffs: BorisCoefficients,
    interp: str = "nearest",
) -> jax.Array:
    """One velocity half-kick for all particles.

    Parity target: ``step_velocity_frag`` (empic.js:729-778):

    1. rotate Cartesian (vx, vy) into the local cylindrical frame
       (vr, va) via direction = (x/r, y/r);
    2. gather R1, R2, R3, A at the particle's (r, z) cell (NEAREST);
    3. v+ = (R1·v, R2·v, R3·v) + A;
    4. rotate back to Cartesian;
    5. if the particle was *just respawned* (alive flag ≈ 0,
       empic.js:771-772) its velocity is instead re-initialized thermally to
       0.001 * U(-1, 1)^3 from this substep's uniforms.

    ``position``/``velocity``: (N, 3) normalized; ``alive``: (N,) the w flag;
    ``rand``: (N, >=3) uniforms in [0, 1).  ``interp`` selects the
    coefficient sampling: 'nearest' (reference parity) or 'bilinear'
    (opt-in exacter variant — see PusherSpec.interp).
    """
    # One fused 12-channel gather instead of four 3-channel ones: XLA TPU
    # gathers are latency-bound per row, so row width is nearly free.
    x, y, z = position[..., 0], position[..., 1], position[..., 2]
    r = jnp.sqrt(x * x + y * y)
    packed = jnp.concatenate([coeffs.r1, coeffs.r2, coeffs.r3, coeffs.a], axis=-1)
    if interp == "bilinear":
        rows = gather_bilinear(packed, r, z)
    elif interp == "nearest":
        rows = gather_nearest(packed, r, z)
    else:
        raise ValueError(f"unknown interp {interp!r} (nearest|bilinear)")
    return velocity_from_rows(position, velocity, alive, rand, rows)


def velocity_from_rows(
    position: jax.Array,
    velocity: jax.Array,
    alive: jax.Array,
    rand: jax.Array,
    rows: jax.Array,
) -> jax.Array:
    """The gather-free half of ``push_velocity``: apply pre-gathered
    R1/R2/R3/A coefficient rows (N, 12).  Split out so the tile-sorted fast
    path (models/pusher_sorted.py) can swap in the windowed MXU gather."""
    x, y = position[..., 0], position[..., 1]
    r = jnp.sqrt(x * x + y * y)
    dir_x = x / r
    dir_y = y / r

    vx, vy, vz = velocity[..., 0], velocity[..., 1], velocity[..., 2]
    vr = vx * dir_x + vy * dir_y
    va = vy * dir_x - vx * dir_y

    r1, r2, r3, a = rows[..., 0:3], rows[..., 3:6], rows[..., 6:9], rows[..., 9:12]

    cyl = jnp.stack([vr, va, vz], axis=-1)
    rotated = jnp.stack(
        [
            jnp.sum(r1 * cyl, axis=-1),
            jnp.sum(r2 * cyl, axis=-1),
            jnp.sum(r3 * cyl, axis=-1),
        ],
        axis=-1,
    ) + a

    next_v = jnp.stack(
        [
            rotated[..., 0] * dir_x - rotated[..., 1] * dir_y,
            rotated[..., 0] * dir_y + rotated[..., 1] * dir_x,
            rotated[..., 2],
        ],
        axis=-1,
    )

    thermal = 0.001 * (2.0 * rand[..., :3] - 1.0)
    return jnp.where((alive > 0.5)[..., None], next_v, thermal)
