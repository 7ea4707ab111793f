"""Particle -> grid moment deposition.

Parity target: ``programMoments01`` (empic.js:980-1035) plus its host-built
shape texture (empic.js:949-978): each particle is rasterized as an 11x11
point sprite at window position (r*nr, z*nz), splatting
``0.001 * (vr, va, vz, 1)`` times a cos^2 radial bell (normalized to sum 1)
with additive blending into the moments framebuffer — rgb = sum v*w,
a = sum w.

TPU-native formulation: because every sprite is the *same* pixel-aligned
11x11 stencil, the splat factorizes exactly into

    moments = conv2d( scatter_add(point masses at nearest cell), bell )

— one scatter-add (or sorted segment-sum) plus one small convolution that XLA
maps onto the systolic array, instead of per-particle scatter of 121 taps.

``normalize_moments`` and ``ema_moments`` mirror ``programNormalizeMoments01``
(empic.js:1042-1066: mean velocity = rgb/a, cylindrical volume weighting
1000*0.5/r) and ``programAvgMoments`` (empic.js:262-282, 1071-1084:
new = 0.01*next + 0.99*avg).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SHAPE_SIZE = 11  # empic.js:949 — nshape


def bell_kernel(nshape: int = SHAPE_SIZE) -> jax.Array:
    """The cos^2 radial bell of empic.js:956-971, normalized to sum 1."""
    mid = (nshape - 1) / 2
    i = np.arange(nshape)[:, None]
    j = np.arange(nshape)[None, :]
    d = np.sqrt((i - mid) ** 2 + (j - mid) ** 2)
    shape = np.maximum(0.0, np.cos(0.5 * np.pi * d / mid)) ** 2
    shape = shape / shape.sum()
    return jnp.asarray(shape, dtype=jnp.float32)


def particle_cell_indices(
    position: jax.Array, nr: int, nz: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest grid cell per particle from normalized Cartesian position.

    The reference places the sprite at gl_Position = (2r-1, 2z-1)
    (empic.js:997), i.e. window coordinate (r*nr, z*nz); the covered pixel is
    the one whose center is nearest — floor of the window coordinate.
    Returns (ir, iz, r).
    """
    x, y, z = position[..., 0], position[..., 1], position[..., 2]
    r = jnp.sqrt(x * x + y * y)
    ir = jnp.clip(jnp.floor(r * nr).astype(jnp.int32), 0, nr - 1)
    iz = jnp.clip(jnp.floor(z * nz).astype(jnp.int32), 0, nz - 1)
    return ir, iz, r


@functools.partial(jax.jit, static_argnums=(2, 3))
def deposit_moments(
    position: jax.Array,
    velocity: jax.Array,
    nr: int,
    nz: int,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Deposit (sum v_r*w, sum v_a*w, sum v_z*w, sum w) onto the grid.

    The per-particle color is ``0.001 * (vr, va, vz, 1)`` (empic.js:1008)
    with (vr, va) the cylindrical-frame velocity (empic.js:1004-1007).
    ``weights`` (optional, (N,)): per-particle multiplier — the padded
    sorted layout passes 0 on filler rows.  Returns ``(nr, nz, 4)``.
    """
    ir, iz, r = particle_cell_indices(position, nr, nz)
    x, y = position[..., 0], position[..., 1]
    dir_x = x / r
    dir_y = y / r
    vx, vy, vz = velocity[..., 0], velocity[..., 1], velocity[..., 2]
    vr = vx * dir_x + vy * dir_y
    va = vy * dir_x - vx * dir_y

    color = 0.001 * jnp.stack([vr, va, vz, jnp.ones_like(vr)], axis=-1)  # (N, 4)
    if weights is not None:
        color = color * weights[:, None]

    flat_idx = ir * nz + iz
    point_grid = jnp.zeros((nr * nz, 4), dtype=jnp.float32).at[flat_idx].add(color)
    point_grid = point_grid.reshape(nr, nz, 4)

    kernel = bell_kernel()
    # Correlate each channel with the (symmetric) bell — exact factorization of
    # the pixel-aligned sprite splat. conv via lax with SAME padding.
    out = jax.lax.conv_general_dilated(
        point_grid.transpose(2, 0, 1)[:, None],          # (4, 1, nr, nz)
        kernel[None, None],                              # (1, 1, 11, 11)
        window_strides=(1, 1),
        padding="SAME",
        precision=jax.lax.Precision.HIGHEST,  # full f32 on MXU (parity)
    )
    return out[:, 0].transpose(1, 2, 0)


@jax.jit
def normalize_moments(moments: jax.Array) -> jax.Array:
    """Mean velocity + cylindrical volume weighting.

    Parity target: ``programNormalizeMoments01`` (empic.js:1048-1060):
    M = (a > 0) ? (r/a, g/a, b/a, a) : 0, then scaled by 1000 * 0.5 / u where
    u = (i+0.5)/nr is the texel-center r coordinate.
    """
    nr = moments.shape[0]
    a = moments[..., 3:4]
    safe = jnp.where(a > 0.0, a, 1.0)
    m = jnp.where(a > 0.0, jnp.concatenate([moments[..., :3] / safe, a], axis=-1), 0.0)
    u = (jnp.arange(nr, dtype=jnp.float32)[:, None, None] + 0.5) / nr
    return 1000.0 * m * 0.5 / u


@jax.jit
def ema_moments(next_moments: jax.Array, avg: jax.Array, ratio: float = 0.01) -> jax.Array:
    """Exponential moving average (``avg_frag``, empic.js:262-282; ratio 0.01
    per empic.js:1083)."""
    ratio = jnp.float32(ratio)
    return ratio * next_moments + (1.0 - ratio) * avg
