"""Device-side rendering of fields and particle moments to RGB framebuffers.

Replaces the reference's render-to-canvas passes with pure array math that
stays on device until the final frame is streamed to host:

* ``render_bmag`` — |B| split by direction into RGB (``programBMag``,
  empic.js:467-493): red = |B|*|min(0, dir_z)|, green = |B|*dir_r,
  blue = |B|*max(0, dir_z).
* ``render_density_overlay`` — grayscale density composited on top with the
  reference's SRC_ALPHA, ONE blending (``programDensity``,
  empic.js:1090-1116, blend at :1502-1505): the source fragment is
  0.5*(a, a, a, 1) so the composite adds 0.25*a to each channel.
* ``frame_to_uint8`` — clamp to [0,1] and quantize for host streaming
  (the drawImage analogue, fusionsim.js:176-178).

Frames are returned in image layout ``(nz, nr, 3)`` with z rising upward,
matching the reference's 400x800 canvas orientation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def render_bmag(b_field: jax.Array) -> jax.Array:
    """Magnetic-field background layer; ``(nr, nz, 3)`` float RGB in [0, inf)."""
    mag = jnp.linalg.norm(b_field, axis=-1)
    safe = jnp.where(mag > 0.0, mag, 1.0)
    dirs = b_field / safe[..., None]
    red = mag * jnp.abs(jnp.minimum(0.0, dirs[..., 2]))
    green = mag * dirs[..., 0]
    blue = mag * jnp.maximum(0.0, dirs[..., 2])
    return jnp.stack([red, green, blue], axis=-1)


@jax.jit
def render_density_overlay(background: jax.Array, moments_avg: jax.Array) -> jax.Array:
    """Composite the density layer over the |B| background.

    GL blend SRC_ALPHA, ONE with src = 0.5*(a, a, a, 1):
    out = src_rgb * src_alpha + dst = 0.25*a + dst (empic.js:1101-1116).
    """
    a = moments_avg[..., 3]
    src_rgb = 0.5 * a
    src_alpha = 0.5
    return background + (src_rgb * src_alpha)[..., None]


def frame_to_uint8(frame: jax.Array) -> jax.Array:
    """Clamp/quantize an ``(nr, nz, 3)`` float frame to image-layout uint8.

    Transposes to ``(nz, nr, 3)`` and flips z so row 0 is the top of the
    canvas, matching the browser canvas orientation.
    """
    img = jnp.clip(frame, 0.0, 1.0) * 255.0
    img = img.astype(jnp.uint8)
    return img.transpose(1, 0, 2)[::-1]
