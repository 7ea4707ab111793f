"""Block reductions over 2D fields.

Working TPU-native equivalents of the reference's *dead* generated-shader
block reductions ``webgl_max``/``webgl_avg`` (utilities.js:759-1001 — both
call nonexistent methods and were never used; SURVEY.md U8/U9) and of the
solver's halving reduction pyramid (matrix_webgl.js:346-388, M6).  On TPU a
log-depth texture pyramid is pointless — XLA lowers ``jnp.max``/``mean``
reshape-reductions to optimal tree reductions — so these are thin, shaped
like the originals' API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _blocks(field: jax.Array, block: tuple[int, int]) -> jax.Array:
    h, w = field.shape[:2]
    bh, bw = block
    if h % bh or w % bw:
        raise ValueError(f"field {field.shape} not divisible by block {block}")
    return field.reshape(h // bh, bh, w // bw, bw, *field.shape[2:])


def block_max(field: jax.Array, block: tuple[int, int]) -> jax.Array:
    """Per-block maximum; output (H/bh, W/bw, ...) — webgl_max's intent."""
    return jnp.max(_blocks(field, block), axis=(1, 3))


def block_avg(field: jax.Array, block: tuple[int, int]) -> jax.Array:
    """Per-block average — webgl_avg's intent."""
    return jnp.mean(_blocks(field, block), axis=(1, 3))


def pyramid_sum(field: jax.Array, levels: int) -> jax.Array:
    """Successive 2x2 adjacent sums, ``levels`` times (the M6 pyramid)."""
    out = field
    for _ in range(levels):
        out = block_avg(out, (2, 2)) * 4.0
    return out
