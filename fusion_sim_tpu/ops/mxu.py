"""Exact-ish bf16 MXU matmul helpers (the "3-term trick").

Mosaic exposes matmul precision as either single-pass bf16 (`default`,
~2^-9 relative error) or `highest` (multi-pass f32 emulation, ~6 bf16
passes).  There is no `HIGH` tier.  This module hand-rolls the missing
middle: split each f32 operand into bf16 hi+lo halves

    x = hi + lo,   hi = bf16(x),   lo = bf16(x - hi)      (|lo| <= 2^-9 |x|)

and accumulate three bf16 MXU passes

    a @ b ~= a_hi @ b_hi + a_hi @ b_lo + a_lo @ b_hi

dropping only the a_lo @ b_lo term (<= 2^-18 relative) — ~2x fewer MXU
passes than `highest` at ~16-bit-mantissa accuracy, far beyond single-pass
bf16.  All dots accumulate in float32 on the MXU.

Used by the fused PIC kernels (ops/pallas_pic.py, ops/pallas_em.py) for
field gathers and charge/current deposition (VERDICT r2 next-step #1b/#6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_bf16(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split float32 ``x`` into bf16 ``(hi, lo)`` with ``hi + lo ~= x`` to
    ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot3(a_hi, a_lo, b_hi, b_lo, dimension_numbers):
    """3-term bf16 dot_general of pre-split operands, f32 accumulation."""
    def d(a, b):
        return jax.lax.dot_general(a, b, dimension_numbers,
                                   preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))


def dot3_split(a, b, dimension_numbers):
    """3-term bf16 dot_general, splitting both f32 operands inline."""
    a_hi, a_lo = split_bf16(a)
    b_hi, b_lo = split_bf16(b)
    return dot3(a_hi, a_lo, b_hi, b_lo, dimension_numbers)


def split_bf16_3_exact(x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """EXACT 3-way bf16 decomposition: x == h1 + h2 + h3 bit-for-bit (f32).

    Unlike ``split_bf16`` (round-to-nearest, ~2^-18 residual), this uses
    mantissa TRUNCATION: h1 keeps x's top 16 bits (a valid bf16 pattern),
    h2 the next 8 mantissa bits, h3 the last 8 — each exactly representable
    in bf16, and their f32 sum reconstructs x exactly (disjoint exponent
    windows).  This makes one-hot selection (NEAREST sampling) through
    single-pass bf16 MXU matmuls BIT-EXACT in 3 passes, vs ~6 for XLA's
    ``highest`` f32 emulation."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    h1 = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    r1 = x - h1
    u1 = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    h2 = jax.lax.bitcast_convert_type(u1 & jnp.uint32(0xFFFF0000), jnp.float32)
    h3 = r1 - h2
    return (h1.astype(jnp.bfloat16), h2.astype(jnp.bfloat16),
            h3.astype(jnp.bfloat16))
