"""Accuracy of the 3-term exact-bf16 MXU matmul helpers (ops/mxu.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from fusion_sim_tpu.ops.mxu import dot3, dot3_split, split_bf16


def test_split_bf16_reconstructs_to_16_mantissa_bits():
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((256, 128)) *
                     10.0 ** rng.integers(-6, 6, (256, 128))), jnp.float32)
    hi, lo = split_bf16(x)
    assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
    rec = hi.astype(jnp.float32) + lo.astype(jnp.float32)
    err = np.abs(np.asarray(rec - x)) / np.maximum(np.abs(np.asarray(x)), 1e-30)
    assert err.max() < 2.0 ** -15  # two bf16 halves ~ >=16 mantissa bits


def test_dot3_split_much_tighter_than_single_pass_bf16():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((96, 160)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((160, 112)), jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    exact = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = np.abs(exact).max()

    got3 = np.asarray(dot3_split(a, b, dn))
    one_pass = np.asarray(jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dn,
        preferred_element_type=jnp.float32))

    err3 = np.abs(got3 - exact).max() / scale
    err1 = np.abs(one_pass - exact).max() / scale
    assert err3 < 1e-4          # ~2^-18-ish after accumulation
    assert err3 < err1 / 20.0   # far beyond single-pass bf16


def test_dot3_matches_dot3_split_on_presplit_operands():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    a_hi, a_lo = split_bf16(a)
    b_hi, b_lo = split_bf16(b)
    np.testing.assert_array_equal(np.asarray(dot3(a_hi, a_lo, b_hi, b_lo, dn)),
                                  np.asarray(dot3_split(a, b, dn)))
