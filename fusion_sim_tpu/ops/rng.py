"""Counter-based random-number subsystem.

The reference implements a GPU-resident chaotic-map RNG: a 1024^2
crypto-seeded entropy texture walked by per-particle state, emitting two
uniforms plus two logistic-map values per particle per substep
(``programStepRandB/A``, empic.js:783-895).  That construction exists only
because WebGL 1.0 has no RNG; it is crypto-seeded and therefore not
reproducible by design (SURVEY.md §7 "RNG parity").

The TPU-native replacement is JAX's counter-based threefry: deterministic,
splittable, parallel-safe.  We replicate the *distribution semantics* — four
U(0,1) values per particle per substep, consumed exactly like the reference's
``rand`` texture (xy -> respawn position quantiles, xyz -> thermal velocity
init) — not the chaotic map itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def substep_uniforms(key: jax.Array, n_particles: int) -> tuple[jax.Array, jax.Array]:
    """Draw the per-substep (N, 4) uniforms and advance the stream.

    Returns ``(rand, next_key)``.  ``rand[:, :2]`` feeds the respawn sampler
    (empic.js:714-716), ``rand[:, :3]`` the thermal velocity init
    (empic.js:771-772), matching the reference's one-rand-texture-per-substep
    consumption (empic.js:1436-1469 ping-pongs rand_A/rand_B).
    """
    next_key, sub = jax.random.split(key)
    rand = jax.random.uniform(sub, (n_particles, 4), dtype=jnp.float32)
    return rand, next_key


def step_uniforms(key: jax.Array, n_particles: int) -> tuple[jax.Array, jax.Array]:
    """BOTH half-steps' uniforms in ONE generator invocation: (2, N, 4),
    ``rand[0]`` for substep B and ``rand[1]`` for substep A (the
    reference's rand_B/rand_A ping-pong order, empic.js:1436-1469).

    MEASURED WASH at step level (round 5): standalone, an (8, n) draw
    times the same ~3.3 ms as a (4, n) draw at n = 1.5M (suggesting a
    large fixed cost), but that number is dominated by the tunneled
    backend's dispatch-chain latency — inside the sorted pusher's
    window-scan jit, swapping two per-substep draws for one batched draw
    measured 13.9 vs 13.5 ms/step (noise-level, no win), so the pusher
    keeps per-substep ``substep_uniforms``.  Kept as the documented
    probe result; distribution semantics identical (iid U(0,1) per
    particle per substep)."""
    next_key, sub = jax.random.split(key)
    rand = jax.random.uniform(sub, (2, n_particles, 4), dtype=jnp.float32)
    return rand, next_key
