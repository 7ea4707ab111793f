"""Multi-step dispatch batching for the stateful model shells.

Each sorted model's ``step(n)`` used to dispatch one jitted step per
physics step.  On the tunneled TPU backend a dispatch costs ~19 ms of
host round-trip regardless of device work, so any model whose step is
cheaper than that was dispatch-bound: the fused grid-parity pusher
measured 22 ms/step in a Python loop vs 2.7 ms for the same step inside
one jit (examples/profile_pusher.py).  Production stepping therefore
batches: ``lax.scan`` over the jitted step, one dispatch per resort
window (or per ``step(n)`` call, whichever is shorter).

``pow2_chunk`` quantizes chunk lengths to powers of two so a shell
compiles at most log2(resort_every) scan variants instead of one per
distinct remainder.
"""

from __future__ import annotations

import jax


def make_multi_step(step, length: int):
    """``state -> state`` applying ``step`` ``length`` times in one jit."""

    @jax.jit
    def multi(state):
        out, _ = jax.lax.scan(lambda s, _: (step(s), None), state, None,
                              length=length)
        return out

    return multi


def make_window_step(step, resort, length: int):
    """``state -> state`` running one full resort window in ONE dispatch:
    ``length`` steps (lax.scan) followed by the relayout resort.  The resort
    is physics-transparent (pure relayout), so window boundaries can be
    crossed wholesale; shells use this whenever a ``step(n)`` call spans at
    least one full window."""

    @jax.jit
    def window(state):
        out, _ = jax.lax.scan(lambda s, _: (step(s), None), state, None,
                              length=length)
        return resort(out)

    return window


def pow2_chunk(n_avail: int) -> int:
    """Largest power of two <= n_avail (>= 1)."""
    return 1 << (max(1, n_avail).bit_length() - 1)
