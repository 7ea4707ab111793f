"""Timing helpers for the tunneled axon backend.

Two artifacts make naive per-call timing useless here:

* every dispatch crosses the tunnel: a single sub-30-ms op measures as
  ~30 ms of round-trip latency no matter how cheap it is;
* eager (non-jit) composites dispatch op by op and take SECONDS.

``loop_timeit`` wraps the target in ONE jit that applies it ``iters``
times with a serializing data dependency (a ~1e-30-scaled scalar of the
previous output folded into the first float input — not constant-
foldable, physically negligible), fences with a device-side slice, and
returns the per-iteration time.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def loop_timeit(f, *args, iters=16, reps=5):
    """Median per-iteration wall time of ``f(*args)`` applied ``iters``
    times inside one jit.  ``f`` must be a pure function of its args."""

    def chain(args, h):
        # fold a negligible data-dependent term of the previous output into
        # the first numeric leaf to serialize iterations (and defeat
        # loop-invariant hoisting) without changing the work
        leaves, treedef = jax.tree_util.tree_flatten(args)
        for i, leaf in enumerate(leaves):
            if not hasattr(leaf, "dtype"):
                continue
            leaves = list(leaves)
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                leaves[i] = leaf + (h * 1e-30).astype(leaf.dtype)
            elif leaf.dtype == jnp.bool_:
                leaves[i] = jnp.logical_xor(leaf, jnp.isnan(h))
            elif jnp.issubdtype(leaf.dtype, jnp.integer):
                leaves[i] = leaf + jnp.isnan(h).astype(leaf.dtype)
            else:
                continue
            break
        return jax.tree_util.tree_unflatten(treedef, leaves)

    @jax.jit
    def run(*args):
        h = jnp.float32(0.0)
        out = None
        for _ in range(iters):
            out = f(*chain(args, h))
            first = jax.tree_util.tree_leaves(out)[0]
            h = first.reshape(-1)[0].astype(jnp.float32)
        return out

    out = run(*args)
    _fence(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*args)
        _fence(out)
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[len(ts) // 2]
