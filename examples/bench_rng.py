"""Microbench: per-substep uniform generation cost, threefry vs rbg.

The grid-parity pusher draws (N, 4) uniforms per substep
(ops/rng.substep_uniforms — empic.js:1436-1469's one-rand-texture-per-
substep consumption).  Round-2 profiling attributed ~15 ms/step at 1.05M
to threefry; the rbg counter RNG was projected ~5x cheaper, but the
round-3 hardware run measured only 23.2 -> 22.0 ms/step — this isolates
whether the generator (or something else) owns that time.

PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_rng.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from fusion_sim_tpu.ops.rng import substep_uniforms


def timeit(fn, *args, reps=7):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    print(f"dev={jax.devices()[0]}")
    for n in (1_048_576, 10_002_432):
        for impl in ("threefry2x32", "rbg"):
            key = jax.random.key(0, impl=impl)
            f = jax.jit(lambda k: substep_uniforms(k, n))
            t = timeit(f, key)
            print(f"substep_uniforms n={n:>9} {impl:12s}: {1e3 * t:7.2f} ms "
                  f"({n * 4 * 4 / t / 1e9:.1f} GB/s)")
        # two chained substeps (one full step's worth) — checks whether the
        # split/advance serializes anything
        key = jax.random.key(0, impl="rbg")

        def two(k, n=n):
            r1, k = substep_uniforms(k, n)
            r2, k = substep_uniforms(k, n)
            return r1[0, 0] + r2[0, 0], k
        t = timeit(jax.jit(two), key)
        print(f"2x substep_uniforms n={n:>9} rbg   : {1e3 * t:7.2f} ms")


if __name__ == "__main__":
    main()
