"""Microbench: the resort's sort strategy at 10M-rows scale.

`build_padded_layout` currently runs ONE `jax.lax.sort` carrying the key
plus every payload column (7 operands for the ES model) through the sort
network — measured ~84 ms at 10M/512^2 (PERFORMANCE.md).  The alternative
is sorting (key, row-index) only and permuting the payload columns with
`jnp.take`: the permutation of a nearly-sorted layout is locality-friendly,
so the gathers may beat dragging payloads through the compare-exchange
network.  This measures both forms on the real device so the layout
builder can pick the cheaper one.

PYTHONPATH=/root/repo:$PYTHONPATH \
JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
python examples/bench_resort.py --n 12582912 --payloads 6
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    fence(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        ts.append(time.perf_counter() - t0)
    return 1e3 * sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12_582_912)
    ap.add_argument("--payloads", type=int, default=6,
                    help="payload columns besides the key (ES sorted model: "
                         "pos r/z + vel r/z + weights + spare)")
    ap.add_argument("--tiles", type=int, default=256)
    args = ap.parse_args()

    n, npay = args.n, args.payloads
    rng = np.random.default_rng(0)
    # nearly-sorted keys: a sorted base with ~3% of rows re-keyed, the
    # shape the cadence resort actually sees
    base = np.sort(rng.integers(0, args.tiles, n).astype(np.int32))
    movers = rng.random(n) < 0.03
    keys = jnp.asarray(np.where(movers,
                                rng.integers(0, args.tiles, n), base),
                       dtype=jnp.int32)
    pays = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(npay)]
    print(f"n={n:.3e} payload_cols={npay} dev={jax.devices()[0]}")

    @jax.jit
    def one_sort(k, *ps):
        return jax.lax.sort((k,) + ps, num_keys=1)

    @jax.jit
    def sort_then_take(k, *ps):
        k2, idx = jax.lax.sort((k, jnp.arange(k.shape[0], dtype=jnp.int32)),
                               num_keys=1)
        return (k2,) + tuple(jnp.take(p, idx) for p in ps)

    @jax.jit
    def sort_then_take_stacked(k, *ps):
        # one (N, npay) row-gather instead of npay column gathers
        k2, idx = jax.lax.sort((k, jnp.arange(k.shape[0], dtype=jnp.int32)),
                               num_keys=1)
        m = jnp.stack(ps, axis=-1)
        return k2, jnp.take(m, idx, axis=0)

    t1 = timeit(one_sort, keys, *pays)
    t2 = timeit(sort_then_take, keys, *pays)
    t3 = timeit(sort_then_take_stacked, keys, *pays)
    print(f"one-sort ({1 + npay} operands) : {t1:7.1f} ms")
    print(f"key+index sort, {npay} column takes : {t2:7.1f} ms")
    print(f"key+index sort, one (N,{npay}) row take : {t3:7.1f} ms")


if __name__ == "__main__":
    main()
