"""Microbenchmark: sorted-window factorized gather vs packed XLA gather.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_gather.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from fusion_sim_tpu.ops.interp import cic_gather_packed
from fusion_sim_tpu.ops.sorted_deposit import (
    Tiling2D, build_padded_layout, deposit_sorted_2d, gather_sorted_2d)


def fence(x):
    # Slice ON DEVICE first, then copy one element.  np.asarray(whole_leaf)
    # drags the full array through the tunnel (~2 s for 80 MB) and poisons
    # every timing it fences.
    np.asarray(jax.tree.leaves(x)[0].reshape(-1)[:1])


def timeit(f, *args, n=10):
    out = f(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    fence(out)
    return (time.perf_counter() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_002_432)  # multiple of 1024
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--channels", type=int, default=2)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--margin", type=int, default=4)
    args = ap.parse_args()

    shape = (args.grid, args.grid)
    tiling = Tiling2D(tile_r=args.tile, tile_z=args.tile,
                      block=args.block, margin=args.margin)
    rng = np.random.default_rng(0)
    n = args.n
    pos = (rng.random((n, 2)) * args.grid).astype(np.float32)
    grid = rng.standard_normal((*shape, args.channels)).astype(np.float32)

    print(f"n={n:.1e} grid={shape} C={args.channels} tile={args.tile} "
          f"block={args.block} margin={args.margin} dev={jax.devices()[0]}")

    t_sort, layout = timeit(
        jax.jit(lambda p, w: build_padded_layout(p, shape, tiling, w),
                static_argnames=()), jnp.asarray(pos),
        jnp.ones((n,), jnp.float32), n=3)
    tid, pos_p, w_p, _ = layout
    print(f"build_padded_layout: {1e3 * t_sort:.1f} ms  (padded N={pos_p.shape[0]})")

    g = jnp.asarray(grid)

    t, _ = timeit(lambda: cic_gather_packed(g, jnp.mod(pos_p, float(args.grid)), shape), n=10)
    print(f"cic_gather_packed:   {1e3 * t:.1f} ms")

    t, (vals, in_win) = timeit(lambda: gather_sorted_2d(g, pos_p, tid, shape, tiling), n=10)
    print(f"gather_sorted_2d:    {1e3 * t:.1f} ms   in_win={float(jnp.mean(jnp.where(w_p > 0, in_win, True))):.4f}")

    t, _ = timeit(lambda: gather_sorted_2d(g, pos_p, tid, shape, tiling, mode="nearest"), n=10)
    print(f"gather_sorted_2d(nearest): {1e3 * t:.1f} ms")

    t, _ = timeit(lambda: deposit_sorted_2d(pos_p, w_p, tid, shape, tiling), n=10)
    print(f"deposit_sorted_2d:   {1e3 * t:.1f} ms")

    try:
        from fusion_sim_tpu.ops.pallas_gather import gather_sorted_2d_pallas
        t, (vp, _) = timeit(lambda: gather_sorted_2d_pallas(g, pos_p, tid, shape, tiling), n=10)
        ok = np.allclose(np.asarray(vp)[:4096], np.asarray(vals)[:4096], atol=1e-5)
        print(f"gather_sorted_2d_pallas: {1e3 * t:.1f} ms   match={ok}")
        t, _ = timeit(lambda: gather_sorted_2d_pallas(g, pos_p, tid, shape, tiling, mode="nearest"), n=10)
        print(f"gather_sorted_2d_pallas(nearest): {1e3 * t:.1f} ms")
    except Exception as exc:
        print(f"pallas gather FAILED: {type(exc).__name__}: {str(exc)[:300]}")


if __name__ == "__main__":
    main()
