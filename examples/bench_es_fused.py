"""Benchmark: sorted ES PIC step, XLA backend vs fused-Pallas backend.

PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_es_fused.py --n 10002432
"""

import argparse
import time

import jax
import numpy as np

from fusion_sim_tpu.models import electrostatic as es
from fusion_sim_tpu.ops.sorted_deposit import Tiling2D


def fence(sim):
    np.asarray(sim.state.position[:1])


def bench(sim, label, n_steps=20, reps=3, warmup=1):
    sim.step(warmup)  # compile (and, for repair runs, reach equilibrium)
    fence(sim)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sim.step(n_steps)
        fence(sim)
        best.append((time.perf_counter() - t0) / n_steps)
    med = sorted(best)[len(best) // 2]
    n = sim.n_real
    print(f"{label}: {1e3 * med:.1f} ms/step  ({n / med:.2e} particle-updates/s)"
          f"   spill={int(sim.state.spill)}")
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_002_432)
    ap.add_argument("--cells", type=int, default=512)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--margin", type=int, default=6)
    ap.add_argument("--resort", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--repair", action="store_true",
                    help="incremental layout repair instead of resorts")
    ap.add_argument("--precision", default=None,
                    choices=["highest", "exact_bf16", "exact_bf16_pack",
                             "exact_bf16_pack2", "default"],
                    help="fused-kernel matmul strategy (None = auto)")
    ap.add_argument("--spill-capacity", type=int, default=16384)
    ap.add_argument("--warmup", type=int, default=117,
                    help="repair mode: steps to reach spill equilibrium")
    ap.add_argument("--eager", type=int, default=0,
                    help="repair_eager: relocate rows this many cells "
                         "before they leave the window (no patch needed)")
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    length = 2 * np.pi
    d = length / args.cells
    vol = length * length
    config = es.ESConfig(grid_shape=(args.cells, args.cells),
                         cell_size=(d, d), dt=0.05,
                         charge=-vol / args.n, mass=vol / args.n)
    rng = np.random.default_rng(0)
    pos = rng.random((args.n, 2)).astype(np.float32) * args.cells
    vel = (0.05 * rng.standard_normal((args.n, 2))).astype(np.float32)
    tiling = Tiling2D(tile_r=args.tile, tile_z=args.tile,
                      block=args.block, margin=args.margin)
    print(f"n={args.n:.2e} cells={args.cells} tile={args.tile} "
          f"block={args.block} margin={args.margin} resort={args.resort} "
          f"dev={jax.devices()[0]}")

    kw = dict(spill_capacity=args.spill_capacity)
    resort = args.resort
    warmup = 1
    if args.repair:
        # repair runs measure the spill EQUILIBRIUM, not the zero-spill
        # fresh-layout transient: once warm, ~2*E|v_axis|/window_width of
        # rows leave their window per step (Monte-Carlo for this thermal
        # config: 0.8%/step at tile 32 margin 6, 1.6% tile 16 m4, 2.9%
        # tile 8 m4 — see bench.py sizing note), so the patch buffer and
        # per-tile stacks are sized ~2x that and the warmup walks there
        eq_floor = int(args.n * 0.36 / (args.tile / 2 + args.margin))
        eq_floor = -(-max(eq_floor, 131072) // 1024) * 1024
        kw = dict(repair=True,
                  spill_capacity=max(args.spill_capacity, eq_floor),
                  repair_free_slots=2048)
        if args.eager:
            # eager relocation empties the true-spill path: the equilibrium
            # flux rides the (cheap) eager buffer, the patch buffer only
            # covers the post-resort transient.  The band boundary sits at
            # margin - eager cells, so its flux denominator is narrower
            # than the window's.
            band_floor = int(args.n * 0.36
                             / max(args.tile / 2 + args.margin - args.eager,
                                   1))
            band_floor = -(-max(band_floor, 131072) // 1024) * 1024
            kw.update(repair_eager=args.eager, eager_capacity=band_floor,
                      spill_capacity=max(args.spill_capacity, 16384))
        resort = 10 ** 9
        warmup = args.warmup
    sim_p = es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                      resort_every=resort,
                                      backend="pallas", check_spill=False,
                                      pallas_precision=args.precision,
                                      **kw)
    t_p = bench(sim_p, "pallas fused", n_steps=args.steps, warmup=warmup)
    if args.repair:
        print(f"  unplaced={int(sim_p.state.unplaced)} "
              f"dropped={int(sim_p.state.spill_dropped)}")
    elif int(sim_p.state.spill_dropped):
        # rows past spill_capacity lose their deposit — a "fast" number
        # with a nonzero dropped count is NOT exact; raise --spill-capacity
        print(f"  WARNING dropped={int(sim_p.state.spill_dropped)} "
              f"(deposits lost past spill_capacity — number not exact)")
    del sim_p

    if not args.skip_xla:
        sim_x = es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                          resort_every=resort,
                                          check_spill=False, **kw)
        t_x = bench(sim_x, "xla sorted  ", n_steps=args.steps)
        print(f"speedup: {t_x / t_p:.2f}x")


if __name__ == "__main__":
    main()
