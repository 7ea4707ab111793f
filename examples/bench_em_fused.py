"""Benchmark: sorted EM PIC step — XLA vs Pallas-gather vs fused backends.

PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_em_fused.py --n 10002432
"""

import argparse
import time

import jax
import numpy as np

from fusion_sim_tpu.models import electromagnetic as em
from fusion_sim_tpu.ops.sorted_deposit import Tiling2D


def fence(sim):
    np.asarray(sim.state.position[:1])


def bench(sim, label, n_steps=20, reps=3):
    sim.step(1)  # compile
    fence(sim)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sim.step(n_steps)
        fence(sim)
        times.append((time.perf_counter() - t0) / n_steps)
    med = sorted(times)[len(times) // 2]
    n = sim.n_real
    print(f"{label}: {1e3 * med:.1f} ms/step  "
          f"({n / med:.2e} particle-updates/s)   spill={int(sim.state.spill)}")
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_002_432)
    ap.add_argument("--cells", type=int, default=512)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--margin", type=int, default=6)
    ap.add_argument("--resort", type=int, default=12)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--precision", default=None,
                    choices=["highest", "exact_bf16", "exact_bf16_pack",
                             "exact_bf16_pack2", "default"],
                    help="fused-kernel matmul strategy (None = auto)")
    ap.add_argument("--backends", default="fused",
                    help="comma list from: xla,pallas,fused")
    ap.add_argument("--repair", action="store_true",
                    help="incremental layout repair instead of resorts")
    args = ap.parse_args()

    d = 0.5
    config = em.EMConfig(grid_shape=(args.cells, args.cells),
                         cell_size=(d, d), dt=0.2 * d,
                         charge=-0.01, mass=0.01, field_gather="centered")
    rng = np.random.default_rng(0)
    pos = (rng.random((args.n, 2)) * args.cells).astype(np.float32)
    vel = (0.05 * rng.standard_normal((args.n, 3))).astype(np.float32)
    tiling = Tiling2D(tile_r=args.tile, tile_z=args.tile,
                      block=args.block, margin=args.margin)
    print(f"n={args.n:.2e} cells={args.cells} tile={args.tile} "
          f"block={args.block} margin={args.margin} resort={args.resort} "
          f"dev={jax.devices()[0]}")

    for backend in args.backends.split(","):
        kw = {}
        if backend == "fused":
            kw["pallas_precision"] = args.precision
        resort = args.resort
        if args.repair:
            kw["repair"] = True
            resort = 10 ** 9
        sim = em.SortedElectromagneticPIC(
            config, pos, vel, tiling=tiling, resort_every=resort,
            check_spill=False, gather_backend=backend, **kw)
        bench(sim, f"{backend:6s}", n_steps=args.steps)
        if args.repair:
            print(f"  unplaced={int(sim.state.unplaced)} "
                  f"dropped={int(sim.state.spill_dropped)}")
        elif int(sim.state.spill_dropped):
            print(f"  WARNING dropped={int(sim.state.spill_dropped)} "
                  f"(deposits lost past spill_capacity — number not exact)")
        del sim


if __name__ == "__main__":
    main()
