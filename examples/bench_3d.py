"""Benchmark: 3D sorted ES / EM PIC step at BASELINE config[3] scale.

PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_3d.py \
    --model em --backend fused --n 29997056
"""

import argparse
import time

import jax
import numpy as np

from fusion_sim_tpu.models import electromagnetic as em
from fusion_sim_tpu.models import electrostatic as es
from fusion_sim_tpu.ops.sorted_deposit import Tiling3D


def fence(sim):
    np.asarray(sim.state.position[:1])


def bench(sim, label, n_steps=10, reps=3):
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
    ap.add_argument("--model", default="em", choices=["es", "em"])
    ap.add_argument("--backend", default="fused",
                    help="es: xla|pallas; em: xla|fused")
    ap.add_argument("--n", type=int, default=29_997_056)  # ~3e7, /512
    ap.add_argument("--cells", type=int, default=128)
    ap.add_argument("--tile", type=int, default=8)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--margin", type=int, default=2)
    ap.add_argument("--resort", type=int, default=6)
    ap.add_argument("--repair", action="store_true",
                    help="incremental layout repair instead of resorts "
                         "(cheap for the EM config: ~0.01 cells/step drift "
                         "-> ~40k relocations/step at 3e7)")
    ap.add_argument("--eager", type=int, default=0,
                    help="repair_eager cells (needs --repair)")
    ap.add_argument("--spill-capacity", type=int, default=0,
                    help="0 = auto")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--precision", default=None,
                    choices=["highest", "exact_bf16", "exact_bf16_pack", "default"])
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="tiling dtype (XLA backend matmul precision)")
    args = ap.parse_args()

    nc = args.cells
    tiling = Tiling3D(tile=(args.tile,) * 3, block=args.block,
                      margin=args.margin, dtype=args.dtype)
    rng = np.random.default_rng(0)
    pos = (rng.random((args.n, 3)) * nc).astype(np.float32)
    print(f"n={args.n:.2e} cells={nc}^3 tile={args.tile}^3 "
          f"block={args.block} margin={args.margin} resort={args.resort} "
          f"model={args.model} backend={args.backend} "
          f"precision={args.precision} dev={jax.devices()[0]}")

    kw = {}
    resort = args.resort
    if args.repair:
        # EM 3D flux ~40k/step at 3e7 (0.01 cells/step drift); ES 3D is
        # ~20x hotter (0.05 cells/step over 3 axes) — size accordingly
        default_cap = 98304 if args.model == "em" else 786432
        kw = dict(repair=True,
                  spill_capacity=args.spill_capacity or default_cap,
                  repair_free_slots=512)
        if args.eager:
            kw.update(repair_eager=args.eager,
                      eager_capacity=args.spill_capacity or default_cap,
                      spill_capacity=16384)
        resort = 10 ** 9
    if args.model == "em":
        d = 0.5
        config = em.EMConfig(grid_shape=(nc,) * 3, cell_size=(d,) * 3,
                             dt=0.2 * d, charge=-0.01, mass=0.01,
                             field_gather="centered")
        vel = (0.05 * rng.standard_normal((args.n, 3))).astype(np.float32)
        sim = em.SortedElectromagneticPIC(
            config, pos, vel, tiling=tiling, resort_every=resort,
            check_spill=False, gather_backend=args.backend,
            pallas_precision=args.precision, **kw)
    else:
        length = 2 * np.pi
        d = length / nc
        vol = length ** 3
        config = es.ESConfig(grid_shape=(nc,) * 3, cell_size=(d,) * 3,
                             dt=0.05, charge=-vol / args.n,
                             mass=vol / args.n)
        vel = (0.05 * rng.standard_normal((args.n, 3))).astype(np.float32)
        sim = es.SortedElectrostaticPIC(
            config, pos, vel, tiling=tiling, resort_every=resort,
            check_spill=False, backend=args.backend,
            pallas_precision=args.precision, **kw)
    bench(sim, f"{args.model}-{args.backend}", n_steps=args.steps)


if __name__ == "__main__":
    main()
