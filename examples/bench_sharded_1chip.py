"""Benchmark: domain-decomposed models at n_shards=1 on one chip.

Measures the overhead of the full sharded composition (halo/apron pseudo-
grid, migration ring, distributed solve) relative to the single-chip fused
models — the VERDICT r2 #3 acceptance check (sharded-sorted-fused within
1.3x of single-chip fused).

PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_sharded_1chip.py
"""

import argparse
import time

import jax
import numpy as np

from fusion_sim_tpu.models import electromagnetic as em
from fusion_sim_tpu.models import electrostatic as es
from fusion_sim_tpu.models.electromagnetic_sharded import (
    ShardedEMConfig, ShardedElectromagneticPIC)
from fusion_sim_tpu.models.electrostatic_sharded import (
    ShardedESConfig, ShardedElectrostaticPIC)
from fusion_sim_tpu.ops.sorted_deposit import Tiling2D, Tiling3D
from fusion_sim_tpu.parallel.mesh import make_mesh


def bench(sim, label, n, steps=10, reps=3, warmup=0):
    def fence():
        np.asarray(jax.tree_util.tree_leaves(sim.state)[0].reshape(-1)[:1])

    sim.step(max(steps, 7, warmup))
    fence()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sim.step(steps)
        fence()
        ts.append((time.perf_counter() - t0) / steps)
    med = sorted(ts)[len(ts) // 2]
    print(f"{label}: {1e3 * med:.1f} ms/step  ({n / med:.2e} updates/s)")
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=0,
                    help="0 = per-dim default (10_002_432 in 2D; the "
                         "BASELINE config[3] 29_997_056 in 3D)")
    ap.add_argument("--cells", type=int, default=0,
                    help="0 = per-dim default (512^2 / 128^3)")
    ap.add_argument("--dim", type=int, default=2, choices=[2, 3],
                    help="3 = the 3D sharded fused composition at the "
                         "config[3] single-chip scale (VERDICT r3 #4: "
                         "compare against bench_3d's 254.8 ms ES / "
                         "448.7 ms EM single-chip numbers)")
    ap.add_argument("--model", default="es", choices=["es", "em"])
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "exact_bf16", "exact_bf16_pack",
                             "exact_bf16_pack2", "default"])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--slack", type=float, default=1.05,
                    help="per-shard slot capacity as a multiple of the "
                         "initial load.  The fused kernel's cost scales "
                         "with TOTAL layout rows (dead slots run as filler "
                         "blocks), so capacity slack is a direct per-step "
                         "tax; at n_shards=1 nothing migrates and ~1.05 "
                         "covers it.  Multi-shard runs need headroom for "
                         "migration imbalance (1.3-1.5 typical).")
    ap.add_argument("--repair", action="store_true",
                    help="incremental layout repair instead of resorts")
    ap.add_argument("--eager", type=int, default=0,
                    help="repair_eager: relocate this many cells before "
                         "window exit (no patch needed)")
    ap.add_argument("--spill-capacity", type=int, default=0,
                    help="0 = auto (equilibrium-sized for repair runs)")
    ap.add_argument("--warmup", type=int, default=0,
                    help="0 = auto (spill equilibrium for ES repair runs)")
    ap.add_argument("--mesh2d", action="store_true",
                    help="use the TWO-AXIS mesh composition on a (1, 1) "
                         "mesh (VERDICT r4 #3 nd=1 sanity timing: fused "
                         "2-D-mesh path vs the 1-D sharded rung)")
    args = ap.parse_args()

    if args.mesh2d and (args.repair or args.eager):
        raise SystemExit("--mesh2d does not support repair/eager")
    mesh = (make_mesh(1, ("sx", "sy"), shape=(1, 1)) if args.mesh2d
            else make_mesh(1, ("space",)))
    ndim = args.dim
    n = args.n or (10_002_432 if ndim == 2 else 29_997_056)
    nc = args.cells or (512 if ndim == 2 else 128)
    rng = np.random.default_rng(0)
    pos = (rng.random((n, ndim)) * nc).astype(np.float32)
    if ndim == 2:
        tiling = Tiling2D(tile_r=32, tile_z=32, block=1024, margin=6)
        resort_es, resort_em = 16, 12
    else:
        # config[3] single-chip tiling (examples/bench_3d.py defaults)
        tiling = Tiling3D(tile=(8, 8, 8), block=512, margin=2)
        resort_es = resort_em = 6
    grid = (nc,) * ndim
    cap = (int(n * args.slack) // 1024) * 1024 + 1024
    print(f"n={n:.2e} cells={nc}^{ndim} dev={jax.devices()[0]}")

    if args.model == "es":
        length = 2 * np.pi
        d = length / nc
        vol = length ** ndim
        base = es.ESConfig(grid_shape=grid, cell_size=(d,) * ndim, dt=0.05,
                           charge=-vol / n, mass=vol / n)
        vel = (0.05 * rng.standard_normal((n, ndim))).astype(np.float32)
        # repair runs measure the spill equilibrium (~0.8%/step relocating
        # at tile 32 margin 6 for this thermal config) — size the patch
        # buffer/stacks for it and warm up to it (see bench_es_fused.py)
        spill_cap = args.spill_capacity or (
            163840 if args.repair else (16384 if ndim == 2 else 65536))
        warmup = args.warmup or (117 if args.repair else 0)
        eager_kw = {}
        if args.eager:
            # band flux rides the eager buffer; patch buffer -> outliers
            eager_kw = dict(repair_eager=args.eager,
                            eager_capacity=196608, )
            spill_cap = args.spill_capacity or 16384
        if args.mesh2d:
            from fusion_sim_tpu.models.electrostatic_sharded2d import (
                ShardedESConfig2D, ShardedElectrostaticPIC2D)

            cfg2 = ShardedESConfig2D(
                base=base, mesh_shape=(1, 1), capacity=cap,
                migration_buffer=8192, tiling=tiling,
                resort_every=resort_es, backend="pallas",
                spill_capacity=spill_cap,
                pallas_precision=args.precision)
            sim = ShardedElectrostaticPIC2D(cfg2, mesh, pos, vel)
            bench(sim, f"sharded2d-es-pallas (1,1) {ndim}D", n,
                  steps=args.steps, warmup=warmup)
            return
        cfg = ShardedESConfig(base=base, n_shards=1, capacity=cap,
                              migration_buffer=8192, tiling=tiling,
                              resort_every=10 ** 9 if args.repair
                              else resort_es,
                              repair=args.repair, backend="pallas",
                              spill_capacity=spill_cap,
                              repair_free_slots=2048 if args.repair else 256,
                              pallas_precision=args.precision, **eager_kw)
        sim = ShardedElectrostaticPIC(cfg, mesh, pos, vel)
        bench(sim, f"sharded-es-pallas nd=1 {ndim}D", n, steps=args.steps,
              warmup=warmup)
    else:
        d = 0.5
        base = em.EMConfig(grid_shape=grid, cell_size=(d,) * ndim,
                           dt=0.2 * d, charge=-0.01, mass=0.01,
                           field_gather="centered")
        vel = (0.05 * rng.standard_normal((n, 3))).astype(np.float32)
        if args.mesh2d:
            from fusion_sim_tpu.models.electromagnetic_sharded2d import (
                ShardedEMConfig2D, ShardedElectromagneticPIC2D)

            cfg2 = ShardedEMConfig2D(
                base=base, mesh_shape=(1, 1), capacity=cap,
                migration_buffer=8192, tiling=tiling,
                resort_every=resort_em, gather_backend="fused",
                pallas_precision=args.precision)
            sim = ShardedElectromagneticPIC2D(cfg2, mesh, pos, vel)
            bench(sim, f"sharded2d-em-fused (1,1) {ndim}D", n,
                  steps=args.steps)
            return
        cfg = ShardedEMConfig(base=base, n_shards=1, capacity=cap,
                              migration_buffer=8192, tiling=tiling,
                              resort_every=10 ** 9 if args.repair
                              else resort_em,
                              repair=args.repair, gather_backend="fused",
                              pallas_precision=args.precision)
        sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
        bench(sim, f"sharded-em-fused nd=1 {ndim}D", n, steps=args.steps)


if __name__ == "__main__":
    main()
