"""Multi-chip weak-scaling harness: steps/s vs n_devices at fixed
particles-per-device (VERDICT round-1 item 10).

Runs the domain-decomposed models (ShardedElectromagneticPIC packed and
sorted, ShardedElectrostaticPIC) on a device mesh, growing the problem with
the mesh so per-device work is constant; perfect weak scaling = flat
ms/step.  On this machine real multi-chip hardware is unavailable, so the
default run uses the 8-virtual-device CPU mesh (correctness + collective
structure; absolute numbers are CPU-bound).  On a real pod, run with
JAX_PLATFORMS unset and the pod's device count.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/bench_weak_scaling.py --devices 1 2 4 8 --cpu

Per round it reports ms/step and per-device particle-updates/s; ICI
collective fraction can be profiled separately with jax.profiler.
"""

import argparse
import time

import numpy as np


def fence(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0].reshape(-1)[:1])


def bench_model(sim, n_steps=10, reps=3):
    sim.step(1)
    fence(sim.state)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sim.step(n_steps)
        fence(sim.state)
        times.append((time.perf_counter() - t0) / n_steps)
    return sorted(times)[len(times) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--per-device", type=int, default=131072,
                    help="particles per device")
    ap.add_argument("--cells-x-per-device", type=int, default=32)
    ap.add_argument("--cells-y", type=int, default=128)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh (tests/CI)")
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from fusion_sim_tpu.models import electromagnetic as em
    from fusion_sim_tpu.models import electrostatic as es
    from fusion_sim_tpu.models.electromagnetic_sharded import (
        ShardedEMConfig, ShardedElectromagneticPIC)
    from fusion_sim_tpu.models.electrostatic_sharded import (
        ShardedESConfig, ShardedElectrostaticPIC)
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D
    from fusion_sim_tpu.parallel.mesh import make_mesh

    avail = len(jax.devices())
    print(f"devices available: {avail} ({jax.devices()[0].platform})")
    rows = []
    for nd in args.devices:
        if nd > avail:
            print(f"-- skipping n_devices={nd} (> {avail} available)")
            continue
        mesh = make_mesh(nd, ("space",))
        n = args.per_device * nd
        nx = args.cells_x_per_device * nd
        ny = args.cells_y
        d = 0.5
        rng = np.random.default_rng(0)
        pos = (rng.random((n, 2)) * [nx, ny]).astype(np.float32)
        vel = (0.2 * rng.standard_normal((n, 3))).astype(np.float32)
        cap = int(args.per_device * 1.5) // 1024 * 1024 + 1024

        base = em.EMConfig(grid_shape=(nx, ny), cell_size=(d, d), dt=0.2 * d,
                           charge=-0.01, mass=0.01, field_gather="centered")
        for label, tiling in (("em-packed", None),
                              ("em-sorted",
                               Tiling2D(tile_r=8, tile_z=8, block=1024,
                                        margin=2))):
            cfg = ShardedEMConfig(base=base, n_shards=nd, capacity=cap,
                                  migration_buffer=4096, tiling=tiling,
                                  resort_every=6)
            sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
            t = bench_model(sim, n_steps=args.steps)
            rows.append((label, nd, 1e3 * t, n / t / nd))
            print(f"{label:10s} nd={nd}: {1e3 * t:8.1f} ms/step  "
                  f"{n / t / nd:.3e} updates/s/device")
            del sim

        d_es = 2 * np.pi / ny
        es_cfg = ShardedESConfig(
            base=es.ESConfig(grid_shape=(nx, ny), cell_size=(d_es, d_es),
                             dt=0.05, charge=-1.0 / n, mass=1.0 / n),
            n_shards=nd, capacity=cap, migration_buffer=4096)
        sim = ShardedElectrostaticPIC(
            es_cfg, mesh, pos, (0.05 * rng.standard_normal((n, 2))).astype(np.float32))
        t = bench_model(sim, n_steps=args.steps)
        rows.append(("es-fft", nd, 1e3 * t, n / t / nd))
        print(f"{'es-fft':10s} nd={nd}: {1e3 * t:8.1f} ms/step  "
              f"{n / t / nd:.3e} updates/s/device")
        del sim

    print("\nweak scaling summary (flat ms/step = perfect):")
    for label in dict.fromkeys(r[0] for r in rows):
        xs = [(r[1], r[2]) for r in rows if r[0] == label]
        base_t = xs[0][1]
        eff = ", ".join(f"nd={n}: {t:.1f}ms ({100 * base_t / t:.0f}%)"
                        for n, t in xs)
        print(f"  {label}: {eff}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
