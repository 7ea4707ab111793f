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


def bench_fn(fn, *xs, n=10, reps=3):
    """Median per-call time of a jitted fn (device-sliced fence)."""
    out = fn(*xs)
    fence(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*xs)
        fence(out)
        times.append((time.perf_counter() - t0) / n)
    return sorted(times)[len(times) // 2]


def phase_times_es(cfg, mesh, sim, axis="space"):
    """Per-phase timings of the packed sharded ES step: deposit, apron fold,
    field halo, distributed FFT solve, gather, migration (VERDICT r2
    next-step #9 — gives the collective-fraction table for pod runs).

    Each phase is timed as its own shard_mapped jit on the live state's
    shapes; fractions are vs the sum (the fused full step overlaps some)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from fusion_sim_tpu.models.electrostatic_sharded import APRON_W, HALO_W
    from fusion_sim_tpu.ops.interp import cic_deposit_packed, cic_gather_packed
    from fusion_sim_tpu.ops.solvers import poisson_fft_sharded
    from fusion_sim_tpu.parallel import halo, migration

    base = cfg.base
    slab = cfg.slab
    rest = base.grid_shape[1:]
    pad_shape = (slab + 2 * APRON_W, *rest)
    halo_shape = (slab + 2 * HALO_W, *rest)
    pos, vel = sim.state.position, sim.state.velocity
    alive = sim.state.alive
    w = jnp.where(alive, jnp.float32(1.0), 0.0)
    rho = jnp.zeros(base.grid_shape, jnp.float32)
    rho_pad_g = jnp.zeros((cfg.n_shards * pad_shape[0], *rest), jnp.float32)
    e_grid = jnp.zeros((*base.grid_shape, len(base.grid_shape)), jnp.float32)

    def sm(f, in_specs, out_specs):
        return jax.jit(shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs))

    p1, p2 = P(axis), P(axis, None)
    pf = P(axis, *([None] * (len(base.grid_shape) - 1)))
    pfc = P(axis, *([None] * len(base.grid_shape)))

    phases = {}
    phases["deposit"] = (sm(
        lambda p, ww: cic_deposit_packed(
            jnp.concatenate([jnp.mod(p[:, :1], slab) + APRON_W, p[:, 1:]], 1),
            ww, pad_shape), (p2, p1), pf), (pos, w))
    phases["apron"] = (sm(
        lambda r: halo.accumulate_apron(r, axis, APRON_W), (pf,), pf),
        (rho_pad_g,))
    phases["halo"] = (sm(
        lambda e: halo.with_halo(e, axis, HALO_W), (pfc,), pfc), (e_grid,))
    phases["solve"] = (sm(
        lambda r: poisson_fft_sharded(r, base.grid_shape, base.cell_size,
                                      axis), (pf,), pf), (rho,))
    phases["gather"] = (sm(
        lambda e, p: cic_gather_packed(
            halo.with_halo(e, axis, HALO_W),
            jnp.concatenate([jnp.mod(p[:, :1], slab) + HALO_W, p[:, 1:]], 1),
            halo_shape), (pfc, p2), p2), (e_grid, pos))

    def mig(p, v, a):
        gl = jnp.logical_and(a, p[:, 0] % slab < 0.05)
        gr = jnp.logical_and(a, p[:, 0] % slab > slab - 0.05)
        res = migration.migrate_ring((p, v), a, gl, gr, axis,
                                     cfg.migration_buffer)
        return res.arrays[0], res.arrays[1], res.alive

    if cfg.n_shards > 1:
        phases["migrate"] = (sm(mig, (p2, p2, p1), (p2, p2, p1)),
                             (pos, vel, alive))

    out = {}
    for name, (fn, xs) in phases.items():
        out[name] = bench_fn(fn, *xs)
    return out


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
    ap.add_argument("--phases", action="store_true",
                    help="per-phase timings (deposit/halo/solve/gather/"
                         "migration) for the ES model per device count")
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
        if args.phases:
            ph = phase_times_es(es_cfg, mesh, sim)
            tot = sum(ph.values())
            comm = sum(v for k, v in ph.items()
                       if k in ("halo", "apron", "migrate")) + 0.0
            print(f"  es phases nd={nd}: " + "  ".join(
                f"{k}={1e3 * v:.2f}ms({100 * v / tot:.0f}%)"
                for k, v in ph.items()))
            print(f"  es comm fraction nd={nd}: {100 * comm / tot:.1f}% "
                  f"(halo+apron+migrate; solve's all_to_all counted as "
                  f"solve)")
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
