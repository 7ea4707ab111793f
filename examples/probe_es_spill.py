"""Probe the sorted ES model's per-step spill flux through resort windows.

BENCH_r03 rejected the ES resort-16 rung because it dropped 124,588
deposits past spill_capacity=16384 — contradicting the round-3 sweep's
"dropped=0 audited" row.  Spill flux through a resort window is a
SAWTOOTH (near zero right after a resort, then ballistic), so the audit
must span full windows at the worst phase.  This probe steps ONE step at
a time through whole resort windows, prints the per-step spill delta and
both drop counters, and recommends the capacity that covers the peak.

PYTHONPATH=/root/repo:$PYTHONPATH python examples/probe_es_spill.py \
    --capacity 16384 --resort 16 --windows 4
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--cells", type=int, default=512)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--margin", type=int, default=6)
    ap.add_argument("--resort", type=int, default=16)
    ap.add_argument("--capacity", type=int, default=16384)
    ap.add_argument("--tiers", type=str, default="",
                    help="comma-separated spill_tiers below capacity, "
                         "e.g. '1024,4096' (one cond chain per tier; the "
                         "smallest covering tier runs hot each step)")
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--warm", type=int, default=0,
                    help="extra warm steps before profiling (beyond compile)")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--precision", default=None,
                    help="pallas_precision: highest | exact_bf16 | default")
    ap.add_argument("--quick", action="store_true",
                    help="skip the per-step walk; just time 3 windows + audit")
    args = ap.parse_args()

    from fusion_sim_tpu.models import electrostatic as es
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D

    n = args.n - (args.n % 1024)
    cells = args.cells
    length = 2 * np.pi
    d = length / cells
    vol = length * length
    config = es.ESConfig(grid_shape=(cells, cells), cell_size=(d, d),
                         dt=0.05, charge=-vol / n, mass=vol / n)
    rng = np.random.default_rng(0)
    pos = rng.random((n, 2)).astype(np.float32) * cells
    vel = (0.05 * rng.standard_normal((n, 2))).astype(np.float32)
    tiling = Tiling2D(tile_r=args.tile, tile_z=args.tile, block=1024,
                      margin=args.margin)
    tiers = (tuple(int(t) for t in args.tiers.split(","))
             if args.tiers else None)
    sim = es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                    backend=args.backend,
                                    resort_every=args.resort,
                                    spill_capacity=args.capacity,
                                    spill_tiers=tiers,
                                    pallas_precision=args.precision,
                                    check_spill=False)
    import jax
    print(f"n={n} tile={args.tile} margin={args.margin} "
          f"resort={args.resort} capacity={args.capacity} tiers={tiers} "
          f"backend={args.backend} dev={jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()
    sim.step(1)
    np.asarray(sim.state.position[:1])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)
    # align to a window boundary: bench steps 17 after construction; here
    # we walk to the next resort boundary so window positions are honest
    done = 1 + args.warm
    if args.warm:
        sim.step(args.warm)
    to_boundary = (-done) % args.resort
    if to_boundary:
        sim.step(to_boundary)
        done += to_boundary
    np.asarray(sim.state.position[:1])

    if args.quick:
        sim.step(args.resort)  # one more warm window past the boundary walk
        np.asarray(sim.state.position[:1])
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            sim.step(args.resort)
            np.asarray(sim.state.position[:1])
            rates.append(args.resort / (time.perf_counter() - t0))
        dr = int(sim.state.spill_dropped)
        print(f"median steps/s over 3 windows: {sorted(rates)[1]:.2f} "
              f"({1e3 / sorted(rates)[1]:.1f} ms/step), dropped_total={dr}"
              f"{'  ** NOT EXACT **' if dr else ''}")
        return

    prev_spill = int(sim.state.spill)
    prev_drop = int(sim.state.spill_dropped)
    peak = 0
    for k in range(args.windows * args.resort):
        sim.step(1)
        np.asarray(sim.state.position[:1])
        sp, dr = int(sim.state.spill), int(sim.state.spill_dropped)
        flux = sp - prev_spill + (dr - prev_drop)  # total out-of-window rows
        peak = max(peak, flux)
        print(f"step {done + k + 1:4d} (window pos {k % args.resort:2d}): "
              f"spill={sp - prev_spill:8d} dropped_delta={dr - prev_drop:8d} "
              f"dropped_total={dr}", flush=True)
        prev_spill, prev_drop = sp, dr
    print(f"PEAK out-of-window rows/step={peak} "
          f"(spill_capacity must be >= peak; recommend {int(1.5 * peak)})")

    # timed windows at this capacity for the cost side of the trade
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        sim.step(args.resort)
        np.asarray(sim.state.position[:1])
        rates.append(args.resort / (time.perf_counter() - t0))
    dr = int(sim.state.spill_dropped)
    print(f"median steps/s over 3 windows: {sorted(rates)[1]:.2f} "
          f"({1e3 / sorted(rates)[1]:.1f} ms/step), dropped_total={dr}")


if __name__ == "__main__":
    main()
