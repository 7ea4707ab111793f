"""Benchmark: grid-parity pusher paths (XLA sorted vs streamed fused).

PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_pusher.py \
    --backend fused --rng rbg
"""

import argparse
import time

import jax
import numpy as np

from fusion_sim_tpu import CylindricalParticlePusher
from fusion_sim_tpu.scenarios import apply_default_scenario


def default_scenario(nparticles=1024):
    sim = CylindricalParticlePusher(
        {"radius": 1.0, "height": 2.0, "nr": 400, "nz": 800, "dt": 2e-9,
         "nparticles": nparticles, "particle_mass": 1.67e-27,
         "particle_charge": 1.602e-19})
    apply_default_scenario(sim)
    return sim


def measure(sim, label, steps=20, reps=3):
    def fence():
        st = getattr(sim, "_sorted_state", None)
        np.asarray((st if st is not None else sim.state).position[:1])

    sim.step(max(steps, 13))  # compile + one resort
    fence()
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sim.step(steps)
        fence()
        rates.append(steps / (time.perf_counter() - t0))
    r = sorted(rates)[len(rates) // 2]
    n = sim.spec.n_total
    # 2 substeps (pushes) per step
    print(f"{label}: {1e3 / r:.2f} ms/step  ({2 * n * r:.3e} pushes/s)")
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="fused",
                    choices=["xla", "pallas", "fused"])
    ap.add_argument("--rng", default=None, choices=[None, "rbg"])
    ap.add_argument("--repair", action="store_true",
                    help="incremental layout repair instead of resorts")
    ap.add_argument("--nparticles", type=int, default=1024)  # x1024
    ap.add_argument("--resort", type=int, default=12)
    ap.add_argument("--capacity", type=int, default=16384,
                    help="spill/respawn patch capacity (measured steady-"
                         "state flux on the default scenario is ~650 rows/"
                         "substep at 1M — examples/probe_pusher_flux.py)")
    ap.add_argument("--tile", default="")
    ap.add_argument("--margin", type=int, default=6)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    sim = default_scenario(nparticles=args.nparticles)
    tiling = None
    if args.tile:
        from fusion_sim_tpu.ops.sorted_deposit import Tiling2D
        tr, tz = (int(x) for x in args.tile.split(","))
        tiling = Tiling2D(tile_r=tr, tile_z=tz, block=1024,
                          margin=args.margin)
    print(f"dev={jax.devices()[0]} backend={args.backend} rng={args.rng} "
          f"tiling={tiling}")
    kw = {}
    resort = args.resort
    if args.repair:
        kw = dict(repair=True)
        resort = 10 ** 9
    sim.enable_sorted_path(tiling=tiling, resort_every=resort,
                           backend=args.backend, rng_impl=args.rng,
                           spill_capacity=args.capacity, **kw)
    measure(sim, f"sorted-{args.backend}", steps=args.steps)
    st = sim._sorted_state
    extra = (f" unplaced={int(st.unplaced)}" if args.repair else "")
    print(f"  spill={int(st.spill)} dropped={int(st.dropped)}{extra}")


if __name__ == "__main__":
    main()
