"""Time the sorted fused pusher across (resort cadence, spill_capacity)
configurations and audit drops — picks the bench rung OFFLINE so bench.py
runs exactly one known-exact configuration (VERDICT r3 #1b).

The capacity must cover the LATE-WINDOW PEAK of the spill sawtooth
(probe_pusher_flux --fine); the patch chain's cost scales with capacity,
so the winning rung is usually a shorter cadence with a small buffer
rather than a long cadence with a huge one.

PYTHONPATH=/root/repo:$PYTHONPATH \
JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
python examples/probe_pusher_matrix.py --nparticles 1024 \
    --configs 12:16384 12:8192 10:4096
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nparticles", type=int, default=1024)
    ap.add_argument("--configs", nargs="+", default=["12:16384"],
                    help="resort:capacity[:respawn_capacity] tuples")
    ap.add_argument("--windows", type=int, default=4,
                    help="timed span = windows * resort steps (aligned so "
                    "no fresh scan-length compile lands inside the timing)")
    ap.add_argument("--tiers", type=str, default="",
                    help="comma-separated spill_tiers below each config's "
                         "capacity (fused backend tiered patch chains)")
    args = ap.parse_args()

    from bench import build_sim

    import jax
    print(f"dev={jax.devices()[0]}", flush=True)
    results = []
    for cfg in args.configs:
        parts = [int(v) for v in cfg.split(":")]
        resort, cap = parts[0], parts[1]
        rcap = parts[2] if len(parts) > 2 else None
        sim = build_sim(nparticles=args.nparticles)
        tiers = (tuple(int(t) for t in args.tiers.split(","))
                 if args.tiers else ())
        sim.enable_sorted_path(resort_every=resort, backend="fused",
                               rng_impl="rbg", spill_capacity=cap,
                               respawn_capacity=rcap, spill_tiers=tiers)
        n = sim.spec.n_total
        steps = args.windows * resort
        t0 = time.perf_counter()
        sim.step(2 * resort)  # compile + warm past the fresh-layout phase
        np.asarray(sim._sorted_state.position[:1])
        print(f"  [{cfg}] warm {time.perf_counter() - t0:.1f}s", flush=True)
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            sim.step(steps)
            np.asarray(sim._sorted_state.position[:1])
            rates.append(2 * n * steps / (time.perf_counter() - t0))
        st = sim._sorted_state
        drops = (int(st.dropped), int(st.dropped_over))
        rate = sorted(rates)[1]
        exact = drops == (0, 0)
        results.append((rate if exact else -rate, cfg, drops))
        print(f"  [{cfg}] {rate:.3e} pushes/s "
              f"({2e3 * n / rate:.1f} ms/step) "
              f"dropped={drops[0]} dropped_over={drops[1]}"
              f"{'' if exact else '  ** NOT EXACT **'}", flush=True)
        sim = None
    results.sort(reverse=True)
    print(f"BEST exact rung: {results[0][1]} at {results[0][0]:.3e} pushes/s")


if __name__ == "__main__":
    main()
