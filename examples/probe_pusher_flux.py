"""Measure the sorted pusher's steady-state spill/respawn flux.

The per-substep patch machinery (compaction + respawn + exact patch) is
sized by ``spill_capacity``; this probe reports the ACTUAL per-substep
fluxes at steady state so capacities can be right-sized:

  * spill  — rows out of their sort window (g/s masks, cumulative in state)
  * respawn — rows absorbed by a sink this substep (fresh respawns)

PYTHONPATH=/root/repo:$PYTHONPATH python examples/probe_pusher_flux.py
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nparticles", type=int, default=1024)
    ap.add_argument("--resort", type=int, default=12)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--capacity", type=int, default=16384)
    args = ap.parse_args()

    from bench import build_sim

    sim = build_sim(nparticles=args.nparticles)
    sim.enable_sorted_path(resort_every=args.resort, backend="fused",
                           rng_impl="rbg", spill_capacity=args.capacity)
    import jax
    print(f"n_total={sim._sorted_state.position.shape[0]} "
          f"resort={args.resort} dev={jax.devices()[0]}")

    sim.step(24)  # warm to quasi-steady state
    prev_spill = int(sim._sorted_state.spill)
    prev_alive = float(np.sum(np.asarray(sim._sorted_state.alive)))
    t0 = time.perf_counter()
    for k in range(args.steps // 12):
        sim.step(12)
        st = sim._sorted_state
        np.asarray(st.position[:1])
        sp = int(st.spill)
        dr = int(st.dropped)
        alive = np.asarray(st.alive)
        valid = np.asarray(st.valid)
        n_dead = int(np.sum((alive < 0.5) & valid))
        print(f"step {24 + 12 * (k + 1):4d}: spill/substep="
              f"{(sp - prev_spill) / 24:8.0f} dropped_total={dr} "
              f"dead_now={n_dead}")
        prev_spill = sp
    dt = time.perf_counter() - t0
    n = sim.spec.n_total
    print(f"avg {1e3 * dt / args.steps:.2f} ms/step "
          f"({2 * n * args.steps / dt:.3e} pushes/s)")


if __name__ == "__main__":
    main()
