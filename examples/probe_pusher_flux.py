"""Measure the sorted pusher's spill/respawn flux, including the sawtooth.

The per-substep patch machinery (compaction + respawn + exact patch) is
sized by ``spill_capacity``; this probe reports the ACTUAL fluxes so
capacities can be right-sized.  Spill flux through a resort window is a
SAWTOOTH — near zero right after a resort, then ballistic growth — so the
buffer must cover the LATE-WINDOW PEAK, not the mean (BENCH_r03 dropped
9k rows at 1M when sized to ~6x the mean).  ``--fine`` steps one step at
a time across full resort windows and prints the per-step flux profile;
the default prints per-window means plus both drop counters
(``dropped`` = respawn backlog past respawn_capacity, ``dropped_over`` =
patch overflow past spill_capacity).

PYTHONPATH=/root/repo:$PYTHONPATH python examples/probe_pusher_flux.py \
    --nparticles 4100 --fine
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nparticles", type=int, default=1024)
    ap.add_argument("--resort", type=int, default=12)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--capacity", type=int, default=None,
                    help="spill_capacity (default: model auto-size)")
    ap.add_argument("--respawn-capacity", type=int, default=None)
    ap.add_argument("--fine", action="store_true",
                    help="per-step flux profile over full resort windows")
    args = ap.parse_args()

    from bench import build_sim

    sim = build_sim(nparticles=args.nparticles)
    sim.enable_sorted_path(resort_every=args.resort, backend="fused",
                           rng_impl="rbg", spill_capacity=args.capacity,
                           respawn_capacity=args.respawn_capacity)
    import jax
    print(f"n_total={sim._sorted_state.position.shape[0]} "
          f"resort={args.resort} spill_capacity={sim._sorted_capacity} "
          f"dev={jax.devices()[0]}")

    sim.step(24)  # warm to quasi-steady state
    st = sim._sorted_state
    np.asarray(st.position[:1])

    def counters():
        st = sim._sorted_state
        return (int(st.spill), int(st.dropped),
                0 if st.dropped_over is None else int(st.dropped_over))

    if args.fine:
        # per-step profile across whole windows: the max row is the number
        # spill_capacity must cover (x2 headroom for seed variance)
        prev = counters()
        peak = 0
        for k in range(args.steps):
            sim.step(1)
            np.asarray(sim._sorted_state.position[:1])
            cur = counters()
            flux = (cur[0] - prev[0]) / 2  # per substep
            peak = max(peak, flux)
            in_win = (24 + k) % args.resort
            print(f"step {24 + k + 1:4d} (window pos {in_win:2d}): "
                  f"spill/substep={flux:8.0f} dropped={cur[1]} "
                  f"dropped_over={cur[2]}")
            prev = cur
        print(f"PEAK spill/substep={peak:.0f} "
              f"(recommend spill_capacity >= {int(2 * peak)})")
        return

    prev = counters()
    prev_alive = float(np.sum(np.asarray(sim._sorted_state.alive)))
    t0 = time.perf_counter()
    for k in range(args.steps // 12):
        sim.step(12)
        st = sim._sorted_state
        np.asarray(st.position[:1])
        cur = counters()
        alive = np.asarray(st.alive)
        valid = np.asarray(st.valid)
        n_dead = int(np.sum((alive < 0.5) & valid))
        print(f"step {24 + 12 * (k + 1):4d}: spill/substep="
              f"{(cur[0] - prev[0]) / 24:8.0f} dropped={cur[1]} "
              f"dropped_over={cur[2]} dead_now={n_dead}")
        prev = cur
    dt = time.perf_counter() - t0
    n = sim.spec.n_total
    print(f"avg {1e3 * dt / args.steps:.2f} ms/step "
          f"({2 * n * args.steps / dt:.3e} pushes/s)")


if __name__ == "__main__":
    main()
