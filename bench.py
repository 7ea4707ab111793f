"""Headline benchmark: Boris particle-pushes/sec/chip on the flagship model.

Runs the reference's default scenario physics (mirror-coil field, wall
sinks, box source — fusionsim.js:69-148) at 1M particles through the
framework's production fast path (analytic gather-free stepping,
ops/analytic.py; enable_fast_path on the pusher), plus the grid-sampled
parity path as a secondary number, and prints ONE JSON line.

``vs_baseline`` is relative to the reference's implied throughput: 160,000
particles x 2 substeps x 60 fps = 1.92e7 pushes/s on its 2015 browser GPU
(BASELINE.md "implied push throughput").  The BASELINE.json north-star
target of 1e9 pushes/s/chip corresponds to vs_baseline ~= 52.
"""

import json
import os
import socket
import time

import numpy as np

BASELINE = 1.92e7  # reference at 60 fps (BASELINE.md)


def _await_axon_relay(timeout_s: float = 1200.0) -> bool:
    """If this process is configured for the tunneled axon TPU backend,
    verify the relay is actually reachable before any JAX device use.

    The relay (127.0.0.1:8083) is injected from outside the container and
    can be down; in that state every device-touching call hangs forever
    inside ``make_c_api_client`` with no output.  Poll for up to
    ``timeout_s``; return False if the relay never appears so the caller
    can emit an honest failure line instead of hanging the driver.
    """
    if "axon" not in os.environ.get("PYTHONPATH", "") and \
            os.environ.get("JAX_PLATFORMS", "") != "axon":
        return True  # CPU/other backend: nothing to wait for
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", 8083), timeout=3):
                return True
        except OSError:
            time.sleep(15)
    return False


def build_sim(nparticles: int):
    from fusion_sim_tpu import CylindricalParticlePusher
    from fusion_sim_tpu.scenarios import apply_default_scenario

    sim = CylindricalParticlePusher(
        {"radius": 1.0, "height": 2.0, "nr": 400, "nz": 800, "dt": 2e-9,
         "nparticles": nparticles, "particle_mass": 1.67e-27,
         "particle_charge": 1.602e-19})
    apply_default_scenario(sim)
    return sim


def measure(sim, steps_per_batch: int, batches: int) -> float:
    """Timed pushes/s; sync fences are device->host copies (the tunneled
    axon backend's block_until_ready can return early on chained dispatch)."""
    def fence():
        st = getattr(sim, "_sorted_state", None)
        np.asarray((st if st is not None else sim.state).position[:1])

    n = sim.spec.n_total
    sim.step(steps_per_batch)
    fence()
    t0 = time.perf_counter()
    for _ in range(batches):
        sim.step(steps_per_batch)
    fence()
    dt = time.perf_counter() - t0
    return n * 2 * steps_per_batch * batches / dt


def bench_es_10m(backend: str = "pallas") -> tuple[float, int]:
    """The north-star metric as BASELINE words it: full self-consistent PIC
    steps/sec at 10M particles (2D ES, 512^2) with push+deposit fused in one
    kernel (``backend='pallas'``, ops/pallas_pic.py) and the FFT solve in
    the same jit.  Margin-6 tiling: identical VMEM footprint to margin 4
    (both lane-pad to 128) with ~100x less margin spill.

    Returns ``(median steps/s of 3 windows, spill count, repair_mode)`` —
    the spill count makes the number self-auditing (spilled rows take the
    exact compacted patch; spill_fallback is ON, nothing is shed);
    repair_mode names which configuration rung actually ran
    ('repair+eager' | 'repair' | 'resort-16')."""
    from fusion_sim_tpu.models import electrostatic as es
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D

    n = 10_000_000 - (10_000_000 % 1024)
    cells = 512
    length = 2 * np.pi
    d = length / cells
    vol = length * length
    config = es.ESConfig(grid_shape=(cells, cells), cell_size=(d, d), dt=0.05,
                         charge=-vol / n, mass=vol / n)
    rng = np.random.default_rng(0)
    pos = rng.random((n, 2)).astype(np.float32) * cells
    vel = (0.05 * rng.standard_normal((n, 2))).astype(np.float32)
    # tile 32 margin 6 resort 16 is the fastest EXACT configuration: the
    # round-3 sweep's smaller-window rungs (tile 16 margin 8, resort 32)
    # looked ~15% faster but DROPPED deposits past spill_capacity — spill
    # flux grows ballistically through the resort window (sawtooth) and the
    # late-window per-step spill at 10M exceeds any affordable patch
    # capacity (PERFORMANCE.md sweep table).  Every rung below is
    # drop-audited after its probe; a rung that sheds deposits is rejected.
    t32m6 = Tiling2D(tile_r=32, tile_z=32, block=1024, margin=6)
    import sys

    # Candidate configurations, selected by a MEASURED short window (not by
    # preference: round-3 hardware runs showed the repair machinery's K-row
    # relocation ops cost more than the amortized resort they replace at
    # this spill equilibrium — 186 vs 32 ms/step — so assuming an order
    # here would record the wrong headline).  Repair rungs are sized for
    # the spill EQUILIBRIUM (~0.8%/step at 10M — PERFORMANCE.md
    # "Repair-mode spill equilibrium") and warmed ~100 extra steps so their
    # probe window is steady-state, not the zero-spill fresh-layout
    # transient.
    attempts = [
        ("resort-16", t32m6, dict(resort_every=16)),
    ]
    if backend == "pallas":  # secondary XLA metric: resort rung only
        attempts += [
        ("repair+eager", t32m6,
         dict(resort_every=10 ** 9, repair=True,
              # band flux denominator is tile/2 + margin -
              # keep = 20 cells: ~0.9%/step at 10M, x2
              repair_eager=2, eager_capacity=196608,
              spill_capacity=16384,
              repair_free_slots=2048)),
        ("repair", t32m6,
         dict(resort_every=10 ** 9, repair=True,
              spill_capacity=163840, repair_free_slots=2048)),
        ]
    best = None  # (rate, name, tiling, kw)
    for name, tiling, kw in attempts:
        try:
            sim = es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                            backend=backend,
                                            check_spill=False, **kw)
            sim.step(17)   # compile everything
            if kw.get("repair"):
                sim.step(100)  # walk to the spill equilibrium
            np.asarray(sim.state.position[:1])
            # probe spans one full resort cadence so long-cadence rungs
            # cannot dodge their amortized relayout cost in the comparison
            wp = min(kw.get("resort_every", 16), 32)
            t0 = time.perf_counter()
            sim.step(wp)   # probe window
            np.asarray(sim.state.position[:1])
            rate = wp / (time.perf_counter() - t0)
            if int(sim.state.spill_dropped):
                # rung sheds deposits at this capacity — not exact, reject
                print(f"bench: ES config {name!r} dropped "
                      f"{int(sim.state.spill_dropped)} deposits; rejected",
                      file=sys.stderr)
                continue
            if best is None or rate > best[0]:
                best = (rate, name, tiling, kw)
        except Exception as e:  # noqa: BLE001 — try the next rung
            print(f"bench: ES config {name!r} failed "
                  f"({type(e).__name__}: {e}); skipping", file=sys.stderr)
        finally:
            sim = None
    if best is None:
        raise RuntimeError("every ES bench configuration failed")
    _, repair_mode, tiling, kw = best
    sim = es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                    backend=backend, check_spill=False, **kw)
    sim.step(17)
    if kw.get("repair"):
        sim.step(100)
    np.asarray(sim.state.position[:1])
    # timed windows span exactly one resort cadence (resort rungs) so each
    # window pays its full share of relayout cost — a shorter window would
    # let the median dodge the resort step entirely
    w = min(kw.get("resort_every", 16), 32)
    rates = []
    for _ in range(3):  # median of 3 windows (tunnel variance)
        t0 = time.perf_counter()
        sim.step(w)
        np.asarray(sim.state.position[:1])
        rates.append(w / (time.perf_counter() - t0))
    if int(sim.state.spill_dropped):
        import sys
        print(f"bench: WARNING {int(sim.state.spill_dropped)} rows exceeded "
              f"spill_capacity (deposits lost — number not exact)",
              file=sys.stderr)
    return sorted(rates)[1], int(sim.state.spill), repair_mode


def _audit_pusher_drops(sim, label: str) -> None:
    """Surface any capacity overflow in the sorted pusher's patch/respawn
    machinery: dropped rows retry next substep (no silent corruption), but
    a number measured while dropping is not the exact-semantics number."""
    import sys

    st = getattr(sim, "_sorted_state", None)
    dropped = int(st.dropped) if st is not None else 0
    if dropped:
        print(f"bench: WARNING {label} dropped {dropped} respawn/patch rows "
              f"past capacity {sim._sorted_capacity} during the run",
              file=sys.stderr)


def main() -> None:
    if not _await_axon_relay():
        print(json.dumps({
            "metric": "particle_pushes_per_sec_per_chip",
            "value": 0.0,
            "unit": "pushes/s",
            "vs_baseline": 0.0,
            "error": "axon TPU relay unreachable (127.0.0.1:8083 refused "
                     "for 20 min); hardware bench impossible this run",
        }))
        return

    sim = build_sim(nparticles=1024)  # ~1.05M particles

    grid_pushes = measure(sim, steps_per_batch=20, batches=2)

    # tile-sorted grid mode (same NEAREST parity semantics, fused Mosaic
    # substep with streamed windows + compacted respawn patch —
    # models/pusher_sorted.py, ops/pallas_pusher.py; rbg = the TPU-native
    # counter RNG, distribution-equivalent per SURVEY's RNG-parity rule
    # and ~5x cheaper than threefry — threefry alone was ~15 ms/step here)
    try:
        sim.enable_sorted_path(resort_every=12, backend="fused",
                               rng_impl="rbg")
        grid_sorted = measure(sim, steps_per_batch=20, batches=2)
        _audit_pusher_drops(sim, "grid_mode_sorted")
        sim.disable_sorted_path()
    except Exception as e:  # noqa: BLE001
        grid_sorted = f"failed: {type(e).__name__}"

    # same scenario at 4.2M particles: the sorted step's respawn/spill
    # machinery is a fixed latency chain (~13 ms), so throughput keeps
    # climbing past 1M — this is the capability number for production
    # runs (the reference caps at 160k; N is its nparticles knob)
    try:
        sim4 = build_sim(nparticles=4100)  # ~4.2M particles
        sim4.enable_sorted_path(resort_every=12, backend="fused",
                                rng_impl="rbg")
        grid_sorted_4m = measure(sim4, steps_per_batch=24, batches=2)
        _audit_pusher_drops(sim4, "grid_mode_sorted_4m")
        sim4 = None
    except Exception as e:  # noqa: BLE001
        grid_sorted_4m = f"failed: {type(e).__name__}"

    sim.enable_fast_path()
    fast_pushes = measure(sim, steps_per_batch=50, batches=4)

    # The ES sections compile several large programs (minutes over the
    # tunnel); never let them take down the headline line.
    try:
        es_steps, es_spill, es_repair = bench_es_10m(backend="pallas")
    except Exception as e:  # noqa: BLE001
        es_steps, es_spill, es_repair = f"failed: {type(e).__name__}", -1, False
    try:
        es_steps_xla, _, _ = bench_es_10m(backend="xla")
    except Exception as e:  # noqa: BLE001
        es_steps_xla = f"failed: {type(e).__name__}"

    n_es = 10_000_000 - (10_000_000 % 1024)
    fused_updates = (es_steps * n_es if isinstance(es_steps, float)
                     else es_steps)
    print(json.dumps({
        "metric": "particle_pushes_per_sec_per_chip",
        "value": fast_pushes,
        "unit": "pushes/s",
        "vs_baseline": fast_pushes / BASELINE,
        "grid_mode_value": grid_pushes,
        "grid_mode_sorted_value": grid_sorted,
        "grid_mode_sorted_value_at_4m": grid_sorted_4m,
        # the north star as written: push+deposit+solve in one jit, fused
        # Pallas substep kernel (median of 3 windows, spill patched exactly)
        "fused_pic_updates_per_sec_at_10m": fused_updates,
        "es_pic_steps_per_sec_at_10m": es_steps,
        "es_pic_steps_per_sec_at_10m_xla": es_steps_xla,
        "es_spill_patched_rows": es_spill,
        "es_repair_mode": es_repair,
        "n_particles": sim.spec.n_total,
    }))


if __name__ == "__main__":
    main()
