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
import time

import numpy as np

BASELINE = 1.92e7  # reference at 60 fps (BASELINE.md)


def build_sim(nparticles: int):
    from fusion_sim_tpu import CylindricalParticlePusher

    nr, nz = 400, 800
    n = nparticles ** 2
    sim = CylindricalParticlePusher(
        {"radius": 1.0, "height": 2.0, "nr": nr, "nz": nz, "dt": 2e-9,
         "nparticles": nparticles, "particle_mass": 1.67e-27,
         "particle_charge": 1.602e-19})
    rng = np.random.default_rng(0)
    sink = np.ones((nr, nz), np.float32)
    sink[-1, :] = 0
    sink[1:-1, 0] = 0
    sink[1:-1, -1] = 0
    source = np.zeros((nr, nz), np.float32)
    source[:50, 350:450] = 1.0
    sim.set({
        "position": 0.2 * (rng.random((n, 3)) - 0.5) + np.array([0, 0, 1.0]),
        "velocity": 0.002 * (rng.random((n, 3)) - 0.5),
        "sink_mask": sink,
        "source_pdf": source,
    })
    sim.add_current_loop(0.8, 2.0, -1e7)
    sim.add_current_loop(0.8, 0.0, 1e7)
    sim.precalc()
    return sim


def measure(sim, steps_per_batch: int, batches: int) -> float:
    """Timed pushes/s; sync fences are device->host copies (the tunneled
    axon backend's block_until_ready can return early on chained dispatch)."""
    n = sim.spec.n_total
    sim.step(steps_per_batch)
    np.asarray(sim.state.position[:1])
    t0 = time.perf_counter()
    for _ in range(batches):
        sim.step(steps_per_batch)
    np.asarray(sim.state.position[:1])
    dt = time.perf_counter() - t0
    return n * 2 * steps_per_batch * batches / dt


def bench_es_10m() -> float:
    """Tracked secondary metric: full self-consistent PIC steps/sec at 10M
    particles (2D ES, 512^2, sorted digit-matmul deposition)."""
    from fusion_sim_tpu.models import electrostatic as es

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
    sim = es.SortedElectrostaticPIC(config, pos, vel, resort_every=8)
    sim.step(9)  # compile everything incl. one resort
    np.asarray(sim.state.position[:1])
    t0 = time.perf_counter()
    sim.step(16)
    np.asarray(sim.state.position[:1])
    return 16 / (time.perf_counter() - t0)


def main() -> None:
    sim = build_sim(nparticles=1024)  # ~1.05M particles

    grid_pushes = measure(sim, steps_per_batch=20, batches=2)

    sim.enable_fast_path()
    fast_pushes = measure(sim, steps_per_batch=50, batches=4)

    es_steps = bench_es_10m()

    print(json.dumps({
        "metric": "particle_pushes_per_sec_per_chip",
        "value": fast_pushes,
        "unit": "pushes/s",
        "vs_baseline": fast_pushes / BASELINE,
        "grid_mode_value": grid_pushes,
        "es_pic_steps_per_sec_at_10m": es_steps,
        "n_particles": sim.spec.n_total,
    }))


if __name__ == "__main__":
    main()
