"""Headline benchmark: Boris particle-pushes/sec/chip on the flagship model.

Runs the reference's default scenario physics (400x800 grid, mirror-coil
field, wall sinks, box source — fusionsim.js:69-148) at a benchmark particle
count, stepping with the fused scan path, and prints ONE JSON line:

    {"metric": "particle_pushes_per_sec_per_chip", "value": ..., "unit":
     "pushes/s", "vs_baseline": ...}

``vs_baseline`` is relative to the reference's implied throughput: 160,000
particles x 2 substeps x 60 fps = 1.92e7 pushes/s on its 2015 browser GPU
(BASELINE.md "implied push throughput").  The BASELINE.json north-star
target is 1e9 pushes/s/chip (vs_baseline ~ 52).
"""

import json
import time

import numpy as np


def main() -> None:
    import jax

    from fusion_sim_tpu import CylindricalParticlePusher

    nr, nz = 400, 800
    nparticles = 1024           # per side -> ~1.05M particles
    n = nparticles ** 2
    steps_per_batch = 50

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

    # warm-up (compile); sync via host copy — on the tunneled axon backend,
    # block_until_ready on chained dispatches can return before execution
    # completes, so all timing fences here are device->host copies.
    sim.step(steps_per_batch)
    np.asarray(sim.state.position)

    # timed
    t0 = time.perf_counter()
    batches = 4
    for _ in range(batches):
        sim.step(steps_per_batch)
    np.asarray(sim.state.position)
    dt = time.perf_counter() - t0

    total_pushes = n * 2 * steps_per_batch * batches
    pushes_per_sec = total_pushes / dt
    baseline = 1.92e7  # reference at 60 fps (BASELINE.md)

    print(json.dumps({
        "metric": "particle_pushes_per_sec_per_chip",
        "value": pushes_per_sec,
        "unit": "pushes/s",
        "vs_baseline": pushes_per_sec / baseline,
    }))


if __name__ == "__main__":
    main()
