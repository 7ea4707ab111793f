"""The reference's default scenario (fusionsim.js:69-156), headless.

160,000 protons in a 1 m x 2 m cylinder, 400x800 grid, two opposed 1e7 A
current loops (magnetic mirror/cusp), wall sinks, box source, dt = 2 ns.
Runs N frames of step()+density() and writes the last frame as a PPM image.
"""

import argparse
import sys
import time

import numpy as np

from fusion_sim_tpu import CylindricalParticlePusher
from fusion_sim_tpu.utils.render import frame_to_uint8


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--out", default="/tmp/fusion_frame.ppm")
    p.add_argument("--nr", type=int, default=400)
    p.add_argument("--nz", type=int, default=800)
    p.add_argument("--nparticles", type=int, default=400, help="per side; total n^2")
    args = p.parse_args()

    spec = {
        "radius": 1.0, "height": 2.0, "nr": args.nr, "nz": args.nz,
        "dt": 2e-9, "nparticles": args.nparticles,
        "particle_mass": 1.67e-27, "particle_charge": 1.602e-19,
    }
    t0 = time.perf_counter()
    sim = CylindricalParticlePusher(spec)
    print(f"constructed in {time.perf_counter()-t0:.1f}s", flush=True)

    from fusion_sim_tpu.scenarios import apply_default_scenario

    n = args.nparticles ** 2
    apply_default_scenario(sim)

    frame = sim.density()  # initial frame, like fusionsim.js:153
    t0 = time.perf_counter()
    for i in range(args.frames):
        sim.step()
        frame = sim.density()
    frame.block_until_ready()
    dt = time.perf_counter() - t0
    fps = args.frames / dt
    pushes = n * 2 * args.frames / dt
    print(f"{args.frames} frames in {dt:.2f}s -> {fps:.1f} fps, "
          f"{pushes:.3e} pushes/s", flush=True)

    img = np.asarray(frame_to_uint8(frame))
    with open(args.out, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())
    print(f"wrote {args.out} ({img.shape[1]}x{img.shape[0]})")
    alive = np.asarray(sim.state.alive)
    print(f"alive fraction this substep: {alive.mean():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
