"""Two-stream instability demo (BASELINE configs[1] scale).

Runs the 1e5-particle, 512-cell cold two-stream setup, tracks field energy
through the linear growth phase, fits the growth rate against the cold-beam
dispersion relation, and writes a phase-space + energy-history figure.
"""

import argparse
import sys

import numpy as np

from fusion_sim_tpu.models import electrostatic as es
from fusion_sim_tpu.utils.colormaps import preset
from fusion_sim_tpu.utils.png import encode_png


def theory_gamma(k_v0: float, omega_b_sq: float) -> float:
    a2 = k_v0 ** 2
    w2 = (a2 + omega_b_sq) - np.sqrt(omega_b_sq ** 2 + 4 * omega_b_sq * a2)
    return float(np.sqrt(-w2)) if w2 < 0 else 0.0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=100_000)
    p.add_argument("--cells", type=int, default=512)
    p.add_argument("--out", default="/tmp/two_stream.png")
    args = p.parse_args()

    v0 = 0.2
    sim = es.two_stream(n_particles=args.particles, n_cells=args.cells,
                        v0=v0, perturbation=1e-4, dt=0.05)
    k = 2 * np.pi / sim.config.lengths[0]
    gamma_th = theory_gamma(k * v0, 0.5)

    times, fe = [], []
    for i in range(80):
        sim.step(10)
        times.append((i + 1) * 0.5)
        fe.append(sim.energies()["field"])
        if i % 10 == 9:
            print(f"t={times[-1]:6.1f}  field energy={fe[-1]:.3e}", flush=True)

    t = np.array(times)
    log_fe = np.log(fe)
    sat = log_fe.max()
    mask = (log_fe > log_fe[0] + 2) & (log_fe < sat - 2) & (t < t[np.argmax(log_fe)])
    gamma = np.polyfit(t[mask], log_fe[mask], 1)[0] / 2 if mask.sum() >= 3 else float("nan")
    print(f"growth rate: measured {gamma:.4f} vs theory {gamma_th:.4f} "
          f"({100 * abs(gamma - gamma_th) / gamma_th:.1f}% off)")

    # phase-space (x, v) density image + energy history strip
    pos = np.asarray(sim.state.position)[:, 0]
    vel = np.asarray(sim.state.velocity)[:, 0]
    hist, _, _ = np.histogram2d(pos, vel, bins=(400, 200),
                                range=((0, args.cells), (-3 * v0, 3 * v0)))
    cm = preset("hot", 0, float(np.percentile(hist, 99.5)) or 1.0)
    img = np.asarray(cm.apply(hist.T[::-1]))
    with open(args.out, "wb") as f:
        f.write(encode_png(np.ascontiguousarray(img)))
    print(f"wrote phase-space figure to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
