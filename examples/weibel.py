"""Weibel (filamentation) instability demo — EM PIC validation.

Two cold counter-streaming (out-of-plane) electron populations drive
magnetic filamentation: B-field energy grows at gamma ~ v0 * omega_p
(cold-beam filamentation rate in the k*c >> omega_p limit).  Exercises the
full Yee + Esirkepov loop and prints the measured growth rate and a
filament image of B_x.
"""

import argparse
import sys

import numpy as np

from fusion_sim_tpu.models import electromagnetic as em
from fusion_sim_tpu.utils.colormaps import preset
from fusion_sim_tpu.utils.png import encode_png


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=500_000)
    p.add_argument("--cells", type=int, default=128)
    p.add_argument("--v0", type=float, default=0.2)
    p.add_argument("--out", default="/tmp/weibel.png")
    args = p.parse_args()

    n_cells = args.cells
    length = 32.0       # omega_p = 1 units, c = 1
    d = length / n_cells
    vol = length * length
    n = args.particles
    config = em.EMConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                         dt=0.4 * d, charge=-vol / n, mass=vol / n,
                         field_gather="centered")

    rng = np.random.default_rng(0)
    pos = rng.random((n, 2)) * n_cells
    vel = np.zeros((n, 3), np.float32)
    vel[: n // 2, 2] = args.v0
    vel[n // 2:, 2] = -args.v0
    vel[:, :2] = 1e-3 * rng.standard_normal((n, 2))  # seed noise

    sim = em.ElectromagneticPIC(config, pos, vel)

    def b_energy():
        b = np.asarray(sim.state.b)
        return float(0.5 * (b ** 2).sum() * config.cell_volume)

    times, be = [], []
    steps_per_sample = 5
    for i in range(60):
        sim.step(steps_per_sample)
        times.append((i + 1) * steps_per_sample * config.dt)
        be.append(b_energy())
        if i % 10 == 9:
            print(f"t={times[-1]:6.2f}  B energy={be[-1]:.3e}", flush=True)

    t = np.array(times)
    log_be = np.log(be)
    sat = log_be.max()
    mask = (log_be > log_be[0] + 1.5) & (log_be < sat - 1.5) & (t < t[np.argmax(log_be)])
    if mask.sum() >= 3:
        gamma = np.polyfit(t[mask], log_be[mask], 1)[0] / 2
        print(f"growth rate: measured {gamma:.3f} vs gamma ~ v0*omega_p = {args.v0:.3f} "
              f"({100 * abs(gamma - args.v0) / args.v0:.0f}% off)")
    else:
        print("no clear linear phase (increase steps or particles)")

    bx = np.asarray(sim.state.b)[..., 0]
    lim = float(np.abs(bx).max()) or 1.0
    cm = preset("doppler", -lim, lim)
    img = np.asarray(cm.apply(bx.T[::-1]))
    with open(args.out, "wb") as f:
        f.write(encode_png(np.ascontiguousarray(img)))
    print(f"wrote filament figure to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
