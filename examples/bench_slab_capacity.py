"""Benchmark: BASELINE configs[4] per-chip shard workload on ONE chip.

The stretch config is 1e9 particles on a 512^3 grid across v5e-8 — i.e.
1.25e8 particles on a 512 x 512 x 64 slab per chip.  Real multi-chip
hardware is not reachable from this environment (the sharded composition is
validated on the 8-device CPU mesh + dryrun_multichip), so this measures
the per-chip compute half of config[4] directly: the fused 3D ES step at
shard scale.  Pod-scale rate ~ this rate x 8 / (1 + collective fraction).

PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_slab_capacity.py
"""

import argparse
import time

import jax
import numpy as np

from fusion_sim_tpu.models import electrostatic as es
from fusion_sim_tpu.ops.sorted_deposit import Tiling3D


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=124_999_680)  # 1e9/8, /512
    ap.add_argument("--cells", default="512,512,64")
    ap.add_argument("--tile", default="8,16,16",
                    help="per-axis 3D tile (comma list or one int); bigger "
                    "(y,z) tiles cut n_tiles — the fused kernel's per-tile "
                    "window storage scales with it (tile 8^3 = 32768 tiles "
                    "OOMed at 1.25e8 rows)")
    ap.add_argument("--margin", type=int, default=2)
    ap.add_argument("--resort", type=int, default=8)
    ap.add_argument("--precision", default="exact_bf16")
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    shape = tuple(int(x) for x in args.cells.split(","))
    t = [int(x) for x in str(args.tile).split(",")]
    tile3 = tuple(t * 3 if len(t) == 1 else t)
    tiling = Tiling3D(tile=tile3, block=512, margin=args.margin)
    n = args.n
    rng = np.random.default_rng(0)
    length = 2 * np.pi
    d = length / shape[0]
    vol = length ** 3 * (shape[1] / shape[0]) * (shape[2] / shape[0])
    print(f"n={n:.3e} cells={shape} dev={jax.devices()[0]}")
    config = es.ESConfig(grid_shape=shape, cell_size=(d,) * 3, dt=0.05,
                         charge=-vol / n, mass=vol / n)
    pos = (rng.random((n, 3)) * np.asarray(shape)).astype(np.float32)
    vel = (0.05 * rng.standard_normal((n, 3))).astype(np.float32)
    sim = es.SortedElectrostaticPIC(
        config, pos, vel, tiling=tiling, resort_every=args.resort,
        check_spill=False, backend="pallas", pallas_precision=args.precision)
    del pos, vel

    def fence():
        np.asarray(sim.state.position[:1])

    def hbm(tag):
        st = jax.local_devices()[0].memory_stats() or {}
        used = st.get("bytes_in_use", 0)
        lim = st.get("bytes_limit", 0)
        print(f"  hbm[{tag}]: {used / 1e9:.2f} GB in use"
              + (f" of {lim / 1e9:.2f} GB" if lim else ""), flush=True)

    fence()
    hbm("after init")
    sim.step(1)
    fence()
    hbm("after first step")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sim.step(args.steps)
        fence()
        ts.append((time.perf_counter() - t0) / args.steps)
    med = sorted(ts)[len(ts) // 2]
    print(f"slab ES fused: {1e3 * med:.1f} ms/step  "
          f"({sim.n_real / med:.3e} updates/s/chip; x8 chips ~ "
          f"{8 * sim.n_real / med:.2e}/s before collectives)")


if __name__ == "__main__":
    main()
