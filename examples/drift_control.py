"""Energy-drift control run: is the 2D-thermal f32 drift physics or rounding?

VERDICT r2 weak #4 / next-step #7: the 10k-step 2D thermal run measures
~1.1e-3 relative energy drift on the f32 paths (both base and fused — they
agree), marginally over the <1e-3 BASELINE bar.  The builder's claim was
"inherent f32 grid-heating"; this script grounds it with a control: the
SAME configuration stepped in float64 on CPU.

  * If the f64 drift is ~as large      -> the drift is physics
    (finite-grid/stochastic heating of the PIC scheme at this resolution),
    not kernel rounding — document and keep f32.
  * If the f64 drift collapses         -> it's accumulation error; ship a
    compensated-accumulation option.

Run (CPU, ~20-40 min each at 1M):
  python examples/drift_control.py --dtype f32
  python examples/drift_control.py --dtype f64
Smaller sanity run: --n 250000 --cells 128 --steps 2000
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cells", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--dt", type=float, default=0.05)
    ap.add_argument("--vth", type=float, default=0.05)
    ap.add_argument("--dtype", choices=("f32", "f64"), default="f32")
    ap.add_argument("--every", type=int, default=500)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from fusion_sim_tpu.models import electrostatic as es

    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    length = 2 * np.pi
    d = length / args.cells
    vol = length * length
    config = es.ESConfig(grid_shape=(args.cells, args.cells),
                         cell_size=(d, d), dt=args.dt,
                         charge=-vol / args.n, mass=vol / args.n)
    rng = np.random.default_rng(0)
    pos = (rng.random((args.n, 2)) * args.cells).astype(np.float64)
    vel = (args.vth * rng.standard_normal((args.n, 2))).astype(np.float64)

    sim = es.ElectrostaticPIC(config, pos, vel)
    # force the requested dtype (the shell casts to f32 by default)
    sim.state = es.ESState(
        position=jnp.asarray(pos, dtype),
        velocity=jnp.asarray(vel, dtype),
        step=jnp.int32(0))

    e0 = sim.energies()["total"]
    print(f"dtype={args.dtype} n={args.n} cells={args.cells} "
          f"dt={args.dt} vth={args.vth} lambda_D/dx="
          f"{args.vth / d:.2f}  E0={e0:.8e}", flush=True)
    worst = 0.0
    t0 = time.time()
    for s in range(0, args.steps, args.every):
        sim.step(min(args.every, args.steps - s))
        e = sim.energies()["total"]
        drift = abs(e - e0) / abs(e0)
        worst = max(worst, drift)
        print(f"step {s + args.every:6d}  E={e:.8e}  drift={drift:.3e}  "
              f"({time.time() - t0:.0f}s)", flush=True)
    print(f"RESULT dtype={args.dtype} max_drift={worst:.3e}")


if __name__ == "__main__":
    main()
