"""Phase attribution of the sorted-fused ES model STEP (not just the
kernel): full step vs resort vs solve vs patch vs compaction, at the
bench configuration.  Complements profile_kernels --which es2d (kernel
alone) — tile-16 vs tile-32 measured the SAME 32 ms/step, so the step
must be dominated by tile-independent terms; this finds them.

PYTHONPATH=/root/repo:$PYTHONPATH python examples/profile_es_step.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from proftools import loop_timeit

from fusion_sim_tpu.models import electrostatic as es
from fusion_sim_tpu.ops.sorted_deposit import Tiling2D


def timeit(fn, *args, reps=7, **kw):
    # loop-amortized: single dispatches over the tunneled backend measure
    # ~30 ms of round-trip latency regardless of the op (see proftools)
    return loop_timeit(lambda *a: fn(*a, **kw), *args, reps=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_002_432)
    ap.add_argument("--cells", type=int, default=512)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--margin", type=int, default=6)
    ap.add_argument("--precision", default="highest")
    args = ap.parse_args()
    n, cells = args.n, args.cells
    length = 2 * np.pi
    d = length / cells
    vol = length * length
    config = es.ESConfig(grid_shape=(cells, cells), cell_size=(d, d),
                         dt=0.05, charge=-vol / n, mass=vol / n)
    rng = np.random.default_rng(0)
    pos = rng.random((n, 2)).astype(np.float32) * cells
    vel = (0.05 * rng.standard_normal((n, 2))).astype(np.float32)
    tiling = Tiling2D(tile_r=args.tile, tile_z=args.tile, block=1024,
                      margin=args.margin)
    sim = es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                    resort_every=10 ** 9, backend="pallas",
                                    check_spill=False,
                                    pallas_precision=args.precision)
    sim.step(8)  # warm: some spill present (equilibrium-ish patch cost)
    st = sim.state
    print(f"n={n:.2e} cells={cells} tile={args.tile} margin={args.margin} "
          f"prec={args.precision} dev={jax.devices()[0]}")

    t = timeit(sim._step, st)
    print(f"full fused step (jit):            {1e3 * t:7.2f} ms "
          f"(spill now {int(st.spill)})")

    t = timeit(sim._resort, st)
    print(f"full resort:                      {1e3 * t:7.2f} ms")

    rho = st.rho - jnp.sum(st.rho) / (cells * cells)
    t = timeit(jax.jit(lambda r: es.solve_fields(config, r)), rho)
    print(f"solve_fields (DFT + grad):        {1e3 * t:7.2f} ms")

    # compaction + patch at the live spill mask
    from fusion_sim_tpu.ops.interp import (cic_deposit_packed,
                                           cic_gather_packed,
                                           spill_rows_cond)
    _, e_grid = es.solve_fields(config, rho)
    shape = config.grid_shape
    grid_f = jnp.asarray(shape, jnp.float32)
    cap = sim.spill_capacity
    n_tot = st.position.shape[0]
    mask_np = np.zeros((n_tot,), bool)
    mask_np[rng.choice(n_tot, size=8192, replace=False)] = True
    mask = jnp.asarray(mask_np) & st.valid
    n_m = jnp.sum(mask)
    t = timeit(jax.jit(lambda m, s: spill_rows_cond(m, s, cap, n_tot)),
               mask, n_m)
    print(f"spill_rows_cond (hot, cap {cap}):  {1e3 * t:7.2f} ms")

    idx, ok = spill_rows_cond(mask, n_m, cap, n_tot)
    w = jnp.where(st.valid, jnp.float32(config.charge / config.cell_volume),
                  0.0)

    def patch(pos_a, vel_a, e_g, idx, ok):
        pos_k = jnp.mod(pos_a[idx], grid_f)
        e_k = cic_gather_packed(e_g, pos_k, shape)
        vel_k = vel_a[idx] + 0.1 * e_k
        pos_k = jnp.mod(pos_k + 0.05 * vel_k / d, grid_f)
        drho = cic_deposit_packed(pos_k, jnp.where(ok, w[idx], 0.0), shape)
        return (pos_a.at[idx].set(pos_k, mode="drop"),
                vel_a.at[idx].set(vel_k, mode="drop"), drho)
    t = timeit(jax.jit(patch), st.position, st.velocity, e_grid, idx, ok)
    print(f"exact patch at cap {cap}:          {1e3 * t:7.2f} ms")

    # kernel alone at the SAME layout/precision
    from fusion_sim_tpu.ops.pallas_pic import fused_es2d_substep
    qm_dt = float(config.charge / config.mass * config.dt)
    c_ax = tuple(float(config.dt / dd) for dd in config.cell_size)
    interpret = jax.default_backend() != "tpu"
    t = timeit(jax.jit(lambda e, p, v, ww, ti: fused_es2d_substep(
        e, p, v, ww, ti, shape, tiling, qm_dt, c_ax[0], c_ax[1],
        precision=args.precision, interpret=interpret)),
        e_grid, st.position, st.velocity, w, st.tile_id)
    print(f"fused_es2d_substep kernel:        {1e3 * t:7.2f} ms")


if __name__ == "__main__":
    main()
