"""Fused-ES kernel floor attribution + full-K packing measurement
(VERDICT r4 #1): time the 2D fused substep kernel and its ablations at
the headline configuration, so each remaining millisecond has a name.

Variants (all at 10M rows, 512^2, tile 32, block 1024):

- exact_bf16            the round-4 headline kernel (3 gather pumps)
- exact_bf16_pack       full-K packing: the two cross terms contract in
                        ONE matmul [Whi|Wlo] @ [ar_lo;ar_hi], K=2*wr_pad
                        <= 128 — 2 gather pumps (ops/pallas_pic.py)
- ablate=no_gather      gather matmul (and its tents/z-select) removed
- ablate=no_deposit     deposit matmul (and its tents) removed
- ablate both           VPU/DMA/pipeline floor

The deltas attribute kernel time between the gather MXU chain, the
deposit MXU chain, and everything else; if (baseline - no_gather) >>
(baseline - pack_expected), the kernel is pump-bound and packing pays.

PYTHONPATH=/root/repo:$PYTHONPATH python examples/probe_kernel_floor.py \
    --margin 8 [--margins 8 10 12] [--n 10002432]
"""

import argparse

import jax
import numpy as np

from proftools import loop_timeit

from fusion_sim_tpu.models import electrostatic as es
from fusion_sim_tpu.ops.pallas_pic import fused_es2d_substep
from fusion_sim_tpu.ops.sorted_deposit import Tiling2D


def main():
    import os
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_002_432)
    ap.add_argument("--cells", type=int, default=512)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--margins", type=int, nargs="+", default=[8])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-ablate", action="store_true")
    ap.add_argument("--xla-parts", action="store_true",
                    help="time the substep's XLA pre/post phases standalone")
    ap.add_argument("--n-g-sweep", type=int, nargs="*", default=[],
                    help="extra blocks-per-grid-step values to time (the "
                         "~7us/grid-step pipeline overhead lever)")
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
    shape = config.grid_shape
    qm_dt = float(config.charge / config.mass * config.dt)
    c_ax = tuple(float(config.dt / dd) for dd in config.cell_size)
    interpret = jax.default_backend() != "tpu"
    print(f"n={n:.3e} cells={cells} tile={args.tile} dev={jax.devices()[0]}")

    for margin in args.margins:
        tiling = Tiling2D(tile_r=args.tile, tile_z=args.tile, block=1024,
                          margin=margin)
        sim = es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                        resort_every=10 ** 9,
                                        backend="pallas", check_spill=False,
                                        pallas_precision="exact_bf16")
        sim.step(4)  # settle into a realistic in-window distribution
        st = sim.state
        import jax.numpy as jnp
        w = jnp.where(st.valid, jnp.float32(config.charge /
                                            config.cell_volume), 0.0)
        rho = st.rho - jnp.sum(st.rho) / (cells * cells)
        _, e_grid = es.solve_fields(config, rho)
        wr = args.tile + 2 * margin + 1
        wr_pad = -(-wr // 8) * 8
        print(f"-- margin {margin}: wr={wr} wr_pad={wr_pad} "
              f"packK={2 * wr_pad}{' (>128: pack splits)' if 2 * wr_pad > 128 else ''}")

        def run(prec, ablate=None, n_g=32):
            fn = lambda e, p, v, ww, ti: fused_es2d_substep(
                e, p, v, ww, ti, shape, tiling, qm_dt, c_ax[0], c_ax[1],
                precision=prec, interpret=interpret, ablate=ablate, n_g=n_g)
            return loop_timeit(fn, e_grid, st.position, st.velocity, w,
                               st.tile_id, iters=args.iters, reps=args.reps)

        for ng in args.n_g_sweep:
            t_ng_ = run("exact_bf16_pack", n_g=ng)
            print(f"   pack @ n_g={ng:<3d}:            {1e3 * t_ng_:7.2f} ms")

        t_base = run("exact_bf16")
        print(f"   exact_bf16 baseline:        {1e3 * t_base:7.2f} ms")
        t_pack = run("exact_bf16_pack")
        print(f"   exact_bf16_pack:            {1e3 * t_pack:7.2f} ms "
              f"({100 * (t_base - t_pack) / t_base:+.1f}%)")
        t_pack2 = run("exact_bf16_pack2")
        print(f"   exact_bf16_pack2 (+dep):    {1e3 * t_pack2:7.2f} ms "
              f"({100 * (t_base - t_pack2) / t_base:+.1f}%)")
        if args.xla_parts:
            # the substep jit's XLA pre/post work, timed standalone: what
            # part of the no-MXU floor is NOT the Mosaic kernel
            from fusion_sim_tpu.ops.mxu import split_bf16
            from fusion_sim_tpu.ops.pallas_gather import _local_coords
            from fusion_sim_tpu.ops.sorted_deposit import (
                extract_tile_windows, fold_tile_windows)

            p_blk = tiling.block
            t_lc = loop_timeit(jax.jit(
                lambda p, t: _local_coords(p, t, shape, tiling, p_blk)),
                st.position, st.tile_id,
                iters=args.iters, reps=args.reps)
            print(f"   xla: _local_coords:         {1e3 * t_lc:7.2f} ms")
            wz = args.tile + 2 * margin + 1
            wz_pad = -(-wz // 8) * 8
            ntr, ntz = tiling.n_tiles(shape)

            def prep(e):
                ew = extract_tile_windows(e, shape, tiling, wr, wz)
                ew = ew.reshape(ntr * ntz, wr, wz, 2).transpose(0, 3, 2, 1)
                ew = jnp.pad(ew, ((0, 0), (0, 0), (0, wz_pad - wz),
                                  (0, wr_pad - wr)))
                ew = ew.reshape(ntr * ntz, 2 * wz_pad, wr_pad)
                hi, lo = split_bf16(ew)
                return jnp.concatenate([hi, lo], axis=2)
            t_ex = loop_timeit(jax.jit(prep), e_grid,
                               iters=args.iters, reps=args.reps)
            print(f"   xla: extract+split+pack:    {1e3 * t_ex:7.2f} ms")
            wz_lane = -(-wz // 128) * 128
            tw = jnp.zeros((ntr * ntz, wr_pad, wz_lane), jnp.float32)
            t_fold = loop_timeit(jax.jit(
                lambda t: fold_tile_windows(t[:, :wr, :wz], shape, tiling,
                                            wr, wz)), tw,
                iters=args.iters, reps=args.reps)
            print(f"   xla: fold_tile_windows:     {1e3 * t_fold:7.2f} ms")
        if not args.skip_ablate:
            t_ng = run("exact_bf16", "no_gather")
            print(f"   ablate no_gather:           {1e3 * t_ng:7.2f} ms "
                  f"(gather chain ~{1e3 * (t_base - t_ng):.2f})")
            t_nd = run("exact_bf16", "no_deposit")
            print(f"   ablate no_deposit:          {1e3 * t_nd:7.2f} ms "
                  f"(deposit chain ~{1e3 * (t_base - t_nd):.2f})")
            t_nb = run("exact_bf16", "no_both")
            print(f"   ablate no_both (floor):     {1e3 * t_nb:7.2f} ms "
                  f"(VPU/DMA/pipeline floor)")
            t_pnd = run("exact_bf16_pack", "no_deposit")
            print(f"   pack + no_deposit:          {1e3 * t_pnd:7.2f} ms "
                  f"(packed gather chain ~{1e3 * (t_pnd - t_nb):.2f} vs "
                  f"3-pump {1e3 * (t_nd - t_nb):.2f})")
        del sim, st
    print("done")


if __name__ == "__main__":
    main()
