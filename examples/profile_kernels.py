"""Standalone timings of the fused Pallas substeps (no model shell, no
resort/FFT/patch) — separates kernel cost from step composition.

PYTHONPATH=/root/repo:$PYTHONPATH python examples/profile_kernels.py --which es2d
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from fusion_sim_tpu.ops.sorted_deposit import (Tiling2D, Tiling3D,
                                               build_padded_layout)


def timeit(fn, *args, reps=5, **kw):
    # loop-amortized: single dispatches over the tunneled backend measure
    # ~30 ms of round-trip latency regardless of the op (see proftools)
    from proftools import loop_timeit

    return loop_timeit(lambda *a: fn(*a, **kw), *args, reps=reps)


def prof_es2d(n, cells, precisions, n_gs):
    from fusion_sim_tpu.ops.pallas_pic import fused_es2d_substep

    shape = (cells, cells)
    tiling = Tiling2D(tile_r=32, tile_z=32, block=1024, margin=6)
    rng = np.random.default_rng(0)
    pos = (rng.random((n, 2)) * cells).astype(np.float32)
    vel = (0.05 * rng.standard_normal((n, 2))).astype(np.float32)
    e = rng.standard_normal((*shape, 2)).astype(np.float32)
    tid, pos_p, v0, v1, w, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.asarray(vel[:, 0]),
        jnp.asarray(vel[:, 1]), jnp.ones((n,), jnp.float32))
    vel_p = jnp.stack([v0, v1], axis=-1)
    for ng in n_gs:
        for prec in precisions:
            # static params ride **kw (closed over) — positional args pass
            # through loop_timeit's outer jit and would be traced
            t = timeit(fused_es2d_substep, jnp.asarray(e), pos_p, vel_p, w,
                       tid, shape=shape, tiling=tiling, qm_dt=0.01, c_r=0.1,
                       c_z=0.1, precision=prec, n_g=ng)
            print(f"es2d n_g={ng:3d} {prec:11s}: {1e3 * t:7.2f} ms "
                  f"({n / t:.2e} rows/s)")


def prof_em2d(n, cells, precisions, n_gs, stream=None):
    from fusion_sim_tpu.ops.pallas_em import fused_em2d_substep

    shape = (cells, cells)
    tiling = Tiling2D(tile_r=32, tile_z=32, block=1024, margin=6)
    rng = np.random.default_rng(0)
    pos = (rng.random((n, 2)) * cells).astype(np.float32)
    vel = (0.05 * rng.standard_normal((n, 3))).astype(np.float32)
    table = rng.standard_normal((*shape, 6)).astype(np.float32)
    tid, pos_p, v0, v1, v2, w = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.asarray(vel[:, 0]),
        jnp.asarray(vel[:, 1]), jnp.asarray(vel[:, 2]),
        jnp.ones((n,), jnp.float32))[:6]
    vel_p = jnp.stack([v0, v1, v2], axis=-1)
    for ng in n_gs:
        for prec in precisions:
            t = timeit(fused_em2d_substep, jnp.asarray(table), pos_p, vel_p,
                       w > 0.5, tid, shape=shape, tiling=tiling,
                       qm_half_dt=0.01, dt=0.1, cell_size=(0.1, 0.1),
                       charge=-0.01, precision=prec, n_g=ng, stream=stream)
            print(f"em2d n_g={ng:3d} {prec:11s}: {1e3 * t:7.2f} ms "
                  f"({n / t:.2e} rows/s)")


def prof_3d(n, cells, precisions, n_gs, which):
    shape = (cells,) * 3
    tiling = Tiling3D(tile=(8, 8, 8), block=512, margin=2)
    rng = np.random.default_rng(0)
    pos = (rng.random((n, 3)) * cells).astype(np.float32)
    vel = (0.05 * rng.standard_normal((n, 3))).astype(np.float32)
    tid, pos_p, v0, v1, v2, w, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.asarray(vel[:, 0]),
        jnp.asarray(vel[:, 1]), jnp.asarray(vel[:, 2]),
        jnp.ones((n,), jnp.float32))
    vel_p = jnp.stack([v0, v1, v2], axis=-1)
    if which == "es3d":
        from fusion_sim_tpu.ops.pallas_pic3d import fused_es3d_substep

        e = rng.standard_normal((*shape, 3)).astype(np.float32)
        for ng in n_gs:
            for prec in precisions:
                t = timeit(fused_es3d_substep, jnp.asarray(e), pos_p, vel_p,
                           w, tid, shape=shape, tiling=tiling, qm_dt=0.01,
                           c_x=0.1, c_y=0.1, c_z=0.1, precision=prec, n_g=ng)
                print(f"es3d n_g={ng:3d} {prec:11s}: {1e3 * t:7.2f} ms "
                      f"({n / t:.2e} rows/s)")
    else:
        from fusion_sim_tpu.ops.pallas_em3d import fused_em3d_substep

        table = rng.standard_normal((*shape, 6)).astype(np.float32)
        valid = w > 0.5

        # XLA prep pieces (window extract + per-block gather + relayout)
        import functools

        wx = wy = wz = 8 + 2 * tiling.margin + 1
        p_blk = tiling.block
        nb = pos_p.shape[0] // p_blk

        from fusion_sim_tpu.ops.sorted_deposit import (
            extract_tile_windows_3d_flat, fold_tile_windows_3d_flat)

        for prec in ("highest", "2term"):
            @functools.partial(jax.jit, static_argnames=("p",))
            def extract_flat(tbl, p="highest"):
                return extract_tile_windows_3d_flat(tbl, shape, tiling,
                                                    precision=p)

            t = timeit(extract_flat, jnp.asarray(table), p=prec)
            print(f"em3d extract FLAT ({prec}): {1e3 * t:7.2f} ms")

        n_tiles = int(np.prod(tiling.n_tiles(shape)))
        jflat = jnp.zeros((n_tiles, 3, wx, wy * wz), jnp.float32)
        for prec in ("highest", "2term"):
            @functools.partial(jax.jit, static_argnames=("p",))
            def fold_flat(w, p="highest"):
                return fold_tile_windows_3d_flat(w, shape, tiling,
                                                 precision=p)

            t = timeit(fold_flat, jflat, p=prec)
            print(f"em3d fold FLAT ({prec}): {1e3 * t:7.2f} ms")

        for ng in n_gs:
            for prec in precisions:
                t = timeit(fused_em3d_substep, jnp.asarray(table), pos_p,
                           vel_p, valid, tid, shape=shape, tiling=tiling,
                           qm_half_dt=0.01, dt=0.1,
                           cell_size=(0.5, 0.5, 0.5), charge=-0.01,
                           precision=prec, n_g=ng)
                print(f"em3d n_g={ng:3d} {prec:11s}: {1e3 * t:7.2f} ms "
                      f"({n / t:.2e} rows/s)")


def prof_pusher(nparticles):
    """Per-piece timing of the fused grid-parity pusher substep."""
    import jax.numpy as jnp

    from fusion_sim_tpu import CylindricalParticlePusher
    from fusion_sim_tpu.models.pusher_sorted import (_cell_coords,
                                                     to_sorted_state)
    from fusion_sim_tpu.ops.pallas_pusher import (build_pusher_windows,
                                                  fused_pusher_substep,
                                                  stream_tiling_for)
    from fusion_sim_tpu.ops.push import sink_respawn
    from fusion_sim_tpu.ops.rng import substep_uniforms
    from fusion_sim_tpu.scenarios import apply_default_scenario

    sim = CylindricalParticlePusher(
        {"radius": 1.0, "height": 2.0, "nr": 400, "nz": 800, "dt": 2e-9,
         "nparticles": nparticles, "particle_mass": 1.67e-27,
         "particle_charge": 1.602e-19})
    apply_default_scenario(sim)
    spec = sim.spec
    tiling = stream_tiling_for(spec.nr, spec.nz, margin=6)
    st = to_sorted_state(sim.state, spec, tiling)
    n_tot = st.position.shape[0]
    print(f"n={spec.n_total:.3e} padded={n_tot:.3e} tiling=({tiling.tile_r},"
          f"{tiling.tile_z})")
    fields = sim.fields
    packed13 = jnp.concatenate(
        [fields.coeffs.r1, fields.coeffs.r2, fields.coeffs.r3,
         fields.coeffs.a, fields.sink_mask[..., None]], axis=-1)
    t = timeit(build_pusher_windows, packed13, spec.nr, spec.nz, tiling)
    print(f"build_pusher_windows (once per field set): {1e3 * t:7.2f} ms")
    windows = build_pusher_windows(packed13, spec.nr, spec.nz, tiling)

    t = timeit(lambda k: substep_uniforms(k, n_tot), st.key)
    print(f"substep_uniforms (threefry): {1e3 * t:7.2f} ms")
    rand, _ = substep_uniforms(st.key, n_tot)
    key_rbg = jax.random.key(0, impl="rbg")
    t = timeit(lambda k: substep_uniforms(k, n_tot), key_rbg)
    print(f"substep_uniforms (rbg): {1e3 * t:7.2f} ms")

    cell = _cell_coords(st.position, spec.nr, spec.nz)
    t = timeit(fused_pusher_substep, packed13, st.position, st.velocity,
               st.alive, rand, cell, st.tile_id, spec.nr, spec.nz, tiling,
               spec.step_factor, windows=windows)
    print(f"fused_pusher_substep kernel: {1e3 * t:7.2f} ms")

    sink = jnp.zeros((n_tot,), jnp.float32)
    t = timeit(sink_respawn, st.position, sink, rand, fields.inv_cdf,
               respawn_capacity=16384)
    print(f"sink_respawn (no sinks): {1e3 * t:7.2f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="es2d",
                    choices=["es2d", "em2d", "es3d", "em3d", "pusher"])
    ap.add_argument("--n", type=int, default=0)
    ap.add_argument("--cells", type=int, default=0)
    ap.add_argument("--precisions", default="highest,exact_bf16,default")
    ap.add_argument("--n-gs", default="")
    ap.add_argument("--stream", default=None,
                    choices=[None, "on", "off"],
                    help="em2d only: force window streaming on/off")
    args = ap.parse_args()
    precisions = args.precisions.split(",")
    print(f"dev={jax.devices()[0]}")
    if args.which == "pusher":
        prof_pusher(args.n or 1024)
        return
    if args.which == "es2d":
        n = args.n or 10_002_432
        n_gs = [int(x) for x in args.n_gs.split(",")] if args.n_gs else [32]
        prof_es2d(n, args.cells or 512, precisions, n_gs)
    elif args.which == "em2d":
        n = args.n or 10_002_432
        n_gs = [int(x) for x in args.n_gs.split(",")] if args.n_gs else [32]
        stream = None if args.stream is None else args.stream == "on"
        prof_em2d(n, args.cells or 512, precisions, n_gs, stream)
    else:
        n = args.n or 9_998_336
        n_gs = [int(x) for x in args.n_gs.split(",")] if args.n_gs else [16]
        prof_3d(n, args.cells or 128, precisions, n_gs, args.which)


if __name__ == "__main__":
    main()
