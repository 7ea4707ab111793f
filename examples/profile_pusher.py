"""Phase attribution of the sorted-fused grid-parity pusher step.

The fused pusher measured 22.0 ms/step at 1.05M (rbg) — far from the
2e8 pushes/s bar — with the RNG swap (threefry -> rbg) moving it only
1.2 ms, so the generator was NOT the dominant term.  This times each
phase of the substep in isolation at the bench configuration:

  * substep_uniforms (threefry vs rbg)
  * the fused Mosaic kernel alone
  * spill_rows_cond at the respawn capacity (hot branch, scattered mask)
  * sample_inverse_cdf + the respawn scatters (sink_respawn hot path)
  * the full model step for reference

PYTHONPATH=/root/repo:$PYTHONPATH python examples/profile_pusher.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from proftools import loop_timeit


def timeit(fn, *args, reps=7, **kw):
    # loop-amortized: single dispatches over the tunneled backend measure
    # ~30 ms of round-trip latency regardless of the op (see proftools)
    return loop_timeit(lambda *a: fn(*a, **kw), *args, reps=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nparticles", type=int, default=1024)  # squared
    ap.add_argument("--capacity", type=int, default=16384)
    args = ap.parse_args()

    from bench import build_sim

    sim = build_sim(nparticles=args.nparticles)
    sim.enable_sorted_path(resort_every=12, backend="fused", rng_impl="rbg")
    st = sim._sorted_state
    n_tot = st.position.shape[0]
    spec = sim.spec
    tiling = sim._sorted_tiling
    print(f"n_total={n_tot} grid={spec.nr}x{spec.nz} "
        f"tiling=({tiling.tile_r},{tiling.tile_z},m{tiling.margin}) "
        f"dev={jax.devices()[0]}")

    # full step reference
    t_full = timeit(sim._sorted_step, sim.fields, st)
    print(f"full fused step (2 substeps):     {1e3 * t_full:7.2f} ms")

    # RNG
    from fusion_sim_tpu.ops.rng import substep_uniforms
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)
        t = timeit(jax.jit(lambda k: substep_uniforms(k, n_tot)), key)
        print(f"substep_uniforms ({impl:12s}):  {1e3 * t:7.2f} ms")

    # fused kernel alone (with cached windows)
    from fusion_sim_tpu.ops.pallas_pusher import (build_pusher_windows,
                                                  fused_pusher_substep)
    fields = sim.fields
    packed13 = jnp.concatenate(
        [fields.coeffs.r1, fields.coeffs.r2, fields.coeffs.r3,
         fields.coeffs.a, fields.sink_mask[..., None]], axis=-1)
    windows = build_pusher_windows(packed13, spec.nr, spec.nz, tiling)
    rand = jax.random.uniform(jax.random.key(1), (n_tot, 4))
    from fusion_sim_tpu.models.pusher_sorted import _cell_coords
    cell = _cell_coords(st.position, spec.nr, spec.nz)
    interpret = jax.default_backend() != "tpu"
    t = timeit(jax.jit(lambda *a: fused_pusher_substep(
        *a, spec.nr, spec.nz, tiling, spec.step_factor, windows=windows,
        interpret=interpret)), packed13, st.position, st.velocity, st.alive,
        rand, cell, st.tile_id)
    print(f"fused_pusher_substep kernel:      {1e3 * t:7.2f} ms")

    # compaction at the respawn capacity, scattered mask (the hot branch)
    from fusion_sim_tpu.ops.interp import spill_rows_cond
    rng = np.random.default_rng(0)
    mask_np = np.zeros((n_tot,), bool)
    mask_np[rng.choice(n_tot, size=4096, replace=False)] = True
    mask = jnp.asarray(mask_np)
    n_m = jnp.sum(mask)
    t = timeit(jax.jit(lambda m, s: spill_rows_cond(
        m, s, args.capacity, n_tot)), mask, n_m)
    print(f"spill_rows_cond (hot, cap {args.capacity}): {1e3 * t:7.2f} ms")

    # respawn tail: inverse-CDF sample + 3 column scatters at capacity
    from fusion_sim_tpu.ops.push import sink_respawn
    sink = (jnp.asarray(rng.random(n_tot)) > 0.004).astype(jnp.float32)
    t = timeit(jax.jit(lambda p, s, r: sink_respawn(
        p, s, r, fields.inv_cdf, respawn_capacity=args.capacity)),
        st.position, sink, rand)
    print(f"sink_respawn (hot, cap {args.capacity}):    {1e3 * t:7.2f} ms")

    # spill patch ops at capacity (gather_nearest + velocity_from_rows)
    from fusion_sim_tpu.ops.boris import gather_nearest, velocity_from_rows
    idx, _ = spill_rows_cond(mask, n_m, args.capacity, n_tot)

    def patch(pos, vel, alive, rand, idx):
        pk = pos[idx]
        rk = jnp.sqrt(pk[:, 0] ** 2 + pk[:, 1] ** 2)
        rows_k = gather_nearest(packed13[..., :12], rk, pk[:, 2])
        vel_k = velocity_from_rows(pk, vel[idx], alive[idx], rand[idx],
                                   rows_k)
        return pos.at[idx].set(pk, mode="drop"), vel_k
    t = timeit(jax.jit(patch), st.position, st.velocity, st.alive, rand, idx)
    print(f"spill patch (gather+rows+scatter):{1e3 * t:7.2f} ms")


if __name__ == "__main__":
    main()
