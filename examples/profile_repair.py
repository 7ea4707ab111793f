"""Phase-level timing of the incremental-repair machinery (ops/repair.py).

Round-3 hardware runs measured the repair-mode ES step at 186 ms vs
32 ms for the plain resort-16 configuration — the relocation machinery
costs ~5x the amortized resort it replaces.  This profiler times each
K-row phase in isolation at the bench's equilibrium sizing so the cost
is attributable (compaction vs gathers vs allocate_slots vs scatters).

PYTHONPATH=/root/repo:$PYTHONPATH python examples/profile_repair.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from proftools import loop_timeit

from fusion_sim_tpu.ops.interp import (cic_deposit_packed, cic_gather_packed,
                                       spill_rows_cond)
from fusion_sim_tpu.ops.repair import (allocate_slots, init_free_list,
                                       near_band_mask, relocate)
from fusion_sim_tpu.ops.sorted_deposit import (Tiling2D, build_padded_layout,
                                               tile_ids)


def timeit(fn, *args, reps=5, **kw):
    # loop-amortized: single dispatches over the tunneled backend measure
    # ~30 ms of round-trip latency regardless of the op (see proftools)
    return loop_timeit(lambda *a: fn(*a, **kw), *args, reps=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_002_432)
    ap.add_argument("--cells", type=int, default=512)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--margin", type=int, default=6)
    ap.add_argument("--capacity", type=int, default=163840)
    ap.add_argument("--flux", type=int, default=81920,
                    help="simulated spilled rows per step (equilibrium)")
    args = ap.parse_args()
    n, cells, cap = args.n, args.cells, args.capacity
    shape = (cells, cells)
    tiling = Tiling2D(tile_r=args.tile, tile_z=args.tile, block=1024,
                      margin=args.margin)
    n_tiles = int(np.prod(tiling.n_tiles(shape)))

    rng = np.random.default_rng(0)
    pos = (rng.random((n, 2)) * cells).astype(np.float32)
    vel = (0.05 * rng.standard_normal((n, 2))).astype(np.float32)
    tid, pos_p, v0, v1, w = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.asarray(vel[:, 0]),
        jnp.asarray(vel[:, 1]), jnp.ones((n,), jnp.float32),
        reserve=True, spread=True)[:5]
    vel_p = jnp.stack([v0, v1], axis=-1)
    valid = w > 0.5
    n_tot = pos_p.shape[0]
    grid_f = jnp.asarray(shape, jnp.float32)

    # a flux-sized scattered spill mask (uniform rows, like real spill)
    mask_np = np.zeros((n_tot,), bool)
    mask_np[rng.choice(n_tot, size=args.flux, replace=False)] = True
    mask = jnp.asarray(mask_np) & valid
    n_spill = jnp.sum(mask)

    fidx, fcnt = init_free_list(tid, valid, n_tiles, tiling.block, 2048)

    print(f"n={n:.2e} n_tot={n_tot} capacity={cap} flux={args.flux} "
          f"n_tiles={n_tiles} dev={jax.devices()[0]}")

    t = timeit(jax.jit(lambda m, s: spill_rows_cond(m, s, cap, n_tot)),
               mask, n_spill)
    print(f"spill_rows_cond (hot, cap={cap}):      {1e3 * t:7.2f} ms")
    idx, ok = spill_rows_cond(mask, n_spill, cap, n_tot)

    t = timeit(jax.jit(lambda p, i: (p[i], p[i])), pos_p, idx)
    print(f"2x payload gather (K,2):               {1e3 * t:7.2f} ms")

    pos_k = jnp.mod(pos_p[idx], grid_f)
    e = jnp.asarray(rng.standard_normal((cells, cells, 2)), jnp.float32)
    t = timeit(jax.jit(lambda g, p: cic_gather_packed(g, p, shape)), e, pos_k)
    print(f"cic_gather_packed at K:                {1e3 * t:7.2f} ms")

    wk = jnp.where(ok, 1.0, 0.0).astype(jnp.float32)
    t = timeit(jax.jit(lambda p, ww: cic_deposit_packed(p, ww, shape)),
               pos_k, wk)
    print(f"cic_deposit_packed at K:               {1e3 * t:7.2f} ms")

    t = timeit(jax.jit(lambda p: tile_ids(p, shape, tiling)), pos_k)
    print(f"tile_ids at K:                         {1e3 * t:7.2f} ms")

    new_t = tile_ids(pos_k, shape, tiling)
    old_t = tid[idx]
    alloc = jax.jit(lambda fi, fc, i, o, nt, ot: allocate_slots(
        fi, fc, i, o, nt, ot, n_tot, n_tiles))
    t = timeit(alloc, fidx, fcnt, idx, ok, new_t, old_t)
    print(f"allocate_slots (2 rounds):             {1e3 * t:7.2f} ms")
    dest, placed, fidx2, fcnt2, nun = alloc(fidx, fcnt, idx, ok, new_t, old_t)

    reloc = jax.jit(lambda p, v, va, i, d, pl, pk, vk: relocate(
        (p, v), va, i, d, pl, (pk, vk), n_tot))
    t = timeit(reloc, pos_p, vel_p, valid, idx, dest, placed, pos_k,
               vel_p[idx])
    print(f"relocate (2 payload + 2 valid scatter):{1e3 * t:7.2f} ms")

    t = timeit(jax.jit(lambda p, ti: near_band_mask(p, ti, shape, tiling, 2)),
               pos_p, tid)
    print(f"near_band_mask at N:                   {1e3 * t:7.2f} ms")

    # the whole repair_relocate wiring as the model calls it
    from fusion_sim_tpu.ops.repair import repair_relocate

    class S:
        pass

    def whole(p, v, va, fi, fc):
        st = S()
        st.free_idx, st.free_cnt, st.valid = fi, fc, va
        st.tile_id, st.unplaced = tid, jnp.int32(0)
        return repair_relocate(st, p, v, idx, ok, jnp.mod(p[idx], grid_f),
                               v[idx], shape, tiling, n_tiles, 2,
                               in_win=~mask, eager_keep=0, eager_cap=0)
    t = timeit(jax.jit(whole), pos_p, vel_p, valid, fidx, fcnt)
    print(f"repair_relocate total (no eager):      {1e3 * t:7.2f} ms")

    def whole_eager(p, v, va, fi, fc):
        st = S()
        st.free_idx, st.free_cnt, st.valid = fi, fc, va
        st.tile_id, st.unplaced = tid, jnp.int32(0)
        return repair_relocate(st, p, v, idx, ok, jnp.mod(p[idx], grid_f),
                               v[idx], shape, tiling, n_tiles, 2,
                               in_win=~mask, eager_keep=2, eager_cap=196608)
    t = timeit(jax.jit(whole_eager), pos_p, vel_p, valid, fidx, fcnt)
    print(f"repair_relocate total (eager 196608):  {1e3 * t:7.2f} ms")


if __name__ == "__main__":
    main()
