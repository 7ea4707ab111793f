"""Pallas tile-window gather vs the XLA reference forms (interpret mode on
CPU; the compiled kernel is exercised on TPU by examples/bench_gather.py)."""

import jax.numpy as jnp
import numpy as np

from fusion_sim_tpu.ops.interp import cic_gather
from fusion_sim_tpu.ops.pallas_gather import gather_sorted_2d_pallas
from fusion_sim_tpu.ops.sorted_deposit import (Tiling2D, build_padded_layout,
                                               gather_sorted_2d)


def _layout(shape, tiling, n, seed=0, channels=2):
    rng = np.random.default_rng(seed)
    pos = (rng.random((n, 2)) * np.array(shape)).astype(np.float32)
    grid = rng.standard_normal((*shape, channels)).astype(np.float32)
    tid, pos_p, validp, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.ones((n,), jnp.float32))
    return jnp.asarray(grid), pos_p, tid, np.asarray(validp > 0.5)


def test_pallas_gather_matches_cic():
    shape = (64, 128)
    tiling = Tiling2D(tile_r=16, tile_z=16, block=128, margin=2)
    grid, pos_p, tid, keep = _layout(shape, tiling, 4096)
    vals, in_win = gather_sorted_2d_pallas(grid, pos_p, tid, shape, tiling,
                                           interpret=True)
    ref = cic_gather(grid, pos_p, shape)
    np.testing.assert_allclose(np.asarray(vals)[keep], np.asarray(ref)[keep],
                               rtol=1e-4, atol=5e-6)
    assert bool(np.all(np.where(keep, np.asarray(in_win), True)))


def test_pallas_gather_nearest_matches_xla():
    shape = (32, 64)
    tiling = Tiling2D(tile_r=8, tile_z=16, block=128, margin=2)
    grid, pos_p, tid, keep = _layout(shape, tiling, 1024, seed=1, channels=3)
    vals, _ = gather_sorted_2d_pallas(grid, pos_p, tid, shape, tiling,
                                      mode="nearest", interpret=True)
    ref, _ = gather_sorted_2d(grid, pos_p, tid, shape, tiling, mode="nearest")
    np.testing.assert_allclose(np.asarray(vals)[keep], np.asarray(ref)[keep],
                               rtol=1e-6)


def test_pallas_gather_scalar_grid():
    shape = (64, 64)
    tiling = Tiling2D(tile_r=16, tile_z=16, block=128, margin=2)
    rng = np.random.default_rng(2)
    n = 2048
    pos = (rng.random((n, 2)) * np.array(shape)).astype(np.float32)
    grid = rng.standard_normal(shape).astype(np.float32)
    tid, pos_p, validp, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.ones((n,), jnp.float32))
    vals, _ = gather_sorted_2d_pallas(jnp.asarray(grid), pos_p, tid, shape,
                                      tiling, interpret=True)
    ref = cic_gather(jnp.asarray(grid), pos_p, shape)
    keep = np.asarray(validp > 0.5)
    np.testing.assert_allclose(np.asarray(vals)[keep], np.asarray(ref)[keep],
                               rtol=1e-4, atol=5e-6)
