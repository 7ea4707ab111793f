"""Sorted digit-matmul deposition tests: exactness vs the packed reference,
margin tolerance, spill accounting, sort helper."""

import numpy as np
import jax.numpy as jnp

from fusion_sim_tpu.ops.interp import cic_deposit_packed
from fusion_sim_tpu.ops.sorted_deposit import (
    Tiling2D,
    build_padded_layout,
    deposit_sorted_2d,
    sort_by_tile,
    tile_ids,
)

SHAPE = (64, 64)
TILING = Tiling2D(tile_r=16, tile_z=16, block=256, margin=2)


def _sorted_particles(n, seed=0):
    rng = np.random.default_rng(seed)
    n = (n // TILING.block) * TILING.block
    pos = rng.random((n, 2)).astype(np.float32) * np.array(SHAPE, np.float32)
    w = rng.random(n).astype(np.float32)
    tid, pos_s, w_s, n_valid = build_padded_layout(
        jnp.asarray(pos), SHAPE, TILING, jnp.asarray(w))
    return tid, pos_s, w_s, pos, w


def test_matches_packed_reference():
    tid, pos_s, w_s, pos, w = _sorted_particles(5000)
    grid, spill, _ = deposit_sorted_2d(pos_s, w_s, tid, SHAPE, TILING)
    ref = cic_deposit_packed(jnp.asarray(pos), jnp.asarray(w), SHAPE)
    assert int(spill) == 0
    # bf16 one-hot weights: ~0.4% relative accuracy
    np.testing.assert_allclose(np.asarray(grid), np.asarray(ref),
                               atol=6e-3 * float(jnp.abs(ref).max()))
    np.testing.assert_allclose(float(grid.sum()), float(w.sum()), rtol=1e-3)


def test_margin_tolerates_drift():
    """Particles drifted up to `margin` cells since the sort still deposit
    exactly (the resort-amortization contract)."""
    tid, pos_s, w_s, pos, w = _sorted_particles(5000, seed=1)
    rng = np.random.default_rng(2)
    drift = (rng.random(pos_s.shape) - 0.5) * 2 * (TILING.margin - 1)
    pos_drifted = jnp.mod(pos_s + drift.astype(np.float32),
                          jnp.asarray(SHAPE, jnp.float32))
    grid, spill, _ = deposit_sorted_2d(pos_drifted, w_s, tid, SHAPE, TILING)
    assert int(spill) == 0
    ref = cic_deposit_packed(pos_drifted, w_s, SHAPE)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(ref),
                               atol=6e-3 * float(jnp.abs(ref).max()))


def test_spill_reported_beyond_margin():
    tid, pos_s, w_s, *_ = _sorted_particles(2000, seed=3)
    # teleport some particles far away: they must be counted as spill
    pos_tele = pos_s.at[:100].set(jnp.mod(pos_s[:100] + 40.0, 64.0))
    _, spill, _ = deposit_sorted_2d(pos_tele, w_s, tid, SHAPE, TILING)
    assert int(spill) >= 90  # most of the 100 moved out of window


def test_periodic_boundary_tiles():
    """Mass near the domain edge wraps correctly (windows straddle the
    periodic boundary)."""
    n = TILING.block
    pos = np.zeros((n, 2), np.float32)
    pos[:, 0] = 0.25   # near r=0 edge; CIC touches row -1 -> wraps to 63
    pos[:, 1] = 63.75  # near z edge; touches col 64 -> wraps to 0
    w = np.full((n,), 0.5, np.float32)
    tid, pos_p, w_p, _ = build_padded_layout(jnp.asarray(pos), SHAPE, TILING,
                                             jnp.asarray(w))
    grid, spill, _ = deposit_sorted_2d(pos_p, w_p, tid, SHAPE, TILING)
    ref = cic_deposit_packed(jnp.asarray(pos), jnp.asarray(w), SHAPE)
    assert int(spill) == 0
    np.testing.assert_allclose(np.asarray(grid), np.asarray(ref),
                               atol=6e-3 * float(jnp.abs(ref).max()))


def test_esirkepov_sorted_matches_reference():
    """Sorted digit-matmul Esirkepov equals the packed reference and keeps
    discrete continuity."""
    from fusion_sim_tpu.ops.esirkepov import esirkepov_deposit_2d
    from fusion_sim_tpu.ops.sorted_deposit import esirkepov_sorted_2d

    rng = np.random.default_rng(7)
    n = 4096
    cell = (0.7, 1.3)
    dt = 0.4
    x0 = rng.random((n, 2)).astype(np.float32) * np.array(SHAPE, np.float32)
    x1 = x0 + ((rng.random((n, 2)) - 0.5) * 0.9).astype(np.float32)
    vz = rng.standard_normal(n).astype(np.float32)
    q = -1.7

    # build the sorted layout keyed on x0's tiles, carrying x1/vz as payload
    qw = np.full(n, q, np.float32)
    tid, x0_s, x1a, x1b, vz_s, qw_s, _ = build_padded_layout(
        jnp.asarray(x0), SHAPE, TILING,
        jnp.asarray(x1[:, 0]), jnp.asarray(x1[:, 1]), jnp.asarray(vz),
        jnp.asarray(qw))
    x1_s = jnp.stack([x1a, x1b], axis=-1)

    j_sorted, spill, _ = esirkepov_sorted_2d(
        x0_s, x1_s, vz_s, qw_s, tid, dt, SHAPE, cell, TILING)
    assert int(spill) == 0
    j_ref = esirkepov_deposit_2d(jnp.asarray(x0), jnp.asarray(x1),
                                 jnp.asarray(vz), q, dt, SHAPE, cell)
    scale = float(jnp.abs(j_ref).max())
    np.testing.assert_allclose(np.asarray(j_sorted), np.asarray(j_ref),
                               atol=2e-5 * scale)

    # discrete continuity on the sorted result
    from fusion_sim_tpu.ops.interp import cic_deposit
    vol = cell[0] * cell[1]
    w = jnp.full((n,), q / vol, jnp.float32)
    sh = jnp.asarray(SHAPE, jnp.float32)
    rho0 = np.asarray(cic_deposit(jnp.asarray(x0) % sh, w, SHAPE))
    rho1 = np.asarray(cic_deposit(jnp.asarray(x1) % sh, w, SHAPE))
    j = np.asarray(j_sorted)
    div = (j[..., 0] - np.roll(j[..., 0], 1, axis=0)) / cell[0] \
        + (j[..., 1] - np.roll(j[..., 1], 1, axis=1)) / cell[1]
    residual = (rho1 - rho0) / dt + div
    assert np.abs(residual).max() < 3e-5 * max(np.abs(rho0).max() / dt, 1.0)


def test_deposit_sorted_3d_matches_reference():
    from fusion_sim_tpu.ops.sorted_deposit import (
        Tiling3D, deposit_sorted_3d, tile_ids_3d)

    shape = (16, 16, 32)
    tiling = Tiling3D(tile=(8, 8, 16), block=128, margin=2)
    rng = np.random.default_rng(9)
    n = 4096
    pos = rng.random((n, 3)).astype(np.float32) * np.array(shape, np.float32)
    w = rng.random(n).astype(np.float32)

    # the padded layout builder is dimension-generic
    tid_p, pos_p, w_p, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.asarray(w))

    grid, spill, _ = deposit_sorted_3d(pos_p, w_p, tid_p, shape, tiling)
    assert int(spill) == 0
    ref = cic_deposit_packed(jnp.asarray(pos), jnp.asarray(w), shape)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(ref),
                               atol=1e-5 * float(jnp.abs(ref).max()))
    np.testing.assert_allclose(float(grid.sum()), float(w.sum()), rtol=1e-4)


def test_esirkepov_sorted_3d_matches_reference():
    from fusion_sim_tpu.ops.esirkepov import esirkepov_deposit_3d
    from fusion_sim_tpu.ops.sorted_deposit import (
        Tiling3D, esirkepov_sorted_3d)

    shape = (16, 16, 32)
    tiling = Tiling3D(tile=(8, 8, 16), block=128, margin=2)
    cell = (0.9, 1.1, 0.7)
    dt = 0.3
    rng = np.random.default_rng(11)
    n = 2048
    x0 = rng.random((n, 3)).astype(np.float32) * np.array(shape, np.float32)
    x1 = x0 + ((rng.random((n, 3)) - 0.5) * 0.9).astype(np.float32)
    q = -1.3
    qw = np.full(n, q, np.float32)

    tid, x0_p, a, b, c, qw_p, _ = build_padded_layout(
        jnp.asarray(x0), shape, tiling,
        jnp.asarray(x1[:, 0]), jnp.asarray(x1[:, 1]), jnp.asarray(x1[:, 2]),
        jnp.asarray(qw))
    x1_p = jnp.stack([a, b, c], axis=-1)

    j_sorted, spill, _ = esirkepov_sorted_3d(
        x0_p, x1_p, qw_p, tid, dt, shape, cell, tiling)
    assert int(spill) == 0
    j_ref = esirkepov_deposit_3d(jnp.asarray(x0), jnp.asarray(x1), q, dt,
                                 shape, cell)
    scale = float(jnp.abs(j_ref).max())
    np.testing.assert_allclose(np.asarray(j_sorted), np.asarray(j_ref),
                               atol=3e-5 * scale)

    # discrete continuity
    from fusion_sim_tpu.ops.interp import cic_deposit
    vol = cell[0] * cell[1] * cell[2]
    w = jnp.full((n,), q / vol, jnp.float32)
    sh = jnp.asarray(shape, jnp.float32)
    rho0 = np.asarray(cic_deposit(jnp.asarray(x0) % sh, w, shape))
    rho1 = np.asarray(cic_deposit(jnp.asarray(x1) % sh, w, shape))
    j = np.asarray(j_sorted)
    div = sum((j[..., ax] - np.roll(j[..., ax], 1, axis=ax)) / cell[ax]
              for ax in range(3))
    residual = (rho1 - rho0) / dt + div
    assert np.abs(residual).max() < 5e-5 * max(np.abs(rho0).max() / dt, 1.0)


def test_sort_by_tile_payloads():
    rng = np.random.default_rng(4)
    pos = rng.random((1000, 2)).astype(np.float32) * 64
    vel = rng.standard_normal((1000, 3)).astype(np.float32)
    w = rng.random(1000).astype(np.float32)
    tid, pos_s, vel_s, w_s = sort_by_tile(jnp.asarray(pos), SHAPE, TILING,
                                          jnp.asarray(vel), jnp.asarray(w))
    assert bool(jnp.all(tid[1:] >= tid[:-1]))
    # payload rows stay attached to their particle: check via lookup
    tid0 = tile_ids(jnp.asarray(pos), SHAPE, TILING)
    order = np.argsort(np.asarray(tid0), kind="stable")
    np.testing.assert_allclose(np.asarray(pos_s)[np.asarray(tid).argsort(kind='stable')].sum(),
                               np.asarray(pos).sum(), rtol=1e-5)
    np.testing.assert_allclose(float(w_s.sum()), float(w.sum()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vel_s).sum(axis=0),
                               vel.sum(axis=0), rtol=1e-4)


def test_gather_sorted_2d_matches_cic_gather():
    """Tile-window factorized gather == exact CIC gather for in-window
    particles (the sorted-layout contract)."""
    from fusion_sim_tpu.ops.interp import cic_gather
    from fusion_sim_tpu.ops.sorted_deposit import (
        Tiling2D, build_padded_layout, gather_sorted_2d)

    shape = (64, 128)
    tiling = Tiling2D(tile_r=16, tile_z=16, block=64, margin=2)
    rng = np.random.default_rng(0)
    n = 4096
    pos = (rng.random((n, 2)) * np.array(shape)).astype(np.float32)
    grid = rng.standard_normal((*shape, 2)).astype(np.float32)

    tid, pos_p, validp, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.ones((n,), jnp.float32))
    vals, in_win = gather_sorted_2d(jnp.asarray(grid), pos_p, tid, shape, tiling)
    keep = validp > 0.5
    # freshly sorted: every REAL particle in window (fillers sit at 0)
    assert bool(jnp.all(jnp.where(keep, in_win, True)))

    ref = cic_gather(jnp.asarray(grid), pos_p, shape)
    np.testing.assert_allclose(np.asarray(vals)[np.asarray(keep)],
                               np.asarray(ref)[np.asarray(keep)],
                               rtol=1e-5, atol=1e-6)

    # scalar grid path
    vals1, _ = gather_sorted_2d(jnp.asarray(grid[..., 0]), pos_p, tid, shape, tiling)
    ref1 = cic_gather(jnp.asarray(grid[..., 0]), pos_p, shape)
    np.testing.assert_allclose(np.asarray(vals1)[np.asarray(keep)],
                               np.asarray(ref1)[np.asarray(keep)],
                               rtol=1e-5, atol=1e-6)


def test_gather_sorted_2d_nearest_mode():
    """mode='nearest' reproduces NEAREST texel sampling (empic.js texture
    semantics) for in-window particles."""
    from fusion_sim_tpu.ops.sorted_deposit import (
        Tiling2D, build_padded_layout, gather_sorted_2d)

    shape = (32, 64)
    tiling = Tiling2D(tile_r=8, tile_z=16, block=32, margin=2)
    rng = np.random.default_rng(1)
    n = 1024
    pos = (rng.random((n, 2)) * np.array(shape)).astype(np.float32)
    grid = rng.standard_normal((*shape, 3)).astype(np.float32)

    tid, pos_p, validp, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.ones((n,), jnp.float32))
    vals, in_win = gather_sorted_2d(jnp.asarray(grid), pos_p, tid, shape,
                                    tiling, mode="nearest")
    base = np.floor(np.asarray(pos_p)).astype(int) % np.array(shape)
    ref = grid[base[:, 0], base[:, 1]]
    keep = np.asarray(validp > 0.5)
    np.testing.assert_allclose(np.asarray(vals)[keep], ref[keep], rtol=1e-6)


def test_gather_sorted_2d_out_of_window_flagged():
    """Particles drifted past the margin are flagged (clamped values)."""
    from fusion_sim_tpu.ops.sorted_deposit import (
        Tiling2D, build_padded_layout, gather_sorted_2d)

    shape = (64, 64)
    tiling = Tiling2D(tile_r=16, tile_z=16, block=64, margin=2)
    rng = np.random.default_rng(2)
    n = 256
    pos = (rng.random((n, 2)) * np.array(shape)).astype(np.float32)
    tid, pos_p, _, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.ones((n,), jnp.float32))
    # push every particle far out of its window
    pos_drift = jnp.mod(pos_p + 24.0, jnp.asarray(shape, jnp.float32))
    grid = jnp.ones(shape, jnp.float32)
    _, in_win = gather_sorted_2d(grid, pos_drift, tid, shape, tiling)
    assert not bool(jnp.all(in_win))


def test_gather_sorted_3d_matches_cic_gather():
    from fusion_sim_tpu.ops.interp import cic_gather
    from fusion_sim_tpu.ops.sorted_deposit import (
        Tiling3D, build_padded_layout, gather_sorted_3d)

    shape = (16, 16, 32)
    tiling = Tiling3D(tile=(8, 8, 8), block=32, margin=1)
    rng = np.random.default_rng(3)
    n = 2048
    pos = (rng.random((n, 3)) * np.array(shape)).astype(np.float32)
    grid = rng.standard_normal((*shape, 6)).astype(np.float32)

    tid, pos_p, validp, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.ones((n,), jnp.float32))
    vals, in_win = gather_sorted_3d(jnp.asarray(grid), pos_p, tid, shape, tiling)
    keep = np.asarray(validp > 0.5)
    assert bool(np.all(np.where(keep, np.asarray(in_win), True)))
    ref = cic_gather(jnp.asarray(grid), pos_p, shape)
    np.testing.assert_allclose(np.asarray(vals)[keep],
                               np.asarray(ref)[keep], rtol=1e-4, atol=1e-5)
