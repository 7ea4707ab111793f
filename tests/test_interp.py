"""CIC deposit/gather unit tests (charge conservation, linearity, adjointness)."""

import jax.numpy as jnp
import numpy as np

from fusion_sim_tpu.ops.interp import cic_deposit, cic_gather


def test_deposit_conserves_charge_1d():
    pos = jnp.array([[3.25], [7.9], [0.1], [31.7]], jnp.float32)
    w = jnp.array([1.0, 2.0, -1.5, 0.5], jnp.float32)
    grid = cic_deposit(pos, w, (32,))
    np.testing.assert_allclose(float(grid.sum()), float(w.sum()), rtol=1e-6)


def test_deposit_linear_weights_1d():
    pos = jnp.array([[3.25]], jnp.float32)
    w = jnp.array([1.0], jnp.float32)
    grid = np.asarray(cic_deposit(pos, w, (8,)))
    np.testing.assert_allclose(grid[3], 0.75, rtol=1e-6)
    np.testing.assert_allclose(grid[4], 0.25, rtol=1e-6)
    assert grid[[0, 1, 2, 5, 6, 7]].sum() == 0


def test_deposit_periodic_wrap():
    pos = jnp.array([[7.5]], jnp.float32)
    grid = np.asarray(cic_deposit(pos, jnp.ones(1), (8,)))
    np.testing.assert_allclose(grid[7], 0.5, rtol=1e-6)
    np.testing.assert_allclose(grid[0], 0.5, rtol=1e-6)


def test_gather_matches_linear_field_2d():
    """Gathering a linear field reproduces it exactly (CIC is 1st order)."""
    nx, ny = 16, 16
    gx, gy = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    grid = (2.0 * gx + 3.0 * gy).astype(np.float32)
    pos = jnp.array([[3.5, 4.25], [10.1, 2.9], [5.0, 5.0]], jnp.float32)
    vals = np.asarray(cic_gather(jnp.asarray(grid), pos, (nx, ny)))
    expected = 2.0 * np.array([3.5, 10.1, 5.0]) + 3.0 * np.array([4.25, 2.9, 5.0])
    np.testing.assert_allclose(vals, expected, rtol=1e-5)


def test_gather_channels():
    grid = jnp.stack([jnp.arange(8, dtype=jnp.float32),
                      jnp.arange(8, dtype=jnp.float32) * 2], axis=-1)  # (8, 2)
    pos = jnp.array([[2.5]], jnp.float32)
    vals = np.asarray(cic_gather(grid, pos, (8,)))
    np.testing.assert_allclose(vals[0], [2.5, 5.0], rtol=1e-6)


def test_packed_variants_match_reference():
    """cic_deposit_packed / cic_gather_packed must equal the plain forms."""
    from fusion_sim_tpu.ops.interp import cic_deposit_packed, cic_gather_packed

    rng = np.random.default_rng(2)
    for shape in [(32,), (16, 24), (8, 10, 12)]:
        d = len(shape)
        pos = jnp.asarray(rng.random((200, d)) * np.array(shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal(200), jnp.float32)
        ref = np.asarray(cic_deposit(pos, w, shape))
        packed = np.asarray(cic_deposit_packed(pos, w, shape))
        np.testing.assert_allclose(packed, ref, rtol=1e-5, atol=1e-6)

        grid = jnp.asarray(rng.standard_normal(shape + (3,)), jnp.float32)
        ref_g = np.asarray(cic_gather(grid, pos, shape))
        packed_g = np.asarray(cic_gather_packed(grid, pos, shape))
        np.testing.assert_allclose(packed_g, ref_g, rtol=1e-5, atol=1e-6)

        # scalar grid path
        ref_s = np.asarray(cic_gather(grid[..., 0], pos, shape))
        packed_s = np.asarray(cic_gather_packed(grid[..., 0], pos, shape))
        np.testing.assert_allclose(packed_s, ref_s, rtol=1e-5, atol=1e-6)


def test_deposit_gather_adjoint():
    """<deposit(w), g> == <w, gather(g)> — the defining adjointness that
    makes the ES force momentum-conserving."""
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.random((100, 2)) * 16, jnp.float32)
    w = jnp.asarray(rng.standard_normal(100), jnp.float32)
    g = jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)
    lhs = float(jnp.sum(cic_deposit(pos, w, (16, 16)) * g))
    rhs = float(jnp.sum(w * cic_gather(g, pos, (16, 16))))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_spill_rows_cond_gather_compaction():
    """spill_rows_cond's scatter-free compaction returns exactly the
    spilled row indices for clustered, scattered, and adversarial masks
    (no silent drops — the round-2 chunk-budget respawn-backlog bug)."""
    import jax.numpy as jnp

    from fusion_sim_tpu.ops.interp import spill_rows_cond

    n = 300_000
    rng = np.random.default_rng(3)
    # clustered spills: 40 chunks, a few rows each
    mask = np.zeros(n, bool)
    chunks = rng.choice(n // 1024, size=40, replace=False)
    for c in chunks:
        mask[c * 1024 + rng.choice(1024, size=5, replace=False)] = True
    want = np.where(mask)[0]
    idx, ok = spill_rows_cond(jnp.asarray(mask), jnp.sum(jnp.asarray(mask)),
                              4096, n)
    got = np.sort(np.asarray(idx)[np.asarray(ok)])
    np.testing.assert_array_equal(got, want)

    # no spills: cold branch, all sentinels
    idx0, ok0 = spill_rows_cond(jnp.zeros(n, bool), jnp.int32(0), 4096, n)
    assert not bool(np.asarray(ok0).any())
    assert (np.asarray(idx0) == n).all()

    # scattered: one spill in every chunk (the case the old chunk-budgeted
    # hierarchy silently truncated) — every row captured
    mask_all = np.zeros(n, bool)
    mask_all[::1024] = True
    idx2, ok2 = spill_rows_cond(jnp.asarray(mask_all),
                                jnp.sum(jnp.asarray(mask_all)), 4096, n)
    got2 = np.sort(np.asarray(idx2)[np.asarray(ok2)])
    np.testing.assert_array_equal(got2, np.where(mask_all)[0])

    # beyond capacity: the first `capacity` rows in row order are captured
    idx3, ok3 = spill_rows_cond(jnp.asarray(mask_all),
                                jnp.sum(jnp.asarray(mask_all)), 64, n)
    got3 = np.sort(np.asarray(idx3)[np.asarray(ok3)])
    np.testing.assert_array_equal(got3, np.where(mask_all)[0][:64])

    # adversarial: random dense-ish mask incl. chunk boundaries + tail
    mask_r = rng.random(n) < 0.01
    mask_r[0] = mask_r[-1] = mask_r[1023] = mask_r[1024] = True
    idx4, ok4 = spill_rows_cond(jnp.asarray(mask_r),
                                jnp.sum(jnp.asarray(mask_r)), 8192, n)
    got4 = np.sort(np.asarray(idx4)[np.asarray(ok4)])
    np.testing.assert_array_equal(got4, np.where(mask_r)[0][:8192])
