"""Sharded EM PIC equivalence tests on the 8-fake-device mesh: the
domain-decomposed step must reproduce the single-device model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fusion_sim_tpu.models import electromagnetic as em
from fusion_sim_tpu.models.electromagnetic_sharded import (
    ShardedEMConfig,
    ShardedElectromagneticPIC,
)
from fusion_sim_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.multichip


def _setup(n_particles=2000, n_cells=64, seed=0):
    d = 0.5
    base = em.EMConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                       dt=0.2 * d, charge=-0.01, mass=0.01,
                       field_gather="centered")
    rng = np.random.default_rng(seed)
    pos = rng.random((n_particles, 2)) * n_cells
    vel = 0.2 * rng.standard_normal((n_particles, 3))
    return base, pos, vel


def test_sharded_matches_single_device():
    base, pos, vel = _setup()
    mesh = make_mesh(8, ("space",))

    ref = em.ElectromagneticPIC(base, pos, vel)
    ref.step(10)

    cfg = ShardedEMConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=64)
    sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
    sim.step(10)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    # fields must match (deposition order differs -> f32 tolerance)
    np.testing.assert_allclose(np.asarray(sim.state.e), np.asarray(ref.state.e),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sim.state.b), np.asarray(ref.state.b),
                               rtol=2e-4, atol=2e-5)

    # particles: same multiset (match by sorting on position)
    p_sharded, v_sharded = sim.gather_particles()
    assert p_sharded.shape[0] == pos.shape[0]
    ref_pos = np.asarray(ref.state.position)
    order_a = np.lexsort((p_sharded[:, 1], p_sharded[:, 0]))
    order_b = np.lexsort((ref_pos[:, 1], ref_pos[:, 0]))
    np.testing.assert_allclose(p_sharded[order_a], ref_pos[order_b],
                               rtol=1e-4, atol=1e-4)


def test_sharded_em_debug_checks_raises_on_fast_particles():
    """debug_checks=True: per-step displacement past the apron/migration
    bound raises instead of silently mis-migrating (VERDICT r2 weak #5).
    The Yee CFL check bounds c*dt, but non-relativistic particle ICs can
    still exceed it."""
    base, pos, vel = _setup(n_particles=500, seed=7)
    vel = vel + np.array([30.0, 0.0, 0.0])  # ~12 cells/step >> disp_bound
    mesh = make_mesh(8, ("space",))
    cfg = ShardedEMConfig(base=base, n_shards=8, capacity=512,
                          migration_buffer=256, debug_checks=True)
    sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
    with pytest.raises(RuntimeError, match="migration invariant violated"):
        sim.step(1)


def test_sharded_particles_stay_owned():
    """After each step every live particle's x lies in its owner's slab."""
    base, pos, vel = _setup(seed=1)
    mesh = make_mesh(8, ("space",))
    cfg = ShardedEMConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=64)
    sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
    slab = cfg.slab
    for _ in range(5):
        sim.step()
        p = np.asarray(sim.state.position).reshape(8, cfg.capacity, 2)
        a = np.asarray(sim.state.alive).reshape(8, cfg.capacity)
        for s in range(8):
            xs = p[s][a[s]][:, 0]
            assert ((xs >= s * slab) & (xs < (s + 1) * slab)).all(), (s, xs)


def test_sharded_3d_matches_single_device():
    """The 3D sharded path (configs[4] structure) reproduces the
    single-device 3D EM model."""
    d = 0.5
    n_cells = 32  # slab width 4 = apron width (the minimum)
    base = em.EMConfig(grid_shape=(n_cells, n_cells, n_cells),
                       cell_size=(d, d, d), dt=0.15 * d,
                       charge=-0.01, mass=0.01, field_gather="centered")
    rng = np.random.default_rng(5)
    n = 2000
    pos = rng.random((n, 3)) * n_cells
    vel = 0.2 * rng.standard_normal((n, 3))

    ref = em.ElectromagneticPIC(base, pos, vel)
    ref.step(6)

    mesh = make_mesh(8, ("space",))
    cfg = ShardedEMConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=128)
    sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
    sim.step(6)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(sim.state.e), np.asarray(ref.state.e),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sim.state.b), np.asarray(ref.state.b),
                               rtol=2e-4, atol=2e-5)
    p_sh, _ = sim.gather_particles()
    assert p_sh.shape[0] == n


def test_sharded_gauss_and_energy_sanity():
    base, pos, vel = _setup(seed=2)
    mesh = make_mesh(8, ("space",))
    cfg = ShardedEMConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=64)
    sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
    sim.step(20)
    assert np.isfinite(np.asarray(sim.state.e)).all()
    assert np.isfinite(np.asarray(sim.state.b)).all()
    assert int(np.asarray(sim.state.alive).sum()) == pos.shape[0]


@pytest.mark.slow
def test_sharded_sorted_matches_packed_2d():
    """ShardedElectromagneticPIC with the sorted-layout composition
    (per-shard tile-sorted padded particles, VERDICT round-1 item 4)
    reproduces the packed sharded model and the single-device reference."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D

    base, pos, vel = _setup()
    mesh = make_mesh(8, ("space",))

    ref = em.ElectromagneticPIC(base, pos, vel)
    ref.step(10)

    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)
    cfg = ShardedEMConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=64, tiling=tiling, resort_every=4)
    sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
    sim.step(10)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(sim.state.e), np.asarray(ref.state.e),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sim.state.b), np.asarray(ref.state.b),
                               rtol=2e-4, atol=2e-5)
    p_sharded, _ = sim.gather_particles()
    assert p_sharded.shape[0] == pos.shape[0]
    ref_pos = np.asarray(ref.state.position)
    # nearest-neighbor pairing (lexsort pairing is fragile when two distinct
    # particles sit within f32 noise of each other along the sort axis)
    d2 = ((p_sharded[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)  # a permutation
    np.testing.assert_allclose(p_sharded, ref_pos[match], rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_sharded_sorted_fused_matches_xla():
    """gather_backend='fused' inside the sharded sorted composition (the
    single-chip Mosaic substep per shard, VERDICT r2 next-step #3) matches
    the XLA sorted sharded route on the 8-device mesh."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D

    base, pos, vel = _setup(n_particles=1000, n_cells=32)
    mesh = make_mesh(4, ("space",))
    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)

    a = ShardedElectromagneticPIC(
        ShardedEMConfig(base=base, n_shards=4, capacity=512,
                        migration_buffer=64, tiling=tiling, resort_every=4),
        mesh, pos, vel)
    b = ShardedElectromagneticPIC(
        ShardedEMConfig(base=base, n_shards=4, capacity=512,
                        migration_buffer=64, tiling=tiling, resort_every=4,
                        gather_backend="fused"),
        mesh, pos, vel)
    a.step(6)
    b.step(6)
    assert int(np.asarray(b.state.overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(b.state.e), np.asarray(a.state.e),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.state.b), np.asarray(a.state.b),
                               rtol=1e-4, atol=1e-6)
    pa, va = a.gather_particles()
    pb, vb = b.gather_particles()
    d2 = ((pb[:, None, :] - pa[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(pb, pa[match], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(vb, va[match], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sharded_sorted_fused_3d_matches_xla():
    """gather_backend='fused' in THREE dimensions inside the sharded sorted
    composition (VERDICT r3 #4): the per-shard fused_em3d_substep matches
    the XLA sorted sharded route on the mesh."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    d = 0.5
    n_cells, n = 16, 1024
    base = em.EMConfig(grid_shape=(n_cells,) * 3, cell_size=(d,) * 3,
                       dt=0.15 * d, charge=-0.01, mass=0.01,
                       field_gather="centered")
    rng = np.random.default_rng(9)
    pos = (rng.random((n, 3)) * n_cells).astype(np.float32)
    vel = (0.2 * rng.standard_normal((n, 3))).astype(np.float32)
    mesh = make_mesh(2, ("space",))
    tiling = Tiling3D(tile=(4, 4, 4), block=128, margin=1)

    kw = dict(base=base, n_shards=2, capacity=1024, migration_buffer=64,
              tiling=tiling, resort_every=3)
    a = ShardedElectromagneticPIC(ShardedEMConfig(**kw), mesh, pos, vel)
    b = ShardedElectromagneticPIC(
        ShardedEMConfig(gather_backend="fused", **kw), mesh, pos, vel)
    a.step(6)
    b.step(6)
    assert int(np.asarray(b.state.overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(b.state.e), np.asarray(a.state.e),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.state.b), np.asarray(a.state.b),
                               rtol=1e-4, atol=1e-6)
    pa, va = a.gather_particles()
    pb, vb = b.gather_particles()
    d2 = ((pb[:, None, :] - pa[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(pb, pa[match], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(vb, va[match], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sharded_sorted_matches_packed_3d():
    """3D sorted x sharded composition (the config[4] stretch structure)."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    d = 0.5
    n_cells = 32
    base = em.EMConfig(grid_shape=(n_cells, n_cells, n_cells),
                       cell_size=(d, d, d), dt=0.15 * d,
                       charge=-0.01, mass=0.01, field_gather="centered")
    rng = np.random.default_rng(5)
    n = 2000
    pos = rng.random((n, 3)) * n_cells
    vel = 0.2 * rng.standard_normal((n, 3))

    ref = em.ElectromagneticPIC(base, pos, vel)
    ref.step(6)

    mesh = make_mesh(8, ("space",))
    tiling = Tiling3D(tile=(4, 4, 4), block=128, margin=1)
    cfg = ShardedEMConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=128, tiling=tiling, resort_every=2)
    sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
    sim.step(6)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(sim.state.e), np.asarray(ref.state.e),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sim.state.b), np.asarray(ref.state.b),
                               rtol=2e-4, atol=2e-5)
    p_sh, _ = sim.gather_particles()
    assert p_sh.shape[0] == n


def test_sharded_sorted_single_shard():
    """n_shards=1 (slab = nx): the slab-centered local transform must keep
    every particle in the pseudo-grid interior (a wrap centered on x_lo sent
    the upper half of the domain to negative local x — caught on TPU as a
    43% spill rate)."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D

    base, pos, vel = _setup()
    mesh = make_mesh(1, ("space",))

    ref = em.ElectromagneticPIC(base, pos, vel)
    ref.step(8)

    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)
    cfg = ShardedEMConfig(base=base, n_shards=1, capacity=2048,
                          migration_buffer=64, tiling=tiling, resort_every=4)
    sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
    sim.step(8)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    # near-zero spill: only genuine margin out-drifters, not a transform bug
    assert int(np.asarray(sim.state.spill).sum()) < pos.shape[0] * 0.01
    np.testing.assert_allclose(np.asarray(sim.state.e), np.asarray(ref.state.e),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sim.state.b), np.asarray(ref.state.b),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("gather_backend", [
    pytest.param("xla", marks=pytest.mark.slow),
    pytest.param("fused", marks=pytest.mark.slow),
])
def test_sharded_sorted_em_repair_matches_single_device(gather_backend):
    """repair=True on the sorted-sharded EM composition: resort disabled,
    sustained cross-shard drift, stack-coordinated migration — still matches
    the single-device reference."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D

    base, pos, vel = _setup()
    vel = vel.copy()
    vel[:, 0] += 1.2  # sustained drift: rows cross shards continuously
    mesh = make_mesh(8, ("space",))

    n_steps = 20
    ref = em.ElectromagneticPIC(base, pos, vel)
    ref.step(n_steps)

    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)
    cfg = ShardedEMConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=128, tiling=tiling,
                          resort_every=10 ** 6, repair=True,
                          gather_backend=gather_backend)
    sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
    sim.step(n_steps)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    if gather_backend == "xla":
        # the fused kernel's slab geometry (one x-tile per slab) hands every
        # x-crossing to migration before it can spill, so spill can be 0
        assert int(np.asarray(sim.state.spill).sum()) > 0
    np.testing.assert_allclose(np.asarray(sim.state.e),
                               np.asarray(ref.state.e), rtol=2e-3, atol=2e-4)
    p_sharded, _ = sim.gather_particles()
    assert p_sharded.shape[0] == pos.shape[0]   # no particle lost
    ref_pos = np.asarray(ref.state.position)
    d2 = ((p_sharded[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(p_sharded, ref_pos[match], rtol=1e-4,
                               atol=2e-3)


@pytest.mark.slow
def test_sharded_sorted_em_3d_repair_matches_single_device():
    """3D sorted-sharded EM with repair=True, resort disabled: the
    dimension-agnostic relocation + stacked migration hold in 3D too."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    d = 0.5
    n_cells = 32
    base = em.EMConfig(grid_shape=(n_cells, n_cells, n_cells),
                       cell_size=(d, d, d), dt=0.15 * d,
                       charge=-0.01, mass=0.01, field_gather="centered")
    rng = np.random.default_rng(5)
    n = 2000
    pos = rng.random((n, 3)) * n_cells
    vel = 0.2 * rng.standard_normal((n, 3))
    vel = vel.copy()
    vel[:, 0] += 1.2

    n_steps = 12
    ref = em.ElectromagneticPIC(base, pos, vel)
    ref.step(n_steps)

    mesh = make_mesh(8, ("space",))
    tiling = Tiling3D(tile=(4, 4, 4), block=128, margin=1)
    cfg = ShardedEMConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=128, tiling=tiling,
                          resort_every=10 ** 6, repair=True)
    sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
    sim.step(n_steps)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(sim.state.e),
                               np.asarray(ref.state.e), rtol=2e-3, atol=2e-4)
    p_sharded, _ = sim.gather_particles()
    assert p_sharded.shape[0] == n
    ref_pos = np.asarray(ref.state.position)
    d2 = ((p_sharded[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(p_sharded, ref_pos[match], rtol=1e-4,
                               atol=2e-3)


def test_sharded_em_eager_repair_matches_single_device():
    """Sorted-sharded EM with eager relocation reproduces the single-device
    EM model with the resort disabled."""
    from fusion_sim_tpu.models import electromagnetic as em
    from fusion_sim_tpu.models.electromagnetic_sharded import (
        ShardedEMConfig, ShardedElectromagneticPIC)
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D
    from fusion_sim_tpu.parallel.mesh import make_mesh

    n_cells = 64
    d = 0.5
    n = 4000
    base = em.EMConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                       dt=0.2 * d, charge=-0.01, mass=0.01,
                       field_gather="centered")
    rng = np.random.default_rng(2)
    pos = (rng.random((n, 2)) * n_cells).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 3))).astype(np.float32)
    vel[:, 0] += 2.0

    ref = em.ElectromagneticPIC(base, pos, vel)
    ref.step(5)

    mesh = make_mesh(8, ("space",))
    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)
    cfg = ShardedEMConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=64, tiling=tiling,
                          resort_every=10 ** 6, repair=True, repair_eager=1)
    sim = ShardedElectromagneticPIC(cfg, mesh, pos, vel)
    sim.step(5)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    p_sh, v_sh = sim.gather_particles()
    assert p_sh.shape[0] == n
    ref_pos = np.asarray(ref.state.position) % n_cells
    p_sh = p_sh % n_cells
    d2 = ((p_sh[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(p_sh, ref_pos[match], rtol=1e-4, atol=5e-3)
