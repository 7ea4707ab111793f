"""2-D-mesh EM PIC equivalence on the 8-fake-device CPU mesh: the two-axis
apron/halo Yee step (no global solve — every phase collective-local) must
reproduce the single-device model, including field state and diagonal
(two-phase) particle migration."""

import numpy as np
import pytest

from fusion_sim_tpu.models import electromagnetic as em
from fusion_sim_tpu.models.electromagnetic_sharded2d import (
    ShardedEMConfig2D,
    ShardedElectromagneticPIC2D,
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


def _assert_matches(sim, ref, pos0_shape):
    assert int(np.asarray(sim.state.overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(sim.state.e),
                               np.asarray(ref.state.e),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sim.state.b),
                               np.asarray(ref.state.b),
                               rtol=2e-4, atol=2e-5)
    p_sh, v_sh = sim.gather_particles()
    assert p_sh.shape[0] == pos0_shape
    ref_pos = np.asarray(ref.state.position)
    order_a = np.lexsort((p_sh[:, 1], p_sh[:, 0]))
    order_b = np.lexsort((ref_pos[:, 1], ref_pos[:, 0]))
    np.testing.assert_allclose(p_sh[order_a], ref_pos[order_b],
                               rtol=1e-4, atol=1e-4)


def test_sharded2d_em_matches_single_device():
    base, pos, vel = _setup()
    mesh = make_mesh(8, ("sx", "sy"), shape=(2, 4))

    ref = em.ElectromagneticPIC(base, pos, vel)
    ref.step(10)

    cfg = ShardedEMConfig2D(base=base, mesh_shape=(2, 4), capacity=1024,
                            migration_buffer=64)
    sim = ShardedElectromagneticPIC2D(cfg, mesh, pos, vel)
    sim.step(10)
    _assert_matches(sim, ref, pos.shape[0])


def test_sharded2d_em_3d_matches_single_device():
    """3D grid decomposed over its two leading axes on a (2, 2) mesh."""
    n_cells, n_particles = 16, 1500
    d = 0.5
    base = em.EMConfig(grid_shape=(n_cells, n_cells, 8),
                       cell_size=(d, d, d), dt=0.15 * d, charge=-0.01,
                       mass=0.01, field_gather="centered")
    rng = np.random.default_rng(2)
    pos = rng.random((n_particles, 3)) * np.array([n_cells, n_cells, 8])
    vel = 0.2 * rng.standard_normal((n_particles, 3))

    ref = em.ElectromagneticPIC(base, pos, vel)
    ref.step(6)

    mesh = make_mesh(4, ("sx", "sy"), shape=(2, 2))
    cfg = ShardedEMConfig2D(base=base, mesh_shape=(2, 2), capacity=1024,
                            migration_buffer=64)
    sim = ShardedElectromagneticPIC2D(cfg, mesh, pos, vel)
    sim.step(6)
    _assert_matches(sim, ref, pos.shape[0])


def test_sharded2d_em_diagonal_migration_conserves():
    """Uniform diagonal drift crosses both block axes (corner crossers
    route in two phases); population + charge are conserved."""
    base, pos, _ = _setup(n_particles=1500)
    cells_per_step = 0.8
    v = cells_per_step * base.cell_size[0] / base.dt
    vel = np.concatenate([np.full((pos.shape[0], 2), v, np.float32),
                          np.zeros((pos.shape[0], 1), np.float32)], axis=1)

    mesh = make_mesh(8, ("sx", "sy"), shape=(2, 4))
    cfg = ShardedEMConfig2D(base=base, mesh_shape=(2, 4), capacity=2048,
                            migration_buffer=1024)
    sim = ShardedElectromagneticPIC2D(cfg, mesh, pos, vel)
    n0 = int(np.asarray(sim.state.alive).sum())
    sim.step(25)
    inv = sim.check_invariants()
    assert inv["overflow"] == 0
    assert int(np.asarray(sim.state.alive).sum()) == n0


def test_sharded2d_em_debug_checks_raises_on_fast_particles():
    base, pos, vel = _setup(n_particles=500, seed=7)
    vel = vel + np.array([30.0, 30.0, 0.0])  # >> disp_bound on both axes
    mesh = make_mesh(8, ("sx", "sy"), shape=(2, 4))
    cfg = ShardedEMConfig2D(base=base, mesh_shape=(2, 4), capacity=512,
                            migration_buffer=256, debug_checks=True)
    sim = ShardedElectromagneticPIC2D(cfg, mesh, pos, vel)
    with pytest.raises(RuntimeError, match="migration invariant violated"):
        sim.step(1)


def test_sharded2d_sorted_em_matches_single_device():
    """Sorted-layout composition on the (2, 4) mesh (two-axis halo'd
    pseudo-grid, digit-matmul gather/Esirkepov, dimension-ordered
    migration — VERDICT r4 #3) reproduces the single-device EM model."""
    from fusion_sim_tpu.models.electromagnetic_sharded2d import \
        ShardedEMConfig2D
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D

    base, pos, vel = _setup()
    ref = em.ElectromagneticPIC(base, pos, vel)
    ref.step(10)

    mesh = make_mesh(8, ("sx", "sy"), shape=(2, 4))
    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)
    cfg = ShardedEMConfig2D(base=base, mesh_shape=(2, 4), capacity=1024,
                            migration_buffer=64, tiling=tiling,
                            resort_every=4)
    sim = ShardedElectromagneticPIC2D(cfg, mesh, pos, vel)
    sim.step(10)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(sim.state.e),
                               np.asarray(ref.state.e),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sim.state.b),
                               np.asarray(ref.state.b),
                               rtol=2e-4, atol=2e-5)
    p_sh, _ = sim.gather_particles()
    assert p_sh.shape[0] == pos.shape[0]
    ref_pos = np.asarray(ref.state.position)
    d2 = ((p_sh[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(p_sh, ref_pos[match], rtol=1e-4, atol=1e-4)


def test_sharded2d_sorted_em_fused_matches_xla():
    """gather_backend='fused' on the 2-D mesh (the fused EM Mosaic substep
    per shard composed with two-axis halos/aprons and migrate_grid) matches
    the XLA sorted 2-D-mesh composition."""
    from fusion_sim_tpu.models.electromagnetic_sharded2d import \
        ShardedEMConfig2D
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D

    base, pos, vel = _setup(n_particles=1000, n_cells=32)
    mesh = make_mesh(4, ("sx", "sy"), shape=(2, 2))
    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)
    kw = dict(base=base, mesh_shape=(2, 2), capacity=512,
              migration_buffer=64, tiling=tiling, resort_every=4)

    a = ShardedElectromagneticPIC2D(ShardedEMConfig2D(**kw), mesh, pos, vel)
    b = ShardedElectromagneticPIC2D(
        ShardedEMConfig2D(gather_backend="fused", **kw), mesh, pos, vel)
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
