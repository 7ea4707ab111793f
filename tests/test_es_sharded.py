"""Sharded ES PIC (distributed FFT Poisson) equivalence on the 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from fusion_sim_tpu.models import electrostatic as es
from fusion_sim_tpu.models.electrostatic_sharded import (
    ShardedESConfig,
    ShardedElectrostaticPIC,
)
from fusion_sim_tpu.ops.solvers import poisson_fft, poisson_fft_sharded
from fusion_sim_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.multichip


def _setup(n_particles=4000, n_cells=64, seed=0):
    length = 2 * np.pi
    d = length / n_cells
    vol = length * length
    base = es.ESConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                       dt=0.05, charge=-vol / n_particles,
                       mass=vol / n_particles)
    rng = np.random.default_rng(seed)
    pos = rng.random((n_particles, 2)) * n_cells
    vel = 0.05 * rng.standard_normal((n_particles, 2))
    return base, pos, vel


def test_poisson_fft_sharded_matches_single_device():
    """Pencil-decomposed spectral solve == single-device solve, 2D and 3D."""
    mesh = make_mesh(8, ("space",))
    for shape, dx in [((64, 64), (0.5, 0.25)), ((32, 64, 16), (0.5, 0.25, 1.0))]:
        rng = np.random.default_rng(1)
        rho = rng.standard_normal(shape).astype(np.float32)
        rho -= rho.mean()
        ref = poisson_fft(jnp.asarray(rho), dx)
        f = shard_map(
            lambda r: poisson_fft_sharded(r, shape, dx, "space"),
            mesh=mesh, in_specs=P("space"), out_specs=P("space"))
        out = jax.jit(f)(jnp.asarray(rho))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


def test_sharded_es_matches_single_device():
    base, pos, vel = _setup()
    mesh = make_mesh(8, ("space",))

    ref = es.ElectrostaticPIC(base, pos, vel)
    ref.step(6)

    cfg = ShardedESConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=128)
    sim = ShardedElectrostaticPIC(cfg, mesh, pos, vel)
    sim.step(6)

    inv = sim.check_invariants()
    assert inv["overflow"] == 0
    assert inv["disp_bound_ok"]

    pos_s, vel_s = sim.gather_particles()
    pos_r = np.asarray(ref.state.position)
    assert pos_s.shape == pos_r.shape  # constant particle count
    # multiset comparison per axis (ordering differs across shards)
    for ax in range(2):
        np.testing.assert_allclose(np.sort(pos_s[:, ax]),
                                   np.sort(pos_r[:, ax]), atol=2e-3)
        np.testing.assert_allclose(np.sort(vel_s[:, ax]),
                                   np.sort(np.asarray(ref.state.velocity)[:, ax]),
                                   atol=2e-3)


def test_sharded_es_migration_roundtrip():
    """A drifting cloud crosses several slab boundaries and survives."""
    base, pos, vel = _setup(n_particles=1000, seed=3)
    vel = vel + np.array([1.2, 0.0])  # strong +x drift (cells/step ~ 0.38)
    mesh = make_mesh(8, ("space",))
    ref = es.ElectrostaticPIC(base, pos, vel)
    cfg = ShardedESConfig(base=base, n_shards=8, capacity=512,
                          migration_buffer=256)
    sim = ShardedElectrostaticPIC(cfg, mesh, pos, vel)
    n_steps = 40  # drift ~15 cells: across ~2 slab boundaries
    ref.step(n_steps)
    sim.step(n_steps)
    assert int(jnp.sum(sim.state.overflow)) == 0
    pos_s, _ = sim.gather_particles()
    assert pos_s.shape[0] == 1000
    for ax in range(2):
        np.testing.assert_allclose(
            np.sort(pos_s[:, ax]),
            np.sort(np.asarray(ref.state.position)[:, ax]), atol=5e-3)


def test_sharded_es_debug_checks_raises_on_fast_particles():
    """debug_checks=True turns a silently-corrupting invariant violation
    (per-step displacement >= apron/migration bound) into a RuntimeError
    (VERDICT r2 weak #5)."""
    base, pos, vel = _setup(n_particles=1000, seed=5)
    vel = vel + np.array([40.0, 0.0])  # ~20 cells/step >> disp_bound
    mesh = make_mesh(8, ("space",))
    cfg = ShardedESConfig(base=base, n_shards=8, capacity=512,
                          migration_buffer=256, debug_checks=True)
    sim = ShardedElectrostaticPIC(cfg, mesh, pos, vel)
    with pytest.raises(RuntimeError, match="migration invariant violated"):
        sim.step(1)
    # the same config without the flag steps silently (the old behavior)
    cfg2 = ShardedESConfig(base=base, n_shards=8, capacity=512,
                           migration_buffer=256)
    sim2 = ShardedElectrostaticPIC(cfg2, mesh, pos, vel)
    sim2.step(1)
    assert not sim2.check_invariants()["disp_bound_ok"]


def test_sharded_sorted_es_matches_single_device():
    """Sorted-layout composition of the domain-decomposed ES step (2D)
    reproduces the single-device ES model on the 8-device mesh."""
    from fusion_sim_tpu.models import electrostatic as es
    from fusion_sim_tpu.models.electrostatic_sharded import (
        ShardedESConfig, ShardedElectrostaticPIC)
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D
    from fusion_sim_tpu.parallel.mesh import make_mesh

    n_cells = 64
    d = 2 * np.pi / n_cells
    n = 4000
    base = es.ESConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                       dt=0.05, charge=-1.0 / n, mass=1.0 / n)
    rng = np.random.default_rng(0)
    pos = (rng.random((n, 2)) * n_cells).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 2))).astype(np.float32)

    ref = es.ElectrostaticPIC(base, pos, vel)
    ref.step(6)

    mesh = make_mesh(8, ("space",))
    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)
    cfg = ShardedESConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=64, tiling=tiling, resort_every=4)
    sim = ShardedElectrostaticPIC(cfg, mesh, pos, vel)
    sim.step(6)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    p_sh, v_sh = sim.gather_particles()
    assert p_sh.shape[0] == n
    ref_pos = np.asarray(ref.state.position)
    d2 = ((p_sh[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(p_sh, ref_pos[match], rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(v_sh, np.asarray(ref.state.velocity)[match],
                               rtol=1e-4, atol=2e-3)


@pytest.mark.slow
def test_sharded_sorted_es_pallas_matches_xla():
    """backend='pallas' (the single-chip fused ES Mosaic substep per shard,
    carried-rho structure, VERDICT r2 next-step #3) tracks the XLA sorted
    sharded composition on the mesh."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D

    n_cells, n = 32, 2048
    d = 2 * np.pi / n_cells
    base = es.ESConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                       dt=0.05, charge=-1.0 / n, mass=1.0 / n)
    rng = np.random.default_rng(4)
    pos = (rng.random((n, 2)) * n_cells).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 2))).astype(np.float32)
    mesh = make_mesh(4, ("space",))
    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)

    a = ShardedElectrostaticPIC(
        ShardedESConfig(base=base, n_shards=4, capacity=1024,
                        migration_buffer=64, tiling=tiling, resort_every=4),
        mesh, pos, vel)
    b = ShardedElectrostaticPIC(
        ShardedESConfig(base=base, n_shards=4, capacity=1024,
                        migration_buffer=64, tiling=tiling, resort_every=4,
                        backend="pallas"),
        mesh, pos, vel)
    a.step(6)
    b.step(6)
    assert int(np.asarray(b.state.overflow).sum()) == 0
    pa, va = a.gather_particles()
    pb, vb = b.gather_particles()
    assert pb.shape[0] == n
    d2 = ((pb[:, None, :] - pa[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(pb, pa[match], rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(vb, va[match], rtol=1e-4, atol=2e-3)
    # the carried rho equals a fresh deposit at the current positions
    seed = b._seed_rho(b.state)
    np.testing.assert_allclose(np.asarray(b.state.rho), np.asarray(seed),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sharded_sorted_es_3d_matches_single_device():
    """3D sorted-sharded ES composition (VERDICT r2 next-step #4) on the
    8-device mesh reproduces the single-device ES model."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    n_cells, n = 32, 4096
    d = 2 * np.pi / n_cells
    base = es.ESConfig(grid_shape=(n_cells,) * 3, cell_size=(d,) * 3,
                       dt=0.05, charge=-1.0 / n, mass=1.0 / n)
    rng = np.random.default_rng(2)
    pos = (rng.random((n, 3)) * n_cells).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 3))).astype(np.float32)

    ref = es.ElectrostaticPIC(base, pos, vel)
    ref.step(8)

    mesh = make_mesh(8, ("space",))
    tiling = Tiling3D(tile=(4, 8, 8), block=128, margin=1)
    cfg = ShardedESConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=64, tiling=tiling, resort_every=3)
    sim = ShardedElectrostaticPIC(cfg, mesh, pos, vel)
    sim.step(8)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    p_sh, v_sh = sim.gather_particles()
    assert p_sh.shape[0] == n
    ref_pos = np.asarray(ref.state.position)
    d2 = ((p_sh[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(p_sh, ref_pos[match], rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(v_sh, np.asarray(ref.state.velocity)[match],
                               rtol=1e-4, atol=2e-3)


@pytest.mark.slow
def test_sharded_sorted_es_pallas_3d_matches_xla():
    """backend='pallas' in THREE dimensions inside the sharded composition
    (VERDICT r3 #4: the config[4] stretch shape is 3D sharded fused): the
    per-shard fused_es3d_substep + carried-rho structure tracks the XLA
    sorted sharded route on the mesh."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    n_cells, n = 16, 1024
    d = 2 * np.pi / n_cells
    base = es.ESConfig(grid_shape=(n_cells,) * 3, cell_size=(d,) * 3,
                       dt=0.05, charge=-1.0 / n, mass=1.0 / n)
    rng = np.random.default_rng(6)
    pos = (rng.random((n, 3)) * n_cells).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 3))).astype(np.float32)
    mesh = make_mesh(2, ("space",))
    tiling = Tiling3D(tile=(4, 4, 4), block=128, margin=1)

    kw = dict(base=base, n_shards=2, capacity=1024, migration_buffer=64,
              tiling=tiling, resort_every=3)
    a = ShardedElectrostaticPIC(ShardedESConfig(**kw), mesh, pos, vel)
    b = ShardedElectrostaticPIC(ShardedESConfig(backend="pallas", **kw),
                                mesh, pos, vel)
    a.step(6)
    b.step(6)
    assert int(np.asarray(b.state.overflow).sum()) == 0
    pa, va = a.gather_particles()
    pb, vb = b.gather_particles()
    assert pb.shape[0] == n
    d2 = ((pb[:, None, :] - pa[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(pb, pa[match], rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(vb, va[match], rtol=1e-4, atol=2e-3)
    # the carried rho equals a fresh deposit at the current positions
    seed = b._seed_rho(b.state)
    np.testing.assert_allclose(np.asarray(b.state.rho), np.asarray(seed),
                               rtol=1e-4, atol=1e-5)


def test_sharded_sorted_es_single_shard():
    """n_shards=1 sorted ES composition: slab-centered transform keeps
    everything in the pseudo-grid interior."""
    from fusion_sim_tpu.models import electrostatic as es
    from fusion_sim_tpu.models.electrostatic_sharded import (
        ShardedESConfig, ShardedElectrostaticPIC)
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D
    from fusion_sim_tpu.parallel.mesh import make_mesh

    n_cells = 32
    d = 2 * np.pi / n_cells
    n = 2000
    base = es.ESConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                       dt=0.05, charge=-1.0 / n, mass=1.0 / n)
    rng = np.random.default_rng(1)
    pos = (rng.random((n, 2)) * n_cells).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 2))).astype(np.float32)

    ref = es.ElectrostaticPIC(base, pos, vel)
    ref.step(8)

    mesh = make_mesh(1, ("space",))
    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)
    cfg = ShardedESConfig(base=base, n_shards=1, capacity=2048,
                          migration_buffer=64, tiling=tiling, resort_every=4)
    sim = ShardedElectrostaticPIC(cfg, mesh, pos, vel)
    sim.step(8)

    assert int(np.asarray(sim.state.spill).sum()) < n * 0.02
    p_sh, _ = sim.gather_particles()
    assert p_sh.shape[0] == n
    ref_pos = np.asarray(ref.state.position)
    d2 = ((p_sh[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    np.testing.assert_allclose(p_sh, ref_pos[match], rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize("backend", [
    pytest.param("xla", marks=pytest.mark.slow),
    pytest.param("pallas", marks=pytest.mark.slow),
])
def test_sharded_sorted_es_repair_matches_single_device(backend):
    """repair=True on the sorted-sharded composition: spills relocate
    in-shard, migration arrivals seat straight into their tile via the
    stack-coordinated merge (migrate_ring_stacked), and with the resort
    DISABLED the run still reproduces the single-device ES model through
    sustained cross-shard drift."""
    from fusion_sim_tpu.models import electrostatic as es
    from fusion_sim_tpu.models.electrostatic_sharded import (
        ShardedESConfig, ShardedElectrostaticPIC)
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D
    from fusion_sim_tpu.parallel.mesh import make_mesh

    n_cells = 64
    d = 2 * np.pi / n_cells
    n = 4000
    base = es.ESConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                       dt=0.05, charge=-1.0 / n, mass=1.0 / n)
    rng = np.random.default_rng(0)
    pos = (rng.random((n, 2)) * n_cells).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 2))).astype(np.float32)
    vel[:, 0] += 0.8  # sustained x drift: every particle crosses shards

    n_steps = 24
    ref = es.ElectrostaticPIC(base, pos, vel)
    if backend == "pallas":
        # the pallas composition carries rho (solve uses last step's
        # deposit); the reference for row-level comparison is the XLA
        # sharded repair path below — here just check vs plain ES moments
        pass
    ref.step(n_steps)

    mesh = make_mesh(8, ("space",))
    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)
    cfg = ShardedESConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=128, tiling=tiling,
                          resort_every=10 ** 6, backend=backend, repair=True)
    sim = ShardedElectrostaticPIC(cfg, mesh, pos, vel)
    sim.step(n_steps)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    assert int(np.asarray(sim.state.spill).sum()) > 0   # migration churned
    p_sh, v_sh = sim.gather_particles()
    assert p_sh.shape[0] == n                           # no particle lost
    ref_pos = np.asarray(ref.state.position)
    if backend == "xla":
        d2 = ((p_sh[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
        match = d2.argmin(axis=1)
        assert len(np.unique(match)) == len(match)
        np.testing.assert_allclose(p_sh, ref_pos[match], rtol=1e-4, atol=5e-3)
        np.testing.assert_allclose(v_sh,
                                   np.asarray(ref.state.velocity)[match],
                                   rtol=1e-4, atol=5e-3)
    else:
        # carried-rho loop lags the solve by one step — compare moments
        np.testing.assert_allclose(np.sort(p_sh[:, 0]),
                                   np.sort(ref_pos[:, 0]), atol=0.3)
        np.testing.assert_allclose(v_sh.mean(0), 
                                   np.asarray(ref.state.velocity).mean(0),
                                   atol=0.02)


def test_sharded_sorted_es_repair_eager_matches_single_device():
    """repair_eager on the SHARDED composition (VERDICT r4 #6): band rows
    relocate while still in-window (slab-axis pseudo-grid band handling +
    migration-mask interaction), the resort stays disabled, and the run
    reproduces the single-device ES model through sustained cross-shard
    drift — with the out-of-window patch flux collapsing vs plain repair."""
    from fusion_sim_tpu.models import electrostatic as es
    from fusion_sim_tpu.models.electrostatic_sharded import (
        ShardedESConfig, ShardedElectrostaticPIC)
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D
    from fusion_sim_tpu.parallel.mesh import make_mesh

    n_cells = 64
    d = 2 * np.pi / n_cells
    n = 4000
    base = es.ESConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                       dt=0.05, charge=-1.0 / n, mass=1.0 / n)
    rng = np.random.default_rng(0)
    pos = (rng.random((n, 2)) * n_cells).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 2))).astype(np.float32)
    vel[:, 0] += 0.8  # sustained x drift: every particle crosses shards

    n_steps = 24
    ref = es.ElectrostaticPIC(base, pos, vel)
    ref.step(n_steps)

    mesh = make_mesh(8, ("space",))
    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)
    kw = dict(base=base, n_shards=8, capacity=1024, migration_buffer=128,
              tiling=tiling, resort_every=10 ** 6, repair=True)
    plain = ShardedElectrostaticPIC(ShardedESConfig(**kw), mesh, pos, vel)
    eager = ShardedElectrostaticPIC(
        ShardedESConfig(repair_eager=1, **kw), mesh, pos, vel)
    plain.step(n_steps)
    eager.step(n_steps)

    assert int(np.asarray(eager.state.overflow).sum()) == 0
    p_sh, v_sh = eager.gather_particles()
    assert p_sh.shape[0] == n
    ref_pos = np.asarray(ref.state.position)
    d2 = ((p_sh[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(p_sh, ref_pos[match], rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(v_sh, np.asarray(ref.state.velocity)[match],
                               rtol=1e-4, atol=5e-3)
    # eager relocation moves band rows BEFORE they exit: the exact-patch
    # flux (state.spill counts out-of-window rows) collapses vs plain
    # repair under the same drift
    spill_plain = int(np.asarray(plain.state.spill).sum())
    spill_eager = int(np.asarray(eager.state.spill).sum())
    assert spill_eager < spill_plain / 4, (spill_eager, spill_plain)


@pytest.mark.slow
def test_sharded_sorted_es_3d_repair_matches_single_device():
    """3D sorted-sharded ES with repair=True and the resort disabled: the
    dimension-agnostic relocation + stacked migration reproduce the
    single-device model under sustained cross-shard drift."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    n_cells, n = 32, 4096
    d = 2 * np.pi / n_cells
    base = es.ESConfig(grid_shape=(n_cells,) * 3, cell_size=(d,) * 3,
                       dt=0.05, charge=-1.0 / n, mass=1.0 / n)
    rng = np.random.default_rng(2)
    pos = (rng.random((n, 3)) * n_cells).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 3))).astype(np.float32)
    vel[:, 0] += 0.6

    ref = es.ElectrostaticPIC(base, pos, vel)
    ref.step(8)

    mesh = make_mesh(8, ("space",))
    tiling = Tiling3D(tile=(4, 8, 8), block=128, margin=1)
    cfg = ShardedESConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=128, tiling=tiling,
                          resort_every=10 ** 6, repair=True)
    sim = ShardedElectrostaticPIC(cfg, mesh, pos, vel)
    sim.step(8)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    p_sh, v_sh = sim.gather_particles()
    assert p_sh.shape[0] == n
    ref_pos = np.asarray(ref.state.position)
    d2 = ((p_sh[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(p_sh, ref_pos[match], rtol=1e-4, atol=5e-3)


@pytest.mark.slow
def test_sharded_repair_overflow_triggers_resort():
    """Dropped migration arrivals (tile + spare stacks empty) warn and
    schedule a full resort, which rebuilds stacks and stops the loss."""
    import warnings

    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D
    from fusion_sim_tpu.parallel.mesh import make_mesh

    n_cells = 64
    d = 2 * np.pi / n_cells
    n = 2000
    base = es.ESConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                       dt=0.05, charge=-1.0 / n, mass=1.0 / n)
    rng = np.random.default_rng(3)
    # everyone clustered in shard 0, all drifting right fast: shard 1's
    # minuscule stacks are overwhelmed within a couple of steps
    pos = np.zeros((n, 2), np.float32)
    pos[:, 0] = 6.0 + rng.random(n).astype(np.float32)
    pos[:, 1] = (rng.random(n) * n_cells).astype(np.float32)
    vel = (0.05 * rng.standard_normal((n, 2))).astype(np.float32)
    vel[:, 0] += 1.9

    mesh = make_mesh(8, ("space",))
    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)

    # (a) pathologically tiny stacks: drops happen, but they WARN, schedule
    # resorts, and the accounting is exact (live + dropped == n)
    cfg = ShardedESConfig(base=base, n_shards=8, capacity=2048,
                          migration_buffer=2048, tiling=tiling,
                          resort_every=10 ** 6, repair=True,
                          repair_free_slots=4, spare_slots=4)
    sim = ShardedElectrostaticPIC(cfg, mesh, pos, vel)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        for _ in range(10):
            sim.step(1)
        dropped_total = int(np.asarray(sim.state.overflow).sum())
        drop_warns = [x for x in w if "dropped" in str(x.message)]
    assert dropped_total > 0        # the scenario actually overwhelms them
    assert drop_warns               # ...and the shell said so
    p_sh, _ = sim.gather_particles()
    assert p_sh.shape[0] + dropped_total == n   # exact accounting

    # (b) DEFAULT sizing (spare >= 2*migration_buffer): the same flood
    # seats every arrival — nothing lost, no warning
    cfg2 = ShardedESConfig(base=base, n_shards=8, capacity=2048,
                           migration_buffer=2048, tiling=tiling,
                           resort_every=10 ** 6, repair=True)
    sim2 = ShardedElectrostaticPIC(cfg2, mesh, pos, vel)
    for _ in range(10):
        sim2.step(1)
    assert int(np.asarray(sim2.state.overflow).sum()) == 0
    p_sh2, _ = sim2.gather_particles()
    assert p_sh2.shape[0] == n


def test_sharded_eager_repair_matches_single_device():
    """Sorted-sharded ES with eager relocation (repair_eager) reproduces the
    single-device model with the resort disabled and zero window exits for
    in-slab rows (migrants still take their exchange path)."""
    from fusion_sim_tpu.models import electrostatic as es
    from fusion_sim_tpu.models.electrostatic_sharded import (
        ShardedESConfig, ShardedElectrostaticPIC)
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D
    from fusion_sim_tpu.parallel.mesh import make_mesh

    n_cells = 64
    d = 2 * np.pi / n_cells
    n = 4000
    base = es.ESConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                       dt=0.05, charge=-1.0 / n, mass=1.0 / n)
    rng = np.random.default_rng(1)
    pos = (rng.random((n, 2)) * n_cells).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 2))).astype(np.float32)
    vel[:, 0] += 0.6  # drift: tiles churn and shards exchange particles

    ref = es.ElectrostaticPIC(base, pos, vel)
    ref.step(8)

    mesh = make_mesh(8, ("space",))
    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)
    cfg = ShardedESConfig(base=base, n_shards=8, capacity=1024,
                          migration_buffer=64, tiling=tiling,
                          resort_every=10 ** 6, repair=True, repair_eager=1)
    sim = ShardedElectrostaticPIC(cfg, mesh, pos, vel)
    sim.step(8)

    assert int(np.asarray(sim.state.overflow).sum()) == 0
    p_sh, v_sh = sim.gather_particles()
    assert p_sh.shape[0] == n
    ref_pos = np.asarray(ref.state.position)
    d2 = ((p_sh[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(p_sh, ref_pos[match], rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(v_sh, np.asarray(ref.state.velocity)[match],
                               rtol=1e-4, atol=2e-3)
