"""Multi-device tests on the 8-fake-device CPU mesh (SURVEY.md §4):
particle-DP pusher equivalence, spatially sharded EM step equivalence,
explicit halo exchange, apron accumulation, ring particle migration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from fusion_sim_tpu.models.pusher import CylindricalParticlePusher, make_step_fn
from fusion_sim_tpu.models import electromagnetic as em
from fusion_sim_tpu.parallel import halo, migration
from fusion_sim_tpu.parallel.mesh import make_mesh
from fusion_sim_tpu.parallel.sharding import (
    replicate_pusher_fields,
    shard_em_state,
    shard_pusher_state,
)

pytestmark = pytest.mark.multichip

SPEC = {
    "radius": 1.0, "height": 2.0, "nr": 32, "nz": 64, "dt": 2e-9,
    "nparticles": 16, "particle_mass": 1.67e-27, "particle_charge": 1.602e-19,
}


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


def _setup_pusher():
    sim = CylindricalParticlePusher(SPEC, seed=3)
    n = SPEC["nparticles"] ** 2
    rng = np.random.default_rng(0)
    sim.set({
        "position": 0.2 * (rng.random((n, 3)) - 0.5) + np.array([0, 0, 1.0]),
        "velocity": 0.002 * (rng.random((n, 3)) - 0.5),
        "source_pdf": np.ones((SPEC["nr"], SPEC["nz"]), np.float32),
    })
    sim.add_bz(0.05)
    sim.precalc()
    return sim


def test_particle_dp_pusher_matches_single_device():
    sim = _setup_pusher()
    step = make_step_fn(sim.spec)

    # single-device run
    ref = step(sim.fields, sim.state)

    # sharded run
    mesh = make_mesh(8, ("data",))
    state_sharded = shard_pusher_state(sim.state, mesh)
    fields_sharded = replicate_pusher_fields(sim.fields, mesh)
    out = step(fields_sharded, state_sharded)

    np.testing.assert_allclose(np.asarray(ref.position), np.asarray(out.position),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ref.velocity), np.asarray(out.velocity),
                               rtol=1e-6, atol=1e-7)
    # output keeps the particle axis sharded
    assert out.position.sharding.spec[0] == "data"


def test_spatially_sharded_em_step_matches():
    rng = np.random.default_rng(1)
    n_cells = 32
    d = 0.5
    config = em.EMConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                         dt=0.2 * d, charge=-0.01, mass=0.01)
    n = 1024
    pos = rng.random((n, 2)) * n_cells
    vel = 0.1 * rng.standard_normal((n, 3))
    sim = em.ElectromagneticPIC(config, pos, vel)
    step = em.make_step_fn(config)
    ref = step(sim.state)

    mesh = make_mesh(8, ("space",))
    sharded = shard_em_state(sim.state, mesh, particle_axis="space",
                             space_axis="space")
    out = step(sharded)
    np.testing.assert_allclose(np.asarray(ref.e), np.asarray(out.e),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.position), np.asarray(out.position),
                               rtol=1e-6, atol=1e-6)


def test_with_halo_matches_roll():
    mesh = make_mesh(8, ("space",))
    x = jnp.arange(64.0).reshape(64, 1) * jnp.ones((1, 4))

    def f(local):
        return halo.with_halo(local, "space", 2)

    out = shard_map(f, mesh=mesh, in_specs=P("space", None),
                    out_specs=P("space", None))(x)
    out = np.asarray(out)  # (8 * 12, 4)
    blocks = out.reshape(8, 12, 4)
    xb = np.asarray(x).reshape(8, 8, 4)
    for s in range(8):
        np.testing.assert_array_equal(blocks[s, 2:10], xb[s])
        np.testing.assert_array_equal(blocks[s, :2], xb[(s - 1) % 8, -2:])
        np.testing.assert_array_equal(blocks[s, 10:], xb[(s + 1) % 8, :2])


def test_accumulate_apron_inverse_of_halo():
    """Depositing 1 everywhere on padded blocks then folding aprons gives
    uniform weight 1 + 2*width/... : every interior cell receives exactly the
    contributions its owners deposited — total conserved."""
    mesh = make_mesh(8, ("space",))
    width = 2

    def f(local):
        padded = jnp.ones((local.shape[0] + 2 * width,) + local.shape[1:])
        return halo.accumulate_apron(padded, "space", width)

    x = jnp.zeros((64, 3))
    out = shard_map(f, mesh=mesh, in_specs=P("space", None),
                    out_specs=P("space", None))(x)
    out = np.asarray(out).reshape(8, 8, 3)
    # every edge cell got 1 (own) + 1 (neighbor apron); interiors 1
    expected = np.ones((8, 8, 3))
    expected[:, :width] += 1
    expected[:, -width:] += 1
    np.testing.assert_array_equal(out, expected)


def test_migration_ring():
    """16 particles per shard; some move left/right; totals conserved and
    arrivals land on the correct neighbor."""
    mesh = make_mesh(8, ("space",))
    n_per = 16
    cap = 4

    # global particle data: value = owner shard id * 100 + local index
    ids = jnp.arange(8 * n_per, dtype=jnp.float32).reshape(8 * n_per, 1)
    alive = jnp.ones((8 * n_per,), bool)
    # shard s: local particles 0 goes left, 1-2 go right, rest stay
    go_left = jnp.zeros((8 * n_per,), bool)
    go_right = jnp.zeros((8 * n_per,), bool)
    for s in range(8):
        go_left = go_left.at[s * n_per + 0].set(True)
        go_right = go_right.at[s * n_per + 1].set(True)
        go_right = go_right.at[s * n_per + 2].set(True)

    def f(arr, alv, gl, gr):
        res = migration.migrate_ring((arr,), alv, gl, gr, "space", cap)
        return res.arrays[0], res.alive, res.overflow[None]

    arr_out, alive_out, overflow = shard_map(
        f, mesh=mesh,
        in_specs=(P("space", None), P("space"), P("space"), P("space")),
        out_specs=(P("space", None), P("space"), P("space")),
    )(ids, alive, go_left, go_right)

    arr_out = np.asarray(arr_out).reshape(8, n_per)
    alive_out = np.asarray(alive_out).reshape(8, n_per)
    assert np.asarray(overflow).sum() == 0
    # conservation: the union of live ids equals the original set
    live_ids = sorted(arr_out[alive_out].astype(int).tolist())
    assert live_ids == sorted(range(8 * n_per))
    # arrivals: shard s must now contain id (s-1)*n_per+1, (s-1)*n_per+2
    # (right-movers from left neighbor) and (s+1)*n_per (left-mover from
    # right neighbor)
    for s in range(8):
        ids_here = set(arr_out[s][alive_out[s]].astype(int).tolist())
        assert ((s - 1) % 8) * n_per + 1 in ids_here
        assert ((s - 1) % 8) * n_per + 2 in ids_here
        assert ((s + 1) % 8) * n_per + 0 in ids_here
        # leavers gone
        assert s * n_per + 0 not in ids_here
        assert s * n_per + 1 not in ids_here


def test_migration_overflow_reported():
    mesh = make_mesh(8, ("space",))
    n_per = 16
    cap = 2  # too small: 3 right-movers

    ids = jnp.arange(8 * n_per, dtype=jnp.float32).reshape(8 * n_per, 1)
    alive = jnp.ones((8 * n_per,), bool)
    go_left = jnp.zeros((8 * n_per,), bool)
    go_right = jnp.zeros((8 * n_per,), bool)
    for s in range(8):
        for k in range(3):
            go_right = go_right.at[s * n_per + k].set(True)

    def f(arr, alv, gl, gr):
        res = migration.migrate_ring((arr,), alv, gl, gr, "space", cap)
        return res.arrays[0], res.alive, res.overflow[None]

    _, _, overflow = shard_map(
        f, mesh=mesh,
        in_specs=(P("space", None), P("space"), P("space"), P("space")),
        out_specs=(P("space", None), P("space"), P("space")),
    )(ids, alive, go_left, go_right)
    assert np.asarray(overflow).sum() == 8  # one dropped per shard
