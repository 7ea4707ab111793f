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


def test_halo_2d_corners():
    """with_halo_2d fills edge AND corner ghost cells of a 2-D-mesh
    decomposition (periodic torus) via two sequential axis exchanges."""
    mesh = make_mesh(4, ("sx", "sy"), shape=(2, 2))
    gx, gy, w = 8, 8, 2
    glob = np.arange(gx * gy, dtype=np.float32).reshape(gx, gy)

    def f(local):
        return halo.with_halo_2d(local, ("sx", "sy"), (w, w))

    out = shard_map(f, mesh=mesh, in_specs=P("sx", "sy"),
                    out_specs=P("sx", "sy"))(jnp.asarray(glob))
    out = np.asarray(out)  # (gx + 2*2*w, gy + 2*2*w) stacked shard blocks
    lx, ly = gx // 2, gy // 2
    for sx in range(2):
        for sy in range(2):
            blk = out[sx * (lx + 2 * w):(sx + 1) * (lx + 2 * w),
                      sy * (ly + 2 * w):(sy + 1) * (ly + 2 * w)]
            rows = (np.arange(sx * lx - w, (sx + 1) * lx + w)) % gx
            cols = (np.arange(sy * ly - w, (sy + 1) * ly + w)) % gy
            np.testing.assert_array_equal(blk, glob[np.ix_(rows, cols)])


def test_accumulate_apron_2d_matches_global_fold():
    """accumulate_apron_2d folds two-axis deposition aprons (corners
    included) identically to a global periodic scatter."""
    mesh = make_mesh(4, ("sx", "sy"), shape=(2, 2))
    gx, gy, w = 8, 8, 2
    lx, ly = gx // 2, gy // 2
    rng = np.random.default_rng(7)
    padded = rng.standard_normal((2, 2, lx + 2 * w, ly + 2 * w)).astype(np.float32)

    # reference: scatter every shard's padded block onto the global torus
    ref = np.zeros((gx, gy), np.float32)
    for sx in range(2):
        for sy in range(2):
            for i in range(lx + 2 * w):
                for j in range(ly + 2 * w):
                    ref[(sx * lx + i - w) % gx, (sy * ly + j - w) % gy] += \
                        padded[sx, sy, i, j]

    stacked = jnp.asarray(
        np.block([[padded[0, 0], padded[0, 1]], [padded[1, 0], padded[1, 1]]]))

    def f(p):
        return halo.accumulate_apron_2d(p, ("sx", "sy"), (w, w))

    out = shard_map(f, mesh=mesh, in_specs=P("sx", "sy"),
                    out_specs=P("sx", "sy"))(stacked)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-5)


def test_migrate_grid_diagonal():
    """Dimension-ordered 2-phase migration routes a diagonal mover across
    BOTH mesh axes (x hop then y hop) and conserves the population."""
    mesh = make_mesh(4, ("sx", "sy"), shape=(2, 2))
    n_per, cap = 8, 4
    # fields: value, dest_sx, dest_sy.  Shard (0,0)'s particle 0 goes
    # diagonally to (1,1); its particle 1 goes to (1,0); one particle on
    # (1,1) goes to (0,1).  Encoded per-row so each shard reads its own.
    n = 4 * n_per
    val = np.arange(n, dtype=np.float32)
    dest = np.zeros((n, 2), np.float32)
    for s in range(4):      # default: stay on own shard (sx, sy) = divmod(s, 2)
        dest[s * n_per:(s + 1) * n_per] = divmod(s, 2)
    dest[0] = (1, 1)        # shard (0,0) row 0 -> diagonal
    dest[1] = (1, 0)        # shard (0,0) row 1 -> +x only
    dest[3 * n_per] = (0, 1)  # shard (1,1) row 0 -> -x only
    # arrivals land in DEAD slots: keep the back half of every shard free
    alive = np.ones((n,), bool)
    for s_ in range(4):
        alive[s_ * n_per + n_per // 2:(s_ + 1) * n_per] = False

    def mask_fn_factory():
        def mask_fn(arrays, k):
            _, dsx, dsy = arrays
            mine = jax.lax.axis_index("sx" if k == 0 else "sy")
            d = (dsx if k == 0 else dsy).astype(jnp.int32)
            move = d != mine
            return jnp.zeros_like(move), move  # ring of 2: one hop suffices
        return mask_fn

    def f(v, dx, dy, alv):
        res = migration.migrate_grid((v, dx, dy), alv, mask_fn_factory(),
                                     ("sx", "sy"), cap)
        return (*res.arrays, res.alive, res.overflow[None])

    specs = P(("sx", "sy"))
    out = shard_map(
        f, mesh=mesh, in_specs=(specs,) * 4,
        out_specs=(specs, specs, specs, specs, specs))(
        jnp.asarray(val), jnp.asarray(dest[:, 0]), jnp.asarray(dest[:, 1]),
        jnp.asarray(alive))
    v_out, dx_out, dy_out, alive_out, overflow = map(np.asarray, out)
    assert overflow.sum() == 0
    assert alive_out.sum() == alive.sum()  # population conserved
    # every live row now sits on its destination shard
    for s in range(4):
        sx, sy = divmod(s, 2)
        seg = slice(s * n_per, (s + 1) * n_per)
        live = alive_out[seg]
        np.testing.assert_array_equal(dx_out[seg][live], sx)
        np.testing.assert_array_equal(dy_out[seg][live], sy)
    # the diagonal mover's value landed on shard (1,1)
    seg = slice(3 * n_per, 4 * n_per)
    assert 0.0 in v_out[seg][alive_out[seg]]
