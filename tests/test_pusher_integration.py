"""End-to-end tests of the cylindrical pusher on a scaled-down version of the
default scenario (fusionsim.js:69-156)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion_sim_tpu import CylindricalParticlePusher

SPEC = {
    "radius": 1.0,
    "height": 2.0,
    "nr": 64,
    "nz": 128,
    "dt": 2e-9,
    "nparticles": 32,     # 1024 particles
    "particle_mass": 1.67e-27,
    "particle_charge": 1.602e-19,
}


@pytest.fixture(scope="module")
def sim():
    sim = CylindricalParticlePusher(SPEC, seed=0)
    nr, nz = SPEC["nr"], SPEC["nz"]
    n = SPEC["nparticles"] ** 2

    sink = np.ones((nr, nz), dtype=np.float32)
    sink[-1, :] = 0
    sink[1:-1, 0] = 0
    sink[1:-1, -1] = 0

    source = np.zeros((nr, nz), dtype=np.float32)
    source[: nr // 8, nz // 2 - nz // 16 : nz // 2 + nz // 16] = 1.0

    rng = np.random.default_rng(0)
    pos = 0.2 * (rng.random((n, 3)) - 0.5) + np.array([0, 0, 1.0])
    vel = 0.002 * (rng.random((n, 3)) - 0.5)

    sim.set({"position": pos, "velocity": vel, "sink_mask": sink, "source_pdf": source})
    sim.add_current_loop(0.8, 2.0, -1e7)
    sim.add_current_loop(0.8, 0.0, 1e7)
    sim.precalc()
    return sim


def test_field_is_mirror_like(sim):
    """Two opposed loops: B_z antisymmetric about the midplane."""
    b = np.asarray(sim.fields.b)
    assert np.isfinite(b).all()
    nz = SPEC["nz"]
    bz_low = b[5, nz // 4, 2]
    bz_high = b[5, 3 * nz // 4, 2]
    assert np.sign(bz_low) != np.sign(bz_high)


def test_step_keeps_state_finite_and_in_domain(sim):
    sim.step(50)
    pos = np.asarray(sim.state.position)
    vel = np.asarray(sim.state.velocity)
    assert np.isfinite(pos).all() and np.isfinite(vel).all()
    r = np.sqrt(pos[:, 0] ** 2 + pos[:, 1] ** 2)
    # sink absorbs at r_max and z walls; respawned particles land in source box
    assert r.max() <= 1.05
    assert pos[:, 2].min() >= -0.05 and pos[:, 2].max() <= 1.05
    assert np.asarray(sim.state.alive).shape == (SPEC["nparticles"] ** 2,)


def test_particle_count_constant(sim):
    """The sink/respawn mechanism keeps the particle count constant
    (SURVEY.md §5 'failure detection')."""
    assert sim.state.position.shape[0] == SPEC["nparticles"] ** 2


def test_density_frame(sim):
    frame = sim.density()
    assert frame.shape == (SPEC["nr"], SPEC["nz"], 3)
    f = np.asarray(frame)
    assert np.isfinite(f).all()
    assert f.min() >= 0.0
    # |B| background should be nonzero nearly everywhere
    assert (f.sum(axis=-1) > 0).mean() > 0.9


def test_respawn_thermal_velocity(sim):
    """Particles forced into the sink must respawn in the source box with
    thermal velocity |v| <= 0.001*sqrt(3) after the next substep."""
    n = SPEC["nparticles"] ** 2
    # Put all particles outside r=1 wall -> absorbed on next position pass
    pos = np.tile(np.array([1.05, 0.0, 1.0], dtype=np.float32), (n, 1))
    vel = np.zeros((n, 3), dtype=np.float32)
    sim.set({"position": pos, "velocity": vel})
    sim.step()  # substep1 absorbs+respawns (w=0); substep2 thermal-inits
    vel_out = np.asarray(sim.state.velocity)
    speed = np.linalg.norm(vel_out, axis=1)
    assert speed.max() <= 0.001 * np.sqrt(3) + 1e-6
    pos_out = np.asarray(sim.state.position)
    r = np.sqrt(pos_out[:, 0] ** 2 + pos_out[:, 1] ** 2)
    assert (r <= 1 / 8 + 0.01).mean() > 0.95  # source box r-extent


def test_determinism_same_seed():
    sim1 = CylindricalParticlePusher(SPEC, seed=7)
    sim2 = CylindricalParticlePusher(SPEC, seed=7)
    n = SPEC["nparticles"] ** 2
    rng = np.random.default_rng(1)
    pos = 0.1 * rng.random((n, 3)) + 0.3
    vel = 0.001 * (rng.random((n, 3)) - 0.5)
    source = np.ones((SPEC["nr"], SPEC["nz"]), dtype=np.float32)
    for s in (sim1, sim2):
        s.set({"position": pos, "velocity": vel, "source_pdf": source})
        s.add_bz(0.1)
        s.precalc()
        s.step(10)
    np.testing.assert_array_equal(np.asarray(sim1.state.position),
                                  np.asarray(sim2.state.position))
    np.testing.assert_array_equal(np.asarray(sim1.state.velocity),
                                  np.asarray(sim2.state.velocity))


def test_checkpoint_roundtrip(sim):
    blob = sim.get_state()
    sim2 = CylindricalParticlePusher(SPEC, seed=99)
    sim2.set_state(blob)
    sim.step()
    sim2.step()
    np.testing.assert_array_equal(np.asarray(sim.state.position),
                                  np.asarray(sim2.state.position))


def test_grid_b_blocks_fast_path():
    """set({'B': ...}) must refuse enable_fast_path (a grid B is not an
    analytic source; ADVICE r1: previously the fast path silently dropped it)."""
    sim = CylindricalParticlePusher(SPEC, seed=0)
    sim.set({"B": np.zeros((SPEC["nr"], SPEC["nz"], 3), np.float32)})
    sim.precalc()
    with pytest.raises(ValueError, match="grid B"):
        sim.enable_fast_path()


def test_bilinear_interp_variant():
    """spec.interp='bilinear' is the opt-in exacter sampling: identical to
    NEAREST on a uniform field, different (but finite/stable) on the mirror
    field."""
    spec_bi = dict(SPEC, interp="bilinear")
    a = CylindricalParticlePusher(SPEC, seed=0)
    b = CylindricalParticlePusher(spec_bi, seed=0)
    n = SPEC["nparticles"] ** 2
    rng = np.random.default_rng(1)
    pos = 0.2 * (rng.random((n, 3)) - 0.5) + np.array([0.3, 0, 1.0])
    vel = 0.002 * (rng.random((n, 3)) - 0.5)
    for sim in (a, b):
        sim.set({"position": pos, "velocity": vel})
        sim.add_bz(0.5)  # uniform field: coefficients constant over cells
        sim.precalc()
        sim.step(5)
    # bilinear of a constant sums four weighted terms -> f32 rounding only
    np.testing.assert_allclose(np.asarray(a.state.velocity),
                               np.asarray(b.state.velocity), atol=1e-8)

    c = CylindricalParticlePusher(SPEC, seed=0)
    d = CylindricalParticlePusher(spec_bi, seed=0)
    for sim in (c, d):
        sim.set({"position": pos, "velocity": vel})
        sim.add_current_loop(0.8, 2.0, -1e7)
        sim.add_current_loop(0.8, 0.0, 1e7)
        sim.precalc()
        sim.step(10)
    vc = np.asarray(c.state.velocity)
    vd = np.asarray(d.state.velocity)
    assert np.all(np.isfinite(vd))
    assert not np.allclose(vc, vd)  # sampling mode is actually consulted
