"""Analytic fast-path tests: equivalence with grid mode on uniform fields,
energy conservation (the BASELINE drift bar), sink/respawn geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from fusion_sim_tpu.models.pusher import CylindricalParticlePusher, PusherSpec
from fusion_sim_tpu.ops import analytic as A

SPEC = {
    "radius": 1.0, "height": 2.0, "nr": 64, "nz": 128, "dt": 2e-9,
    "nparticles": 16, "particle_mass": 1.67e-27, "particle_charge": 1.602e-19,
}


def _init(sim, seed=0):
    n = SPEC["nparticles"] ** 2
    rng = np.random.default_rng(seed)
    sim.set({
        "position": 0.2 * (rng.random((n, 3)) - 0.5) + np.array([0, 0, 1.0]),
        "velocity": 0.002 * (rng.random((n, 3)) - 0.5),
        "source_pdf": np.ones((SPEC["nr"], SPEC["nz"]), np.float32),
    })


def test_fast_path_matches_grid_on_uniform_field():
    """With a spatially uniform B, NEAREST grid sampling and per-particle
    evaluation see the same field, so grid and fast paths must agree
    (same PRNG stream, no sink hits)."""
    sim_grid = CylindricalParticlePusher(SPEC, seed=5)
    sim_fast = CylindricalParticlePusher(SPEC, seed=5)
    for s in (sim_grid, sim_fast):
        _init(s)
        s.add_bz(0.05)
        s.precalc()
    sim_fast.enable_fast_path(rng_impl=None)  # keep threefry: same stream
    sim_grid.step(20)
    sim_fast.step(20)
    np.testing.assert_allclose(np.asarray(sim_grid.state.position),
                               np.asarray(sim_fast.state.position),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sim_grid.state.velocity),
                               np.asarray(sim_fast.state.velocity),
                               rtol=2e-5, atol=2e-7)


def test_fast_path_energy_conservation_10k_substeps():
    """Mirror-field pusher without sink losses: physical speed of every
    particle conserved to < 1e-3 over 10,000 substeps (the BASELINE
    energy-drift bar applied particle-wise)."""
    spec = PusherSpec(radius=1.0, height=2.0, nr=400, nz=800, dt=2e-9,
                      nparticles=16, particle_mass=1.67e-27,
                      particle_charge=1.602e-19)
    scen = A.AnalyticScenario(
        loops=((0.8, 2.0, -1e7), (0.8, 0.0, 1e7)),
        sink_box=(10.0, -10.0, 10.0),       # no absorption
        source_box=(0.0, 0.1, 0.9, 1.1))
    n = 256
    rng = np.random.default_rng(1)
    scale = np.array([1.0, 1.0, 0.5])       # factor_r, factor_r, factor_z
    v_phys = 0.002 * (rng.random((n, 3)) - 0.5)
    state = A.FastState(
        position=jnp.asarray((0.3 * rng.random((n, 3)) + 0.1) * scale
                             + np.array([0, 0, 0.4]), jnp.float32),
        velocity=jnp.asarray(v_phys * scale, jnp.float32),
        alive=jnp.ones((n,), jnp.float32),
        key=jax.random.key(2))
    run = A.make_fast_multi_step_fn(spec, scen, 5000)  # 10k substeps
    out = run(state)
    assert float(out.alive.min()) == 1.0, "no particle may be absorbed"
    v0 = np.linalg.norm(v_phys, axis=1)
    v1 = np.linalg.norm(np.asarray(out.velocity) / scale, axis=1)
    drift = np.abs(v1 - v0) / v0
    assert drift.max() < 1e-3, drift.max()


def test_magnetic_mirror_bounce():
    """The flagship physics oracle (SURVEY.md §4): protons with pitch angle
    outside the loss cone bounce between mirror throats — z oscillates, the
    parallel velocity reverses repeatedly, speed is conserved, and the
    particle never reaches the coils.

    Uses CO-directed coils (a true magnetic mirror, ratio ~2.15, loss cone
    sin^2 = 0.47 < our 0.94).  Note the default scenario's OPPOSED coils
    form a spindle cusp whose midplane field null does not confine
    adiabatically — particles there escape through the point cusps, which
    is correct physics but not a bounce test."""
    spec = PusherSpec(radius=1.0, height=2.0, nr=400, nz=800, dt=2e-9,
                      nparticles=4, particle_mass=1.67e-27,
                      particle_charge=1.602e-19)
    scen = A.AnalyticScenario(
        loops=((0.8, 2.0, 1e7), (0.8, 0.0, 1e7)),
        sink_box=(10.0, -10.0, 10.0),  # no absorption
        source_box=(0.0, 0.1, 0.9, 1.1))
    n = 16
    rng = np.random.default_rng(3)
    scale = np.array([1.0, 1.0, 0.5])
    # near-axis particles at the midplane, v_perp >> v_parallel
    pos = np.zeros((n, 3))
    pos[:, 0] = 0.05 + 0.01 * rng.random(n)
    pos[:, 2] = 1.0
    v = np.zeros((n, 3))
    v[:, 1] = 0.002      # v_perp (azimuthal at this position)
    v[:, 2] = 0.0005     # v_parallel
    state = A.FastState(
        position=jnp.asarray(pos * scale, jnp.float32),
        velocity=jnp.asarray(v * scale, jnp.float32),
        alive=jnp.ones((n,), jnp.float32),
        key=jax.random.key(0))

    run = A.make_fast_multi_step_fn(spec, scen, 250)  # 500 substeps/chunk
    z_hist = []
    vz_hist = []
    for _ in range(24):  # 12000 substeps total
        state = run(state)
        z_hist.append(np.asarray(state.position[:, 2]) * 2.0)  # physical z
        vz_hist.append(np.asarray(state.velocity[:, 2]))
    z_hist = np.array(z_hist)      # (24, n)
    vz_hist = np.array(vz_hist)

    # confined: never near the coils
    assert z_hist.min() > 0.2 and z_hist.max() < 1.8, (z_hist.min(), z_hist.max())
    # bouncing: parallel velocity reverses at least twice for most particles
    sign_changes = (np.diff(np.sign(vz_hist), axis=0) != 0).sum(axis=0)
    assert (sign_changes >= 2).mean() > 0.8, sign_changes
    # physical speed conserved (pure B; the stored per-axis-scaled norm is
    # not an invariant when v_parallel <-> v_perp exchange)
    v0 = np.linalg.norm(v, axis=1)
    v1 = np.linalg.norm(np.asarray(state.velocity) / scale, axis=1)
    np.testing.assert_allclose(v1, v0, rtol=2e-3)


def test_fast_path_respawn_geometry():
    sim = CylindricalParticlePusher(SPEC, seed=7)
    _init(sim)
    sim.add_bz(0.01)
    sim.precalc()
    sim.enable_fast_path(sink_box=(0.9, 0.1, 1.9),
                         source_box=(0.0, 0.2, 0.8, 1.2))
    n = SPEC["nparticles"] ** 2
    # place all particles outside the sink box
    sim.state = sim.state._replace(
        position=jnp.tile(jnp.array([[0.95, 0.0, 0.5]], jnp.float32), (n, 1)))
    sim.step()
    pos = np.asarray(sim.state.position)
    r = np.sqrt(pos[:, 0] ** 2 + pos[:, 1] ** 2)
    assert (r <= 0.2 + 1e-3).all()
    z_phys = pos[:, 2] * 2.0
    assert (z_phys >= 0.8 - 1e-3).all() and (z_phys <= 1.2 + 1e-3).all()
    speed = np.linalg.norm(np.asarray(sim.state.velocity), axis=1)
    assert speed.max() <= 0.001 * np.sqrt(3) + 1e-6


def test_fast_path_uniform_e_matches_grid():
    """Uniform E + uniform B: the fast path's analytic A-vector must match
    the grid path's programPreA coefficients (same PRNG stream)."""
    sim_grid = CylindricalParticlePusher(SPEC, seed=11)
    sim_fast = CylindricalParticlePusher(SPEC, seed=11)
    e_field = np.zeros((SPEC["nr"], SPEC["nz"], 3), np.float32)
    e_field[..., 0] = 2e3
    e_field[..., 2] = -1e3
    for s in (sim_grid, sim_fast):
        _init(s)
        s.set({"E": e_field})
        s.add_bz(0.05)
        s.precalc()
    sim_fast.enable_fast_path(uniform_e=(2e3, 0.0, -1e3), rng_impl=None)
    sim_grid.step(10)
    sim_fast.step(10)
    np.testing.assert_allclose(np.asarray(sim_grid.state.velocity),
                               np.asarray(sim_fast.state.velocity),
                               rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sim_grid.state.position),
                               np.asarray(sim_fast.state.position),
                               rtol=2e-4, atol=1e-7)


def test_fast_path_rejects_grid_sources():
    sim = CylindricalParticlePusher(SPEC, seed=0)
    _init(sim)
    sim._sources.append(("spindle",))
    import pytest
    with pytest.raises(ValueError, match="analytic sources"):
        sim.enable_fast_path()


def test_b_field_superposition():
    scen = A.AnalyticScenario(loops=((0.8, 0.0, 1e6),), bz=0.1,
                              line_current=1e5)
    r = jnp.array([0.3, 0.5])
    z = jnp.array([0.2, 1.0])
    b = np.asarray(A.b_field_at(scen, r, z))
    from fusion_sim_tpu.ops.fields import current_loop_b_exact
    from fusion_sim_tpu.constants import MU_0, PI
    expected = np.array(current_loop_b_exact(r, z, 0.8, 0.0, 1e6))
    expected[:, 2] += 0.1
    expected[:, 1] += 1e5 * MU_0 / (2 * PI * np.asarray(r))
    np.testing.assert_allclose(b, expected, rtol=1e-5)
