"""EM PIC validation: Yee vacuum waves, discrete continuity of Esirkepov
deposition, Gauss-law maintenance over a full PIC run, Weibel-type smoke."""

import jax.numpy as jnp
import numpy as np

from fusion_sim_tpu.models import electromagnetic as em
from fusion_sim_tpu.ops import fdtd
from fusion_sim_tpu.ops.esirkepov import esirkepov_deposit_2d, esirkepov_deposit_3d
from fusion_sim_tpu.ops.interp import cic_deposit


def test_yee_vacuum_wave_2d():
    """A plane EM wave (Ez, Bx) propagating in y at speed c: after one
    period it returns to the initial field (up to Yee dispersion)."""
    n = 64
    L = 2 * np.pi
    d = L / n
    config = em.EMConfig(grid_shape=(n, n), cell_size=(d, d), dt=0.4 * d,
                         charge=0.0, mass=1.0)
    y_ez = (np.arange(n) + 0.0) * d      # Ez at nodes
    k = 1.0
    e = np.zeros((n, n, 3), np.float32)
    b = np.zeros((n, n, 3), np.float32)
    e[:, :, 2] = np.sin(k * y_ez)[None, :]
    # Bx(i, j+1/2) staggered in y and a half step back in time
    y_bx = (np.arange(n) + 0.5) * d
    omega = 2 / config.dt * np.sin(k * d / 2) * config.dt / d / 2 * 2  # ~k for small kd
    b[:, :, 0] = np.sin(k * y_bx + 0.0)[None, :]  # E x B ~ +y propagation

    sim = em.ElectromagneticPIC(config, np.zeros((1, 2)), np.zeros((1, 3)), e=e, b=b)
    e0 = np.asarray(sim.state.e[..., 2]).copy()
    fe0 = sim.energies()["field"]
    # one spatial period: wave travels L in time L/c; steps = L / (c dt)
    steps = int(round(L / config.dt))
    sim.step(steps)
    e1 = np.asarray(sim.state.e[..., 2])
    fe1 = sim.energies()["field"]
    # energy exactly conserved by Yee in vacuum
    np.testing.assert_allclose(fe1, fe0, rtol=1e-4)
    # wave returned (phase error from Yee dispersion is small at n=64)
    corr = np.corrcoef(e0.ravel(), e1.ravel())[0, 1]
    assert corr > 0.98, corr


def _continuity_2d(n_particles, seed):
    rng = np.random.default_rng(seed)
    shape = (24, 16)
    cell = (0.7, 1.3)
    dt = 0.5
    x0 = rng.random((n_particles, 2)) * np.array(shape)
    dxp = (rng.random((n_particles, 2)) - 0.5) * 0.99
    x1 = x0 + dxp
    vz = rng.standard_normal(n_particles).astype(np.float32)
    q = 1.7
    j = np.asarray(esirkepov_deposit_2d(
        jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
        jnp.asarray(vz), q, dt, shape, cell))

    vol = cell[0] * cell[1]
    w = jnp.full((n_particles,), q / vol, jnp.float32)
    rho0 = np.asarray(cic_deposit(jnp.asarray(x0, jnp.float32) % jnp.asarray(shape, jnp.float32), w, shape))
    rho1 = np.asarray(cic_deposit(jnp.asarray(x1, jnp.float32) % jnp.asarray(shape, jnp.float32), w, shape))

    div = (j[..., 0] - np.roll(j[..., 0], 1, axis=0)) / cell[0] \
        + (j[..., 1] - np.roll(j[..., 1], 1, axis=1)) / cell[1]
    residual = (rho1 - rho0) / dt + div
    scale = np.abs(rho0).max() / dt
    assert np.abs(residual).max() < 2e-5 * max(scale, 1.0), np.abs(residual).max()


def test_esirkepov_2d_continuity():
    _continuity_2d(500, 0)


def test_esirkepov_2d_continuity_boundary_crossers():
    _continuity_2d(2000, 1)


def test_esirkepov_3d_continuity():
    rng = np.random.default_rng(2)
    shape = (12, 10, 8)
    cell = (1.0, 0.8, 1.2)
    dt = 0.3
    n = 400
    x0 = rng.random((n, 3)) * np.array(shape)
    x1 = x0 + (rng.random((n, 3)) - 0.5) * 0.99
    q = -2.3
    j = np.asarray(esirkepov_deposit_3d(
        jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32), q, dt, shape, cell))
    vol = cell[0] * cell[1] * cell[2]
    w = jnp.full((n,), q / vol, jnp.float32)
    sh = jnp.asarray(shape, jnp.float32)
    rho0 = np.asarray(cic_deposit(jnp.asarray(x0, jnp.float32) % sh, w, shape))
    rho1 = np.asarray(cic_deposit(jnp.asarray(x1, jnp.float32) % sh, w, shape))
    div = sum((j[..., a] - np.roll(j[..., a], 1, axis=a)) / cell[a] for a in range(3))
    residual = (rho1 - rho0) / dt + div
    scale = np.abs(rho0).max() / dt
    assert np.abs(residual).max() < 2e-5 * max(scale, 1.0), np.abs(residual).max()


def test_gauss_law_maintained_full_run():
    """Run a hot neutral-ish plasma 100 steps: div E - rho/eps0 must stay at
    its initial (roundoff) level — the whole point of Esirkepov."""
    rng = np.random.default_rng(3)
    n_cells = 32
    d = 0.5
    config = em.EMConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                         dt=0.2 * d, charge=-0.01, mass=0.01)
    n = 5000
    pos = rng.random((n, 2)) * n_cells
    vel = 0.1 * rng.standard_normal((n, 3))
    sim = em.ElectromagneticPIC(config, pos, vel)
    # initialize E consistently with Gauss's law: solve Poisson for init rho
    from fusion_sim_tpu.ops.solvers import poisson_fft, gradient_periodic
    rho = em.charge_density(config, sim.state.position)
    rho = rho - jnp.mean(rho)  # neutralizing background
    background = -jnp.mean(em.charge_density(config, sim.state.position))
    phi = poisson_fft(rho, config.cell_size)
    gx, gy = gradient_periodic(phi, config.cell_size)
    # Put E on the Yee staggering via averaging (approx; residual small)
    e = np.zeros((n_cells, n_cells, 3), np.float32)
    sim.state = sim.state._replace(e=jnp.asarray(e))

    bg = jnp.full(config.grid_shape, background, jnp.float32)
    res0 = np.abs(np.asarray(em.gauss_residual(config, sim.state, bg))).max()
    sim.step(100)
    res1 = np.abs(np.asarray(em.gauss_residual(config, sim.state, bg))).max()
    # residual unchanged to f32 accumulation error
    assert res1 - res0 < 5e-4 * max(res0, 1.0), (res0, res1)


def test_center_fields_linear_exact():
    """Averaging staggered samples of a LINEAR field must reproduce the node
    values exactly — this pins the roll direction (a one-cell shift bug
    passes uniform-field tests)."""
    n = 16
    x = np.arange(n)
    e = np.zeros((n, n, 3), np.float32)
    e[..., 0] = (x[:, None] + 0.5)            # Ex stored at (i+1/2, j): value=x
    b = np.zeros((n, n, 3), np.float32)
    b[..., 2] = (x[:, None] + 0.5) + (x[None, :] + 0.5)  # Bz at (i+1/2, j+1/2)
    table = np.asarray(fdtd.center_fields(jnp.asarray(e), jnp.asarray(b),
                                          fdtd.E_OFFSETS_2D, fdtd.B_OFFSETS_2D))
    # interior nodes (wrap pollutes row/col 0 only)
    np.testing.assert_allclose(table[1:, 1:, 0],
                               np.broadcast_to(x[1:, None], (n - 1, n - 1)),
                               rtol=1e-6)
    expect_bz = x[1:, None] + x[None, 1:]
    np.testing.assert_allclose(table[1:, 1:, 5], expect_bz, rtol=1e-6)


def test_centered_gather_mode():
    """'centered' field gather: physics stays sane (finite fields, Gauss law
    maintained — deposition is unchanged) and a uniform B gives the same
    kick as staggered mode (averaging a constant is exact)."""
    rng = np.random.default_rng(4)
    n_cells, d = 16, 0.5
    n = 500
    pos = rng.random((n, 2)) * n_cells
    vel = 0.1 * rng.standard_normal((n, 3))
    b0 = np.zeros((n_cells, n_cells, 3), np.float32)
    b0[..., 2] = 0.3

    outs = []
    for fg in ("staggered", "centered"):
        config = em.EMConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                             dt=0.2 * d, charge=-0.01, mass=0.01,
                             field_gather=fg)
        sim = em.ElectromagneticPIC(config, pos, vel, b=b0)
        sim.step()  # first kick: E = 0 everywhere, B uniform -> modes agree
        outs.append(np.asarray(sim.state.velocity))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=1e-7)

    # a full interacting run keeps Gauss's law in centered mode too
    config = em.EMConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                         dt=0.2 * d, charge=-0.01, mass=0.01,
                         field_gather="centered")
    sim = em.ElectromagneticPIC(config, pos, vel)
    bg = jnp.full((n_cells, n_cells),
                  -float(jnp.mean(em.charge_density(config, sim.state.position))))
    r0 = np.abs(np.asarray(em.gauss_residual(config, sim.state, bg))).max()
    sim.step(50)
    r1 = np.abs(np.asarray(em.gauss_residual(config, sim.state, bg))).max()
    assert r1 - r0 < 5e-4 * max(r0, 1.0)


def test_boris_kick_gyration():
    """Pure B kick preserves speed and rotates by 2*atan(qB dt/2m)."""
    v = jnp.array([[0.1, 0.0, 0.05]])
    b = jnp.array([[0.0, 0.0, 2.0]])
    e = jnp.zeros((1, 3))
    qm_half_dt = 0.15
    v1 = np.asarray(em.boris_kick(v, e, b, qm_half_dt, False, 1.0))[0]
    theta = 2 * np.arctan(qm_half_dt * 2.0)
    v0 = np.asarray(v)[0]
    np.testing.assert_allclose(np.linalg.norm(v1), np.linalg.norm(v0), rtol=1e-6)
    cosang = np.dot(v0[:2], v1[:2]) / (np.linalg.norm(v0[:2]) * np.linalg.norm(v1[:2]))
    np.testing.assert_allclose(cosang, np.cos(theta), rtol=1e-5)


def test_particle_chunked_step_matches():
    """particle_chunks splits the push/deposit into sequential batches
    (HBM bound at 3e7+ particles); results must match the unchunked step."""
    rng = np.random.default_rng(6)
    n_cells, d, n = 16, 0.5, 1024
    pos = rng.random((n, 2)) * n_cells
    vel = 0.1 * rng.standard_normal((n, 3))
    outs = []
    for chunks in (1, 4):
        config = em.EMConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                             dt=0.2 * d, charge=-0.01, mass=0.01,
                             field_gather="centered", particle_chunks=chunks)
        sim = em.ElectromagneticPIC(config, pos, vel)
        sim.step(5)
        outs.append(sim.state)
    np.testing.assert_allclose(np.asarray(outs[0].e), np.asarray(outs[1].e),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(outs[0].position),
                               np.asarray(outs[1].position), rtol=1e-6)


def test_relativistic_mode():
    """Proper-velocity convention: gyrofrequency slows by gamma, coordinate
    speed stays below c, and drift uses u/gamma."""
    n_cells, d = 16, 0.5
    # tiny macro-charge at q/m = -1: self-fields scale with q^2/m -> 1e-8,
    # negligible, while the external-B rotation is unchanged
    config = em.EMConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                         dt=0.1 * d, charge=-1e-8, mass=1e-8,
                         relativistic=True)
    b0 = np.zeros((n_cells, n_cells, 3), np.float32)
    b0[..., 2] = 1.0
    u0 = 2.0  # proper velocity 2c -> gamma = sqrt(5)
    pos = np.array([[8.0, 8.0]], np.float32)
    vel = np.array([[u0, 0.0, 0.0]], np.float32)
    sim = em.ElectromagneticPIC(config, pos, vel, b=b0)
    gamma = np.sqrt(1 + u0**2)

    x_prev = np.asarray(sim.state.position).copy()
    for _ in range(10):
        sim.step()
        x_now = np.asarray(sim.state.position)
        step_len = np.linalg.norm((x_now - x_prev)) * d
        # coordinate displacement per step must be subluminal
        assert step_len < config.c * config.dt + 1e-6
        x_prev = x_now.copy()
    u = np.asarray(sim.state.velocity)[0]
    # |u| conserved by the magnetic rotation
    np.testing.assert_allclose(np.linalg.norm(u), u0, rtol=1e-4)
    # relativistic KE convention: m c^2 (gamma - 1)
    np.testing.assert_allclose(sim.energies()["kinetic"],
                               config.mass * (gamma - 1), rtol=1e-3)


def test_cfl_enforced():
    import pytest
    with pytest.raises(ValueError, match="CFL"):
        em.EMConfig(grid_shape=(8, 8), cell_size=(0.1, 0.1), dt=0.1,
                    charge=1.0, mass=1.0)
