"""Electrostatic PIC physics validation (BASELINE configs[0-1]):
two-stream growth rate vs cold-beam dispersion, plasma oscillation frequency,
Landau damping, momentum/energy conservation."""

import numpy as np
import pytest

from fusion_sim_tpu.models import electrostatic as es


def two_stream_gamma(k_v0: float, omega_b_sq: float) -> float:
    """Growth rate of the cold symmetric two-stream mode:
    1 = wb^2/(w-kv)^2 + wb^2/(w+kv)^2 -> quartic in w; returns Im(w) of the
    unstable root."""
    a2 = k_v0**2
    w2 = (a2 + omega_b_sq) - np.sqrt(omega_b_sq**2 + 4 * omega_b_sq * a2)
    assert w2 < 0, "chosen mode must be unstable"
    return float(np.sqrt(-w2))


def field_energy_series(sim, n_steps, sample_every=1):
    out = []
    for _ in range(n_steps // sample_every):
        sim.step(sample_every)
        out.append(sim.energies()["field"])
    return np.array(out)


def test_two_stream_growth_rate():
    sim = es.two_stream(n_particles=20000, n_cells=64, v0=0.2,
                        perturbation=1e-4, dt=0.05)
    k = 2 * np.pi / sim.config.lengths[0]
    gamma = two_stream_gamma(k * 0.2, 0.5)

    fe = field_energy_series(sim, 600, sample_every=10)  # t = 0.5 per sample
    t = 0.5 * (1 + np.arange(len(fe)))
    # linear phase: from a few e-foldings above start until well below saturation
    log_fe = np.log(fe)
    sat = log_fe.max()
    lo, hi = log_fe[0] + 2.0, sat - 2.0
    mask = (log_fe > lo) & (log_fe < hi) & (t < t[np.argmax(log_fe)])
    assert mask.sum() >= 4, "no clear linear phase found"
    slope = np.polyfit(t[mask], log_fe[mask], 1)[0]
    measured_gamma = slope / 2  # energy ~ e^{2 gamma t}
    assert abs(measured_gamma - gamma) / gamma < 0.2, (measured_gamma, gamma)


def test_plasma_oscillation_frequency():
    """Cold plasma with a velocity perturbation rings at omega_p = 1:
    field energy oscillates at 2*omega_p."""
    n, cells = 20000, 64
    length = 2 * np.pi
    dx = length / cells
    config = es.ESConfig(grid_shape=(cells,), cell_size=(dx,), dt=0.02,
                         charge=-length / n, mass=length / n)
    x = (np.arange(n) + 0.5) / n * length
    v = 0.01 * np.sin(2 * np.pi * x / length)
    sim = es.ElectrostaticPIC(config, (x / dx)[:, None], v[:, None])

    fe = field_energy_series(sim, 2000, sample_every=4)  # dt_sample = 0.08
    freqs = np.fft.rfftfreq(len(fe), d=0.08) * 2 * np.pi
    spectrum = np.abs(np.fft.rfft(fe - fe.mean()))
    peak = freqs[np.argmax(spectrum)]
    np.testing.assert_allclose(peak, 2.0, rtol=0.05)  # 2*omega_p


def test_momentum_conservation():
    sim = es.two_stream(n_particles=5000, n_cells=32, v0=0.2,
                        perturbation=1e-2, dt=0.05)
    p0 = np.asarray(es.momentum(sim.config, sim.state))
    sim.step(200)
    p1 = np.asarray(es.momentum(sim.config, sim.state))
    scale = sim.config.mass * 5000 * 0.2  # total |p| of one beam
    assert abs(p1[0] - p0[0]) / scale < 1e-4


def test_energy_conservation_warm_plasma():
    """Warm stable plasma: total energy drift < 1e-3 over 1000 steps
    (the BASELINE energy-drift bar, on the ES model)."""
    sim = es.landau(n_particles=20000, n_cells=64, k_lambda_d=0.5,
                    perturbation=0.01, dt=0.05)
    e0 = sim.energies()["total"]
    sim.step(1000)
    e1 = sim.energies()["total"]
    assert abs(e1 - e0) / abs(e0) < 1e-3, (e0, e1)


@pytest.mark.slow
def test_landau_damping_rate():
    """kλ_D = 0.5: ω ≈ 1.4156, γ ≈ 0.1533 (Landau's result).  Fit the decay
    of the field-energy envelope over the first few oscillations."""
    sim = es.landau(n_particles=400000, n_cells=128, k_lambda_d=0.5,
                    perturbation=0.05, dt=0.05)
    fe = field_energy_series(sim, 400, sample_every=2)  # t_sample = 0.1
    t = 0.1 * (1 + np.arange(len(fe)))
    log_fe = np.log(fe)
    # envelope: peaks of the 2*omega oscillation
    from scipy.signal import argrelmax
    peaks = argrelmax(log_fe, order=3)[0]
    peaks = peaks[t[peaks] < 25]
    assert len(peaks) >= 3
    slope = np.polyfit(t[peaks], log_fe[peaks], 1)[0]
    gamma = -slope / 2
    assert abs(gamma - 0.1533) / 0.1533 < 0.35, gamma


def test_2d_self_consistency_smoke():
    """2D ES PIC (BASELINE configs[0]): uniform plasma stays quiet; fields
    finite; mean charge density ~ 0 with the neutralizing background."""
    n, cells = 10000, (32, 32)
    length = 2 * np.pi
    dx = (length / 32, length / 32)
    config = es.ESConfig(grid_shape=cells, cell_size=dx, dt=0.05,
                         charge=-(length**2) / n, mass=(length**2) / n)
    rng = np.random.default_rng(0)
    pos = rng.random((n, 2)) * 32
    vel = 0.01 * rng.standard_normal((n, 2))
    sim = es.ElectrostaticPIC(config, pos, vel)
    rho, (phi, e) = None, sim.fields()
    sim.step(50)
    en = sim.energies()
    assert np.isfinite(en["total"])
    pos_out = np.asarray(sim.state.position)
    assert (pos_out >= 0).all() and (pos_out < 32).all()
