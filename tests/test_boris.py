"""Boris pusher physics oracles (SURVEY.md §4 test strategy).

The kick/rotation math is checked against closed-form electrodynamics on
uniform fields: pure-E acceleration q*E*dt/m, pure-B rotation by
2*atan(h*|B|) with exact |v| conservation (the defining property of the
Boris scheme), and the E x B drift.
"""

import jax.numpy as jnp
import numpy as np

from fusion_sim_tpu.constants import SPEED_OF_LIGHT
from fusion_sim_tpu.ops.boris import precompute_rotation, push_velocity

NR, NZ = 8, 8


def uniform_coeffs(b_vec, e_vec, h, factor_r=1.0, factor_z=1.0):
    b = jnp.broadcast_to(jnp.asarray(b_vec, jnp.float32), (NR, NZ, 3))
    e = jnp.broadcast_to(jnp.asarray(e_vec, jnp.float32), (NR, NZ, 3))
    return precompute_rotation(b, e, h, factor_r, factor_z)


def push(coeffs, position, velocity):
    pos = jnp.asarray(position, jnp.float32)[None]
    vel = jnp.asarray(velocity, jnp.float32)[None]
    alive = jnp.ones((1,), jnp.float32)
    rand = jnp.zeros((1, 4), jnp.float32)
    return np.asarray(push_velocity(pos, vel, alive, rand, coeffs))[0]


def test_pure_e_acceleration():
    """B=0: one substep adds q*E*dt/m to the physical velocity
    (normalized: 2*h*E/c, empic.js:645-653 with hB2=0)."""
    h = 1e-4
    ez = 5e3
    coeffs = uniform_coeffs([0, 0, 0], [0, 0, ez], h)
    v0 = [0.001, 0.0, 0.0]
    v1 = push(coeffs, [0.5, 0.0, 0.5], v0)
    expected_dvz = 2 * h * ez / SPEED_OF_LIGHT
    np.testing.assert_allclose(v1[2] - v0[2], expected_dvz, rtol=1e-5)
    np.testing.assert_allclose(v1[0], v0[0], rtol=1e-6)


def test_pure_b_rotation_angle_and_energy():
    """Uniform B_z: velocity rotates about z by theta = 2*atan(h*B), |v| exact."""
    h = 0.05
    bz = 2.0
    coeffs = uniform_coeffs([0, 0, bz], [0, 0, 0], h)
    v0 = np.array([0.001, 0.0, 0.0005])
    v1 = push(coeffs, [0.5, 0.0, 0.5], v0)

    theta = 2 * np.arctan(h * bz)
    # Rotation direction: for B_z > 0 the reference's matrix gives
    # v_x' = cos*vx + sin*vy ... check via perpendicular components.
    vperp0 = v0[:2]
    vperp1 = v1[:2]
    np.testing.assert_allclose(np.linalg.norm(vperp1), np.linalg.norm(vperp0), rtol=1e-6)
    cos_angle = np.dot(vperp0, vperp1) / (np.linalg.norm(vperp0) * np.linalg.norm(vperp1))
    np.testing.assert_allclose(cos_angle, np.cos(theta), rtol=1e-5)
    np.testing.assert_allclose(v1[2], v0[2], rtol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(v1), np.linalg.norm(v0), rtol=1e-6)


def _iterate_push(coeffs, pos, vel, n):
    """Scan n velocity substeps at fixed position; returns (final_v, mean_v)."""
    import jax

    alive = jnp.ones((1,), jnp.float32)
    rand = jnp.zeros((1, 4), jnp.float32)

    def body(v, _):
        v = push_velocity(pos, v, alive, rand, coeffs)
        return v, v

    final, history = jax.lax.scan(body, vel, None, length=n)
    return np.asarray(final)[0], np.asarray(jnp.mean(history, axis=0))[0]


def test_energy_conservation_many_rotations():
    """10000 pure-B substeps: |v| drift stays at f32 roundoff level."""
    h = 0.02
    coeffs = uniform_coeffs([0, 0, 1.5], [0, 0, 0], h)
    pos = jnp.array([[0.5, 0.0, 0.5]], jnp.float32)
    vel = jnp.array([[0.001, 0.0005, 0.0002]], jnp.float32)
    v_mag0 = float(jnp.linalg.norm(vel))
    final, _ = _iterate_push(coeffs, pos, vel, 10000)
    v_mag = float(np.linalg.norm(final))
    assert abs(v_mag - v_mag0) / v_mag0 < 1e-3


def test_exb_drift():
    """Crossed fields: averaged velocity = E x B / B^2 drift."""
    h = 0.01
    bz = 1.0
    # E along r (local x at position (r, 0)): drift = E x B / B^2 -> -y direction
    er = 1e4
    coeffs = uniform_coeffs([0, 0, bz], [er, 0, 0], h)
    pos = jnp.array([[0.5, 0.0, 0.5]], jnp.float32)
    vel = jnp.zeros((1, 3), jnp.float32)
    # ~20 gyroperiods of substeps: theta = 2*atan(h*B) per substep
    theta = 2 * np.arctan(h * bz)
    n = int(round(20 * 2 * np.pi / theta))
    _, mean_v = _iterate_push(coeffs, pos, vel, n)
    drift = -er / bz / SPEED_OF_LIGHT  # v_y = (E x B)_y / B^2, normalized
    np.testing.assert_allclose(mean_v[1], drift, rtol=0.02)
    assert abs(mean_v[0]) < abs(drift) * 0.02


def test_anisotropic_metric_factors():
    """factor_r != factor_z scales the z-coupling entries
    (empic.js:527, 566, 606) — a pure-B_r rotation must mix v_a and v_z with
    the metric correction, preserving the *physical* speed."""
    h = 0.05
    fr, fz = 1.0, 0.5  # radius 1 m, height 2 m (the default scenario)
    br = 1.0
    coeffs = uniform_coeffs([br, 0, 0], [0, 0, 0], h, fr, fz)
    # particle at (r, 0): local frame = Cartesian
    v0 = np.array([0.0, 0.001, 0.0005])  # physical: vy, vz/c... stored scaled
    v0_stored = v0 * np.array([fr, fr, fz])
    v1_stored = push(coeffs, [0.5, 0.0, 0.5], v0_stored)
    v1 = v1_stored / np.array([fr, fr, fz])
    # physical speed conserved
    np.testing.assert_allclose(np.linalg.norm(v1), np.linalg.norm(v0), rtol=1e-5)
    # rotation angle about r-axis
    theta = 2 * np.arctan(h * br)
    perp0 = v0[1:]
    perp1 = v1[1:]
    cos_angle = np.dot(perp0, perp1) / (np.linalg.norm(perp0) * np.linalg.norm(perp1))
    np.testing.assert_allclose(cos_angle, np.cos(theta), rtol=1e-5)
