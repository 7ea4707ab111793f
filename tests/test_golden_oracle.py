"""Golden-run cross-validation of the parity path against an independent
NumPy float64 port of the reference's substep semantics (tests/golden_oracle.py).

SURVEY.md §7 step 5 / VERDICT r1 item 2: these tests would catch any
transcription error in the Boris/metric math (empic.js:506-659), the
velocity pass (:729-778), the position/sink/respawn pass (:692-726), and the
inverse-CDF build (:1263-1341).  RNG uniforms are injected identically into
both implementations (the reference's chaotic map is not reproducible by
design; SURVEY.md §7 'RNG parity').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion_sim_tpu.models.pusher import PusherSpec
from fusion_sim_tpu.ops import fields as field_ops
from fusion_sim_tpu.ops.boris import precompute_rotation, push_velocity
from fusion_sim_tpu.ops.push import push_position
from fusion_sim_tpu.ops.sampling import build_inverse_cdf_table

from golden_oracle import GoldenOracle, golden_inverse_cdf_table

SPEC = PusherSpec(radius=1.0, height=2.0, nr=64, nz=128, dt=2e-9,
                  nparticles=32, particle_mass=1.67e-27,
                  particle_charge=1.602e-19)
N = 1024


def _mirror_b():
    """The default scenario's two opposed current loops (fusionsim.js:137-138)
    on the reduced grid, via the exact elliptic-integral field."""
    u, v = field_ops.grid_coords(SPEC.nr, SPEC.nz)
    r = jnp.broadcast_to(u * SPEC.radius, (SPEC.nr, SPEC.nz))
    z = jnp.broadcast_to(v * SPEC.height, (SPEC.nr, SPEC.nz))
    b = (field_ops.current_loop_b_exact(r, z, 0.8, 2.0, -1e7)
         + field_ops.current_loop_b_exact(r, z, 0.8, 0.0, 1e7))
    return np.asarray(b, np.float64)


def _scenario():
    nr, nz = SPEC.nr, SPEC.nz
    b = _mirror_b()
    rng = np.random.default_rng(7)
    e = 1e3 * rng.standard_normal((nr, nz, 3))  # exercise the A formula too
    sink = np.ones((nr, nz), np.float32)
    sink[-1, :] = 0
    sink[1:-1, 0] = 0
    sink[1:-1, -1] = 0
    source = np.zeros((nr, nz), np.float32)
    source[: nr // 8, nz // 2 - nz // 16: nz // 2 + nz // 16] = 1.0
    table = np.asarray(build_inverse_cdf_table(jnp.asarray(source)))
    return b.astype(np.float32), e.astype(np.float32), sink, table


def _oracle(b, e, sink, table, dtype=np.float64):
    return GoldenOracle(radius=SPEC.radius, height=SPEC.height, nr=SPEC.nr,
                        nz=SPEC.nz, dt=SPEC.dt,
                        particle_mass=SPEC.particle_mass,
                        particle_charge=SPEC.particle_charge,
                        b_grid=b, e_grid=e, sink_mask=sink, inv_cdf=table,
                        dtype=dtype)


def _random_states(rng, n):
    pos = np.empty((n, 3), np.float32)
    pos[:, 0] = 0.05 + 0.85 * rng.random(n)
    pos[:, 1] = 0.4 * (rng.random(n) - 0.5)
    pos[:, 2] = 0.05 + 0.9 * rng.random(n)
    vel = (0.004 * (rng.random((n, 3)) - 0.5)).astype(np.float32)
    alive = (rng.random(n) > 0.1).astype(np.float32)
    rand = rng.random((n, 4)).astype(np.float32)
    return pos, vel, alive, rand


def _interior_mask(oracle, pos, vel, alive, rand, margin=1e-3):
    """Particles whose NEAREST cell / sink / thermal decisions cannot flip
    under f32 rounding (sampling coords farther than ``margin`` cells from
    any texel boundary, both before and after the drift)."""
    x, y, z = pos[:, 0].astype(np.float64), pos[:, 1].astype(np.float64), pos[:, 2]
    r = np.sqrt(x * x + y * y)
    ok = np.abs(r) > 1e-3

    def far(coord, size):
        t = coord * size
        f = t - np.floor(t)
        return (f > margin) & (f < 1 - margin)

    ok &= far(r, SPEC.nr) & far(z.astype(np.float64), SPEC.nz)
    v = oracle.velocity_pass(pos.astype(np.float64), vel.astype(np.float64),
                             alive.astype(np.float64), rand.astype(np.float64))
    nxt = pos.astype(np.float64) + oracle.step_factor * v
    r2 = np.sqrt(nxt[:, 0] ** 2 + nxt[:, 1] ** 2)
    ok &= far(r2, SPEC.nr) & far(nxt[:, 2], SPEC.nz) & (np.abs(r2) > 1e-3)
    ok &= far(rand[:, 0].astype(np.float64), 512) & far(rand[:, 1].astype(np.float64), 512)
    ok &= (np.abs(alive - 0.5) > 0.1)
    return ok


def test_precompute_matches_oracle():
    """R1/R2/R3/A transcription (empic.js:506-659) vs the f64 oracle."""
    b, e, sink, table = _scenario()
    oracle = _oracle(b, e, sink, table)
    coeffs = precompute_rotation(jnp.asarray(b), jnp.asarray(e), SPEC.h,
                                 SPEC.factor_r, SPEC.factor_z)
    for name, fw, gold in (("r1", coeffs.r1, oracle.r1),
                           ("r2", coeffs.r2, oracle.r2),
                           ("r3", coeffs.r3, oracle.r3),
                           ("a", coeffs.a, oracle.a)):
        np.testing.assert_allclose(np.asarray(fw, np.float64), gold,
                                   rtol=2e-5, atol=5e-7, err_msg=name)


def test_single_substep_matches_oracle():
    """One full half-step (velocity + position + sink/respawn + w-flag) on
    4096 random states with injected uniforms, vs the f64 oracle."""
    b, e, sink, table = _scenario()
    oracle = _oracle(b, e, sink, table)
    coeffs = precompute_rotation(jnp.asarray(b), jnp.asarray(e), SPEC.h,
                                 SPEC.factor_r, SPEC.factor_z)
    rng = np.random.default_rng(3)
    pos, vel, alive, rand = _random_states(rng, 4096)

    v_fw = push_velocity(jnp.asarray(pos), jnp.asarray(vel),
                         jnp.asarray(alive), jnp.asarray(rand), coeffs)
    p_fw, a_fw = push_position(jnp.asarray(pos), v_fw, jnp.asarray(rand),
                               jnp.asarray(sink), jnp.asarray(table),
                               SPEC.step_factor)
    p_g, v_g, a_g = oracle.substep(pos.astype(np.float64),
                                   vel.astype(np.float64),
                                   alive.astype(np.float64),
                                   rand.astype(np.float64))

    keep = _interior_mask(oracle, pos, vel, alive, rand)
    assert keep.sum() > 3000  # the filter must not trivialize the test
    np.testing.assert_allclose(np.asarray(v_fw)[keep], v_g[keep],
                               rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(np.asarray(p_fw)[keep], p_g[keep],
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(a_fw)[keep], a_g[keep])


def test_trajectory_matches_oracle_200_substeps():
    """200 injected-rand half-steps with sinks/respawn active: the bulk of
    the cloud must track the f64 oracle (per-particle divergence beyond
    rounding noise means a semantics mismatch, not chaos, at this horizon)."""
    b, e, sink, table = _scenario()
    e = np.zeros_like(e)  # pure magnetic: bounded orbits for a clean check
    oracle = _oracle(b, e, sink, table)
    coeffs = precompute_rotation(jnp.asarray(b), jnp.asarray(e), SPEC.h,
                                 SPEC.factor_r, SPEC.factor_z)
    rng = np.random.default_rng(11)
    n = 1024
    pos = np.empty((n, 3), np.float32)
    pos[:, 0] = 0.05 + 0.2 * rng.random(n)
    pos[:, 1] = 0.1 * (rng.random(n) - 0.5)
    pos[:, 2] = 0.45 + 0.1 * rng.random(n)
    vel = (0.004 * (rng.random((n, 3)) - 0.5)).astype(np.float32)
    alive = np.ones(n, np.float32)
    n_sub = 200
    rands = rng.random((n_sub, n, 4)).astype(np.float32)

    sf = SPEC.step_factor

    @jax.jit
    def fw_substep(p, v, a, r):
        v = push_velocity(p, v, a, r, coeffs)
        p, a = push_position(p, v, r, jnp.asarray(sink), jnp.asarray(table), sf)
        return p, v, a

    pf, vf, af = jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(alive)
    pg, vg, ag = pos.astype(np.float64), vel.astype(np.float64), alive.astype(np.float64)
    for k in range(n_sub):
        pf, vf, af = fw_substep(pf, vf, af, jnp.asarray(rands[k]))
        pg, vg, ag = oracle.substep(pg, vg, ag, rands[k].astype(np.float64))

    d = np.max(np.abs(np.asarray(pf, np.float64) - pg), axis=1)
    frac_close = float(np.mean(d < 1e-3))
    assert frac_close > 0.95, f"only {frac_close:.3f} of particles track the oracle"
    assert float(np.mean(np.asarray(af) == ag)) > 0.95
    # median must be at rounding-noise level, far below any O(1) formula bug
    assert float(np.median(d)) < 1e-5


@pytest.mark.slow
def test_energy_drift_10k_substeps_vs_oracle():
    """BASELINE north star as worded: energy drift < 1e-3 over 10k steps vs
    the reference semantics.  Pure-B mirror, no sinks (the Boris rotation
    conserves physical speed exactly, so drift measures accumulated
    transcription + rounding error)."""
    b, e, sink, table = _scenario()
    e = np.zeros_like(e)
    sink = np.ones_like(sink)  # no respawns: clean invariant
    oracle = _oracle(b, e, sink, table)
    coeffs = precompute_rotation(jnp.asarray(b), jnp.asarray(e), SPEC.h,
                                 SPEC.factor_r, SPEC.factor_z)
    rng = np.random.default_rng(5)
    n = 1024
    pos = np.empty((n, 3), np.float32)
    pos[:, 0] = 0.05 + 0.2 * rng.random(n)
    pos[:, 1] = 0.1 * (rng.random(n) - 0.5)
    pos[:, 2] = 0.45 + 0.1 * rng.random(n)
    vel = (0.004 * (rng.random((n, 3)) - 0.5)).astype(np.float32)
    alive = np.ones(n, np.float32)
    n_sub = 10_000

    sf = SPEC.step_factor
    sink_j, table_j = jnp.asarray(sink), jnp.asarray(table)

    @jax.jit
    def run(p, v, a, key):
        def body(carry, _):
            p, v, a, key = carry
            key, sub = jax.random.split(key)
            r = jax.random.uniform(sub, (n, 4))  # unused: no sinks
            v = push_velocity(p, v, a, r, coeffs)
            p, a = push_position(p, v, r, sink_j, table_j, sf)
            return (p, v, a, key), None

        (p, v, a, _), _ = jax.lax.scan(body, (p, v, a, key), None, length=n_sub)
        return p, v, a

    pf, vf, af = run(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(alive),
                     jax.random.key(0))
    assert float(jnp.min(af)) == 1.0  # nothing respawned

    pg, vg, ag = pos.astype(np.float64), vel.astype(np.float64), alive.astype(np.float64)
    zeros = np.zeros((n, 4))
    for _ in range(n_sub):
        pg, vg, ag = oracle.substep(pg, vg, ag, zeros)

    ke0 = float(np.sum(oracle.physical_speed2(vel.astype(np.float64))))
    ke_fw = float(np.sum(oracle.physical_speed2(np.asarray(vf, np.float64))))
    ke_g = float(np.sum(oracle.physical_speed2(vg)))
    assert abs(ke_g / ke0 - 1.0) < 1e-9      # oracle sanity: exact invariant
    assert abs(ke_fw / ke0 - 1.0) < 1e-3     # the BASELINE bar
    assert abs(ke_fw / ke_g - 1.0) < 1e-3    # framework vs reference semantics


def test_inverse_cdf_table_matches_oracle():
    """Table build (empic.js:1263-1341) vs the loop-for-loop f64 port, on
    the default scenario's box source (includes empty rows/columns)."""
    nr, nz = 64, 128
    source = np.zeros((nr, nz), np.float64)
    rng = np.random.default_rng(13)
    source[: nr // 8, nz // 2 - nz // 16: nz // 2 + nz // 16] = (
        0.5 + rng.random((nr // 8, nz // 8)))
    size = 128
    fw = np.asarray(build_inverse_cdf_table(jnp.asarray(source, jnp.float32),
                                            size=size), np.float64)
    gold = golden_inverse_cdf_table(source, size=size)
    d = np.abs(fw - gold)
    # f32 vs f64 CDF boundaries may flip a few quantile cells by one index
    assert float(np.mean(d < 1e-4)) > 0.995
    assert float(np.max(d)) < 2.0 / nz + 1e-4
