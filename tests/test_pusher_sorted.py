"""Tile-sorted pusher fast path: per-particle math identical to the plain
grid path (multiset comparison — order and RNG stream differ by design)."""

import pytest
import numpy as np

import jax.numpy as jnp

from fusion_sim_tpu.models.pusher import CylindricalParticlePusher
from fusion_sim_tpu.models.pusher_sorted import Tiling2D
from fusion_sim_tpu.scenarios import apply_default_scenario


def _make(nr=80, nz=160, nparticles=32, seed=0):
    return CylindricalParticlePusher(
        {"radius": 1.0, "height": 2.0, "nr": nr, "nz": nz, "dt": 2e-9,
         "nparticles": nparticles, "particle_mass": 1.67e-27,
         "particle_charge": 1.602e-19}, seed=seed)


def _interior_setup(sim, seed=1):
    """Particles well inside the domain, no sinks -> no respawns, so the
    (differently-shaped) RNG stream never enters the dynamics."""
    rng = np.random.default_rng(seed)
    n = sim.spec.n_total
    r = 0.3 + 0.3 * rng.random(n)
    th = 2 * np.pi * rng.random(n)
    pos = np.stack([r * np.cos(th), r * np.sin(th),
                    0.6 + 0.8 * rng.random(n)], axis=-1)
    vel = 0.002 * rng.standard_normal((n, 3))
    sim.set({"position": pos, "velocity": vel})
    sim.add_current_loop(0.8, 0.0, 1.0e7)
    sim.add_current_loop(0.8, 2.0, -1.0e7)
    sim.precalc()


def test_sorted_path_matches_plain_grid_path():
    a = _make()
    b = _make()
    _interior_setup(a)
    _interior_setup(b)
    b.enable_sorted_path(tiling=Tiling2D(tile_r=16, tile_z=16, block=128,
                                         margin=3), resort_every=3)
    a.step(8)
    b.step(8)
    b.disable_sorted_path()

    pa = np.asarray(a.state.position)
    pb = np.asarray(b.state.position)
    assert pb.shape == pa.shape
    # multiset equality via nearest-neighbor pairing
    d2 = ((pb[:, None, :] - pa[None, :, :]) ** 2).sum(-1)
    match = d2.argmin(axis=1)
    assert len(np.unique(match)) == len(match)
    np.testing.assert_allclose(pb, pa[match], rtol=1e-5, atol=1e-6)
    va = np.asarray(a.state.velocity)
    vb = np.asarray(b.state.velocity)
    np.testing.assert_allclose(vb, va[match], rtol=1e-5, atol=1e-7)


def test_sorted_path_default_scenario_respawns():
    """Full default scenario (sinks + respawn + thermal reinit): constant
    particle count, finite state, frames render, spill counter moves."""
    sim = _make(nr=64, nz=128, nparticles=32)
    apply_default_scenario(sim)
    sim.enable_sorted_path(tiling=Tiling2D(tile_r=16, tile_z=16, block=128,
                                           margin=3), resort_every=4)
    sim.step(6)
    frame = sim.density()
    assert np.isfinite(np.asarray(frame)).all()
    st = sim._sorted_state
    assert int(jnp.sum(st.valid)) == sim.spec.n_total
    assert bool(jnp.all(jnp.isfinite(st.position)))
    assert bool(jnp.all(jnp.isfinite(st.velocity)))
    sim.disable_sorted_path()
    assert sim.state.position.shape[0] == sim.spec.n_total
    assert bool(jnp.all(jnp.isfinite(sim.state.position)))


def test_spill_capacity_overflow_freezes_not_corrupts():
    """Rows past ``spill_capacity`` FREEZE for the substep and retry
    (ADVICE r3: the xla backend previously pushed them with clamped-window
    gathers — silent corruption).  With zero fields the velocity is exactly
    constant, so after k steps every row's displacement must be an integer
    number 0..2k of substep drifts — never a fractional/corrupted move —
    and the overflow must surface in ``dropped_over`` (separate from the
    respawn backlog in ``dropped``)."""
    sim = _make(nr=64, nz=128, nparticles=32)  # 1024 particles
    rng = np.random.default_rng(7)
    n = sim.spec.n_total
    r = 0.2 + 0.5 * rng.random(n)
    th = 2 * np.pi * rng.random(n)
    pos = np.stack([r * np.cos(th), r * np.sin(th),
                    0.4 + 1.0 * rng.random(n)], axis=-1)
    vel = 0.004 * rng.standard_normal((n, 3))  # fast drift -> window exits
    sim.set({"position": pos, "velocity": vel})
    # the set() API applies the reference's per-axis normalization
    # (factor_r, factor_r, factor_z and /c) — compare in internal units
    pos0 = np.asarray(sim.state.position)
    vel0 = np.asarray(sim.state.velocity)
    sim.precalc()  # zero E/B: rotation = identity, A = 0
    sim.enable_sorted_path(
        tiling=Tiling2D(tile_r=8, tile_z=8, block=128, margin=1),
        resort_every=10_000,  # never resort: out-of-window rows accumulate
        spill_capacity=32)    # far below the out-of-window flux
    k = 6
    sim.step(k)
    st = sim._sorted_state
    assert int(st.dropped_over) > 0      # overflow happened and was counted
    assert int(st.dropped) == 0          # no respawns in this scenario
    valid = np.asarray(st.valid)
    p1 = np.asarray(st.position)[valid]
    v1 = np.asarray(st.velocity)[valid]
    # velocities unchanged up to the Cartesian<->cylindrical frame
    # round-trip rounding (zero fields, no respawn)
    order1 = np.lexsort(v1.T)
    order0 = np.lexsort(vel0.T)
    v_sorted = v1[order1]
    v_ref = vel0[order0]
    np.testing.assert_allclose(v_sorted, v_ref, rtol=1e-4, atol=1e-8)
    # displacement = m * step_factor * v for integer m in [0, 2k]
    d = (p1[order1] - pos0[order0])
    step_vec = np.float32(sim.spec.step_factor) * v_ref
    comp = np.argmax(np.abs(step_vec), axis=1)
    m = d[np.arange(len(d)), comp] / step_vec[np.arange(len(d)), comp]
    np.testing.assert_allclose(m, np.round(m), atol=2e-2)
    assert (np.round(m) >= 0).all() and (np.round(m) <= 2 * k).all()
    assert (np.round(m) < 2 * k).any()   # some rows actually froze


def test_fused_backend_smoke_tiny():
    """Default-CI canary for the fused pusher kernel (VERDICT r3 #7): a
    tiny-shape Mosaic interpret run must match the XLA sorted backend
    row-for-row.  The full-size equivalence matrix stays in `slow`."""
    a = _make(nr=32, nz=64, nparticles=8, seed=5)
    b = _make(nr=32, nz=64, nparticles=8, seed=5)
    apply_default_scenario(a, seed=5)
    apply_default_scenario(b, seed=5)
    t = Tiling2D(tile_r=16, tile_z=16, block=128, margin=2)
    a.enable_sorted_path(tiling=t, resort_every=3)
    b.enable_sorted_path(tiling=t, resort_every=3, backend="fused")
    a.step(3)
    b.step(3)
    sa, sb = a._sorted_state, b._sorted_state
    np.testing.assert_allclose(np.asarray(sb.position),
                               np.asarray(sa.position), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sb.velocity),
                               np.asarray(sa.velocity), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(sb.alive), np.asarray(sa.alive))


def test_fused_backend_spill_tiers_match_single_tier():
    """``spill_tiers`` is a pure performance knob on the fused backend:
    the tiered patch ladder must reproduce the single-capacity patch
    bit-for-bit (same rows patched with the same math — only the static
    buffer sizes differ), including the respawn RNG stream."""
    a = _make(nr=32, nz=64, nparticles=8, seed=5)
    b = _make(nr=32, nz=64, nparticles=8, seed=5)
    apply_default_scenario(a, seed=5)
    apply_default_scenario(b, seed=5)
    t = Tiling2D(tile_r=16, tile_z=16, block=128, margin=2)
    a.enable_sorted_path(tiling=t, resort_every=3, backend="fused",
                         spill_capacity=256)
    b.enable_sorted_path(tiling=t, resort_every=3, backend="fused",
                         spill_capacity=256, spill_tiers=(4, 32))
    a.step(3)
    b.step(3)
    sa, sb = a._sorted_state, b._sorted_state
    assert int(sb.spill) == int(sa.spill)
    np.testing.assert_array_equal(np.asarray(sb.position),
                                  np.asarray(sa.position))
    np.testing.assert_array_equal(np.asarray(sb.velocity),
                                  np.asarray(sa.velocity))
    np.testing.assert_array_equal(np.asarray(sb.alive), np.asarray(sa.alive))
    assert int(sb.dropped_over) == int(sa.dropped_over)


@pytest.mark.slow
def test_fused_backend_matches_xla_backend():
    """backend='fused' (one Mosaic kernel per half-step, interpret mode on
    CPU) reproduces the XLA sorted backend row-for-row — identical layout,
    identical RNG stream, identical math."""
    a = _make(nr=80, nz=160, nparticles=16, seed=3)
    b = _make(nr=80, nz=160, nparticles=16, seed=3)
    apply_default_scenario(a, seed=3)
    apply_default_scenario(b, seed=3)
    t = Tiling2D(tile_r=16, tile_z=16, block=128, margin=3)
    a.enable_sorted_path(tiling=t, resort_every=4)
    b.enable_sorted_path(tiling=t, resort_every=4, backend="fused")
    a.step(8)
    b.step(8)
    sa, sb = a._sorted_state, b._sorted_state
    np.testing.assert_allclose(np.asarray(sb.position),
                               np.asarray(sa.position), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sb.velocity),
                               np.asarray(sa.velocity), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(sb.alive), np.asarray(sa.alive))
