"""Sorted-layout ES PIC: physics equivalence with the reference model."""

import pytest
import numpy as np
import jax.numpy as jnp

from fusion_sim_tpu.models import electrostatic as es
from fusion_sim_tpu.ops.sorted_deposit import Tiling2D


def _setup(n=8192, cells=64, seed=0):
    length = 2 * np.pi
    d = length / cells
    vol = length * length
    config = es.ESConfig(grid_shape=(cells, cells), cell_size=(d, d), dt=0.05,
                         charge=-vol / n, mass=vol / n)
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 2)).astype(np.float32) * cells
    vel = (0.05 * rng.standard_normal((n, 2))).astype(np.float32)
    return config, pos, vel


def test_sorted_es_matches_reference_model():
    config, pos, vel = _setup()
    ref = es.ElectrostaticPIC(config, pos, vel)
    fast = es.SortedElectrostaticPIC(
        config, pos, vel, tiling=Tiling2D(tile_r=16, tile_z=16, block=256,
                                          margin=3), resort_every=4)
    for _ in range(3):
        ref.step(4)
        fast.step(4)
    assert int(fast.state.spill) == 0
    e_ref = ref.energies()
    e_fast = fast.energies()
    np.testing.assert_allclose(e_fast["kinetic"], e_ref["kinetic"], rtol=2e-3)
    np.testing.assert_allclose(e_fast["field"], e_ref["field"], rtol=2e-2)
    # particle multisets agree to deposit-rounding-driven divergence
    pos_f = np.asarray(fast.state.position)[np.asarray(fast.state.valid)]
    pos_r = np.asarray(ref.state.position)
    assert pos_f.shape == pos_r.shape
    # robust multiset comparison: per-axis sorted coordinates (pairing by
    # lexsort is fragile once trajectories diverge at rounding level)
    for ax in range(2):
        np.testing.assert_allclose(np.sort(pos_f[:, ax]), np.sort(pos_r[:, ax]),
                                   atol=0.05)


def test_spill_fallback_is_exact():
    """With a deliberately stale sort (huge resort_every, tiny margin) the
    slow fallback keeps physics identical to the reference model."""
    import warnings

    config, pos, vel = _setup(n=4096, seed=5)
    vel = vel * 10.0  # fast drift: out-runs the margin quickly
    ref = es.ElectrostaticPIC(config, pos, vel)
    fast = es.SortedElectrostaticPIC(
        config, pos, vel, tiling=Tiling2D(tile_r=16, tile_z=16, block=256,
                                          margin=1), resort_every=10 ** 6)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for _ in range(3):
            ref.step(4)
            fast.step(4)
    assert int(fast.state.spill) > 0, "test needs actual spill"
    e_ref = ref.energies()
    e_fast = fast.energies()
    np.testing.assert_allclose(e_fast["kinetic"], e_ref["kinetic"], rtol=2e-3)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_spill_tiers_match_single_tier(backend):
    """``spill_tiers`` is a pure performance knob: the tiered patch ladder
    (one lax.cond chain per static capacity, exactly one hot per step)
    must produce the SAME state as the single-capacity patch — the same
    rows patched with the same math, only the static buffer sizes differ.
    The drifting setup walks the per-step spill count across both tier
    boundaries (0 -> <=8 -> <=64 -> top tier)."""
    n = 1024 if backend == "pallas" else 4096
    config, pos, vel = _setup(n=n, seed=5)
    vel = vel * 6.0  # out-runs margin 1 quickly; spill grows step by step
    tiling = Tiling2D(tile_r=16, tile_z=16, block=256, margin=1)
    kw = dict(tiling=tiling, resort_every=10 ** 6, check_spill=False,
              spill_capacity=512, backend=backend)
    a = es.SortedElectrostaticPIC(config, pos, vel, **kw)
    b = es.SortedElectrostaticPIC(config, pos, vel, spill_tiers=(8, 64),
                                  **kw)
    steps = 4 if backend == "pallas" else 8
    for _ in range(steps):
        a.step(1)
        b.step(1)
        assert int(a.state.spill) == int(b.state.spill)
    assert int(b.state.spill) > 0, "test needs actual spill"
    np.testing.assert_array_equal(np.asarray(b.state.position),
                                  np.asarray(a.state.position))
    np.testing.assert_array_equal(np.asarray(b.state.velocity),
                                  np.asarray(a.state.velocity))
    assert int(b.state.spill_dropped) == int(a.state.spill_dropped)


def test_spill_tiers_validation():
    config, pos, vel = _setup(n=1024, seed=0)
    tiling = Tiling2D(tile_r=16, tile_z=16, block=256, margin=2)
    for bad in [(0,), (64, 8), (8, 8), (512,), (1024,)]:
        with pytest.raises(ValueError, match="spill_tiers"):
            es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                      spill_capacity=512, spill_tiers=bad)
    with pytest.raises(ValueError, match="repair"):
        es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                  spill_capacity=512, spill_tiers=(8,),
                                  repair=True)


def test_sorted_es_energy_drift_matches_reference():
    """This coarse hot setup self-heats (physical PIC grid heating, ~1.5%
    per 100 steps in the reference model too); the sorted path must not add
    to it."""
    config, pos, vel = _setup(seed=1)
    ref = es.ElectrostaticPIC(config, pos, vel)
    e0r = ref.energies()["total"]
    ref.step(100)
    drift_ref = abs(ref.energies()["total"] - e0r) / abs(e0r)

    sim = es.SortedElectrostaticPIC(
        config, pos, vel, tiling=Tiling2D(tile_r=16, tile_z=16, block=256,
                                          margin=3), resort_every=5)
    e0 = sim.energies()["total"]
    sim.step(100)
    drift = abs(sim.energies()["total"] - e0) / abs(e0)
    assert int(sim.state.spill) == 0
    assert drift < drift_ref * 1.1 + 1e-4, (drift, drift_ref)


@pytest.mark.slow
def test_sorted_es_3d_matches_reference_model():
    """3D sorted ES (Tiling3D windows, VERDICT r2 next-step #4) tracks the
    packed reference model."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    n_cells, n = 16, 4096
    length = 2 * np.pi
    d = length / n_cells
    vol = length ** 3
    config = es.ESConfig(grid_shape=(n_cells,) * 3, cell_size=(d,) * 3,
                         dt=0.05, charge=-vol / n, mass=vol / n)
    rng = np.random.default_rng(0)
    pos = (rng.random((n, 3)) * n_cells).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 3))).astype(np.float32)
    vel[:, 0] += 0.5  # drift to exercise the spill patch + repair

    ref = es.ElectrostaticPIC(config, pos, vel)
    tiling = Tiling3D(tile=(8, 8, 8), block=256, margin=1)
    for kw in (dict(resort_every=3),
               dict(resort_every=10 ** 6, repair=True)):
        sim = es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                        check_spill=False, **kw)
        r = es.ElectrostaticPIC(config, pos, vel)
        n_steps = 10
        r.step(n_steps)
        sim.step(n_steps)
        assert int(jnp.sum(sim.state.valid)) == n
        assert int(sim.state.spill_dropped) == 0
        e_ref, e_sim = r.energies(), sim.energies()
        np.testing.assert_allclose(e_sim["kinetic"], e_ref["kinetic"],
                                   rtol=2e-3)
        pos_s = np.asarray(sim.state.position)[np.asarray(sim.state.valid)]
        pos_r = np.asarray(r.state.position)
        for ax in range(3):
            np.testing.assert_allclose(np.sort(pos_s[:, ax]),
                                       np.sort(pos_r[:, ax]), atol=0.05)


@pytest.mark.slow
def test_pallas_backend_3d_matches_xla_backend():
    """backend='pallas' in 3D (ops/pallas_pic3d.py flattened-lane windows,
    interpret mode on CPU) tracks the XLA sorted 3D model."""
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    n_cells, n = 16, 4096
    length = 2 * np.pi
    d = length / n_cells
    vol = length ** 3
    config = es.ESConfig(grid_shape=(n_cells,) * 3, cell_size=(d,) * 3,
                         dt=0.05, charge=-vol / n, mass=vol / n)
    rng = np.random.default_rng(3)
    pos = (rng.random((n, 3)) * n_cells).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 3))).astype(np.float32)
    tiling = Tiling3D(tile=(8, 8, 8), block=256, margin=2)
    a = es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                  resort_every=4)
    b = es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                  resort_every=4, backend="pallas")
    for _ in range(2):
        a.step(4)
        b.step(4)
    e_a, e_b = a.energies(), b.energies()
    np.testing.assert_allclose(e_b["kinetic"], e_a["kinetic"], rtol=2e-3)
    np.testing.assert_allclose(e_b["field"], e_a["field"], rtol=2e-2)
    pos_a = np.asarray(a.state.position)[np.asarray(a.state.valid)]
    pos_b = np.asarray(b.state.position)[np.asarray(b.state.valid)]
    for ax in range(3):
        np.testing.assert_allclose(np.sort(pos_b[:, ax]),
                                   np.sort(pos_a[:, ax]), atol=0.05)


@pytest.mark.slow
def test_pallas_backend_matches_xla_backend():
    """backend='pallas' (fused gather+kick+drift+deposit kernel, interpret
    mode on CPU) tracks the XLA sorted model at rounding level."""
    config, pos, vel = _setup(n=4096, seed=2)
    tiling = Tiling2D(tile_r=16, tile_z=16, block=256, margin=3)
    a = es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                  resort_every=4)
    b = es.SortedElectrostaticPIC(config, pos, vel, tiling=tiling,
                                  resort_every=4, backend="pallas")
    for _ in range(3):
        a.step(4)
        b.step(4)
    assert int(b.state.spill) == 0
    e_a, e_b = a.energies(), b.energies()
    np.testing.assert_allclose(e_b["kinetic"], e_a["kinetic"], rtol=2e-3)
    np.testing.assert_allclose(e_b["field"], e_a["field"], rtol=2e-2)
    pos_a = np.asarray(a.state.position)[np.asarray(a.state.valid)]
    pos_b = np.asarray(b.state.position)[np.asarray(b.state.valid)]
    for ax in range(2):
        np.testing.assert_allclose(np.sort(pos_b[:, ax]), np.sort(pos_a[:, ax]),
                                   atol=0.05)


@pytest.mark.slow
def test_pallas_backend_spill_fallback():
    """Spilled rows in the fused kernel are patched exactly (vs plain model)."""
    import warnings

    config, pos, vel = _setup(n=4096, seed=5)
    vel = vel * 10.0
    ref = es.ElectrostaticPIC(config, pos, vel)
    fast = es.SortedElectrostaticPIC(
        config, pos, vel, tiling=Tiling2D(tile_r=16, tile_z=16, block=256,
                                          margin=1), resort_every=10 ** 6,
        backend="pallas")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for _ in range(3):
            ref.step(4)
            fast.step(4)
    assert int(fast.state.spill) > 0  # the scenario actually spills
    e_ref, e_fast = ref.energies(), fast.energies()
    np.testing.assert_allclose(e_fast["kinetic"], e_ref["kinetic"], rtol=2e-3)
    pos_f = np.asarray(fast.state.position)[np.asarray(fast.state.valid)]
    pos_r = np.asarray(ref.state.position)
    for ax in range(2):
        np.testing.assert_allclose(np.sort(pos_f[:, ax]), np.sort(pos_r[:, ax]),
                                   atol=0.05)
