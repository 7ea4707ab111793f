"""Sorted-layout EM PIC: equivalence with the centered reference model."""

import pytest
import numpy as np
import jax.numpy as jnp

from fusion_sim_tpu.models import electromagnetic as em
from fusion_sim_tpu.ops.sorted_deposit import Tiling2D


def _setup(n=8192, cells=64, seed=0):
    d = 0.5
    config = em.EMConfig(grid_shape=(cells, cells), cell_size=(d, d),
                         dt=0.2 * d, charge=-0.01, mass=0.01,
                         field_gather="centered")
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 2)).astype(np.float32) * cells
    vel = (0.2 * rng.standard_normal((n, 3))).astype(np.float32)
    return config, pos, vel


def test_sorted_em_matches_reference_model():
    config, pos, vel = _setup()
    ref = em.ElectromagneticPIC(config, pos, vel)
    fast = em.SortedElectromagneticPIC(
        config, pos, vel, tiling=Tiling2D(tile_r=16, tile_z=16, block=256,
                                          margin=3), resort_every=3)
    for _ in range(3):
        ref.step(3)
        fast.step(3)
    assert int(fast.state.spill) == 0
    np.testing.assert_allclose(np.asarray(fast.state.e), np.asarray(ref.state.e),
                               atol=3e-4 * max(float(jnp.abs(ref.state.e).max()), 1e-9))
    np.testing.assert_allclose(np.asarray(fast.state.b), np.asarray(ref.state.b),
                               atol=3e-4 * max(float(jnp.abs(ref.state.b).max()), 1e-9))
    e_ref = ref.energies()
    e_fast = fast.energies()
    np.testing.assert_allclose(e_fast["kinetic"], e_ref["kinetic"], rtol=2e-3)
    np.testing.assert_allclose(e_fast["field"], e_ref["field"], rtol=2e-2)


@pytest.mark.slow
def test_sorted_em_3d_matches_reference_model():
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    d = 0.5
    cells = 16
    config = em.EMConfig(grid_shape=(cells,) * 3, cell_size=(d,) * 3,
                         dt=0.15 * d, charge=-0.01, mass=0.01,
                         field_gather="centered")
    rng = np.random.default_rng(3)
    n = 2048
    pos = rng.random((n, 3)).astype(np.float32) * cells
    vel = (0.2 * rng.standard_normal((n, 3))).astype(np.float32)

    ref = em.ElectromagneticPIC(config, pos, vel)
    fast = em.SortedElectromagneticPIC(
        config, pos, vel, tiling=Tiling3D(tile=(8, 8, 8), block=256, margin=2),
        resort_every=3)
    for _ in range(2):
        ref.step(3)
        fast.step(3)
    assert int(fast.state.spill) == 0
    np.testing.assert_allclose(np.asarray(fast.state.e), np.asarray(ref.state.e),
                               atol=3e-4 * max(float(jnp.abs(ref.state.e).max()), 1e-9))
    np.testing.assert_allclose(np.asarray(fast.state.b), np.asarray(ref.state.b),
                               atol=3e-4 * max(float(jnp.abs(ref.state.b).max()), 1e-9))


def test_sorted_em_relativistic_matches_reference():
    """Relativistic proper-velocity convention: the sorted model must apply
    the same u/gamma coordinate drift as the reference model."""
    d = 0.5
    cells = 32
    config = em.EMConfig(grid_shape=(cells, cells), cell_size=(d, d),
                         dt=0.2 * d, charge=-0.01, mass=0.01,
                         field_gather="centered", relativistic=True)
    rng = np.random.default_rng(8)
    n = 2048
    pos = rng.random((n, 2)).astype(np.float32) * cells
    vel = (1.5 * rng.standard_normal((n, 3))).astype(np.float32)  # u ~ c

    ref = em.ElectromagneticPIC(config, pos, vel)
    fast = em.SortedElectromagneticPIC(
        config, pos, vel, tiling=Tiling2D(tile_r=16, tile_z=16, block=256,
                                          margin=3), resort_every=3)
    for _ in range(2):
        ref.step(3)
        fast.step(3)
    assert int(fast.state.spill) == 0
    np.testing.assert_allclose(np.asarray(fast.state.e), np.asarray(ref.state.e),
                               atol=3e-4 * max(float(jnp.abs(ref.state.e).max()), 1e-9))
    np.testing.assert_allclose(fast.energies()["kinetic"],
                               ref.energies()["kinetic"], rtol=2e-3)


def test_sorted_em_gauss_law():
    """The sorted Esirkepov keeps the discrete continuity equation, so
    Gauss's law residual must not grow over a run."""
    from fusion_sim_tpu.ops.interp import cic_deposit

    config, pos, vel = _setup(seed=1)
    sim = em.SortedElectromagneticPIC(
        config, pos, vel, tiling=Tiling2D(tile_r=16, tile_z=16, block=256,
                                          margin=3), resort_every=3)

    def gauss_residual():
        st = sim.state
        div = jnp.zeros(config.grid_shape, jnp.float32)
        for axis, d in enumerate(config.cell_size):
            comp = st.e[..., axis]
            div = div + (comp - jnp.roll(comp, 1, axis=axis)) / d
        valid = st.valid
        w = jnp.where(valid, jnp.float32(config.charge / config.cell_volume), 0.0)
        grid_f = jnp.asarray(config.grid_shape, jnp.float32)
        rho = cic_deposit(jnp.mod(st.position, grid_f), w, config.grid_shape)
        rho = rho - jnp.mean(rho)
        return float(jnp.abs(div - rho / config.eps0).max())

    r0 = gauss_residual()
    sim.step(30)
    r1 = gauss_residual()
    assert int(sim.state.spill) == 0
    assert r1 - r0 < 5e-3 * max(r0, 1.0), (r0, r1)


@pytest.mark.slow
def test_sorted_em_pallas_gather_backend():
    """gather_backend='pallas' (interpret mode on CPU) matches the XLA
    window gather route."""
    import numpy as np

    from fusion_sim_tpu.models import electromagnetic as em
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D

    d = 0.5
    n_cells = 64
    base = em.EMConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                       dt=0.2 * d, charge=-0.01, mass=0.01,
                       field_gather="centered")
    rng = np.random.default_rng(0)
    n = 4096
    pos = rng.random((n, 2)) * n_cells
    vel = 0.2 * rng.standard_normal((n, 3))
    tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)

    a = em.SortedElectromagneticPIC(base, pos, vel, tiling=tiling,
                                    resort_every=4)
    b = em.SortedElectromagneticPIC(base, pos, vel, tiling=tiling,
                                    resort_every=4, gather_backend="pallas")
    a.step(6)
    b.step(6)
    np.testing.assert_allclose(np.asarray(b.state.e), np.asarray(a.state.e),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.state.b), np.asarray(a.state.b),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sorted_em_3d_fused_backend():
    """gather_backend='fused' in 3D (ops/pallas_em3d.py, interpret mode on
    CPU) matches the XLA sorted 3D route with live E/B fields."""
    import numpy as np

    from fusion_sim_tpu.models import electromagnetic as em
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    d = 0.5
    nc = 16
    base = em.EMConfig(grid_shape=(nc,) * 3, cell_size=(d,) * 3,
                       dt=0.2 * d, charge=-0.01, mass=0.01,
                       field_gather="centered")
    rng = np.random.default_rng(0)
    n = 2048
    pos = rng.random((n, 3)) * nc
    vel = 0.2 * rng.standard_normal((n, 3))
    # seed a transverse EM wave so the gather + Boris path is exercised
    x = np.arange(nc) * d
    e0 = np.zeros((nc, nc, nc, 3), np.float32)
    b0 = np.zeros((nc, nc, nc, 3), np.float32)
    e0[..., 1] = 0.05 * np.sin(2 * np.pi * x / (nc * d))[:, None, None]
    b0[..., 2] = 0.05 * np.sin(2 * np.pi * x / (nc * d))[:, None, None]
    tiling = Tiling3D(tile=(8, 8, 8), block=128, margin=2)

    a = em.SortedElectromagneticPIC(base, pos, vel, e=e0, b=b0,
                                    tiling=tiling, resort_every=4)
    b = em.SortedElectromagneticPIC(base, pos, vel, e=e0, b=b0,
                                    tiling=tiling, resort_every=4,
                                    gather_backend="fused")
    a.step(6)
    b.step(6)
    np.testing.assert_allclose(np.asarray(b.state.e), np.asarray(a.state.e),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.state.b), np.asarray(a.state.b),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.state.position),
                               np.asarray(a.state.position),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_sorted_em_fused_backend():
    """gather_backend='fused' (full Mosaic substep, interpret mode on CPU)
    matches the XLA sorted route, non-relativistic and relativistic."""
    import numpy as np

    from fusion_sim_tpu.models import electromagnetic as em
    from fusion_sim_tpu.ops.sorted_deposit import Tiling2D

    for rel in (False, True):
        d = 0.5
        n_cells = 64
        base = em.EMConfig(grid_shape=(n_cells, n_cells), cell_size=(d, d),
                           dt=0.2 * d, charge=-0.01, mass=0.01,
                           field_gather="centered", relativistic=rel)
        rng = np.random.default_rng(0)
        n = 4096
        pos = rng.random((n, 2)) * n_cells
        vel = 0.2 * rng.standard_normal((n, 3))
        tiling = Tiling2D(tile_r=8, tile_z=8, block=128, margin=2)

        a = em.SortedElectromagneticPIC(base, pos, vel, tiling=tiling,
                                        resort_every=4)
        b = em.SortedElectromagneticPIC(base, pos, vel, tiling=tiling,
                                        resort_every=4,
                                        gather_backend="fused")
        a.step(6)
        b.step(6)
        np.testing.assert_allclose(np.asarray(b.state.e),
                                   np.asarray(a.state.e),
                                   rtol=1e-4, atol=1e-6, err_msg=f"rel={rel}")
        np.testing.assert_allclose(np.asarray(b.state.b),
                                   np.asarray(a.state.b),
                                   rtol=1e-4, atol=1e-6, err_msg=f"rel={rel}")
        np.testing.assert_allclose(np.asarray(b.state.position),
                                   np.asarray(a.state.position),
                                   rtol=1e-5, atol=1e-4, err_msg=f"rel={rel}")
