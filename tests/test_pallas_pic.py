"""Fused Pallas ES substep vs the composed XLA path (interpret mode, CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fusion_sim_tpu.ops.interp import cic_deposit_packed, cic_gather_packed
from fusion_sim_tpu.ops.pallas_pic import fused_es2d_substep
from fusion_sim_tpu.ops.sorted_deposit import Tiling2D, build_padded_layout


@pytest.mark.parametrize("precision", [
    "highest",
    pytest.param("exact_bf16", marks=pytest.mark.slow),
    "exact_bf16_pack",
    pytest.param("exact_bf16_pack2", marks=pytest.mark.slow),
])
def test_fused_es2d_substep_matches_composed_step(precision):
    shape = (64, 128)
    tiling = Tiling2D(tile_r=16, tile_z=16, block=128, margin=2)
    rng = np.random.default_rng(0)
    n = 4096
    pos = (rng.random((n, 2)) * np.array(shape)).astype(np.float32)
    vel = rng.standard_normal((n, 2)).astype(np.float32)
    e_grid = rng.standard_normal((*shape, 2)).astype(np.float32)
    qm_dt, c_r, c_z = 0.25, 0.5, 0.5  # drift well under margin cells/step

    tid, pos_p, v0, v1, validp, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.asarray(vel[:, 0]),
        jnp.asarray(vel[:, 1]), jnp.ones((n,), jnp.float32))
    vel_p = jnp.stack([v0, v1], axis=-1)
    w = jnp.where(validp > 0.5, 1.5, 0.0)

    npos, nvel, rho, inw = fused_es2d_substep(
        jnp.asarray(e_grid), pos_p, vel_p, w, tid, shape, tiling,
        qm_dt, c_r, c_z, precision=precision, interpret=True)

    # composed XLA reference
    grid_f = jnp.asarray(shape, jnp.float32)
    e_at_p = cic_gather_packed(jnp.asarray(e_grid), jnp.mod(pos_p, grid_f), shape)
    valid = (w > 0)[:, None]
    vel_ref = jnp.where(valid, vel_p + qm_dt * e_at_p, 0.0)
    pos_ref = jnp.mod(pos_p + jnp.stack([c_r * vel_ref[:, 0],
                                         c_z * vel_ref[:, 1]], -1), grid_f)
    rho_ref = cic_deposit_packed(pos_ref, w, shape)

    keep = np.asarray(w > 0)
    assert bool(np.all(np.asarray(inw)[keep]))  # small drift: no spill
    np.testing.assert_allclose(np.asarray(nvel)[keep], np.asarray(vel_ref)[keep],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(npos)[keep], np.asarray(pos_ref)[keep],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rho), np.asarray(rho_ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("precision", ["highest", "exact_bf16",
                                       "exact_bf16_pack"])
def test_fused_es3d_substep_matches_composed_step(precision):
    from fusion_sim_tpu.ops.pallas_pic3d import fused_es3d_substep
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    shape = (16, 16, 32)
    tiling = Tiling3D(tile=(8, 8, 8), block=128, margin=2)
    rng = np.random.default_rng(7)
    n = 2048
    pos = (rng.random((n, 3)) * np.array(shape)).astype(np.float32)
    vel = rng.standard_normal((n, 3)).astype(np.float32)
    e_grid = rng.standard_normal((*shape, 3)).astype(np.float32)
    qm_dt, c = 0.25, 0.5  # drift well under margin cells/step

    tid, pos_p, v0, v1, v2, validp, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.asarray(vel[:, 0]),
        jnp.asarray(vel[:, 1]), jnp.asarray(vel[:, 2]),
        jnp.ones((n,), jnp.float32))
    vel_p = jnp.stack([v0, v1, v2], axis=-1)
    w = jnp.where(validp > 0.5, 1.5, 0.0)

    npos, nvel, rho, inw = fused_es3d_substep(
        jnp.asarray(e_grid), pos_p, vel_p, w, tid, shape, tiling,
        qm_dt, c, c, c, precision=precision, n_g=4, interpret=True)

    # composed XLA reference
    grid_f = jnp.asarray(shape, jnp.float32)
    e_at_p = cic_gather_packed(jnp.asarray(e_grid), jnp.mod(pos_p, grid_f),
                               shape)
    valid = (w > 0)[:, None]
    vel_ref = jnp.where(valid, vel_p + qm_dt * e_at_p, 0.0)
    pos_ref = jnp.mod(pos_p + c * vel_ref, grid_f)
    rho_ref = cic_deposit_packed(pos_ref, w, shape)

    keep = np.asarray(w > 0)
    assert bool(np.all(np.asarray(inw)[keep]))  # small drift: no spill
    np.testing.assert_allclose(np.asarray(nvel)[keep],
                               np.asarray(vel_ref)[keep],
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(npos)[keep],
                               np.asarray(pos_ref)[keep],
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rho), np.asarray(rho_ref),
                               rtol=1e-3, atol=2e-4)


def test_fused_es3d_substep_flags_out_of_window():
    from fusion_sim_tpu.ops.pallas_pic3d import fused_es3d_substep
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    shape = (16, 16, 16)
    tiling = Tiling3D(tile=(8, 8, 8), block=128, margin=1)
    rng = np.random.default_rng(8)
    n = 512
    pos = (rng.random((n, 3)) * np.array(shape)).astype(np.float32)
    tid, pos_p, validp, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.ones((n,), jnp.float32))
    w = jnp.where(validp > 0.5, 1.0, 0.0)
    vel = jnp.full((pos_p.shape[0], 3), 8.0)  # huge drift: guaranteed spill
    e = jnp.zeros((*shape, 3), jnp.float32)
    _, _, rho, inw = fused_es3d_substep(
        e, pos_p, vel, w, tid, shape, tiling, 0.0, 1.0, 1.0, 1.0,
        n_g=4, interpret=True)
    spilled = np.asarray(~inw) & np.asarray(w > 0)
    assert spilled.any()
    # spilled mass is dropped by the kernel (callers patch it exactly)
    assert float(jnp.sum(rho)) < float(jnp.sum(w)) - 0.5


@pytest.mark.parametrize("precision", ["highest", "exact_bf16",
                                       "exact_bf16_pack"])
def test_fused_em3d_substep_zero_field_matches_packed_esirkepov(precision):
    """With E = B = 0 the fused 3D EM kernel reduces to drift + Esirkepov;
    its J must match the packed reference deposit row for row."""
    from fusion_sim_tpu.ops.esirkepov import esirkepov_deposit_3d
    from fusion_sim_tpu.ops.pallas_em3d import fused_em3d_substep
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D

    shape = (16, 16, 32)
    tiling = Tiling3D(tile=(8, 8, 8), block=128, margin=2)
    dt, cell = 0.2, (0.5, 0.5, 0.5)
    rng = np.random.default_rng(11)
    n = 1024
    # interior positions: avoid the periodic seam so the packed reference
    # (unwrapped x1) and the kernel (window-wrapped) see identical motion
    pos = (2.0 + rng.random((n, 3)) * (np.array(shape) - 4)).astype(np.float32)
    # CFL: |v| dt / cell < 1 cell/step (the Esirkepov 3-point stencil
    # contract, as everywhere in the framework)
    vel = np.clip(rng.standard_normal((n, 3)), -2.0, 2.0).astype(np.float32)
    table = np.zeros((*shape, 6), np.float32)

    tid, pos_p, v0, v1, v2, validp, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.asarray(vel[:, 0]),
        jnp.asarray(vel[:, 1]), jnp.asarray(vel[:, 2]),
        jnp.ones((n,), jnp.float32))
    vel_p = jnp.stack([v0, v1, v2], axis=-1)
    valid = validp > 0.5

    npos, nvel, j, inw = fused_em3d_substep(
        jnp.asarray(table), pos_p, vel_p, valid, tid, shape, tiling,
        qm_half_dt=0.3, dt=dt, cell_size=cell, charge=-0.01,
        precision=precision, n_g=4, interpret=True)

    keep = np.asarray(valid)
    assert bool(np.all(np.asarray(inw)[keep]))
    x1_ref = pos_p + dt * vel_p / jnp.asarray(cell)
    q = jnp.where(valid, jnp.float32(-0.01), 0.0)
    j_ref = esirkepov_deposit_3d(pos_p, x1_ref, q, dt, shape, cell)
    np.testing.assert_allclose(np.asarray(nvel)[keep],
                               np.asarray(vel_p)[keep], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(npos)[keep],
        np.asarray(jnp.mod(x1_ref, jnp.asarray(shape, jnp.float32)))[keep],
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref),
                               rtol=1e-4, atol=1e-6)


def test_fused_em2d_substep_exact_bf16_tracks_highest():
    """The 3-term bf16 gather (ops/mxu.py) stays within ~1e-4 of Mosaic's
    multi-pass f32 path through a full fused EM substep."""
    from fusion_sim_tpu.ops.pallas_em import fused_em2d_substep

    shape = (32, 64)
    tiling = Tiling2D(tile_r=16, tile_z=16, block=128, margin=2)
    rng = np.random.default_rng(3)
    n = 1024
    pos = (rng.random((n, 2)) * np.array(shape)).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 3))).astype(np.float32)
    table = rng.standard_normal((*shape, 6)).astype(np.float32)

    tid, pos_p, v0, v1, v2, validp, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.asarray(vel[:, 0]),
        jnp.asarray(vel[:, 1]), jnp.asarray(vel[:, 2]),
        jnp.ones((n,), jnp.float32))
    vel_p = jnp.stack([v0, v1, v2], axis=-1)
    valid = validp > 0.5

    outs = {}
    for prec in ("highest", "exact_bf16", "exact_bf16_pack2"):
        outs[prec] = fused_em2d_substep(
            jnp.asarray(table), pos_p, vel_p, valid, tid, shape, tiling,
            qm_half_dt=0.1, dt=0.1, cell_size=(0.5, 0.5), charge=-0.01,
            precision=prec, interpret=True)
    for variant in ("exact_bf16", "exact_bf16_pack2"):
        for a, b, name in zip(outs["highest"], outs[variant],
                              ("pos", "vel", "j", "inw")):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"{variant} {name}")


@pytest.mark.slow
def test_fused_es2d_substep_flags_out_of_window():
    shape = (64, 64)
    tiling = Tiling2D(tile_r=16, tile_z=16, block=128, margin=1)
    rng = np.random.default_rng(1)
    n = 512
    pos = (rng.random((n, 2)) * np.array(shape)).astype(np.float32)
    tid, pos_p, validp, _ = build_padded_layout(
        jnp.asarray(pos), shape, tiling, jnp.ones((n,), jnp.float32))
    w = jnp.where(validp > 0.5, 1.0, 0.0)
    vel = jnp.full((pos_p.shape[0], 2), 8.0)  # huge drift: guaranteed spill
    e = jnp.zeros((*shape, 2), jnp.float32)
    _, _, rho, inw = fused_es2d_substep(
        e, pos_p, vel, w, tid, shape, tiling, 0.0, 1.0, 1.0, interpret=True)
    spilled = np.asarray(~inw) & np.asarray(w > 0)
    assert spilled.any()
    # spilled mass is dropped by the kernel (callers patch it exactly)
    assert float(jnp.sum(rho)) < float(jnp.sum(w)) - 0.5


def test_fused_es2d_substep_streamed_matches_resident():
    """stream=True (HBM window set, per-block DMA by prefetched tile index)
    produces identical results to the resident-window form."""
    shape = (64, 128)
    tiling = Tiling2D(tile_r=16, tile_z=16, block=128, margin=2)
    rng = np.random.default_rng(7)
    n = 1024
    pos = jnp.asarray(rng.random((n, 2)) * np.asarray(shape), jnp.float32)
    vel = jnp.asarray(0.1 * rng.standard_normal((n, 2)), jnp.float32)
    e_grid = jnp.asarray(rng.standard_normal((*shape, 2)), jnp.float32)
    tid, pos_p, v0, v1, w_p = build_padded_layout(
        pos, shape, tiling, vel[:, 0], vel[:, 1],
        jnp.ones((n,), jnp.float32))[:5]
    vel_p = jnp.stack([v0, v1], axis=-1)
    args = (e_grid, pos_p, vel_p, w_p, tid, shape, tiling,
            0.1, 0.05, 0.05)
    # n_g=8 forces several grid steps so the double-buffered prefetch path
    # (slot reuse at step >= 2) actually executes on this small layout
    outs_r = fused_es2d_substep(*args, precision="highest", stream=False,
                                n_g=8, interpret=True)
    outs_s = fused_es2d_substep(*args, precision="highest", stream=True,
                                n_g=8, interpret=True)
    for a, b, name in zip(outs_r, outs_s, ("pos", "vel", "rho", "inw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=0, err_msg=name)
    # the K-packed variant streams ONE window ref with doubled lanes (the
    # hi/lo halves side by side) — its stream slicing is a distinct path
    outs_rp = fused_es2d_substep(*args, precision="exact_bf16_pack",
                                 stream=False, n_g=8, interpret=True)
    outs_sp = fused_es2d_substep(*args, precision="exact_bf16_pack",
                                 stream=True, n_g=8, interpret=True)
    for a, b, name in zip(outs_rp, outs_sp, ("pos", "vel", "rho", "inw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=0, err_msg="pack " + name)


@pytest.mark.slow
def test_fused_em2d_substep_streamed_matches_resident():
    """EM: stream=True matches the resident-window form exactly.

    slow: the streaming machinery is shared (ops/pallas_stream.py) and the
    default suite keeps the ES variant as its canary; this covers the
    EM-specific ref slicing."""
    from fusion_sim_tpu.ops.pallas_em import fused_em2d_substep

    shape = (64, 64)
    tiling = Tiling2D(tile_r=16, tile_z=16, block=128, margin=2)
    rng = np.random.default_rng(9)
    n = 1024
    pos = jnp.asarray(rng.random((n, 2)) * np.asarray(shape), jnp.float32)
    vel = jnp.asarray(0.1 * rng.standard_normal((n, 3)), jnp.float32)
    table = jnp.asarray(0.3 * rng.standard_normal((*shape, 6)), jnp.float32)
    tid, pos_p, v0, v1, v2, w_p = build_padded_layout(
        pos, shape, tiling, vel[:, 0], vel[:, 1], vel[:, 2],
        jnp.ones((n,), jnp.float32))[:6]
    vel_p = jnp.stack([v0, v1, v2], axis=-1)
    args = (table, pos_p, vel_p, w_p > 0.5, tid, shape, tiling,
            0.05, 0.1, (0.5, 0.5), -0.01)
    # n_g=8 -> 3 grid steps: the prefetch branch and slot reuse both run
    outs_r = fused_em2d_substep(*args, precision="highest", stream=False,
                                n_g=8, interpret=True)
    outs_s = fused_em2d_substep(*args, precision="highest", stream=True,
                                n_g=8, interpret=True)
    for a, b, name in zip(outs_r, outs_s, ("pos", "vel", "j", "inw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=0, err_msg=name)


@pytest.mark.slow
def test_fused_em2d_substep_streamed_exact_bf16():
    """stream=True with the 3-term bf16 window split (two streamed window
    refs instead of one) matches the resident exact_bf16 form exactly."""
    from fusion_sim_tpu.ops.pallas_em import fused_em2d_substep

    shape = (64, 64)
    tiling = Tiling2D(tile_r=16, tile_z=16, block=128, margin=2)
    rng = np.random.default_rng(11)
    n = 1024
    pos = jnp.asarray(rng.random((n, 2)) * np.asarray(shape), jnp.float32)
    vel = jnp.asarray(0.1 * rng.standard_normal((n, 3)), jnp.float32)
    table = jnp.asarray(0.3 * rng.standard_normal((*shape, 6)), jnp.float32)
    tid, pos_p, v0, v1, v2, w_p = build_padded_layout(
        pos, shape, tiling, vel[:, 0], vel[:, 1], vel[:, 2],
        jnp.ones((n,), jnp.float32))[:6]
    vel_p = jnp.stack([v0, v1, v2], axis=-1)
    args = (table, pos_p, vel_p, w_p > 0.5, tid, shape, tiling,
            0.05, 0.1, (0.5, 0.5), -0.01)
    outs_r = fused_em2d_substep(*args, precision="exact_bf16", stream=False,
                                n_g=8, interpret=True)
    outs_s = fused_em2d_substep(*args, precision="exact_bf16", stream=True,
                                n_g=8, interpret=True)
    for a, b, name in zip(outs_r, outs_s, ("pos", "vel", "j", "inw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=0, err_msg=name)
