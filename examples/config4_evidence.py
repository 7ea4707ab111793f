"""BASELINE configs[4] evidence pack (VERDICT r3 #6): 1e9 particles on a
512^3 grid across v5e-8.

Three artifacts, numbers not prose:
  1. the per-chip HBM budget for the real shape (printed table);
  2. the per-chip compute half measured on one real chip
     (examples/bench_slab_capacity.py — run separately on TPU);
  3. a structurally-exact 1/8-scale run of the full 8-shard 3D
     sorted-sharded FUSED composition on the 8-device CPU mesh (this
     script): same tile/margin/halo/migration/capacity machinery, scaled
     grid + population, asserting zero overflow and layout invariants.

PYTHONPATH=/root/repo:$PYTHONPATH \
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python examples/config4_evidence.py
"""

import numpy as np


def hbm_budget():
    """Per-chip HBM for config[4]: 1.25e8 particles, 512x512x64 slab."""
    n = 125_000_000
    shape = (512, 512, 64)          # per-chip x-slab of the 512^3 grid
    tile, margin, block = 8, 2, 512
    halo = 8                         # halo_w: roundup(margin+2, tile)
    pseudo = (shape[2] + 2 * halo, 512, 512)  # slab axis is x in the model
    n_tiles = (pseudo[0] // tile) * (pseudo[1] // tile) * (pseudo[2] // tile)
    pad_rows = n_tiles * block
    rows = n + pad_rows

    def gb(b):
        return b / 1e9

    part = rows * (3 + 3) * 4        # position + velocity f32
    aux = rows * (4 + 1)             # tile_id i32 + valid bool
    rho = np.prod(pseudo) * 4        # carried rho (pallas backend)
    e_grid = np.prod(pseudo) * 3 * 4  # E on the halo-padded pseudo-grid
    patch = 196_608 * (4 + 4 * 6)    # spill idx + K-row temporaries
    sort = rows * (4 + 4) * 2        # resort: keys + perm, double-buffered
    print("== per-chip HBM budget (config[4]: 1.25e8 rows, 512x512x64) ==")
    print(f"  padded layout rows        : {rows:.3e} "
          f"(+{pad_rows / n:.1%} block padding, {n_tiles} tiles)")
    print(f"  particle payload          : {gb(part):6.2f} GB")
    print(f"  tile_id + valid           : {gb(aux):6.2f} GB")
    print(f"  carried rho (pseudo-grid) : {gb(rho):6.2f} GB")
    print(f"  E field (pseudo-grid, 3ch): {gb(e_grid):6.2f} GB")
    print(f"  spill patch buffers       : {gb(patch):6.2f} GB")
    print(f"  resort transient (peak)   : {gb(sort):6.2f} GB")
    total = part + aux + rho + e_grid + patch + sort
    print(f"  TOTAL (peak, during sort) : {gb(total):6.2f} GB of 16 GB HBM "
          f"({total / 16e9:.0%})")
    steady = part + aux + rho + e_grid + patch
    print(f"  steady state              : {gb(steady):6.2f} GB "
          f"({steady / 16e9:.0%})")
    return total


def scaled_mesh_run():
    """1/8-scale config[4] on the 8-device CPU mesh: 64^3 grid, 8 x-slabs,
    the same Tiling3D(8^3) / margin / halo / migration machinery, fused
    (pallas, interpret) backend."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from fusion_sim_tpu.models import electrostatic as es
    from fusion_sim_tpu.models.electrostatic_sharded import (
        ShardedESConfig, ShardedElectrostaticPIC)
    from fusion_sim_tpu.ops.sorted_deposit import Tiling3D
    from fusion_sim_tpu.parallel.mesh import make_mesh

    cells = 64
    n = 32_768
    d = 2 * np.pi / cells
    base = es.ESConfig(grid_shape=(cells,) * 3, cell_size=(d,) * 3,
                       dt=0.05, charge=-1.0 / n, mass=1.0 / n)
    rng = np.random.default_rng(0)
    pos = (rng.random((n, 3)) * cells).astype(np.float32)
    vel = (0.05 * rng.standard_normal((n, 3))).astype(np.float32)
    mesh = make_mesh(8, ("space",))
    cfg = ShardedESConfig(
        base=base, n_shards=8, capacity=8192, migration_buffer=256,
        tiling=Tiling3D(tile=(8, 8, 8), block=512, margin=2),
        resort_every=6, spill_capacity=2048, backend="pallas",
        pallas_precision="exact_bf16")
    print(f"== 1/8-scale mesh run: {cells}^3, 8 shards, n={n}, "
          f"slab={cfg.slab}, halo={cfg.halo_w}, pseudo={cfg.pseudo_shape}, "
          f"devices={len(jax.devices())} ==")
    sim = ShardedElectrostaticPIC(cfg, mesh, pos, vel)
    sim.step(8)   # crosses one resort + sustained migration
    ov = int(np.asarray(sim.state.overflow).sum())
    alive = int(np.asarray(sim.state.alive).sum())
    p, v = sim.gather_particles()
    print(f"  overflow={ov} alive={alive}/{n} "
          f"spill={int(np.asarray(sim.state.spill).sum())} "
          f"finite={bool(np.isfinite(p).all() and np.isfinite(v).all())}")
    assert ov == 0 and alive == n
    ke0 = float(0.5 * np.sum(vel.astype(np.float64) ** 2))
    ke1 = float(0.5 * np.sum(v.astype(np.float64) ** 2))
    print(f"  KE ratio after 8 steps: {ke1 / ke0:.4f} (thermal plasma ~1)")
    print("  LAYOUT OK: fused 3D sorted-sharded composition holds at the "
          "config[4] structure")


if __name__ == "__main__":
    hbm_budget()
    scaled_mesh_run()
