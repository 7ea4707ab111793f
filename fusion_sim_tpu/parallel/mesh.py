"""Device-mesh construction helpers.

The reference is single-browser/single-GPU (SURVEY.md §2.6); multi-chip
scaling in this framework is jax.sharding over a Mesh with XLA collectives
riding ICI.  Axis-name conventions:

* ``"data"``  — particle data-parallel axis (the DP analogue: particles are
  independent in the test-particle pusher, empic.js:749-773).
* ``"space"`` — spatial grid-decomposition axis (the PIC analogue of
  sequence/context parallelism: halo exchange + particle migration,
  SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(n_devices: int | None = None,
              axes: tuple[str, ...] = ("data",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    1D by default; pass ``axes=("data", "space")`` with ``shape`` for 2D
    meshes (particle-DP x grid-decomposition hybrids).
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,) if len(axes) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"mesh shape {shape} != {n_devices} devices")
    return Mesh(np.asarray(devices).reshape(shape), axes)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_along(mesh: Mesh, axis_name: str, rank: int,
                  array_axis: int = 0) -> NamedSharding:
    """NamedSharding placing ``axis_name`` on array axis ``array_axis`` of a
    rank-``rank`` array, all other axes replicated."""
    spec = [None] * rank
    spec[array_axis] = axis_name
    return NamedSharding(mesh, P(*spec))
