"""Sharding layouts for the simulation models.

Two first-class strategies (SURVEY.md §2.6, §5):

* **Particle data-parallel** (``shard_pusher_state``): particle arrays split
  over the ``data`` axis, fields replicated.  Correct for the test-particle
  pusher because particles never interact (empic.js:749-773 has no
  particle-particle coupling); the only cross-particle op is moment
  deposition, whose scatter-add onto the replicated grid XLA closes with an
  automatic psum — exactly the collective the reference's additive-blend
  deposition (empic.js:1473-1478) maps to.

* **Spatial grid decomposition** (``shard_fields_spatial``): field arrays
  split along one spatial axis.  Stencil ops (jnp.roll differences in
  ops/fdtd) compile to XLA collective-permutes riding ICI — automatic halo
  exchange.  Explicit-control halos live in parallel/halo.py; particle
  migration between slabs in parallel/migration.py.

All functions only *annotate* placement (jax.device_put /
lax.with_sharding_constraint); the jitted step functions are unchanged —
XLA propagates the shardings and inserts the collectives.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pusher import FieldState, PusherState


def shard_pusher_state(state: PusherState, mesh: Mesh,
                       axis: str = "data") -> PusherState:
    """Particle-DP placement: (N, ...) arrays split on the particle axis."""
    part = NamedSharding(mesh, P(axis))
    part2 = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    return PusherState(
        position=jax.device_put(state.position, part2),
        velocity=jax.device_put(state.velocity, part2),
        alive=jax.device_put(state.alive, part),
        key=jax.device_put(state.key, rep),
        moments_avg=jax.device_put(state.moments_avg, rep),
    )


def replicate_pusher_fields(fields: FieldState, mesh: Mesh) -> FieldState:
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), fields)


def shard_fields_spatial(fields, mesh: Mesh, axis: str = "space",
                         array_axis: int = 0):
    """Split every grid array of a PyTree along one spatial axis."""

    def place(x):
        spec = [None] * x.ndim
        if x.ndim > array_axis and x.shape[array_axis] % mesh.shape[axis] == 0:
            spec[array_axis] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(place, fields)


def shard_em_state(state, mesh: Mesh, particle_axis: str = "data",
                   space_axis: str | None = None):
    """EM PIC placement: particles over ``particle_axis``; fields either
    replicated (space_axis=None) or split along x."""
    part2 = NamedSharding(mesh, P(particle_axis, None))
    if space_axis is None:
        fspec = NamedSharding(mesh, P())
    else:
        fspec = NamedSharding(mesh, P(space_axis))
    return state._replace(
        position=jax.device_put(state.position, part2),
        velocity=jax.device_put(state.velocity, part2),
        e=jax.device_put(state.e, fspec),
        b=jax.device_put(state.b, fspec),
    )
