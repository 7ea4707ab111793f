"""Position drift, sink absorption, and Monte-Carlo respawn.

Parity target: ``step_position_frag`` (empic.js:692-726, instantiated as
``programStepPositionB/A`` at :841-853/:916-928):

1. drift: x+ = x + (dt*c) * v (step factor, empic.js:852);
2. compute r = |(x, y)| and sample the sink mask at (r, z) (NEAREST);
3. if sink > 0.5 the particle survives with alive flag w = 1;
   otherwise it *respawns*: new (r', z') from the inverse-CDF table with this
   substep's two uniforms, placed at Cartesian (r', 0, z') with w = 0 — the
   w = 0 flag makes the *next* substep's velocity pass thermal-reinitialize it
   (empic.js:719, 771-772).  Velocity is left untouched this pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boris import gather_nearest
from .sampling import sample_inverse_cdf


def push_position(
    position: jax.Array,
    velocity: jax.Array,
    rand: jax.Array,
    sink_mask: jax.Array,
    inv_cdf_table: jax.Array,
    step_factor: float,
) -> tuple[jax.Array, jax.Array]:
    """One drift + sink/respawn pass.

    ``position``/``velocity``: (N, 3) normalized; ``rand``: (N, >=2) uniforms;
    ``sink_mask``: (nr, nz) with 1 = keep, 0 = absorb; ``inv_cdf_table``:
    (512, 512, 2); ``step_factor`` = dt * c.

    Returns (next_position, next_alive).
    """
    next_pos = position + jnp.float32(step_factor) * velocity
    x, y, z = next_pos[..., 0], next_pos[..., 1], next_pos[..., 2]
    r = jnp.sqrt(x * x + y * y)
    sink = gather_nearest(sink_mask[..., None], r, z)[..., 0]
    pos, alive, _ = sink_respawn(next_pos, sink, rand, inv_cdf_table)
    return pos, alive


def sink_respawn(
    next_pos: jax.Array,
    sink: jax.Array,
    rand: jax.Array,
    inv_cdf_table: jax.Array,
    respawn_capacity: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """The gather-free half of ``push_position``: apply a pre-sampled sink
    value per particle (split out for the tile-sorted fast path,
    models/pusher_sorted.py).

    ``respawn_capacity``: if set, the inverse-CDF table lookup (a
    latency-bound row gather) runs only on up to that many compacted
    respawning rows instead of all N — bit-identical results for every
    respawned row (the table transforms this substep's uniforms; no RNG
    state is consumed).  ``spill_rows_cond`` captures *every* respawning row
    up to the capacity (respawns are scattered ~uniformly across the
    population, so it takes its exact flat-compaction branch when they span
    many chunks); only rows past ``respawn_capacity`` itself keep their
    drifted position with alive = 0 and are re-absorbed next substep.
    Callers should surface that backlog — the third return value
    ``n_dropped = max(n_respawning - capacity, 0)`` counts it (0 when
    ``respawn_capacity`` is None)."""
    x, y, z = next_pos[..., 0], next_pos[..., 1], next_pos[..., 2]
    keep = sink > 0.5
    alive = keep.astype(jnp.float32)

    if respawn_capacity is None:
        new_r, new_z = sample_inverse_cdf(inv_cdf_table, rand[..., 0],
                                          rand[..., 1])
        out_x = jnp.where(keep, x, new_r)
        out_y = jnp.where(keep, y, 0.0)
        out_z = jnp.where(keep, z, new_z)
        return (jnp.stack([out_x, out_y, out_z], axis=-1), alive,
                jnp.int32(0))

    from .interp import spill_rows_cond

    n = x.shape[0]
    mask = jnp.logical_not(keep)
    n_respawn = jnp.sum(mask)
    idx, _ = spill_rows_cond(mask, n_respawn, respawn_capacity, n)
    new_r, new_z = sample_inverse_cdf(inv_cdf_table, rand[idx, 0],
                                      rand[idx, 1])
    out_x = x.at[idx].set(new_r, mode="drop")
    out_y = y.at[idx].set(0.0, mode="drop")
    out_z = z.at[idx].set(new_z, mode="drop")
    n_dropped = jnp.maximum(
        n_respawn.astype(jnp.int32) - respawn_capacity, 0)
    return jnp.stack([out_x, out_y, out_z], axis=-1), alive, n_dropped
