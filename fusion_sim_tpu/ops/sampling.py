"""Monte-Carlo source sampling via tabulated inverse CDF.

The reference builds, on the CPU, a marginal CDF over r and per-row
conditional CDFs over z from a user-supplied 2D source PDF, then tabulates a
512x512 inverse-CDF lookup (f1, f2) -> (r, z) uploaded as a texture
(empic.js:1263-1341); respawned particles sample it with two uniforms
(``step_position_frag``, empic.js:712-717).  Here the whole construction is
on-device and jittable: cumulative sums + ``jnp.searchsorted`` reproduce the
reference's linear-interpolated inverse exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INV_CDF_SIZE = 512  # empic.js:228-241 — 512x512 lookup table


def _inverse_interp(cdf: jax.Array, f: jax.Array) -> jax.Array:
    """Inverse of a discrete CDF with the reference's interpolation.

    Parity target: ``inverse_cdf_x`` (empic.js:1296-1311): find the first
    index i with cdf[i] >= f; return (i + (f - cdf[i-1])/(cdf[i] - cdf[i-1]))
    normalized by the table length, with the i == 0 branch f/cdf[0].
    """
    n = cdf.shape[0]
    # f == 0 edge: the reference's j == 0 branch divides 0/0 -> NaN when the
    # CDF has leading zeros (empic.js:1303-1305 with cdf[0] == 0).  We take
    # the limit f -> 0+ instead: the first cell with nonzero mass.
    f = jnp.maximum(f, jnp.float32(1e-30))
    i = jnp.searchsorted(cdf, f, side="left")
    i = jnp.minimum(i, n - 1)
    prev = jnp.where(i > 0, cdf[jnp.maximum(i - 1, 0)], 0.0)
    denom = cdf[i] - prev
    frac = jnp.where(denom > 0, (f - prev) / denom, 0.0)
    return (i.astype(jnp.float32) + frac) / n


def build_inverse_cdf_table(source_pdf: jax.Array, size: int = INV_CDF_SIZE) -> jax.Array:
    """Tabulate the inverse CDF of a 2D source PDF.

    ``source_pdf``: (nr, nz) non-negative weights (reference passes
    ``source[i][j]``, empic.js:1263).  Returns ``(size, size, 2)`` where entry
    [i, j] = (r, z) in [0,1)^2 for quantiles f1=i/(size-1), f2=j/(size-1) —
    exactly the table of empic.js:1325-1341.
    """
    pdf = jnp.asarray(source_pdf, dtype=jnp.float32)
    nr = pdf.shape[0]

    row_sums = jnp.sum(pdf, axis=1)  # sum over z per r-row
    cdf_x = jnp.cumsum(row_sums)
    cdf_x = cdf_x / cdf_x[-1]

    # Empty rows would make the conditional CDF 0/0 (the reference runs its
    # scan off the end of the array there, empic.js:1316-1319); substitute a
    # uniform ramp — such rows are only reachable at quantile-1 boundaries.
    nz = pdf.shape[1]
    totals = jnp.cumsum(pdf, axis=1)
    ramp = (jnp.arange(nz, dtype=jnp.float32) + 1.0) / nz
    cdf_y = jnp.where(row_sums[:, None] > 0, totals / jnp.where(row_sums == 0, 1.0, row_sums)[:, None], ramp[None, :])

    f = jnp.arange(size, dtype=jnp.float32) / (size - 1)

    x = jax.vmap(lambda f1: _inverse_interp(cdf_x, f1))(f)  # (size,)
    rows = jnp.minimum((x * nr).astype(jnp.int32), nr - 1)  # empic.js:1314
    # quantile-1.0 boundary: floor lands one past the support; step back onto
    # the last row with mass so the conditional CDF is meaningful.
    rows = jnp.where(row_sums[rows] > 0, rows, jnp.maximum(rows - 1, 0))

    def y_for_row(row_idx):
        return jax.vmap(lambda f2: _inverse_interp(cdf_y[row_idx], f2))(f)

    y = jax.vmap(y_for_row)(rows)  # (size, size)
    x_grid = jnp.broadcast_to(x[:, None], (size, size))
    return jnp.stack([x_grid, y], axis=-1)


def sample_inverse_cdf(table: jax.Array, u1: jax.Array, u2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """NEAREST lookup of the inverse-CDF table with two uniforms per particle.

    Matches ``texture2D(u_inv_cdf, vec2(rand.x, rand.y))`` with NEAREST
    filtering (empic.js:716; utilities.js:556-560).
    """
    size = table.shape[0]
    i = jnp.clip(jnp.floor(u1 * size).astype(jnp.int32), 0, size - 1)
    j = jnp.clip(jnp.floor(u2 * size).astype(jnp.int32), 0, size - 1)
    picked = table[i, j]
    return picked[..., 0], picked[..., 1]
