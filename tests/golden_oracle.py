"""Golden-run oracle: an independent NumPy port of the reference's exact
substep semantics, used to cross-validate the framework's parity path.

This is NOT framework code — it deliberately re-transcribes the reference
shaders from scratch (float64 by default) so that a transcription error in
`fusion_sim_tpu.ops.boris` / `ops.push` / `ops.sampling` cannot hide:

* Boris precompute R1/R2/R3/A   — empic.js:506-659 (programPre1/2/3/A)
* velocity pass                 — empic.js:729-778 (step_velocity_frag)
* position/sink/respawn pass    — empic.js:692-726 (step_position_frag)
* substep ordering + rand use   — empic.js:824-853, 899-928, 1436-1469
  (velocity pass first, position pass consumes the NEW velocity; both
  passes of one half-step consume the same rand texture)
* inverse-CDF table build       — empic.js:1263-1341 (host loop)

RNG: the reference's chaotic-map rand texture is crypto-seeded and not
reproducible by design (SURVEY.md §7), so the oracle takes *injected*
uniforms per substep; tests drive the framework's pure ops with the same
arrays.
"""

from __future__ import annotations

import numpy as np

SPEED_OF_LIGHT = 2.998e8  # empic.js:26


def nearest_sample(tex: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """texture2D with NEAREST/CLAMP_TO_EDGE (utilities.js:556-560):
    texel = clamp(floor(coord * size), 0, size-1) per axis."""
    nr, nz = tex.shape[0], tex.shape[1]
    iu = np.clip(np.floor(u * nr).astype(np.int64), 0, nr - 1)
    iv = np.clip(np.floor(v * nz).astype(np.int64), 0, nz - 1)
    return tex[iu, iv]


class GoldenOracle:
    """Reference-semantics pusher on (nr, nz) grids, NumPy, dtype-selectable."""

    def __init__(self, *, radius, height, nr, nz, dt, particle_mass,
                 particle_charge, b_grid, e_grid, sink_mask, inv_cdf,
                 dtype=np.float64):
        self.dtype = dtype
        self.nr, self.nz = nr, nz
        self.h = dtype(particle_charge * dt / (2.0 * particle_mass))  # empic.js:44
        self.factor_r = dtype(1.0 / radius)
        self.factor_z = dtype(1.0 / height)
        self.step_factor = dtype(dt * SPEED_OF_LIGHT)  # empic.js:852
        self.b = np.asarray(b_grid, dtype)
        self.e = np.asarray(e_grid, dtype)
        self.sink = np.asarray(sink_mask, dtype)
        self.inv_cdf = np.asarray(inv_cdf, dtype)
        self.precalc()

    # ------------------------------------------------------------- precompute
    def precalc(self):
        """programPre1/2/3 (empic.js:506-621) + programPreA (:625-659)."""
        d = self.dtype
        h = self.h
        bx, by, bz = self.b[..., 0], self.b[..., 1], self.b[..., 2]
        bmag2 = bx * bx + by * by + bz * bz
        hb2 = h * h * bmag2
        factor = d(2.0) / (d(1.0) + hb2)
        diag = d(1.0) - hb2 * factor
        rz = self.factor_r / self.factor_z
        zr = self.factor_z / self.factor_r

        self.r1 = np.stack([
            diag + factor * h * h * bx * bx,
            factor * h * (bz + h * bx * by),
            factor * h * (-by + h * bx * bz) * rz,      # empic.js:527
        ], axis=-1)
        self.r2 = np.stack([
            factor * h * (-bz + h * by * bx),
            diag + factor * h * h * by * by,
            factor * h * (bx + h * by * bz) * rz,       # empic.js:566
        ], axis=-1)
        self.r3 = np.stack([
            factor * h * (by + h * bz * bx) * zr,       # empic.js:606
            factor * h * (-bx + h * bz * by) * zr,
            diag + factor * h * h * bz * bz,
        ], axis=-1)

        e = self.e
        ecb = np.cross(e, self.b)
        edb = np.sum(e * self.b, axis=-1, keepdims=True)
        # NOTE: h*(E·B) is a GLSL *scalar* added to the vec3 (empic.js:652) —
        # it broadcasts to every component; reproduced on purpose.
        a = (h * (d(2.0) - hb2 * factor)[..., None] * e
             + (h * h * factor)[..., None] * (ecb + h * edb)) / d(SPEED_OF_LIGHT)
        a = a * np.array([self.factor_r, self.factor_r, self.factor_z], d)
        self.a = a

    # ---------------------------------------------------------------- substep
    def velocity_pass(self, position, velocity, alive, rand):
        """step_velocity_frag (empic.js:729-778)."""
        d = self.dtype
        x, y, z = position[:, 0], position[:, 1], position[:, 2]
        r = np.sqrt(x * x + y * y)
        dir_x, dir_y = x / r, y / r

        vx, vy, vz = velocity[:, 0], velocity[:, 1], velocity[:, 2]
        vr = vx * dir_x + vy * dir_y
        va = vy * dir_x - vx * dir_y
        cyl = np.stack([vr, va, vz], axis=-1)

        r1 = nearest_sample(self.r1, r, z)
        r2 = nearest_sample(self.r2, r, z)
        r3 = nearest_sample(self.r3, r, z)
        a = nearest_sample(self.a, r, z)

        rot = np.stack([np.sum(r1 * cyl, -1), np.sum(r2 * cyl, -1),
                        np.sum(r3 * cyl, -1)], axis=-1) + a
        nxt = np.stack([rot[:, 0] * dir_x - rot[:, 1] * dir_y,
                        rot[:, 0] * dir_y + rot[:, 1] * dir_x,
                        rot[:, 2]], axis=-1)
        thermal = d(0.001) * (d(2.0) * rand[:, :3] - d(1.0))  # empic.js:771-772
        return np.where((alive > 0.5)[:, None], nxt, thermal)

    def position_pass(self, position, velocity, rand):
        """step_position_frag (empic.js:692-726).  ``velocity`` is the NEW
        velocity of this half-step (empic.js:847-848)."""
        nxt = position + self.step_factor * velocity
        x, y, z = nxt[:, 0], nxt[:, 1], nxt[:, 2]
        r = np.sqrt(x * x + y * y)
        keep = nearest_sample(self.sink, r, z) > 0.5

        size = self.inv_cdf.shape[0]
        i = np.clip(np.floor(rand[:, 0] * size).astype(np.int64), 0, size - 1)
        j = np.clip(np.floor(rand[:, 1] * size).astype(np.int64), 0, size - 1)
        new_xz = self.inv_cdf[i, j]  # (N, 2) -> respawn at (x', 0, z')

        out = np.stack([np.where(keep, x, new_xz[:, 0]),
                        np.where(keep, y, self.dtype(0.0)),
                        np.where(keep, z, new_xz[:, 1])], axis=-1)
        return out, keep.astype(self.dtype)

    def substep(self, position, velocity, alive, rand):
        """One half-step: velocity pass, then position pass with the new
        velocity; both consume the same rand (empic.js:824-853)."""
        velocity = self.velocity_pass(position, velocity, alive, rand)
        position, alive = self.position_pass(position, velocity, rand)
        return position, velocity, alive

    def physical_speed2(self, velocity):
        """|v_phys|^2 / c^2 — the Boris-rotation invariant (velocities are
        stored per-axis scaled, empic.js:645-646)."""
        return ((velocity[:, 0] / self.factor_r) ** 2
                + (velocity[:, 1] / self.factor_r) ** 2
                + (velocity[:, 2] / self.factor_z) ** 2)


def golden_inverse_cdf_table(source_pdf, size: int = 512,
                             dtype=np.float64) -> np.ndarray:
    """Host inverse-CDF tabulation, ported loop-for-loop from
    empic.js:1268-1341 (with the framework's documented divergence: an empty
    PDF row reached at a quantile boundary steps back to the last row with
    mass instead of the reference's out-of-bounds scan)."""
    pdf = np.asarray(source_pdf, dtype)
    n_x, n_y = pdf.shape

    cdf_y = np.cumsum(pdf, axis=1)
    row_sums = cdf_y[:, -1].copy()
    with np.errstate(invalid="ignore", divide="ignore"):
        cdf_y = cdf_y / row_sums[:, None]
    cdf_x = np.cumsum(row_sums)
    cdf_x = cdf_x / cdf_x[-1]

    def inverse_cdf_x(f):
        i = int(np.searchsorted(cdf_x, f, side="left"))  # while(cdf_x[i] < f)
        i = min(i, n_x - 1)
        if i == 0:
            return (f / cdf_x[0]) / n_x
        return (i + (f - cdf_x[i - 1]) / (cdf_x[i] - cdf_x[i - 1])) / n_x

    def inverse_cdf_y(x, f):
        i = min(n_x - 1, int(np.floor(x * n_x)))  # empic.js:1314
        while row_sums[i] == 0 and i > 0:         # framework divergence note
            i -= 1
        row = cdf_y[i]
        j = int(np.searchsorted(row, f, side="left"))
        j = min(j, n_y - 1)
        if j == 0:
            if row[0] == 0:  # f -> 0+ limit of the reference's 0/0
                return (np.argmax(row > 0)) / n_y
            return (f / row[0]) / n_y
        return (j + (f - row[j - 1]) / (row[j] - row[j - 1])) / n_y

    table = np.zeros((size, size, 2), dtype)
    for i in range(size):
        f1 = dtype(i) / dtype(size - 1)
        x = inverse_cdf_x(f1)
        for j in range(size):
            f2 = dtype(j) / dtype(size - 1)
            table[i, j, 0] = x
            table[i, j, 1] = inverse_cdf_y(x, f2)
    return table
