"""Linear and spectral solvers.

* ``weighted_jacobi`` / ``SORIterative`` — TPU-native re-creation of the
  reference's GPU iterative solver (``makeSORIterative``,
  matrix_webgl.js:35-711): the iteration x+ = omega*(R x + C) + (1-omega)*x
  with R = -A_offdiag/diag(A), C = b/diag(A) (programR/programC,
  matrix_webgl.js:224-305), run entirely on device under ``lax.while_loop``
  with the convergence statistics of the host loop (Pearson correlation
  between successive iterates and the relative max-diff stop test,
  matrix_webgl.js:646-691) computed on device — eliminating the reference's
  per-iteration readPixels round trip (SURVEY.md §3.5).

  The texture pyramid (M5-M7) existed only because WebGL lacks a dot
  product; on TPU the whole MV product is one MXU matmul.

* ``poisson_fft`` — spectral Poisson solve on periodic grids (any rank),
  the field solver for the self-consistent electrostatic PIC loop
  (BASELINE.json configs[0-1]).

* ``conjugate_gradient`` — matrix-free CG under ``lax.while_loop`` for
  non-periodic/SPD problems.

Divergence from the reference, by intent (SURVEY.md §2.4 note): the
reference's host loop accumulates its correlation sums *across* iterations
without reset (matrix_webgl.js:637-680) and scales dot products by 0.25 to
dodge u8 readback clipping (matrix_webgl.js:447-451); we compute the true
per-iteration Pearson correlation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SolveResult(NamedTuple):
    """Parity with the reference's solve() return object
    (matrix_webgl.js:693-698)."""

    correlation: jax.Array  # Pearson correlation between last two iterates
    diff: jax.Array         # relative max-diff at the last iteration
    iterations: jax.Array   # iterations taken
    result: jax.Array       # the solution vector


def _jacobi_stats(x1: jax.Array, x2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pearson correlation + the reference's relative-diff stop metric
    (matrix_webgl.js:676-683): diff = 2*n*max|x2-x1| / (|sum x1| + |sum x2|)."""
    n = x1.shape[0]
    s1, s2 = jnp.sum(x1), jnp.sum(x2)
    s11 = jnp.sum(x1 * x1)
    s22 = jnp.sum(x2 * x2)
    s12 = jnp.sum(x1 * x2)
    denom = jnp.sqrt((n * s11 - s1 * s1) * (n * s22 - s2 * s2))
    correlation = jnp.where(denom > 0, (n * s12 - s1 * s2) / denom, 1.0)
    max_diff = jnp.max(jnp.abs(x2 - x1))
    diff = 2.0 * n * max_diff / (jnp.abs(s1) + jnp.abs(s2))
    return correlation, diff


@functools.partial(jax.jit, static_argnames=("max_iterations", "substep"))
def weighted_jacobi(
    a: jax.Array,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    tolerance: float = 1e-3,
    max_iterations: int = 100,
    substep: int = 1,
    omega: float = 1.0,
) -> SolveResult:
    """Weighted-Jacobi solve of A x = b, fully on device.

    Iteration (programR/programC/programResult, matrix_webgl.js:224-424):
        x+ = omega * (R x + C) + (1 - omega) * x,
        R = -A_offdiag / diag(A),  C = b / diag(A)

    ``substep`` iterations run between convergence checks, like the
    reference's substep parameter (matrix_webgl.js:648-662).  The stop test
    is ``diff <= tolerance`` with diff as in matrix_webgl.js:683.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0, jnp.float32)
    d = jnp.diagonal(a)
    inv_d = 1.0 / d
    r = -(a - jnp.diag(d)) * inv_d[:, None]  # row-scaled off-diagonal
    c = b * inv_d
    omega = jnp.float32(omega)

    def one_iter(x):
        return omega * (r @ x + c) + (1.0 - omega) * x

    def cond(carry):
        _, _, it, _, diff = carry
        return jnp.logical_and(it < max_iterations, diff > tolerance)

    def body(carry):
        x, _, it, _, _ = carry
        x_prev = x
        for _ in range(substep):
            x = one_iter(x)
        corr, diff = _jacobi_stats(x_prev, x)
        return (x, x_prev, it + 1, corr, diff)

    init = (x, x, jnp.int32(0), jnp.float32(0.0), jnp.float32(jnp.inf))
    x, _, iterations, correlation, diff = jax.lax.while_loop(cond, body, init)
    return SolveResult(correlation=correlation, diff=diff,
                       iterations=iterations, result=x)


class SORIterative:
    """API-parity wrapper mirroring ``makeSORIterative``
    (matrix_webgl.js:35-711): ``vec_length``/``vec_height`` sizing from
    ``n_power`` (vector length = 4*(2^n_power)^2, matrix_webgl.js:44-54),
    chainable ``set_matrix``/``set_b``/``init_vector``, ``mv_product``,
    ``solve`` and ``x_result``."""

    def __init__(self, n_power: int, relaxation: float = 1.0):
        self.vec_height = 2 ** n_power
        self.vec_length = 4 * self.vec_height * self.vec_height
        self.omega = relaxation
        self._a = None
        self._b = None
        self._x = jnp.zeros((self.vec_length,), jnp.float32)

    def set_matrix(self, matrix) -> "SORIterative":
        a = jnp.asarray(matrix, jnp.float32)
        if a.shape != (self.vec_length, self.vec_length):
            raise ValueError(
                f"matrix must be ({self.vec_length}, {self.vec_length}), got {a.shape}")
        self._a = a
        return self

    def set_b(self, b) -> "SORIterative":
        self._b = jnp.asarray(b, jnp.float32).reshape(self.vec_length)
        return self

    def init_vector(self, vector) -> "SORIterative":
        self._x = jnp.asarray(vector, jnp.float32).reshape(self.vec_length)
        return self

    def mv_product(self) -> jax.Array:
        """One iteration application x -> omega*(R x + C) + (1-omega)*x
        (out.mv_product, matrix_webgl.js:539-562)."""
        d = jnp.diagonal(self._a)
        r = -(self._a - jnp.diag(d)) / d[:, None]
        c = self._b / d
        self._x = self.omega * (r @ self._x + c) + (1 - self.omega) * self._x
        return self._x

    def solve(self, params: dict) -> dict:
        """Parity with out.solve (matrix_webgl.js:571-700); returns a dict
        with correlation/diff/iterations/result."""
        from ..config import Optional, validate_object

        validate_object(params, {
            "tolerance": "number",
            "substep": Optional("number"),
            "max_iterations": Optional("number"),
        })
        out = weighted_jacobi(
            self._a, self._b, self._x,
            tolerance=float(params["tolerance"]),
            max_iterations=int(params.get("max_iterations", 100)),
            substep=int(params.get("substep", 1)),
            omega=self.omega,
        )
        self._x = out.result
        return {
            "correlation": float(out.correlation),
            "diff": float(out.diff),
            "iterations": int(out.iterations),
            "result": out.result,
        }

    def x_result(self) -> jax.Array:
        """Current solution (x_result_tex, matrix_webgl.js:703-706)."""
        return self._x


def make_sor_iterative(spec: dict) -> SORIterative:
    """Factory with the reference's spec validation (matrix_webgl.js:36-40)."""
    from ..config import Optional, validate_object

    validate_object(spec, {"n_power": "number", "relaxation": Optional("number")})
    return SORIterative(int(spec["n_power"]), float(spec.get("relaxation", 1.0)))


# ---------------------------------------------------------------------------
# Spectral Poisson solver (the modern field-solve path; BASELINE configs[0-1])
# ---------------------------------------------------------------------------

def _ksq_grid(shape: tuple[int, ...], dx: tuple[float, ...]) -> jax.Array:
    """|k|^2 on the rfft grid of ``shape`` with cell sizes ``dx``."""
    ks = []
    for n, d in zip(shape[:-1], dx[:-1]):
        ks.append(2 * jnp.pi * jnp.fft.fftfreq(n, d=d))
    ks.append(2 * jnp.pi * jnp.fft.rfftfreq(shape[-1], d=dx[-1]))
    grids = jnp.meshgrid(*ks, indexing="ij")
    return sum(g * g for g in grids)


@functools.partial(jax.jit, static_argnames=("dx",))
def poisson_fft(rho: jax.Array, dx: tuple[float, ...], eps0: float = 1.0) -> jax.Array:
    """Solve laplacian(phi) = -rho/eps0 on a fully periodic grid.

    Spectral: phi_k = rho_k / (eps0 * |k|^2), k=0 mode zeroed (the mean of
    phi is gauge).  Shapes: any rank; ``dx`` has one entry per axis.
    This is the jnp.fft field solve mandated by SURVEY.md §7 step 6.
    """
    rho = jnp.asarray(rho)
    rho_k = jnp.fft.rfftn(rho)
    ksq = _ksq_grid(rho.shape, dx)
    inv = jnp.where(ksq > 0, 1.0 / (eps0 * ksq), 0.0)
    phi_k = rho_k * inv
    return jnp.fft.irfftn(phi_k, s=rho.shape)


@functools.partial(jax.jit, static_argnames=("dx", "precision"))
def poisson_dft2d(rho: jax.Array, dx: tuple[float, float],
                  eps0: float = 1.0, precision: str = "highest") -> jax.Array:
    """``poisson_fft`` for 2D grids as explicit DFT MATMULS.

    XLA's TPU FFT is emulated and slow (~5.5 ms for 512^2 incl. gradient,
    measured); at PIC grid sizes the O(n^3) dense-DFT matmul form runs
    straight on the MXU and is ~10x faster.  Real arithmetic throughout:
    F = C - iS per axis, phi = (1/N) Re[F^H (F rho F^T / (eps0 |k|^2)) F^*].
    Same semantics as ``poisson_fft`` (k=0 mode zeroed).

    ``precision='exact_bf16'`` runs the ten DFT matmuls as 3-term hi/lo
    bf16 splits (ops/mxu.dot3_split, ~2^-18 relative — the same grade as
    the fused kernels' exact_bf16 path) at half the MXU passes of
    'highest'."""
    nx, ny = rho.shape
    hp = jax.lax.Precision.HIGHEST

    def cs(n):
        j = jnp.arange(n, dtype=jnp.float32)
        th = (2.0 * jnp.pi / n) * jnp.outer(j, j)  # (k, x)
        return jnp.cos(th), jnp.sin(th)

    cx, sx = cs(nx)
    cy, sy = cs(ny)
    kx = 2 * jnp.pi * jnp.fft.fftfreq(nx, d=dx[0])
    ky = 2 * jnp.pi * jnp.fft.fftfreq(ny, d=dx[1])
    ksq = kx[:, None] ** 2 + ky[None, :] ** 2
    inv = jnp.where(ksq > 0, 1.0 / (eps0 * ksq), 0.0) / (nx * ny)

    if precision == "exact_bf16":
        from .mxu import dot3_split

        def mm(a, b):
            return dot3_split(a, b, (((1,), (0,)), ((), ())))
    else:
        mm = functools.partial(jnp.matmul, precision=hp)
    a_r = mm(cx, rho)                     # forward x: A = (C - iS) rho
    a_i = -mm(sx, rho)
    b_r = mm(a_r, cy.T) + mm(a_i, sy.T)   # forward y
    b_i = mm(a_i, cy.T) - mm(a_r, sy.T)
    p_r = b_r * inv
    p_i = b_i * inv
    q_r = mm(cx.T, p_r) - mm(sx.T, p_i)   # inverse x: e^{+i}
    q_i = mm(cx.T, p_i) + mm(sx.T, p_r)
    return mm(q_r, cy) - mm(q_i, sy)      # inverse y, real part


@functools.partial(jax.jit, static_argnames=("dx",))
def gradient_periodic(phi: jax.Array, dx: tuple[float, ...]) -> tuple[jax.Array, ...]:
    """Central-difference gradient with periodic wrap; E = -grad(phi)."""
    grads = []
    for axis, d in enumerate(dx):
        up = jnp.roll(phi, -1, axis=axis)
        dn = jnp.roll(phi, 1, axis=axis)
        grads.append((up - dn) / (2.0 * d))
    return tuple(grads)


@functools.partial(jax.jit, static_argnames=("max_iterations",))
def conjugate_gradient(
    a: jax.Array,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    tolerance: float = 1e-6,
    max_iterations: int = 1000,
) -> SolveResult:
    """Dense-SPD conjugate gradient under lax.while_loop (on-device stop test)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0, jnp.float32)
    r = b - a @ x
    p = r
    rs = jnp.dot(r, r)
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-30)

    def cond(carry):
        _, r, _, _, it = carry
        return jnp.logical_and(it < max_iterations,
                               jnp.linalg.norm(r) / bnorm > tolerance)

    def body(carry):
        x, r, p, rs, it = carry
        ap = a @ p
        alpha = rs / jnp.dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.dot(r, r)
        p = r + (rs_new / rs) * p
        return (x, r, p, rs_new, it + 1)

    x, r, _, _, iterations = jax.lax.while_loop(cond, body, (x, r, p, rs, jnp.int32(0)))
    rel = jnp.linalg.norm(r) / bnorm
    return SolveResult(correlation=1.0 - rel, diff=rel, iterations=iterations, result=x)


def poisson_fft_sharded(
    rho_local: jax.Array,
    full_shape: tuple[int, ...],
    dx: tuple[float, ...],
    axis_name: str,
    eps0: float = 1.0,
) -> jax.Array:
    """Distributed spectral Poisson solve for x-slab-decomposed grids.

    The SURVEY §2.6/§5 "sharded FFT (jnp.fft under pjit)" field solve,
    written for use INSIDE shard_map: ``rho_local`` is this shard's
    (nx/S, *rest) slab of the periodic grid.  Pencil algorithm:

        1. FFT along the local (non-sharded) axes;
        2. all_to_all transpose: x-slabs -> axis-1 pencils (rides ICI);
        3. FFT along x (now local);
        4. multiply by the inverse Laplacian eigenvalues of this shard's
           k-pencil (k = 0 zeroed: mean of phi is gauge);
        5. inverse transforms in reverse order.

    Requires full_shape[0] and full_shape[1] divisible by the axis size.
    Returns this shard's phi slab (real float32).
    """
    from jax import lax

    s = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    nx = full_shape[0]
    rest = full_shape[1:]
    if rest[0] % s:
        raise ValueError(f"axis-1 size {rest[0]} not divisible by {s} shards")

    rest_axes = tuple(range(1, len(full_shape)))
    rk = jnp.fft.fftn(rho_local.astype(jnp.complex64), axes=rest_axes)
    # (nx/S, n1, ...) -> (nx, n1/S, ...): split axis 1 over shards, stack x
    rk = lax.all_to_all(rk, axis_name, split_axis=1, concat_axis=0, tiled=True)
    rk = jnp.fft.fft(rk, axis=0)

    kx = 2 * jnp.pi * jnp.fft.fftfreq(nx, d=dx[0])
    k1_full = 2 * jnp.pi * jnp.fft.fftfreq(rest[0], d=dx[1])
    k1 = lax.dynamic_slice(k1_full, (me * (rest[0] // s),), (rest[0] // s,))
    ksq = kx[:, None] ** 2 + (k1 ** 2)[None, :]
    for a in range(2, len(full_shape)):
        ka = 2 * jnp.pi * jnp.fft.fftfreq(full_shape[a], d=dx[a])
        ksq = ksq[..., None] + (ka ** 2)[(None,) * a]
    inv = jnp.where(ksq > 0, 1.0 / (eps0 * ksq), 0.0)
    pk = rk * inv

    pk = jnp.fft.ifft(pk, axis=0)
    pk = lax.all_to_all(pk, axis_name, split_axis=0, concat_axis=1, tiled=True)
    phi = jnp.fft.ifftn(pk, axes=rest_axes).real
    return phi.astype(jnp.float32)
