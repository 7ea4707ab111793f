"""Numerical sanitizers (SURVEY.md §5 'race detection/sanitizers').

The reference has no sanitizers (WebGL pass ordering is structurally
race-free; so is this framework's functional purity).  What remains worth
guarding is numerics: NaN/Inf escapes from division edges and f32 overflow.

* ``debug_nans()`` — context manager enabling JAX's global NaN checking
  (every jitted op re-run un-jitted on NaN to locate it).
* ``checked(fn)`` — wrap a jittable function with ``checkify`` so NaN/OOB
  errors become returned, raisable error values instead of silent garbage.
* ``assert_finite(tree)`` — host-side fast finiteness sweep of a PyTree.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    """Enable jax_debug_nans inside the scope."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn, errors=None):
    """checkify-wrap ``fn``: returns ``wrapped(*args) -> (err, out)``;
    call ``err.throw()`` to raise on NaN / division / OOB-index errors."""
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks | checkify.index_checks
    return checkify.checkify(fn, errors=errors)


def assert_finite(tree, name: str = "state") -> None:
    """Raise with the offending leaf path if any value is non-finite."""
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        # dtype check on the JAX side: ml_dtypes like bfloat16 have numpy
        # dtype kind 'V', so a numpy-kind=='f' guard would skip them
        if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact):
            continue
        finite = np.asarray(jnp.isfinite(leaf))
        if not finite.all():
            bad = int((~finite).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {bad} non-finite values")
