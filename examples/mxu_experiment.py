"""Mosaic MXU contraction-depth experiment.

The fused ES kernel's gather matmul contracts K = wr_pad (48 at tile 32,
32 at tile 16) as the LHS's LANE axis — and the tile sweep measured the
SAME step time at tile 32/16/8, suggesting the MXU pass depth is set by
the PADDED lane width (128), not the logical K.  This times bare Pallas
matmuls at K in {24, 32, 48, 96, 128} in both operand orders to confirm
(and to check whether a sublane-contracted form dodges the padding).

PYTHONPATH=/root/repo:$PYTHONPATH python examples/mxu_experiment.py
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=7):
    out = fn(*args)
    np.asarray(out.reshape(-1)[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.reshape(-1)[:1])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def make_bench(m, k, p, n_g, nsteps, order, precision):
    """One grid step runs n_g matmuls of (m,k)x(k,p) (order='lhs_k_lanes')
    or the dims-swapped contraction (order='lhs_k_sublanes')."""

    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((1, p), jnp.float32)
        for g in range(n_g):
            a = a_ref[0, g]
            b = b_ref[0, g]
            if order == "lhs_k_lanes":
                # (m, k) x (k, p): k = lhs lanes (pads to 128), rhs sublanes
                t = jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())), precision=precision,
                    preferred_element_type=jnp.float32)
            else:
                # contract the SUBLANE axis of both: (k, m) x (k, p)
                t = jax.lax.dot_general(
                    a, b, (((0,), (0,)), ((), ())), precision=precision,
                    preferred_element_type=jnp.float32)
            acc = acc + jnp.sum(t, axis=0, keepdims=True)
        o_ref[0] = acc

    a_shape = (m, k) if order == "lhs_k_lanes" else (k, m)
    a = jnp.asarray(np.random.default_rng(0).standard_normal(
        (nsteps, n_g, *a_shape)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(
        (nsteps, n_g, k, p)), jnp.float32)

    spec_a = pl.BlockSpec((1, n_g, *a_shape), lambda s: (s, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((1, n_g, k, p), lambda s: (s, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, 1, p), lambda s: (s, 0, 0),
                          memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(kernel),
        grid=(nsteps,),
        in_specs=[spec_a, spec_b],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((nsteps, 1, p), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    return jax.jit(lambda a, b: call(a, b)), a, b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=1024)
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--n-g", type=int, default=32)
    ap.add_argument("--nsteps", type=int, default=305)  # ~10M rows worth
    args = ap.parse_args()
    total = args.nsteps * args.n_g * args.p
    print(f"dev={jax.devices()[0]}  m={args.m} p={args.p} "
          f"blocks={args.nsteps * args.n_g} (~{total / 1e6:.1f}M rows)")
    for order in ("lhs_k_lanes", "lhs_k_sublanes"):
        for prec in ("default", "highest"):
            for k in (24, 32, 48, 96, 128):
                try:
                    fn, a, b = make_bench(args.m, k, args.p, args.n_g,
                                          args.nsteps, order, prec)
                    t = timeit(fn, a, b)
                    print(f"{order:16s} {prec:8s} K={k:3d}: "
                          f"{1e3 * t:7.2f} ms ({total / t / 1e9:.2f}G rows/s)")
                except Exception as e:  # noqa: BLE001
                    print(f"{order:16s} {prec:8s} K={k:3d}: "
                          f"FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
