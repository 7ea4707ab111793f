"""Step-level A/B of the K-packed gather at the headline ES rung:
bench_es_10m (t32 m8 r16 c16384 tiers (1024,4096)) with
precision='exact_bf16' vs 'exact_bf16_pack', plus an optional kernel-only
margin-6 reference point for reconciling probe_kernel_floor's margin-8
numbers against PERFORMANCE.md's margin-6 kernel budget.

PYTHONPATH=/root/repo:$PYTHONPATH python examples/probe_pack_step.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ES_MARGIN, ES_RESORT, ES_SPILL_CAPACITY, ES_SPILL_TIERS, \
    _setup_cache, bench_es_10m  # noqa: E402


def main():
    _setup_cache()
    precs = sys.argv[1:] or ("exact_bf16", "exact_bf16_pack")
    for prec in precs:
        # "PRECISION+dft" also switches the dense-DFT solve to exact_bf16
        prec, _, solver = prec.partition("+")
        out = bench_es_10m(backend="pallas", precision=prec,
                           margin=ES_MARGIN, resort=ES_RESORT,
                           spill_capacity=ES_SPILL_CAPACITY,
                           spill_tiers=ES_SPILL_TIERS,
                           solver_precision="exact_bf16" if solver
                           else "highest")
        ms = 1e3 / out["value"] if out.get("value") else float("nan")
        print(f"{prec}: {ms:.2f} ms/step  {json.dumps(out)}", flush=True)


if __name__ == "__main__":
    main()
