#!/bin/bash
# Round-3 follow-up queue: runs after bench_round3_queue.sh finishes.
# Sweep rationale (PERFORMANCE.md "fused ES kernel floor analysis"):
# window widths lane/sublane-pad to multiples of 8, so margin 8 at
# tile 16 (window exactly 32) costs the same kernel time as margin 6
# (window 28 -> pad 32) while tripling the safe resort cadence; the
# resort amortizes to ~3 ms at cadence 32.  Logs: /tmp/bench_round3c.log.
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo

echo "$(date) waiting for the round-3 queue to finish..."
while ! grep -q "ALL DONE ROUND3B" /tmp/bench_round3.log 2>/dev/null; do
  sleep 60
done
echo "$(date) waiting for axon relay on 127.0.0.1:8083..."
while ! timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8083" 2>/dev/null; do
  sleep 60
done

run() {
  echo "===== $(date) $* ====="
  timeout 1800 python -u "$@" 2>&1 | tail -25
}

# RNG microbench: threefry vs rbg uniforms at the pusher's shapes
run examples/bench_rng.py

# repair-phase attribution at the equilibrium sizing
run examples/profile_repair.py

# ES cadence/margin sweep (resort mode): margin 8 pads free
run examples/bench_es_fused.py --skip-xla --precision highest --tile 16 --margin 8 --resort 32
run examples/bench_es_fused.py --skip-xla --precision exact_bf16 --tile 16 --margin 8 --resort 32
run examples/bench_es_fused.py --skip-xla --precision highest --tile 16 --margin 8 --resort 24
run examples/bench_es_fused.py --skip-xla --precision highest --tile 16 --margin 6 --resort 24
run examples/bench_es_fused.py --skip-xla --precision highest --tile 32 --margin 8 --resort 32
run examples/bench_es_fused.py --skip-xla --precision exact_bf16 --tile 32 --margin 8 --resort 32
run examples/bench_es_fused.py --skip-xla --precision highest --tile 8 --margin 8 --resort 32

# EM: exact_bf16 small-tile variants
run examples/bench_em_fused.py --backends fused --precision exact_bf16 --tile 16 --margin 8 --resort 24
run examples/bench_em_fused.py --backends fused --precision exact_bf16 --tile 16 --margin 4 --resort 12
run examples/bench_em_fused.py --backends fused --precision highest --tile 16 --margin 8 --resort 24

echo "===== ALL DONE ROUND3C ====="
