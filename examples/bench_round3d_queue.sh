#!/bin/bash
# Round-3 queue part 3: re-measure the sharded nd=1 compositions after the
# gathered-DFT solve change, plus the single-chip EM kernel standalone.
# Logs: /tmp/bench_round3d.log.
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo

echo "$(date) waiting for the round-3c queue to finish..."
while ! grep -q "ALL DONE ROUND3C" /tmp/bench_round3c.log 2>/dev/null; do
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

# nd=1 overhead check after the gathered-DFT sharded solve
run examples/bench_sharded_1chip.py --model es
run examples/bench_sharded_1chip.py --model em
# single-chip EM fused-kernel standalone (compare against the model step)
run examples/profile_kernels.py --which em2d --n 10002432

echo "===== ALL DONE ROUND3D ====="
run examples/profile_pusher.py
echo "===== ALL DONE ROUND3D2 ====="
run examples/bench_em_fused.py --backends fused --precision exact_bf16 --tile 16 --margin 8 --repair
run examples/bench_em_fused.py --backends fused --precision exact_bf16 --tile 16 --margin 6 --repair
echo "===== ALL DONE ROUND3D3 ====="
run examples/profile_es_step.py --tile 32 --margin 6
run examples/profile_es_step.py --tile 16 --margin 6
echo "===== ALL DONE ROUND3D4 ====="
run examples/mxu_experiment.py
echo "===== ALL DONE ROUND3D5 ====="
run examples/bench_es_fused.py --skip-xla --precision highest --tile 32 --margin 7 --resort 24 --spill-capacity 32768
run examples/bench_es_fused.py --skip-xla --precision exact_bf16 --tile 32 --margin 7 --resort 24 --spill-capacity 32768
run examples/bench_em_fused.py --backends fused --precision exact_bf16 --tile 16 --margin 7 --repair
echo "===== ALL DONE ROUND3D6 ====="
run examples/profile_es_step.py --tile 32 --margin 6 --precision exact_bf16
echo "===== ALL DONE ROUND3D7 ====="
