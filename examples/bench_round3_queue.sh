#!/bin/bash
# Round-3 bench queue: waits for the axon relay to return, then measures.
# Full unfiltered logs in /tmp/bench_round3.log.
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo

echo "$(date) waiting for axon relay on 127.0.0.1:8083..."
while ! timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8083" 2>/dev/null; do
  sleep 60
done
echo "$(date) relay is back; smoke test..."
timeout 300 python -u -c "
import jax, numpy as np, jax.numpy as jnp
print('devices', jax.devices(), flush=True)
x = jnp.ones((256, 256))
print('smoke', float(np.asarray((x @ x)[:1, :1])), flush=True)
" || { echo "smoke failed"; exit 1; }

run() {
  echo "===== $(date) $* ====="
  timeout 1500 python -u "$@" 2>&1 | tail -20
}

# priority order: the verdict-gating numbers first, in case the relay
# drops again mid-queue
run examples/bench_es_fused.py --skip-xla --precision highest --repair
run examples/bench_es_fused.py --skip-xla --precision highest --repair --eager 2
run examples/bench_es_fused.py --skip-xla --precision exact_bf16 --repair
run examples/bench_es_fused.py --skip-xla --precision exact_bf16 --repair --eager 2
run examples/bench_em_fused.py --backends fused --precision highest --repair
run examples/bench_pusher.py --backend fused --rng rbg --repair
run examples/bench_pusher.py --backend fused --rng rbg
run examples/bench_es_fused.py --skip-xla --precision highest
run examples/bench_em_fused.py --backends fused --precision highest
run examples/bench_em_fused.py --backends fused --precision exact_bf16 --repair
run examples/bench_sharded_1chip.py --model es --repair
run examples/bench_sharded_1chip.py --model es --repair --eager 2
run examples/bench_sharded_1chip.py --model em --repair
run examples/bench_sharded_1chip.py --model es
run examples/bench_sharded_1chip.py --model em
run examples/bench_es_fused.py --skip-xla --precision highest --tile 16 --margin 4 --repair
run examples/bench_es_fused.py --skip-xla --precision highest --tile 16 --margin 4 --repair --eager 2
run examples/bench_es_fused.py --skip-xla --precision highest --tile 8 --margin 4 --repair
run examples/bench_es_fused.py --skip-xla --precision highest --tile 8 --margin 4 --repair --eager 2
run examples/bench_es_fused.py --skip-xla --precision exact_bf16 --tile 16 --margin 4 --repair
run examples/bench_es_fused.py --skip-xla --precision exact_bf16 --tile 16 --margin 4 --repair --eager 2
run examples/bench_es_fused.py --skip-xla --precision highest --tile 16
run examples/bench_es_fused.py --skip-xla --precision highest --tile 16 --margin 4
run examples/bench_es_fused.py --skip-xla --precision highest --tile 8 --margin 4
run examples/bench_em_fused.py --backends fused --precision highest --tile 16 --margin 4 --repair
run examples/bench_em_fused.py --backends fused --precision highest --tile 16
run examples/bench_3d.py --model em --backend fused --repair --eager 1
run examples/bench_3d.py --model es --backend pallas --repair --eager 1
run examples/profile_kernels.py --which pusher
run examples/profile_kernels.py --which es2d --n 10002432
echo "===== ALL DONE ROUND3 ====="
run bench.py
echo "===== ALL DONE ROUND3B ====="
