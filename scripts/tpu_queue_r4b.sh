#!/bin/bash
# Round-4 queue, part B: everything after the variant shootout (rerun with
# the optimization-barrier scan timer — the perturbation-based one let XLA
# hoist stages whose perturbed leaf was dead).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
W=scripts/tpu_probe_wait.sh

bash $W || exit 1
echo "=== eval per-stage breakdown (window r8, barrier scan-timed) ==="
timeout 3000 env PSALM_BENCH_PIXDEC_MODE=window python scripts/bench_breakdown.py 2>&1

bash $W || exit 1
echo "=== train breakdown B=1 (all stages + train_rate) ==="
timeout 3600 python scripts/bench_train_breakdown.py 1 2>&1

bash $W || exit 1
echo "=== train B=2 full_step+train_rate ==="
timeout 3600 env PSALM_TB_STAGES=full_step,train_rate python scripts/bench_train_breakdown.py 2 2>&1

bash $W || exit 1
echo "=== train B=4 train_rate ==="
timeout 3600 env PSALM_TB_STAGES=train_rate python scripts/bench_train_breakdown.py 4 2>&1

bash $W || exit 1
echo "=== eval bench B=2 (new headline method) ==="
timeout 3000 env PSALM_BENCH_BATCH=2 PSALM_BENCH_MODES=window8 python bench.py 2>&1

bash $W || exit 1
echo "=== eval bench B=4 (new headline method) ==="
timeout 3000 env PSALM_BENCH_BATCH=4 PSALM_BENCH_MODES=window8 python bench.py 2>&1

bash $W || exit 1
echo "=== window variant sweep round 2 (legacy head_chunk/tile) ==="
timeout 3600 python scripts/bench_window_variants.py 2>&1

bash $W || exit 1
echo "=== batched decode aggregate tok/s (int8, B=4) ==="
timeout 3000 env PSALM_DECODE_BATCH=4 python scripts/bench_decode.py int8 2>&1

bash $W || exit 1
echo "=== batched decode aggregate tok/s (int8, B=8) ==="
timeout 3000 env PSALM_DECODE_BATCH=8 python scripts/bench_decode.py int8 2>&1

echo "=== ALL DONE r4b ==="
