#!/bin/bash
# Round-4 queue, part D: clean relaunch of part C's remaining stages.
# (Part C's file was edited while its bash was mid-read — bash reads
# scripts incrementally, so the running instance was killed after its
# first stage and the remainder runs from this untouched file.)
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
W=scripts/tpu_probe_wait.sh

bash $W || exit 1
echo "=== window variant sweep round 3 (scan_unroll) ==="
timeout 3600 python scripts/bench_window_variants.py 2>&1

bash $W || exit 1
echo "=== train B=2 train_rate (frozen-as-arg fix) ==="
timeout 3600 env PSALM_TB_STAGES=train_rate python scripts/bench_train_breakdown.py 2 2>&1

bash $W || exit 1
echo "=== train B=4 full_step + train_rate ==="
timeout 3600 env PSALM_TB_STAGES=full_step,train_rate python scripts/bench_train_breakdown.py 4 2>&1

bash $W || exit 1
echo "=== Phi breakdown at the realistic eval bucket (S=768) ==="
timeout 3000 env PSALM_PHI_SEQ=768 python scripts/bench_phi_breakdown.py 2>&1

bash $W || exit 1
echo "=== Phi breakdown at S=1350 (the round-3 measurement point) ==="
timeout 3000 env PSALM_PHI_SEQ=1350 python scripts/bench_phi_breakdown.py 2>&1

bash $W || exit 1
echo "=== window-telemetry overhead ==="
timeout 3000 python scripts/bench_telemetry.py 2>&1

echo "=== ALL DONE r4d ==="
