#!/bin/bash
# Round-4 queue, part E: isolated train stages (the backend wedge is
# process-local, so one stage per invocation), the Swin bias-fix A/B, and
# the new headline with h2 + the Swin fix wired.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
W=scripts/tpu_probe_wait.sh

bash $W || exit 1
echo "=== train B=1 full_step (isolated) ==="
timeout 3600 env PSALM_TB_STAGES=full_step python scripts/bench_train_breakdown.py 1 2>&1

bash $W || exit 1
echo "=== train B=1 train_rate (isolated) ==="
timeout 3600 env PSALM_TB_STAGES=train_rate python scripts/bench_train_breakdown.py 1 2>&1

bash $W || exit 1
echo "=== swin breakdown (post bias-fix) ==="
timeout 3000 python scripts/bench_swin_breakdown.py 2>&1

bash $W || exit 1
echo "=== eval per-stage breakdown (swin fix + h2) ==="
timeout 3000 env PSALM_BENCH_PIXDEC_MODE=window python scripts/bench_breakdown.py 2>&1

bash $W || exit 1
echo "=== full bench (new headline: h2 + swin bias fix) ==="
timeout 3000 python bench.py 2>&1

echo "=== ALL DONE r4e ==="
