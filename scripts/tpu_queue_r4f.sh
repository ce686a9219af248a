#!/bin/bash
# Round-4 queue, part F: per-point clamp radii (attempt #5, VERDICT r3 #3a).
# 1. per-op shootout: flat r8/r4 vs per-point (2,4,6,8) / (1,2,3,4),
#    fwd (scan h2, the eval default) and fwd+bwd (einsum h1, the train
#    default)
# 2. full-pipeline A/B: bench.py windowpp mode vs window8
# 3. train full_step with per-point radii
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
W=scripts/tpu_probe_wait.sh

bash $W || exit 1
echo "=== window variants: per-point radii shootout ==="
timeout 3000 python scripts/bench_window_variants.py 2>&1

bash $W || exit 1
echo "=== full pipeline: windowpp(2,4,6,8) vs window8 ==="
timeout 3000 env PSALM_BENCH_MODES=windowpp,window8 python bench.py 2>&1

bash $W || exit 1
echo "=== train full_step B=1, per-point radii (2,4,6,8) ==="
timeout 3600 env PSALM_TB_POINT_RADII=2,4,6,8 PSALM_TB_STAGES=full_step \
    python scripts/bench_train_breakdown.py 1 2>&1

echo "=== ALL DONE r4f ==="
