#!/bin/bash
# Round-5 queue: (a) manual-VJP window-core shootout (VERDICT r4 #2),
# (b) train full_step with the custom VJP, (c) the r4e stages that never
# ran (train isolated stages, Swin Toeplitz A/B breakdown, new headline),
# (d) B=2 superlinearity attribution (VERDICT r4 #3), (e) decode re-time
# with the scan-difference method (VERDICT r4 #5).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
W=scripts/tpu_probe_wait.sh

# wait for a prior queue run (pid in /tmp/r4f.pid) to release the chip
if [ -f /tmp/r4f.pid ]; then
  while kill -0 "$(cat /tmp/r4f.pid)" 2>/dev/null; do sleep 60; done
fi

bash $W || exit 1
echo "=== (a) window cvjp shootout ==="
timeout 3000 python scripts/bench_window_cvjp.py 2>&1

bash $W || exit 1
echo "=== (b) train full_step B=1, custom VJP ==="
timeout 3600 env PSALM_TB_CVJP=1 PSALM_TB_STAGES=full_step \
    python scripts/bench_train_breakdown.py 1 2>&1

bash $W || exit 1
echo "=== (b2) train fwd/bwd isolated, custom VJP ==="
timeout 3600 env PSALM_TB_CVJP=1 PSALM_TB_STAGES=model_fwd,model_fwd_bwd \
    python scripts/bench_train_breakdown.py 1 2>&1

bash $W || exit 1
echo "=== (c1) train B=1 full_step baseline (r4e, AD einsum) ==="
timeout 3600 env PSALM_TB_STAGES=full_step python scripts/bench_train_breakdown.py 1 2>&1

bash $W || exit 1
echo "=== (c2) swin breakdown (post Toeplitz bias fix) ==="
timeout 3000 python scripts/bench_swin_breakdown.py 2>&1

bash $W || exit 1
echo "=== (c3) eval per-stage breakdown (swin fix + h2) ==="
timeout 3000 env PSALM_BENCH_PIXDEC_MODE=window python scripts/bench_breakdown.py 2>&1

bash $W || exit 1
echo "=== (c4) full bench (headline re-capture) ==="
timeout 3000 python bench.py 2>&1

bash $W || exit 1
echo "=== (d1) train B=2 per-stage (superlinearity attribution) ==="
timeout 3600 env PSALM_TB_STAGES=model_fwd,model_fwd_bwd,full_step \
    python scripts/bench_train_breakdown.py 2 2>&1

bash $W || exit 1
echo "=== (d2) train B=2 full_step, bf16 frozen params ==="
timeout 3600 env PSALM_TB_BF16=1 PSALM_TB_STAGES=full_step \
    python scripts/bench_train_breakdown.py 2 2>&1

bash $W || exit 1
echo "=== (e) decode re-time (scan-difference), int8 B=4 ==="
timeout 3600 env PSALM_DECODE_BATCH=4 python scripts/bench_decode.py int8 2>&1

bash $W || exit 1
echo "=== (e2) decode re-time, int8 B=8 ==="
timeout 3600 env PSALM_DECODE_BATCH=8 python scripts/bench_decode.py int8 2>&1

echo "=== ALL DONE r5 ==="
