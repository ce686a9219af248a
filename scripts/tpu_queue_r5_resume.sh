#!/bin/bash
# Resume of tpu_queue_r5.sh from stage (c1) — stages (a)/(b)/(b2) completed
# before the 07:00 axon-service outage. Launch when the service heals;
# safe to start while the original queue still waits (it will exit on
# probe exhaustion; this script's own probe gate serializes).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
W=scripts/tpu_probe_wait.sh

# wait for any prior queue processes to be gone
for pf in /tmp/r5.pid /tmp/r5b.pid /tmp/r5c.pid; do
  if [ -f "$pf" ]; then
    while kill -0 "$(cat $pf)" 2>/dev/null; do sleep 60; done
  fi
done

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
echo "=== (f1) train full_step B=1, cvjp + remat_pix off ==="
timeout 3600 env PSALM_TB_CVJP=1 PSALM_TB_REMAT_PIX=0 PSALM_TB_STAGES=full_step \
    python scripts/bench_train_breakdown.py 1 2>&1

bash $W || exit 1
echo "=== (f3) train full_step B=2, cvjp + remat_pix off ==="
timeout 3600 env PSALM_TB_CVJP=1 PSALM_TB_REMAT_PIX=0 PSALM_TB_STAGES=full_step \
    python scripts/bench_train_breakdown.py 2 2>&1

bash $W || exit 1
echo "=== (e) decode re-time (scan-difference), int8 B=4 ==="
timeout 3600 env PSALM_DECODE_BATCH=4 python scripts/bench_decode.py int8 2>&1

bash $W || exit 1
echo "=== (e2) decode re-time, int8 B=8 ==="
timeout 3600 env PSALM_DECODE_BATCH=8 python scripts/bench_decode.py int8 2>&1

bash $W || exit 1
echo "=== (g) cvjp backward attribution (partial-grad rows) ==="
timeout 3000 python scripts/bench_window_cvjp.py 2>&1

bash $W || exit 1
echo "=== decode repro run 2: int8 B=4 ==="
timeout 3600 env PSALM_DECODE_BATCH=4 python scripts/bench_decode.py int8 2>&1

bash $W || exit 1
echo "=== headline capture 2 ==="
timeout 3000 python bench.py 2>&1

echo "=== ALL DONE r5-resume ==="
