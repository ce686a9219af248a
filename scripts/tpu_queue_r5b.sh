#!/bin/bash
# Round-5 queue, part B: (f) full_step with custom VJP + pixel-decoder
# remat OFF (the cvjp saves only op inputs, so the encoder recompute is
# pure overhead), B=1 and B=2; (g) the cvjp backward per-input attribution
# rows added after queue r5 launched.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
W=scripts/tpu_probe_wait.sh

if [ -f /tmp/r5.pid ]; then
  while kill -0 "$(cat /tmp/r5.pid)" 2>/dev/null; do sleep 60; done
fi

bash $W || exit 1
echo "=== (f1) train full_step B=1, cvjp + remat_pix off ==="
timeout 3600 env PSALM_TB_CVJP=1 PSALM_TB_REMAT_PIX=0 PSALM_TB_STAGES=full_step \
    python scripts/bench_train_breakdown.py 1 2>&1

bash $W || exit 1
echo "=== (f2) train fwd/bwd isolated, cvjp + remat_pix off ==="
timeout 3600 env PSALM_TB_CVJP=1 PSALM_TB_REMAT_PIX=0 \
    PSALM_TB_STAGES=model_fwd,model_fwd_bwd \
    python scripts/bench_train_breakdown.py 1 2>&1

bash $W || exit 1
echo "=== (f3) train full_step B=2, cvjp + remat_pix off ==="
timeout 3600 env PSALM_TB_CVJP=1 PSALM_TB_REMAT_PIX=0 PSALM_TB_STAGES=full_step \
    python scripts/bench_train_breakdown.py 2 2>&1

bash $W || exit 1
echo "=== (g) cvjp backward attribution (partial-grad rows) ==="
timeout 3000 python scripts/bench_window_cvjp.py 2>&1

echo "=== ALL DONE r5b ==="
