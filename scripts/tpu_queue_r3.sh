#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
bash /tmp/probe_wait.sh || exit 1
echo "=== default (remat1 r8) all stages ==="
timeout 3600 python scripts/bench_train_breakdown.py 1 2>&1
bash /tmp/probe_wait.sh || exit 1
echo "=== remat1 r4 full_step ==="
timeout 3600 env PSALM_TB_RADIUS=4 PSALM_TB_STAGES=full_step python scripts/bench_train_breakdown.py 1 2>&1
bash /tmp/probe_wait.sh || exit 1
echo "=== int4 matvec shootout ==="
timeout 3000 python scripts/bench_int4_matvec.py 2>&1
bash /tmp/probe_wait.sh || exit 1
echo "=== eval per-stage breakdown (window r8) ==="
timeout 3000 env PSALM_BENCH_PIXDEC_MODE=window python scripts/bench_breakdown.py 2>&1
bash /tmp/probe_wait.sh || exit 1
echo "=== eval bench B=2 window8 ==="
timeout 3000 env PSALM_BENCH_BATCH=2 PSALM_BENCH_MODES=window8 python bench.py 2>&1
bash /tmp/probe_wait.sh || exit 1
echo "=== eval bench B=4 window8 ==="
timeout 3000 env PSALM_BENCH_BATCH=4 PSALM_BENCH_MODES=window8 python bench.py 2>&1
bash /tmp/probe_wait.sh || exit 1
echo "=== B=2 train full_step ==="
timeout 3600 env PSALM_TB_STAGES=full_step python scripts/bench_train_breakdown.py 2 2>&1
echo "=== ALL DONE ==="
