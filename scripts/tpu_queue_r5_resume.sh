#!/bin/bash
# Resume of the round-5 measurement queue — stage-table-driven with
# done-markers (/tmp/r5done_<stage>) so an outer supervisor can relaunch
# through multi-hour axon outages without re-running finished stages.
# Stages (a)/(b)/(b2) of tpu_queue_r5.sh completed before the outage.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
W=scripts/tpu_probe_wait.sh

run_stage() {  # run_stage <name> <timeout> <cmd...>
  local name=$1 to=$2; shift 2
  [ -f "/tmp/r5done_$name" ] && return 0
  bash $W || exit 1
  echo "=== ($name) $* ==="
  if timeout "$to" "$@" 2>&1; then
    touch "/tmp/r5done_$name"
  else
    echo "=== ($name) FAILED rc=$? ==="
    return 1
  fi
}

set -o pipefail

run_stage c1 3600 env PSALM_TB_STAGES=full_step \
    python scripts/bench_train_breakdown.py 1
run_stage c2 3000 python scripts/bench_swin_breakdown.py
run_stage c3 3000 env PSALM_BENCH_PIXDEC_MODE=window \
    python scripts/bench_breakdown.py
run_stage c4 3000 python bench.py
run_stage d1 3600 env PSALM_TB_STAGES=model_fwd,model_fwd_bwd,full_step \
    python scripts/bench_train_breakdown.py 2
run_stage d2 3600 env PSALM_TB_BF16=1 PSALM_TB_STAGES=full_step \
    python scripts/bench_train_breakdown.py 2
run_stage f1 3600 env PSALM_TB_CVJP=1 PSALM_TB_REMAT_PIX=0 \
    PSALM_TB_STAGES=full_step python scripts/bench_train_breakdown.py 1
run_stage f3 3600 env PSALM_TB_CVJP=1 PSALM_TB_REMAT_PIX=0 \
    PSALM_TB_STAGES=full_step python scripts/bench_train_breakdown.py 2
run_stage e1 3600 env PSALM_DECODE_BATCH=4 python scripts/bench_decode.py int8
run_stage e2 3600 env PSALM_DECODE_BATCH=8 python scripts/bench_decode.py int8
run_stage g1 3000 python scripts/bench_window_cvjp.py
run_stage e1b 3600 env PSALM_DECODE_BATCH=4 python scripts/bench_decode.py int8
run_stage c4b 3000 python bench.py

# only declare completion when every stage's done-marker exists —
# otherwise the outer supervisor must relaunch to retry failed stages
missing=0
for s in c1 c2 c3 c4 d1 d2 f1 f3 e1 e2 g1 e1b c4b; do
  [ -f "/tmp/r5done_$s" ] || { echo "stage $s incomplete"; missing=1; }
done
[ "$missing" = 0 ] && echo "=== ALL DONE r5-resume ==="
