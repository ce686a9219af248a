#!/bin/bash
# Round-5 queue, part C: reproducibility passes (VERDICT r4 #5 done-bar:
# decode table reproducible across two runs within ~10%) + a second
# headline capture for the round record.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
W=scripts/tpu_probe_wait.sh

if [ -f /tmp/r5b.pid ]; then
  while kill -0 "$(cat /tmp/r5b.pid)" 2>/dev/null; do sleep 60; done
fi

bash $W || exit 1
echo "=== decode repro run 2: int8 B=4 ==="
timeout 3600 env PSALM_DECODE_BATCH=4 python scripts/bench_decode.py int8 2>&1

bash $W || exit 1
echo "=== decode repro run 2: int8 B=8 ==="
timeout 3600 env PSALM_DECODE_BATCH=8 python scripts/bench_decode.py int8 2>&1

bash $W || exit 1
echo "=== headline capture 2 ==="
timeout 3000 python bench.py 2>&1

echo "=== ALL DONE r5c ==="
