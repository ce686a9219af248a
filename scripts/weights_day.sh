#!/bin/bash
# Weights-day runbook (ROADMAP.md): run the moment the released PSALM
# checkpoint (HF EnmingZhang/PSALM) is available locally.
#
# Usage: scripts/weights_day.sh <hf_checkpoint_dir> <coco_root> \
#            [refcoco_json] [out_dir]
#
# Steps: convert -> checkpoint-golden module tensors -> PQ vs official GT
# -> referring cIoU -> offset-radius telemetry -> fp32-island audit ->
# decode re-bench.
#
# CI knobs (the synthetic end-to-end test, tests/test_weights_day.py):
#   WD_CONFIG_JSON   psalm_tpu config JSON forwarded to the converter
#   WD_LIMIT         --limit N on the eval CLIs (0 = full dataset)
#   WD_MAX_LEN       --model_max_length on the eval CLIs (pad length)
#   WD_SKIP_GOLDENS  1 = skip the golden-test-suite step
set -euo pipefail
HF_DIR=${1:?hf checkpoint dir}
COCO=${2:?coco root}
REFER_JSON=${3:-}
OUT=${4:-/tmp/psalm_weights_day}
WD_LIMIT=${WD_LIMIT:-0}
WD_MAX_LEN=${WD_MAX_LEN:-2048}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

echo "== 1. convert the released checkpoint to orbax =="
python -m psalm_tpu.checkpoint.convert --torch_dir "$HF_DIR" \
  --out "$OUT/orbax" ${WD_CONFIG_JSON:+--config_json "$WD_CONFIG_JSON"}

if [ "${WD_SKIP_GOLDENS:-0}" != "1" ]; then
  echo "== 2. checkpoint-golden module tensors (real weights) =="
  echo "   point the module goldens at the released state dict: in"
  echo "   tests/test_golden_reference.py each module golden builds the"
  echo "   reference module with random init — load the corresponding"
  echo "   released sd subtree (ref.load_state_dict) before convert_*()"
  echo "   and re-run: python -m pytest tests/test_golden_reference.py -q"
  # WD_GOLDEN_ARGS narrows the run for CI-style invocations (e.g. '-k
  # msdeform'); weights day runs the full suite (empty default).
  python -m pytest tests/test_golden_reference.py -q ${WD_GOLDEN_ARGS:-}
  echo "WD_GOLDENS_OK"
fi

echo "== 3. panoptic PQ vs the official GT scoring path =="
python -m psalm_tpu.eval.panoptic_segmentation \
  --model_path "$OUT/orbax" --json_path "$COCO" --limit "$WD_LIMIT" \
  --model_max_length "$WD_MAX_LEN" \
  --output_dir "$OUT/pq" 2>&1 | tee "$OUT/pq.log"
echo "   compare to the reference GPU/CPU run: bar is +-0.2 PQ"

if [ -n "$REFER_JSON" ]; then
  echo "== 4. referring cIoU (RefCOCO val) =="
  python -m psalm_tpu.eval.referring_segmentation \
    --model_path "$OUT/orbax" --json_path "$REFER_JSON" \
    --image_folder "$COCO/val2017" --limit "$WD_LIMIT" \
    --model_max_length "$WD_MAX_LEN" \
    --output_dir "$OUT/refer" 2>&1 | tee "$OUT/refer.log"
  echo "   bar is +-0.2 cIoU"
else
  echo "== 4. referring cIoU: SKIPPED (no refcoco_json argument) =="
fi

echo "== 5. offset-radius telemetry =="
grep -h "window-mode check" "$OUT"/*.log || true
echo "   confirm the auto-raise radius has clamp rate <= 1e-3;"
echo "   record the radius in BASELINE.md (r8 is the init-safe bound)"

echo "== 6. fp32-island audit =="
echo "   re-run step 3 with --compute_dtype float32 and diff PQ;"
echo "   if >0.1 PQ, widen the f32 islands before publishing bf16 numbers"

echo "== 7. serving + train re-bench with real weights =="
echo "   PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_decode.py"
echo "   PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_breakdown.py 1"
echo "WEIGHTS_DAY_OK"
