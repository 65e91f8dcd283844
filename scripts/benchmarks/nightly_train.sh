#!/usr/bin/env bash
# Nightly benchmark pipeline (reference scripts/benchmarks/nightly_train.sh):
# train a tracking policy for a short budget, evaluate 1024 trials, measure
# throughput, and leave JSON artifacts for the dashboard.
set -euo pipefail

OUT=${1:-nightly_out/$(date +%Y-%m-%d)}
mkdir -p "$OUT"

python -m mjlab_tpu.scripts.train Mjlab-Tracking-Flat-Unitree-G1 \
    --max-iterations "${NIGHTLY_ITERS:-2000}" \
    --log-dir "$OUT/train"

CKPT=$(ls -v "$OUT"/train/model_*.ckpt | tail -1)

python -m mjlab_tpu.tasks.tracking.scripts.evaluate \
    Mjlab-Tracking-Flat-Unitree-G1 \
    --checkpoint-file "$CKPT" \
    --num-envs 1024 \
    --output-file "$OUT/eval_metrics.json"

python scripts/benchmarks/measure_throughput.py \
    --output-dir "$OUT"

echo "nightly artifacts in $OUT"
