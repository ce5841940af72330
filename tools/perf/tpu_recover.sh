#!/bin/bash
# One-shot TPU measurement capture, to fire the moment the axon tunnel
# revives.  Runs every pending on-TPU measurement in priority order and logs
# each to output/perf/recover/.  Safe to re-run; each step is bounded.
#
#   bash tools/perf/tpu_recover.sh [--skip-rehearsal]
#
# Order (most valuable first, in case the tunnel dies again mid-run):
#   1. bounded tunnel probe (abort early if still wedged)
#   2. Pallas 3x3 conv microbench, tile sweep over COM_TPU_CONV_TH
#   3. segment-op design-space microbench (canvas scatter candidates)
#   4. bench.py -> the headline scenes/sec JSON
#   5. multi-epoch COM rehearsal on the TPU (longest; last)
set -u
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
OUT="$REPO/output/perf/recover"
mkdir -p "$OUT"
TS=$(date +%Y%m%d_%H%M%S)
cd "$REPO"

echo "[1/5] probing tunnel..."
if ! timeout 180 python -c "import jax, jax.numpy as jnp; print(float(jax.jit(lambda x: x * 2)(jnp.ones((8, 8)))[0, 0])); print(jax.devices())"; then
  echo "tunnel still wedged; aborting (nothing written)"
  exit 1
fi
echo "tunnel UP at $TS" | tee -a "$OUT/history.log"

echo "[2/5] conv tile sweep..."
for TH in 8 16 32; do
  echo "=== COM_TPU_CONV_TH=$TH ===" >> "$OUT/conv_$TS.log"
  COM_TPU_CONV_TH=$TH timeout 900 python tools/perf/microbench_conv.py \
    >> "$OUT/conv_$TS.log" 2>&1 || echo "th=$TH FAILED" >> "$OUT/conv_$TS.log"
done
echo "=== auto th ===" >> "$OUT/conv_$TS.log"
timeout 900 python tools/perf/microbench_conv.py >> "$OUT/conv_$TS.log" 2>&1 \
  || echo "auto FAILED" >> "$OUT/conv_$TS.log"
tail -40 "$OUT/conv_$TS.log"

echo "[3/5] segment-op microbench..."
timeout 900 python tools/perf/microbench_segops.py > "$OUT/segops_$TS.log" 2>&1 \
  || echo "segops FAILED" >> "$OUT/segops_$TS.log"
tail -20 "$OUT/segops_$TS.log"

echo "[3.5/5] per-stage step breakdown..."
timeout 1800 python tools/perf/step_breakdown.py > "$OUT/breakdown_$TS.log" 2>&1 \
  || echo "breakdown FAILED" >> "$OUT/breakdown_$TS.log"
tail -12 "$OUT/breakdown_$TS.log"

echo "[4/5] bench.py..."
timeout 1800 python bench.py > "$OUT/bench_$TS.json" 2> "$OUT/bench_$TS.err" \
  || echo "bench FAILED" >> "$OUT/bench_$TS.err"
cat "$OUT/bench_$TS.json"

echo "[4.5/5] bench.py with compact canvas scatter (per-sample run cap)..."
COM_TPU_COMPACT_CANVAS=40960 timeout 1800 python bench.py \
  > "$OUT/bench_compact_$TS.json" 2> "$OUT/bench_compact_$TS.err" \
  || echo "bench compact FAILED" >> "$OUT/bench_compact_$TS.err"
cat "$OUT/bench_compact_$TS.json"

if [ "${1:-}" != "--skip-rehearsal" ]; then
  echo "[5/5] COM rehearsal on TPU..."
  timeout 5400 python tools/com_rehearsal.py --epochs 3 --device ambient \
    --output_dir "$REPO/output/com_rehearsal_tpu" \
    > "$OUT/rehearsal_$TS.log" 2>&1 || echo "rehearsal FAILED" >> "$OUT/rehearsal_$TS.log"
  tail -10 "$OUT/rehearsal_$TS.log"
fi
echo "done; artifacts in $OUT (suffix $TS)"
