#!/bin/bash
# obin round 3: CLEAN large-batch A/B — the ab1/ab2 B64/B128 arms ran
# concurrent with CPU pytest on this 1-core host (the documented
# measurement-pollution mode, BASELINE.md late-r3 knob sweep note), so
# pair-vs-obin at large batch is re-measured here back-to-back on an idle
# host. All programs are compile-cached from ab1/ab2. Also: the QuaRot
# sandwich cost arm (--rotate) at B1/B64.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
D="--mode decode --int4_weights --kv_quant --kv_bits 4"
for ARM in "pair 64" "obin 64" "pair 128 --prefill_rows 32" "obin 128 --prefill_rows 32" "pair 1" "obin 1"; do
  set -- $ARM
  FMT=$1; BATCH=$2; shift 2; EXTRA="$*"
  echo "=== B$BATCH $FMT ==="
  INT4_FMT=$FMT python bench.py $D --batch "$BATCH" $EXTRA 2>&1 \
    | grep -v WARNING | tail -2
done
echo "=== rotate cost arms ==="
for B in 1 64; do
  echo "=== B$B obin+rotate ==="
  INT4_FMT=obin python bench.py $D --batch "$B" --rotate 2>&1 \
    | grep -v WARNING | tail -2
done
echo "=== done ==="
