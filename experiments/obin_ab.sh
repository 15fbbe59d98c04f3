#!/bin/bash
# End-to-end decode A/B of the int4 pack FORMAT (INT4_FMT=pair vs obin),
# same session, one v5e. obin drops 2 of the 3 per-weight-byte unpack
# shifts by matmul-ing the raw byte plane and recovering the lo output in
# the f32 epilogue (see ops/int4_matmul.py header). The round-4 i32lite
# finding (one dropped shift = +17% B1) predicts a further B1 win; the
# epilogue adds one [bm] row-sum + two accumulator FMAs per group, so
# large-M arms check the correction doesn't cost at MXU-bound batches.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
D="--mode decode --int4_weights --kv_quant --kv_bits 4"
for B in "1 " "32 " "64 " "128 --prefill_rows 32"; do
  set -- $B
  BATCH=$1; shift; EXTRA="$*"
  for FMT in pair obin; do
    echo "=== B$BATCH INT4_FMT=$FMT ==="
    INT4_FMT=$FMT python bench.py $D --batch "$BATCH" $EXTRA 2>&1 \
      | grep -v WARNING | tail -2
  done
done
echo "=== done ==="
