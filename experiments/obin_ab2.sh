#!/bin/bash
# obin round 2: the M-dependent strategy (epilogue at bm<=OBIN_EPI_M,
# direct and/sub/shr unpack above) should hold the +45% B1 and close the
# -6.3% B64 gap to pair. B1 confirm should hit the compile cache.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
export INT4_FMT=obin
D="--mode decode --int4_weights --kv_quant --kv_bits 4"
echo "=== B64 obin direct ===";  python bench.py $D --batch 64 2>&1 | grep -v WARNING | tail -2
echo "=== B128 obin direct ==="; python bench.py $D --batch 128 --prefill_rows 32 2>&1 | grep -v WARNING | tail -2
echo "=== B1 obin confirm ===";  python bench.py $D --batch 1 2>&1 | grep -v WARNING | tail -2
echo "=== done ==="
