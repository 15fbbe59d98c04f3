#!/bin/bash
# Round-5 int4 unpack sweep, part 2: i32lite at every batch (the unpack is
# per-weight-byte, so the +17% B1 win should carry), block-size arm on top,
# and the fp-arm retry with full logs (part 1 swallowed its traceback).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
export INT4_UNPACK=i32lite
D="--mode decode --int4_weights --kv_quant --kv_bits 4"
echo "=== i32lite B32 ==="
python bench.py $D --batch 32 2>&1 | grep -v WARNING | tail -2
echo "=== i32lite B64 ==="
python bench.py $D --batch 64 2>&1 | grep -v WARNING | tail -2
echo "=== i32lite B128 (prefill_rows 32) ==="
python bench.py $D --batch 128 --prefill_rows 32 2>&1 | grep -v WARNING | tail -2
echo "=== i32lite B1 MLP4_CHUNK=1024 ==="
MLP4_CHUNK=1024 python bench.py $D --batch 1 2>&1 | grep -v WARNING | tail -2
echo "=== fp retry B1 (full log) ==="
INT4_UNPACK=fp python bench.py $D --batch 1 2>&1 | grep -v WARNING | tail -40
echo "=== done ==="
