#!/bin/bash
# End-to-end B1 decode A/B of the int4 nibble-unpack variants (INT4_UNPACK)
# — the round-5 B1 lever (NEXT #1). Isolated-kernel probes proved
# untrustworthy through the tunnel (experiments/int4_bound_probe.py measured
# >HBM-peak "bandwidths"); the decode step itself is the arbiter.
# Arms share the persistent compile cache; each env value is a new program.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
ARGS="--mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4"
for MODE in shift i32lite fp; do
  echo "=== INT4_UNPACK=$MODE ==="
  INT4_UNPACK=$MODE python bench.py $ARGS 2>&1 | grep -v WARNING | tail -3
done
echo "=== done ==="
