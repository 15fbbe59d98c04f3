#!/bin/bash
# Round-5 TPU batch 3: flagship-dims quality flight (VERDICT #6).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
while ! grep -q BATCH2_DONE /tmp/r5_batch2.log 2>/dev/null; do sleep 30; done
echo "=== flagship_quality_flight (attempt 1) ==="
timeout 6000 python -u experiments/flagship_quality_flight.py
rc=$?
if [ $rc -ne 0 ]; then
  echo "--- rc=$rc; retrying once (cache resumes finished compiles) ---"
  timeout 6000 python -u experiments/flagship_quality_flight.py
fi
echo BATCH3_DONE
