#!/bin/bash
# Round-5 FINAL capture: all headline surfaces on shipped defaults
# (megakernel B1, auto-bb decode, int8-smoothed encode). All programs are
# cache-warm from the session's A/B arms, so this is fast and also
# pre-warms the driver's end-of-round bench.py run.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
run() {
  echo "=== $* ==="
  timeout 3000 "$@" 2>&1 | grep -E '^\{|timing|Error' | tail -4
  echo "--- rc=$? ---"
}
run python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
run python bench.py --mode decode --batch 64 --int4_weights --kv_quant --kv_bits 4 --iters 60
run python bench.py --mode decode --batch 128 --int4_weights --kv_quant --kv_bits 4 --prefill_rows 32 --iters 60
run python bench.py --iters 30
echo FINAL_DONE
