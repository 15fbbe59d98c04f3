#!/bin/bash
# Round-5 TPU batch 2: MONO_BB (batch rows per program) decode arms.
# Session anchors: B64 4531.1, B128 4837.1 (r5_anchor.sh).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
# wait for batch 1 to release the chip
while ! grep -q BATCH1_DONE /tmp/r5_batch1.log 2>/dev/null; do sleep 30; done
run() {
  local tries=$1; shift
  for i in $(seq 1 $tries); do
    echo "=== ${ENVV[*]} $* (attempt $i) ==="
    local tmplog
    tmplog=$(mktemp /tmp/r5_batch2.XXXXXX.log)
    timeout 3000 env "${ENVV[@]}" "$@" >"$tmplog" 2>&1
    rc=$?
    grep -E '^\{|timing|Error|error' "$tmplog" | tail -8
    if [ $rc -eq 124 ]; then
      echo "--- rc=124 (TIMEOUT) ---"
    elif [ $rc -ne 0 ]; then
      echo "--- rc=$rc; unfiltered tail follows ---"
      tail -20 "$tmplog"
    else
      echo "--- rc=0 ---"
    fi
    rm -f "$tmplog"
    [ $rc -eq 0 ] && break
  done
}
# fresh same-session B64 re-anchor on the committed code (bb=1 default)
ENVV=()
run 2 python bench.py --mode decode --batch 64 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=(MONO_BB=2)
run 2 python bench.py --mode decode --batch 64 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=(MONO_BB=4)
run 2 python bench.py --mode decode --batch 64 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=(MONO_BB=2)
run 2 python bench.py --mode decode --batch 128 --int4_weights --kv_quant --kv_bits 4 --prefill_rows 32 --iters 60
ENVV=()
echo BATCH2_DONE
