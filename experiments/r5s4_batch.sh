#!/bin/bash
# Round-5 session-2 batch 4: fixed megakernel arm + train flight + quality
# flight retries (runs after r5s3 completes; r5s3 covers train + quality arms).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax

run() {
  local tries=$1; shift
  for i in $(seq 1 $tries); do
    echo "=== ${ENVV[*]} $* (attempt $i) ==="
    local tmplog
    tmplog=$(mktemp /tmp/r5s4.XXXXXX.log)
    timeout 3000 env "${ENVV[@]}" "$@" >"$tmplog" 2>&1
    rc=$?
    grep -E '^\{|timing|Error|error' "$tmplog" | tail -8
    if [ $rc -eq 124 ]; then
      echo "--- rc=124 (TIMEOUT) ---"
    elif [ $rc -ne 0 ]; then
      echo "--- rc=$rc; unfiltered tail follows ---"
      tail -40 "$tmplog"
    else
      echo "--- rc=0 ---"
    fi
    cp "$tmplog" /tmp/r5s4_last.log
    rm -f "$tmplog"
    [ $rc -eq 0 ] && break
  done
}

# 1. megakernel B1 A/B (same-session baseline 313.63)
ENVV=(MEGA_DECODE=1)
run 2 python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=()
echo MEGA_DONE
echo QUEUE_DONE
