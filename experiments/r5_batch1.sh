#!/bin/bash
# Round-5 TPU batch 1: v3q finish-or-cut A/B (VERDICT #2) + B1 K-split
# pipeline arms (VERDICT #3, INT4_BK). Anchors from r5_anchor.sh this
# session: encode 2108.1, B1 313.0, B64 4531.1, B128 4837.1.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
run() {
  local tries=$1; shift
  for i in $(seq 1 $tries); do
    echo "=== $* (attempt $i) ==="
    local tmplog
    tmplog=$(mktemp /tmp/r5_batch1.XXXXXX.log)
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

ENVV=()
# v3q int8 encoder attention vs the v3 default (encode default int8-smoothed)
run 2 python bench.py --enc_algo v3q --iters 30
# B1 K-split arms (new compile each; baseline 313.0 this session)
ENVV=(INT4_BK=768)
run 2 python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=(INT4_BK=1536)
run 2 python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=()
echo BATCH1_DONE
