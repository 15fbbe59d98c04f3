#!/bin/bash
# Round-5 TPU batch 5: INT4_BK K-split B1 arms (re-run after the Mosaic
# sublane-rule fix: scale blocks now ride a [L, nk, bkg, N] view).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
while ! grep -q BATCH4_DONE /tmp/r5_batch4.log 2>/dev/null; do sleep 30; done
run() {
  local tries=$1; shift
  for i in $(seq 1 $tries); do
    echo "=== ${ENVV[*]} $* (attempt $i) ==="
    local tmplog
    tmplog=$(mktemp /tmp/r5_batch5.XXXXXX.log)
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
run 2 python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=(INT4_BK=768)
run 2 python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=(INT4_BK=1536)
run 2 python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=()
echo BATCH5_DONE
