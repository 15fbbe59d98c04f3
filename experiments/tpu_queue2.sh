#!/bin/bash
# Serial TPU queue: stem attribution -> production encode headline ->
# decode int8 validation -> MFU table. One process per job; retries on the
# long ones (the tunnel drops connections on 20+ min compiles sometimes).
cd /root/repo
run() {
  local tries=$1; shift
  for i in $(seq 1 $tries); do
    echo "=== $* (attempt $i) ==="
    timeout 3000 "$@" 2>&1 | grep -E '^\{|timing' | tail -6
    rc=${PIPESTATUS[0]}
    echo "--- rc=$rc ---"
    [ $rc -eq 0 ] && break
  done
}

run 1 python experiments/stem_bench.py
run 2 python bench.py --iters 30
run 2 python bench.py --mode decode --batch 16 --kv_quant --int8_weights --iters 60
run 1 python bench.py --mode decode --batch 16 --kv_quant --iters 60
run 1 python bench.py --mode decode --batch 32 --kv_quant --int8_weights --iters 60
run 1 python experiments/train_mfu_table.py
echo QUEUE_DONE
