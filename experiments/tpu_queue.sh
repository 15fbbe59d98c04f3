#!/bin/bash
# Serial TPU measurement queue (one job at a time through the tunnel).
cd /root/repo
run() {
  echo "=== $* ==="
  timeout 2700 "$@" 2>&1 | grep -E '^\{|^\[.*timing' | tail -4
  echo "--- rc=$? ---"
}

# decode: int8 weights validation (VERDICT item 3 target: >=1500 tok/s @B16)
run python bench.py --mode decode --batch 16 --kv_quant --int8_weights --iters 60
run python bench.py --mode decode --batch 16 --kv_quant --iters 60
run python bench.py --mode decode --batch 32 --kv_quant --int8_weights --iters 60

# train MFU table (VERDICT item 8)
run python experiments/train_mfu_table.py

echo QUEUE_DONE
