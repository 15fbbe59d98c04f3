#!/bin/bash
# Mono-grid decode kernel A/B vs db, same session (int4 w + int4 KV).
cd /root/repo
for args in \
  "--batch 32 --decode_impl decode_mono" \
  "--batch 32 --decode_impl auto" \
  "--batch 1 --decode_impl decode_mono" \
  "--batch 1 --decode_impl auto" \
  "--batch 64 --decode_impl decode_mono" \
; do
  echo "=== decode int4w int4kv $args ==="
  timeout 1800 python bench.py --mode decode --int4_weights --kv_quant \
    --kv_bits 4 --iters 50 $args 2>&1 | tail -2
done
echo DONE
