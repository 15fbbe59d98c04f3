#!/bin/bash
# One process per encode variant (a transport drop wedges the client, so
# never share a process across long compiles); one retry each.
cd /root/repo
for v in encode_twopass encode_v3 encode_v2; do
  for attempt in 1 2; do
    echo "=== $v attempt $attempt ==="
    timeout 2400 python -u experiments/enc_kernel_bench2.py --only $v 2>&1 \
      | grep -E '"exp"|"error"|"done"'
    if [ ${PIPESTATUS[0]} -eq 0 ]; then break; fi
  done
done
echo ALL_DONE
