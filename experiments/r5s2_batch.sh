#!/bin/bash
# Round-5 session-2 TPU chain (fresh box, cold compile cache):
#   A. same-session decode anchors + INT4_BK B1 arms (VERDICT #3, after the
#      Mosaic sublane fix c1931e6) + MONO_BB B64/B128 arms (VERDICT #4)
#   B. encode anchor (also warms the driver's bench.py cache)
#   C. flagship-dims quality flight (VERDICT #6)
#   D. full train.py --synthetic_flagship recipe flight (VERDICT missing #2)
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
mkdir -p /root/.cache/jax

run() {
  local tries=$1; shift
  for i in $(seq 1 $tries); do
    echo "=== ${ENVV[*]} $* (attempt $i) ==="
    local tmplog
    tmplog=$(mktemp /tmp/r5s2.XXXXXX.log)
    timeout 3000 env "${ENVV[@]}" "$@" >"$tmplog" 2>&1
    rc=$?
    grep -E '^\{|timing|Error|error' "$tmplog" | tail -8
    if [ $rc -eq 124 ]; then
      echo "--- rc=124 (TIMEOUT after 3000s — likely mid-compile; cache lets a retry resume) ---"
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

# --- A. decode anchors + kernel arms ---
ENVV=()
run 2 python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=(INT4_BK=768)
run 2 python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=(INT4_BK=1536)
run 2 python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=()
run 2 python bench.py --mode decode --batch 64 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=(MONO_BB=2)
run 2 python bench.py --mode decode --batch 64 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=(MONO_BB=4)
run 2 python bench.py --mode decode --batch 64 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=()
run 2 python bench.py --mode decode --batch 128 --int4_weights --kv_quant --kv_bits 4 --prefill_rows 32 --iters 60
ENVV=(MONO_BB=2)
run 2 python bench.py --mode decode --batch 128 --int4_weights --kv_quant --kv_bits 4 --prefill_rows 32 --iters 60
ENVV=()
echo PHASE_A_DONE

# --- B. encode anchor (driver metric; warms the cache the driver reuses) ---
run 2 python bench.py --iters 30
echo PHASE_B_DONE

# --- C. flagship-dims quality flight ---
echo "=== flagship_quality_flight (attempt 1) ==="
timeout 6000 python -u experiments/flagship_quality_flight.py
rc=$?
if [ $rc -ne 0 ]; then
  echo "--- rc=$rc; retrying once (cache resumes finished compiles) ---"
  timeout 6000 python -u experiments/flagship_quality_flight.py
fi
echo PHASE_C_DONE

# --- D. full train.py recipe at flagship dims ---
python - <<'PYEOF'
import json, os
import numpy as np
from audio_llama_tpu.data.audio_io import write_wav
root = "/tmp/flagship_corpus"
os.makedirs(root + "/audio", exist_ok=True)
rng = np.random.RandomState(0)
entries = []
for i in range(16):
    rel = f"clip_{i}.wav"
    wav = (rng.randn(16000 * 30) * 0.05).astype(np.float32)
    write_wav(f"{root}/audio/{rel}", wav, 16000)
    entries.append({"text": f"Transcribe clip {i}: <audio>",
                    "audio_paths": rel,
                    "response": f"this is clip number {i} " * 4})
open(root + "/examples.json", "w").write(json.dumps(entries))
print("corpus ready")
PYEOF
echo "=== train.py --synthetic_flagship flight ==="
timeout 6000 python -u -m audio_llama_tpu.training.train \
  --synthetic_flagship --tokenizer byte \
  --data_path /tmp/flagship_corpus/examples.json \
  --audio_dir /tmp/flagship_corpus/audio \
  --output_dir /tmp/flagship_train_run \
  --batch_size 2 --eval_batch_size 2 --grad_accum_steps 4 \
  --num_epochs 1 --max_steps 3 \
  --log_steps 1 --eval_steps 2 --save_steps 100 --warmup_steps 1 \
  --num_workers 2 --no_tensorboard --text_max_length 128 2>&1 | tail -30
echo "--- train rc=$? ---"
tail -5 /tmp/flagship_train_run/metrics.jsonl 2>/dev/null
echo PHASE_D_DONE
echo QUEUE_DONE
