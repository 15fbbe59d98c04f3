#!/bin/bash
# Round-5 TPU batch 4: the FULL train.py recipe at flagship dims
# (--synthetic_flagship) — VERDICT "missing #2": the last "does the whole
# product run" box. Production config: B2 x accum4, remat, chunked loss.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
while ! grep -q BATCH3_DONE /tmp/r5_batch3.log 2>/dev/null; do sleep 30; done
# synthetic corpus (the test_train_cli fixture shape, 30 s clips)
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
rc=$?
echo "--- rc=$rc ---"
tail -5 /tmp/flagship_train_run/metrics.jsonl 2>/dev/null
echo BATCH4_DONE
