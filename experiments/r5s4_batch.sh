#!/bin/bash
# Round-5 session-2 batch 4: fixed megakernel arm + train flight + quality
# flight retries (runs after r5s3 completes; r5s3 covers train + quality arms).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax

RUNTMO=3000
run() {
  local tries=$1; shift
  for i in $(seq 1 $tries); do
    echo "=== ${ENVV[*]} $* (attempt $i) ==="
    local tmplog
    tmplog=$(mktemp /tmp/r5s4.XXXXXX.log)
    timeout $RUNTMO env "${ENVV[@]}" "$@" >"$tmplog" 2>&1
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

# 1. megakernel B1 A/B (same-session baseline 313.63); the compile
#    service is degraded this session — give the fat pallas program room
RUNTMO=5400
ENVV=(MEGA_DECODE=1)
run 3 python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=()
echo MEGA_DONE
RUNTMO=3000

# 2. B128 MONO_BB tail: 4838.7 (bb1) -> 5010.1 (bb2) -> 5074.6 (bb4) ->
#    5619.4 (bb8, +16%) — not converged, push bb16/bb32
ENVV=(MONO_BB=16)
run 2 python bench.py --mode decode --batch 128 --int4_weights --kv_quant --kv_bits 4 --prefill_rows 32 --iters 60
ENVV=(MONO_BB=32)
run 2 python bench.py --mode decode --batch 128 --int4_weights --kv_quant --kv_bits 4 --prefill_rows 32 --iters 60
ENVV=(MONO_BB=16)
run 2 python bench.py --mode decode --batch 64 --int4_weights --kv_quant --kv_bits 4 --iters 60
ENVV=()
echo SWEEP2_DONE

# 3. train flight WITH REMAT (s2/s3 runs OOM'd: 19.9G vs 15.75G HBM — the
#    scan saved all 28 layers' MLP activations; the production recipe is
#    B2 x accum4 + remat)
echo "=== train.py --synthetic_flagship --remat (full log /tmp/train_flagship.log) ==="
timeout 6000 python -u -m audio_llama_tpu.training.train \
  --synthetic_flagship --tokenizer byte --remat \
  --data_path /tmp/flagship_corpus/examples.json \
  --audio_dir /tmp/flagship_corpus/audio \
  --output_dir /tmp/flagship_train_run \
  --batch_size 2 --eval_batch_size 2 --grad_accum_steps 4 \
  --num_epochs 1 --max_steps 3 \
  --log_steps 1 --eval_steps 2 --save_steps 100 --warmup_steps 1 \
  --num_workers 2 --no_tensorboard --text_max_length 128 \
  > /tmp/train_flagship.log 2>&1
echo "--- train rc=$? ---"
tail -3 /tmp/train_flagship.log
tail -5 /tmp/flagship_train_run/metrics.jsonl 2>/dev/null
echo TRAIN_DONE

# 4. quality flight with SPLIT encoder compiles (the fused ref+int8
#    program dropped the tunnel transport on 4 straight attempts)
for i in 1 2 3; do
  echo "=== flagship_quality_flight split-compile (retry loop $i) ==="
  timeout 6000 python -u experiments/flagship_quality_flight.py --skip ckpt e2e_audio && break
  echo "--- flight rc=$?; retrying ---"
done
echo QUEUE_DONE
