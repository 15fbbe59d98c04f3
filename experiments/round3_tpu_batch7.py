"""Round-3 TPU batch 7: trace the DECODE step (int8 weights + int8 KV) at
B1 and B32 — attribution for the next decode lever (B1 runs at ~616 GB/s
effective weight stream vs ~810 peak; where do the other 25% go?).

    nohup python -u experiments/round3_tpu_batch7.py > /tmp/r3b7.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def trace_decode(B):
    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm
    from audio_llama_tpu.models import llama_int8 as l8

    cfg = LlamaConfig.llama32_3b()
    prefill_len = 2014
    max_len = prefill_len + 40
    params = jax.jit(
        lambda k: l8.quantize_llama(lm.init_params(cfg, k, dtype=jnp.bfloat16))
    )(jax.random.PRNGKey(0))
    ids = jax.random.randint(
        jax.random.PRNGKey(1), (B, prefill_len), 3, cfg.vocab_size - 8
    )

    @jax.jit
    def prefill(params, ids):
        cache = lm.KVCache.zeros(
            cfg, B, max_len, dtype=jnp.bfloat16, quantized=True
        )
        _, cache, hidden = lm.llama_forward(
            params, cfg, input_ids=ids, kv_cache=cache,
            compute_dtype=jnp.bfloat16, assume_fresh_cache=True,
            return_hidden=True, unembed_logits=False,
        )
        logits = lm.unembed(params, cfg, hidden[:, -1:, :])
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

    @jax.jit
    def step(params, tok, cache):
        logits, cache = lm.llama_forward(
            params, cfg, input_ids=tok[:, None], kv_cache=cache,
            compute_dtype=jnp.bfloat16,
        )
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

    tok, cache = prefill(params, ids)
    tok, cache = step(params, tok, cache)  # compile + warm
    int(jax.device_get(tok[0]))

    d = f"/root/repo/experiments/traces/decodeB{B}"
    os.makedirs(d, exist_ok=True)
    jax.profiler.start_trace(d)
    for _ in range(4):
        tok, cache = step(params, tok, cache)
    int(jax.device_get(tok[0]))  # sync inside the trace
    jax.profiler.stop_trace()
    print(json.dumps({"exp": f"trace_decode_B{B}", "dir": d,
                      "tok0": int(jax.device_get(tok[0]))}), flush=True)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for b in (1, 32):
        trace_decode(b)
    print(json.dumps({"done": True}), flush=True)
