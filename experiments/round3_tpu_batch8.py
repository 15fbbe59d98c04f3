"""Round-3 TPU batch 8: trace the INT4 decode step at B1 — decide between
the two hypotheses for why end-to-end int4 decode lost to int8 (B1 170.8 vs
199.8 tok/s) while the ISOLATED kernel beat the int8 matmul 7x
(int4_native_probe): (a) VPU unpack cost, (b) per-pallas_call launch
overhead across 196 tiny kernel calls per step.

    nohup python -u experiments/round3_tpu_batch8.py > /tmp/r3b8.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def trace_decode_int4(B):
    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm
    from audio_llama_tpu.models import llama_int4 as l4

    cfg = LlamaConfig.llama32_3b()
    prefill_len = 2014
    max_len = prefill_len + 40
    params = jax.jit(
        lambda k: l4.quantize_llama_int4(
            lm.init_params(cfg, k, dtype=jnp.bfloat16)
        )
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
    tok, cache = step(params, tok, cache)
    int(jax.device_get(tok[0]))

    d = f"/root/repo/experiments/traces/decodeInt4B{B}"
    os.makedirs(d, exist_ok=True)
    jax.profiler.start_trace(d)
    for _ in range(4):
        tok, cache = step(params, tok, cache)
    int(jax.device_get(tok[0]))
    jax.profiler.stop_trace()
    print(json.dumps({"exp": f"trace_decode_int4_B{B}", "dir": d}), flush=True)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    trace_decode_int4(1)
    print(json.dumps({"done": True}), flush=True)
