"""Trace the mono-kernel decode step (int4 w + int4 KV) at large batch:
after the mono-grid win (B64 3131 tok/s = ~20.4 ms/step) the memory floor
is ~6.6 ms (1.5 GB weights + 3.8 GB cache at 810 GB/s) — attribute the
remaining 14 ms.

    nohup python -u experiments/trace_decode_mono.py [B] > log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def trace(B):
    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm
    from audio_llama_tpu.models import llama_int4 as l4

    cfg = LlamaConfig.llama32_3b()
    prefill_len = 2014
    max_len = prefill_len + 58
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
            cfg, B, max_len, dtype=jnp.bfloat16, quantized=4
        )
        _, cache, hidden = lm.llama_forward(
            params, cfg, input_ids=ids, kv_cache=cache,
            compute_dtype=jnp.bfloat16, assume_fresh_cache=True,
            return_hidden=True, unembed_logits=False,
        )
        logits = lm.unembed(params, cfg, hidden[:, -1:, :])
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

    # donate the cache: B64 cache ~3.8 GB — two live copies + profiler
    # buffers would pressure HBM (r3b5 lesson)
    @jax.jit
    def step(params, tok, cache):
        logits, cache = lm.llama_forward(
            params, cfg, input_ids=tok[:, None], kv_cache=cache,
            compute_dtype=jnp.bfloat16,
        )
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

    step = jax.jit(step, donate_argnums=(2,))

    tok, cache = prefill(params, ids)
    tok, cache = step(params, tok, cache)
    int(jax.device_get(tok[0]))

    d = f"/root/repo/experiments/traces/decodeMonoB{B}"
    os.makedirs(d, exist_ok=True)
    jax.profiler.start_trace(d)
    for _ in range(4):
        tok, cache = step(params, tok, cache)
    int(jax.device_get(tok[0]))
    jax.profiler.stop_trace()
    print(json.dumps({"exp": f"trace_decode_mono_B{B}", "dir": d}), flush=True)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    trace(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
    print(json.dumps({"done": True}), flush=True)
