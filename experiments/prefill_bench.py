"""Prefill (2014-token multimodal-sized) latency: bf16 vs int8 vs int4
weights — measures the int4 M-large matmul path that decode serving also
uses for its prefill (NEXT r3 #3's unmeasured half; TTFT story).

    nohup python -u experiments/prefill_bench.py [B ...] > log 2>&1 &

2-layer truncation of the flagship config (per-layer ratios are what
matter; same convention as decode_packed_bench). Loop iterations feed the
argmax token back into the ids so XLA cannot hoist the forward.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax'),
)

from experiments.enc_kernel_bench import timed_loop, report


def main():
    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm

    nl = int(os.environ.get("LAYERS", "2"))
    cfg = LlamaConfig.llama32_3b().replace(num_layers=nl)
    P = 2014
    iters = int(os.environ.get("ITERS", "20"))
    print(json.dumps({"backend": jax.default_backend(), "layers": nl}),
          flush=True)

    base = jax.jit(lambda k: lm.init_params(cfg, k, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )

    def quantize(kind):
        if kind == "bf16":
            return base
        if kind == "int8":
            from audio_llama_tpu.models import llama_int8 as l8

            return jax.jit(l8.quantize_llama)(base)
        from audio_llama_tpu.models import llama_int4 as l4

        return jax.jit(l4.quantize_llama_int4)(base)

    # decoder fwd FLOPs (2-layer truncation), matmuls only
    D, F = cfg.hidden_size, cfg.intermediate_size
    kvd = cfg.num_kv_heads * cfg.head_dim
    per_tok = nl * 2 * (D * D + 2 * D * kvd + D * D + 3 * D * F)

    kinds = (os.environ.get("KINDS") or "bf16,int8,int4").split(",")
    bs = [int(a) for a in (sys.argv[1:] or ["1", "16"])]
    for B in bs:
        ids0 = jax.random.randint(
            jax.random.PRNGKey(1), (B, P), 3, cfg.vocab_size - 8
        )
        for kind in kinds:
            params = quantize(kind)

            def fstep(args, params=params):
                (ids,) = args
                cache = lm.KVCache.zeros(cfg, B, P + 8, dtype=jnp.bfloat16)
                _, _, hidden = lm.llama_forward(
                    params, cfg, input_ids=ids, kv_cache=cache,
                    compute_dtype=jnp.bfloat16, assume_fresh_cache=True,
                    return_hidden=True, unembed_logits=False,
                )
                logits = lm.unembed(params, cfg, hidden[:, -1:], jnp.bfloat16)
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                ids = jnp.concatenate([ids[:, 1:], nxt[:, None]], axis=1)
                return jnp.sum(nxt).astype(jnp.float32), (ids,)

            sec = timed_loop(fstep, (ids0,), iters)
            report(f"prefill_B{B}_{kind}", sec, flops=B * P * per_tok)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
