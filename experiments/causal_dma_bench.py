"""Benchmark the valid-chunk manual-DMA causal forward vs stock (73 TF/s
fwd at B2). fwd+bwd uses the DMA fwd + blockspec bwd.

    nohup python -u experiments/causal_dma_bench.py > /tmp/causal_dma.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments.enc_kernel_bench import timed_loop, report


def main():
    Hq, Hkv, hd, T = 24, 8, 128, 2560
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    from audio_llama_tpu.ops.causal_attention import causal_mha

    for B in (2, 8):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, T, Hq, hd), jnp.bfloat16) * 0.05
        k = jax.random.normal(key, (B, T, Hkv, hd), jnp.bfloat16) * 0.05
        v = jax.random.normal(key, (B, T, Hkv, hd), jnp.bfloat16) * 0.05
        mask = jnp.ones((B, T), jnp.int32)
        fwd_flops = 2 * 2 * B * Hq * T * T * hd // 2

        for impl, bq, ck in (("dma2", 512, 512), ("dma2", 256, 256), ("dma2", 512, 1280)):
            def fstep(a, impl=impl, bq=bq, ck=ck):
                q, k, v = a
                o = causal_mha(q, k, v, mask=mask, block_q=bq, chunk_k=ck,
                               fwd_impl=impl)
                bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
                return bump.astype(jnp.float32), (q + bump, k + bump, v + bump)

            try:
                sec = timed_loop(fstep, (q, k, v), 20)
                report(f"{impl}_fwd_B{B}_q{bq}c{ck}", sec, flops=fwd_flops,
                       note="stock fwd: 73 (B2) / 63.2 (B8) TF/s")
            except Exception as e:
                print(json.dumps({"exp": f"{impl}_fwd_B{B}_q{bq}c{ck}",
                                  "error": str(e)[:300]}), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
