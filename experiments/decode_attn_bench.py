"""Isolated double-buffered decode-attention kernel timings (B1/B32,
bf16/int8 cache) vs the HBM cache-read floor — the B32 decode trace
(experiments/traces/decodeB32) showed the attention closed_call at ~3x the
floor; this measures the kernel without the trace harness's copy artifacts.

    nohup python -u experiments/decode_attn_bench.py > /tmp/dec_attn.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments.enc_kernel_bench import timed_loop, report


def main():
    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm
    from audio_llama_tpu.ops.decode_attention_db import (
        decode_attention_db, decode_attention_quantized_db,
    )

    # 2-layer config: the kernel reads one layer's slab; a full 28-layer
    # cache x4 variants OOM'd HBM at B32 (first run)
    cfg = LlamaConfig.llama32_3b().replace(num_layers=2)
    Hq, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    max_len = 2048
    offset = jnp.asarray(2014, jnp.int32)
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    import sys as _s
    bs = [int(a) for a in (_s.argv[1:] or ['1', '32'])]
    for B in bs:
        for quant in (False, True):
            key = jax.random.PRNGKey(0)
            cache = lm.KVCache.zeros(cfg, B, max_len, dtype=jnp.bfloat16,
                                     quantized=quant)
            ck = cache.k + (1 if quant else 0)  # [L, B, Hkv, max_len, hd]
            cv = cache.v + (1 if quant else 0)
            q = jax.random.normal(key, (B, Hq, hd), jnp.bfloat16)
            kn = jax.random.normal(key, (B, Hkv, hd), jnp.bfloat16)
            vn = jax.random.normal(key, (B, Hkv, hd), jnp.bfloat16)
            valid = jnp.ones((B, max_len), jnp.int32)
            # bytes read per call: the K+V slabs (+ scales when quantized)
            elem = 1 if quant else 2
            bytes_per = 2 * B * Hkv * max_len * hd * elem
            if quant:
                bytes_per += 2 * B * Hkv * max_len * 4

            if quant:
                ks = jnp.abs(jax.random.normal(key, (B, Hkv, max_len))) + 0.1
                vs = ks

                def fstep(a, ck=ck, cv=cv, ks=ks, vs=vs):
                    q, = a
                    kq = (kn * 64).astype(jnp.int8)
                    vq = (vn * 64).astype(jnp.int8)
                    sc = jnp.ones((B, Hkv), jnp.float32) / 64
                    o, ck2, cv2 = decode_attention_quantized_db(
                        q, kq, vq, ck, cv, ks, vs, sc, sc,
                        jnp.asarray(0, jnp.int32), offset, valid, hd ** -0.5,
                    )
                    bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(q.dtype)
                    return bump.astype(jnp.float32), (q + bump,)
            else:
                def fstep(a, ck=ck, cv=cv):
                    q, = a
                    o, ck2, cv2 = decode_attention_db(
                        q, kn, vn, ck, cv,
                        jnp.asarray(0, jnp.int32), offset, valid, hd ** -0.5,
                    )
                    bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(q.dtype)
                    return bump.astype(jnp.float32), (q + bump,)

            sec = timed_loop(fstep, (q,), 50)
            floor_ms = bytes_per / 810e9 * 1e3
            report(
                f"decode_attn_B{B}_{'int8' if quant else 'bf16'}", sec,
                elems=bytes_per,
                note=f"HBM floor {floor_ms:.3f} ms at 810 GB/s",
            )
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
