"""Head-packed chunked decode-attention kernel (ops/decode_attention_packed)
vs the double-buffered baseline, isolated, vs the HBM cache-read floor.

    nohup python -u experiments/decode_packed_bench.py [B ...] > log 2>&1 &

Env knobs: CHUNKS=512,1024 QUANTS=0,1 DB=1 (also time the db baseline).
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
    from audio_llama_tpu.ops.decode_attention_packed import (
        decode_attention_packed, decode_attention_quantized_packed,
    )

    cfg = LlamaConfig.llama32_3b().replace(num_layers=2)
    Hq, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    max_len = 2048
    offset = jnp.asarray(2014, jnp.int32)
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    bs = [int(a) for a in (sys.argv[1:] or ["1", "32"])]
    chunks = [int(c) for c in os.environ.get("CHUNKS", "512,2048").split(",")]
    quants = [bool(int(x)) for x in os.environ.get("QUANTS", "0,1").split(",")]
    time_db = bool(int(os.environ.get("DB", "0")))
    depths = [int(d) for d in os.environ.get("DEPTHS", "4").split(",")]

    for B in bs:
        for quant in quants:
            key = jax.random.PRNGKey(0)
            cache = lm.KVCache.zeros(cfg, B, max_len, dtype=jnp.bfloat16,
                                     quantized=quant)
            ck = cache.k + (1 if quant else 0)
            cv = cache.v + (1 if quant else 0)
            q = jax.random.normal(key, (B, Hq, hd), jnp.bfloat16)
            kn = jax.random.normal(key, (B, Hkv, hd), jnp.bfloat16)
            vn = jax.random.normal(key, (B, Hkv, hd), jnp.bfloat16)
            valid = jnp.ones((B, max_len), jnp.int32)
            elem = 1 if quant else 2
            bytes_per = 2 * B * Hkv * max_len * hd * elem
            if quant:
                bytes_per += 2 * B * Hkv * max_len * 4
            floor_ms = bytes_per / 810e9 * 1e3

            def make_step(fn, **kw):
                if quant:
                    ks = jnp.abs(jax.random.normal(
                        key, (B, Hkv, max_len))) + 0.1
                    vs = ks
                    kq = (kn * 64).astype(jnp.int8)
                    vq = (vn * 64).astype(jnp.int8)
                    sc = jnp.ones((B, Hkv), jnp.float32) / 64

                    def fstep(a):
                        qq, = a
                        o, _, _ = fn(
                            qq, kq, vq, ck, cv, ks, vs, sc, sc,
                            jnp.asarray(0, jnp.int32), offset, valid,
                            hd ** -0.5, **kw,
                        )
                        bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6
                                ).astype(qq.dtype)
                        return bump.astype(jnp.float32), (qq + bump,)
                else:
                    def fstep(a):
                        qq, = a
                        o, _, _ = fn(
                            qq, kn, vn, ck, cv,
                            jnp.asarray(0, jnp.int32), offset, valid,
                            hd ** -0.5, **kw,
                        )
                        bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6
                                ).astype(qq.dtype)
                        return bump.astype(jnp.float32), (qq + bump,)
                return fstep

            tag = "int8" if quant else "bf16"
            # sub-0.1ms calls through the tunnel need long chains: scale
            # iters so each timed leg is >= ~50 ms of device work
            iters = max(50, int(400 / max(B, 1)))
            if time_db:
                fn = decode_attention_quantized_db if quant \
                    else decode_attention_db
                sec = timed_loop(make_step(fn), (q,), iters)
                report(f"db_B{B}_{tag}", sec, elems=bytes_per,
                       note=f"floor {floor_ms:.3f} ms")
            for chv in chunks:
                for dv in depths:
                    fn = decode_attention_quantized_packed if quant \
                        else decode_attention_packed
                    sec = timed_loop(
                        make_step(fn, chunk=chv, depth=dv), (q,), iters
                    )
                    report(f"packed_B{B}_{tag}_c{chv}_d{dv}", sec,
                           elems=bytes_per, note=f"floor {floor_ms:.3f} ms")
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
