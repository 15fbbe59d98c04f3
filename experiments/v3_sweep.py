"""Tune v3: block_q × chunk_k sweep at kernel level (cheap compiles).

    nohup python -u experiments/v3_sweep.py > /tmp/v3_sweep.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audio_llama_tpu.config import WhisperConfig
from experiments.enc_kernel_bench import timed_loop, report


def main():
    cfg = WhisperConfig.large_v3_turbo()
    B, H, hd = 8, cfg.num_heads, cfg.head_dim
    T = 1536
    key = jax.random.PRNGKey(0)
    attn_flops = 2 * 2 * B * H * T * T * hd
    qkv = jax.random.normal(key, (3, B, T, H, hd), jnp.bfloat16) * 0.05
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    from audio_llama_tpu.ops.enc_attention import enc_attention

    for bq, ck in [(512, 512), (256, 512), (512, 768), (512, 1536), (768, 512)]:
        try:
            def kstep(a, bq=bq, ck=ck):
                qkv, = a
                o = enc_attention(
                    qkv[0], qkv[1], qkv[2], valid_len=1500, scale=hd ** -0.5,
                    algo="v3", block_q=bq, chunk_k=ck,
                )
                bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
                return bump.astype(jnp.float32), (qkv + bump,)

            sec = timed_loop(kstep, (qkv,), 30)
            report(f"v3_q{bq}_c{ck}", sec, flops=attn_flops)
        except Exception as e:
            print(json.dumps({"exp": f"v3_q{bq}_c{ck}", "error": str(e)[:300]}),
                  flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
