"""Round 2, run 3: bounded-shift (v2) and transpose-free (v3) encoder
attention variants + fused LN kernel + full-encoder numbers per algo.

    nohup python -u experiments/enc_kernel_bench2.py > /tmp/enc_kernel2.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audio_llama_tpu.config import WhisperConfig
from experiments.enc_kernel_bench import timed_loop, report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    def want(n):
        return not only or n in only

    cfg = WhisperConfig.large_v3_turbo()
    B, H, hd, L = 8, cfg.num_heads, cfg.head_dim, cfg.num_layers
    D, F = cfg.d_model, cfg.ffn_dim
    T = 1536
    print(json.dumps({"dims": dict(B=B, T=T, H=H, hd=hd),
                      "backend": jax.default_backend()}), flush=True)
    key = jax.random.PRNGKey(0)
    attn_flops = 2 * 2 * B * H * T * T * hd
    qkv = jax.random.normal(key, (3, B, T, H, hd), jnp.bfloat16) * 0.05

    from audio_llama_tpu.ops.enc_attention import enc_attention

    variants = [
        ("enc_v2_bounded_q512", dict(algo="bounded", block_q=512)),
        ("enc_v2_bounded_q1536", dict(algo="bounded", block_q=1536)),
        ("enc_v3_noTranspose_q512", dict(algo="v3", block_q=512)),
        ("enc_v3_noTranspose_q256", dict(algo="v3", block_q=256)),
    ]
    for name, kw in variants:
        if not want(name):
            continue
        try:
            def kstep(a, kw=kw):
                qkv, = a
                o = enc_attention(
                    qkv[0], qkv[1], qkv[2], valid_len=1500, scale=hd ** -0.5, **kw
                )
                bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
                return bump.astype(jnp.float32), (qkv + bump,)

            sec = timed_loop(kstep, (qkv,), args.iters)
            report(name, sec, flops=attn_flops)
        except Exception as e:
            print(json.dumps({"exp": name, "error": str(e)[:500]}), flush=True)
            traceback.print_exc()

    # fused LN kernel vs XLA layer_norm at encoder shapes
    if want("ln"):
        from audio_llama_tpu.ops.ln_pallas import layer_norm_pallas
        from audio_llama_tpu.ops.norms import layer_norm

        x = jax.random.normal(key, (B, T, D), jnp.bfloat16)
        sc = jnp.ones((D,), jnp.bfloat16)
        bi = jnp.zeros((D,), jnp.bfloat16)
        for name, fn in (("ln_pallas_2x", layer_norm_pallas), ("ln_xla_2x", layer_norm)):
            def lstep(a, fn=fn):
                x, = a
                h = fn(fn(x, sc, bi, 1e-5), sc, bi, 1e-5)
                bump = (jnp.mean(h.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
                return bump.astype(jnp.float32), (x + bump,)

            try:
                sec = timed_loop(lstep, (x,), args.iters)
                report(name, sec)
            except Exception as e:
                print(json.dumps({"exp": name, "error": str(e)[:500]}), flush=True)

    # full encoder per algo (the headline)
    if want("encode_full") or any(
        n in only for n in ("encode_v3", "encode_v2", "encode_twopass")
    ):
        from audio_llama_tpu.models import whisper as wm

        wcfg = cfg.replace(gelu_approx=True)
        params = jax.jit(
            lambda k: wm.init_params(wcfg, k, dtype=jnp.bfloat16)
        )(key)
        mel = jax.random.normal(key, (B, wcfg.num_mel_bins, 3000), jnp.float32) * 0.1
        enc_flops = L * (attn_flops + 2 * 4 * B * T * D * D + 2 * 2 * B * T * D * F)

        for name, algo in (("encode_v3", "v3"), ("encode_v2", "bounded"),
                           ("encode_twopass", "twopass")):
            if not want(name) and only:
                continue
            try:
                def estep(a, algo=algo):
                    mel, = a
                    o = wm.encode(params, wcfg, mel, jnp.bfloat16,
                                  attn_impl="enc_kernel", attn_algo=algo)
                    bump = jnp.mean(o.astype(jnp.float32)) * 1e-6
                    return bump.astype(jnp.float32), (mel + bump.astype(mel.dtype),)

                sec = timed_loop(estep, (mel,), max(args.iters // 3, 4))
                report(name, sec, flops=enc_flops,
                       note=f"audio-sec/s={round(B * 30 / sec, 1)}")
            except Exception as e:
                print(json.dumps({"exp": name, "error": str(e)[:500]}), flush=True)
                traceback.print_exc()

    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
