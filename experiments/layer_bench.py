"""Single-encoder-LAYER benchmark per attention algo (the scan body IS the
layer, so layer time × 32 + stem/mel ≈ encode time; full-encode programs
take 30+ min to compile through the tunnel, a single layer takes ~5).

    nohup python -u experiments/layer_bench.py > /tmp/layer_bench.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys

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

    cfg = WhisperConfig.large_v3_turbo()
    B, H, hd = 8, cfg.num_heads, cfg.head_dim
    D, F = cfg.d_model, cfg.ffn_dim
    T = 1536
    print(json.dumps({"dims": dict(B=B, T=T, H=H, hd=hd),
                      "backend": jax.default_backend()}), flush=True)
    key = jax.random.PRNGKey(0)
    attn_flops = 2 * 2 * B * H * T * T * hd
    layer_flops = attn_flops + 2 * 4 * B * T * D * D + 2 * 2 * B * T * D * F

    kp = jax.random.split(key, 8)
    w = {
        "ln1_s": jnp.ones((D,), jnp.bfloat16), "ln1_b": jnp.zeros((D,), jnp.bfloat16),
        "ln2_s": jnp.ones((D,), jnp.bfloat16), "ln2_b": jnp.zeros((D,), jnp.bfloat16),
        "wq": jax.random.normal(kp[0], (D, D), jnp.bfloat16) * 0.02,
        "wk": jax.random.normal(kp[1], (D, D), jnp.bfloat16) * 0.02,
        "wv": jax.random.normal(kp[2], (D, D), jnp.bfloat16) * 0.02,
        "wo": jax.random.normal(kp[3], (D, D), jnp.bfloat16) * 0.02,
        "w1": jax.random.normal(kp[4], (D, F), jnp.bfloat16) * 0.02,
        "w2": jax.random.normal(kp[5], (F, D), jnp.bfloat16) * 0.02,
    }
    x = jax.random.normal(key, (B, T, D), jnp.bfloat16) * 0.05

    def layer(x, attn_fn, ln_fn):
        h = ln_fn(x, w["ln1_s"], w["ln1_b"])
        q = (h @ w["wq"]).reshape(B, T, H, hd)
        k = (h @ w["wk"]).reshape(B, T, H, hd)
        v = (h @ w["wv"]).reshape(B, T, H, hd)
        a = attn_fn(q, k, v).reshape(B, T, D)
        x = x + a @ w["wo"]
        h = ln_fn(x, w["ln2_s"], w["ln2_b"])
        h = jax.nn.gelu(h @ w["w1"], approximate=True)
        return x + h @ w["w2"]

    from audio_llama_tpu.ops.enc_attention import enc_attention
    from audio_llama_tpu.ops.flash_attention import flash_mha
    from audio_llama_tpu.ops.ln_pallas import layer_norm_pallas
    from audio_llama_tpu.ops.norms import layer_norm

    def ln_xla(x, s, b):
        return layer_norm(x, s, b, 1e-5)

    def ln_pl(x, s, b):
        return layer_norm_pallas(x, s, b, 1e-5)

    ids = jnp.concatenate(
        [jnp.ones((B, 1500), jnp.int32), jnp.zeros((B, T - 1500), jnp.int32)],
        axis=1,
    )
    cases = {
        "layer_flash_lnxla": (
            lambda q, k, v: flash_mha(q, k, v, mask=ids, causal=False,
                                      scale=hd ** -0.5), ln_xla),
        "layer_twopass_lnpl": (
            lambda q, k, v: enc_attention(q, k, v, valid_len=1500,
                                          scale=hd ** -0.5, algo="twopass",
                                          block_q=1536), ln_pl),
        "layer_v3_lnpl": (
            lambda q, k, v: enc_attention(q, k, v, valid_len=1500,
                                          scale=hd ** -0.5, algo="v3"), ln_pl),
        "layer_bounded_lnpl": (
            lambda q, k, v: enc_attention(q, k, v, valid_len=1500,
                                          scale=hd ** -0.5, algo="bounded",
                                          block_q=1536), ln_pl),
    }
    for name, (attn_fn, ln_fn) in cases.items():
        if only and name not in only:
            continue
        try:
            def lstep(a, attn_fn=attn_fn, ln_fn=ln_fn):
                x, = a
                o = layer(x, attn_fn, ln_fn)
                bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
                return bump.astype(jnp.float32), (x + bump,)

            sec = timed_loop(lstep, (x,), args.iters)
            report(name, sec, flops=layer_flops,
                   note=f"est encode audio-s/s={round(B * 30 / (sec * 32 + 0.012), 1)}")
        except Exception as e:
            print(json.dumps({"exp": name, "error": str(e)[:300]}), flush=True)

    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
