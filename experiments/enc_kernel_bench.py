"""Benchmark the two-pass encoder attention kernel vs stock flash on TPU,
plus VPU transcendental rates (exp f32/bf16) that bound any softmax kernel.

    nohup python -u experiments/enc_kernel_bench.py > /tmp/enc_kernel.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audio_llama_tpu.config import WhisperConfig


def timed_loop(fn, args_tuple, iters=30, warmup=2):
    @jax.jit
    def loop(args_tuple, n):
        def body(_, carry):
            acc, args_tuple = carry
            out, args_tuple = fn(args_tuple)
            return (acc + out, args_tuple)

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), args_tuple))
        return acc

    float(loop(args_tuple, warmup))
    n_small = max(1, iters // 10)
    t0 = time.perf_counter()
    float(loop(args_tuple, n_small))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(args_tuple, iters))
    d2 = time.perf_counter() - t0
    return max(d2 - d1, 1e-9) / (iters - n_small)


def report(name, sec, flops=None, elems=None, note=""):
    line = {"exp": name, "ms": round(sec * 1e3, 3)}
    if flops:
        line["tf_per_s"] = round(flops / sec / 1e12, 1)
    if elems:
        line["gelem_per_s"] = round(elems / sec / 1e9, 1)
    if note:
        line["note"] = note
    print(json.dumps(line), flush=True)


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
    print(json.dumps({"dims": dict(B=B, T=T, H=H, hd=hd), "backend": jax.default_backend()}),
          flush=True)
    key = jax.random.PRNGKey(0)
    attn_flops = 2 * 2 * B * H * T * T * hd

    # ---- VPU exp rates on score-sized data (per-layer exp load = B*H*T*T) --
    n_exp = B * 4 * T * T  # 1/5 of a layer's exp load per iteration
    for name, dt in (("exp_f32", jnp.float32), ("exp_bf16", jnp.bfloat16)):
        if not want(name):
            continue
        x = (jax.random.normal(key, (B * 4, T, T), jnp.float32) * 0.1).astype(dt)

        def estep(a, dt=dt):
            x, = a
            y = jnp.exp(-jnp.abs(x))
            bump = (jnp.mean(y.astype(jnp.float32)) * 1e-3).astype(dt)
            return bump.astype(jnp.float32), (x + bump,)

        sec = timed_loop(estep, (x,), args.iters)
        report(name, sec, elems=n_exp)

    # ---- kernels from the framework layout [B, T, H, hd] -------------------
    qkv = jax.random.normal(key, (3, B, T, H, hd), jnp.bfloat16) * 0.05

    if want("enc_kernel"):
        from audio_llama_tpu.ops.enc_attention import enc_attention

        variants = [
            ("enc_kernel_f32exp_q512", dict(exp_dtype=jnp.float32, block_q=512)),
            ("enc_kernel_bf16exp_q512", dict(exp_dtype=jnp.bfloat16, block_q=512)),
            ("enc_kernel_f32exp_q256", dict(exp_dtype=jnp.float32, block_q=256)),
            ("enc_kernel_bf16exp_q1536", dict(exp_dtype=jnp.bfloat16, block_q=1536)),
        ]
        for name, kw in variants:
            def kstep(a, kw=kw):
                qkv, = a
                o = enc_attention(
                    qkv[0], qkv[1], qkv[2], valid_len=1500, scale=hd ** -0.5, **kw
                )
                bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
                return bump.astype(jnp.float32), (qkv + bump,)

            sec = timed_loop(kstep, (qkv,), args.iters)
            report(name, sec, flops=attn_flops, note="incl layout transposes")

    if want("flash_wrapper"):
        from audio_llama_tpu.ops.flash_attention import flash_mha

        ids = jnp.concatenate(
            [jnp.ones((B, 1500), jnp.int32), jnp.zeros((B, T - 1500), jnp.int32)], axis=1
        )

        def fstep(a):
            qkv, = a
            o = flash_mha(qkv[0], qkv[1], qkv[2], mask=ids, causal=False,
                          scale=hd ** -0.5)
            bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
            return bump.astype(jnp.float32), (qkv + bump,)

        sec = timed_loop(fstep, (qkv,), args.iters)
        report("flash_wrapper_segids", sec, flops=attn_flops,
               note="stock kernel incl transposes+segids (round-1 production)")

    # ---- full encoder at flagship dims: auto (new kernel) vs flash ---------
    if want("encode_full"):
        from audio_llama_tpu.models import whisper as wm

        wcfg = cfg.replace(gelu_approx=True)
        params = jax.jit(
            lambda k: wm.init_params(wcfg, k, dtype=jnp.bfloat16)
        )(key)
        mel = jax.random.normal(key, (B, wcfg.num_mel_bins, 3000), jnp.float32) * 0.1
        enc_flops = L * (attn_flops + 2 * 4 * B * T * D * D + 2 * 2 * B * T * D * F)

        for name, impl in (("encode_enc_kernel", "enc_kernel"),
                           ("encode_flash", "flash")):
            def estep(a, impl=impl):
                mel, = a
                o = wm.encode(params, wcfg, mel, jnp.bfloat16, attn_impl=impl)
                bump = jnp.mean(o.astype(jnp.float32)) * 1e-6
                return bump.astype(jnp.float32), (mel + bump.astype(mel.dtype),)

            sec = timed_loop(estep, (mel,), max(args.iters // 3, 4))
            report(name, sec, flops=enc_flops,
                   note=f"audio-sec/s={round(B * 30 / sec, 1)}")

    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
