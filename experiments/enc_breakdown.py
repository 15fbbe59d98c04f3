"""Encoder time breakdown at flagship dims (whisper-large-v3-turbo).

Round-1 measured the encoder at ~105 TF/s effective vs a ~175 TF/s matmul
ceiling (BASELINE.md). This script attributes the gap: stock flash kernel
efficiency, layout transposes, segment-id masking, and the non-attention
remainder — so the hd-64 kernel work (VERDICT item 2) targets the real
bottleneck instead of a guess.

Timing methodology matches bench.py: on-device fori_loop with a data
dependency between iterations, scalar fetch to synchronize, small/large
loop-length subtraction to cancel the tunnel's fixed dispatch latency.

Run on TPU (background):
    nohup python -u experiments/enc_breakdown.py > /tmp/enc_breakdown.log 2>&1 &
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
from audio_llama_tpu.models import whisper as whisper_mod
from audio_llama_tpu.ops.norms import layer_norm


def timed_loop(fn, args_tuple, iters=20, warmup=2):
    """Return seconds per iteration of fn chained on-device."""

    @jax.jit
    def loop(args_tuple, n):
        def body(_, carry):
            out_scalar, args_tuple = carry
            out, args_tuple = fn(args_tuple)
            return (out_scalar + out, args_tuple)

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


def report(name, sec, flops=None, note=""):
    tf = (flops / sec / 1e12) if flops else None
    line = {"exp": name, "ms": round(sec * 1e3, 3)}
    if tf is not None:
        line["tf_per_s"] = round(tf, 1)
    if note:
        line["note"] = note
    print(json.dumps(line), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny dims on CPU")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--only", type=str, default="",
        help="comma-separated experiment names to run (default: all)",
    )
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    def want(name):
        return not only or name in only

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        B, T, H, hd, L, F = 2, 128, 4, 16, 2, 256
        D = H * hd
        cfg = WhisperConfig.tiny()
    else:
        cfg = WhisperConfig.large_v3_turbo()
        B, H, hd, L = 8, cfg.num_heads, cfg.head_dim, cfg.num_layers
        D, F = cfg.d_model, cfg.ffn_dim
        T = 1536  # padded encoder seq

    print(json.dumps({"dims": dict(B=B, T=T, H=H, hd=hd, L=L, D=D, F=F),
                      "backend": jax.default_backend()}), flush=True)
    key = jax.random.PRNGKey(0)

    # ---------------- per-layer building blocks -----------------------------
    attn_flops_layer = 2 * 2 * B * H * T * T * hd  # QK^T + PV
    proj_flops_layer = 2 * 4 * B * T * D * D       # q,k,v,out projections
    mlp_flops_layer = 2 * 2 * B * T * D * F

    x = jax.random.normal(key, (B, T, D), jnp.bfloat16) * 0.02
    qkv = jax.random.normal(key, (3, B, T, H, hd), jnp.bfloat16) * 0.02
    qkv_t = jnp.swapaxes(qkv, 2, 3)  # [3, B, H, T, hd] kernel layout

    use_tpu = not args.smoke

    # 1. stock flash kernel only, pre-transposed, no segment ids
    if use_tpu and want("flash_kernel"):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention as _flash,
        )

        def mk_flash(block_q, block_k, seg=False):
            bs = BlockSizes(
                block_q=block_q, block_k_major=block_k, block_k=block_k,
                block_b=1, block_q_major_dkv=block_q, block_k_major_dkv=block_k,
                block_k_dkv=block_k, block_q_dkv=block_q,
                block_k_major_dq=block_k, block_k_dq=block_k, block_q_dq=block_q,
            )
            ids = jnp.concatenate(
                [jnp.ones((B, 1500), jnp.int32), jnp.zeros((B, T - 1500), jnp.int32)],
                axis=1,
            )

            def step(a):
                (qkv_t,) = a
                o = _flash(
                    qkv_t[0], qkv_t[1], qkv_t[2],
                    segment_ids=SegmentIds(q=ids, kv=ids) if seg else None,
                    causal=False, sm_scale=hd ** -0.5, block_sizes=bs,
                )
                bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
                return bump.astype(jnp.float32), (qkv_t + bump,)

            return step

        for bq, bk in [(512, 512), (256, 512), (512, 1536), (1536, 512), (256, 1536)]:
            sec = timed_loop(mk_flash(bq, bk), (qkv_t,), args.iters)
            report(f"flash_kernel_q{bq}_k{bk}", sec, attn_flops_layer)
        sec = timed_loop(mk_flash(512, 512, seg=True), (qkv_t,), args.iters)
        report("flash_kernel_q512_k512_segids", sec, attn_flops_layer,
               "with padding segment ids (production config)")

    # 2. XLA attention at same dims (materialized logits)
    if want("xla_attn"):
        from audio_llama_tpu.ops.attention import mha

        def xla_step(a):
            (qkv,) = a
            o = mha(qkv[0], qkv[1], qkv[2], bias=None, scale=hd ** -0.5)
            bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
            return bump.astype(jnp.float32), (qkv + bump,)

        sec = timed_loop(xla_step, (qkv,), args.iters)
        report("xla_attn", sec, attn_flops_layer)

    # 3. layout transposes alone (4 per layer: q,k,v in + out back)
    if want("transposes"):
        def tr_step(a):
            (qkv,) = a
            t0 = jnp.swapaxes(qkv[0], 1, 2)
            t1 = jnp.swapaxes(qkv[1], 1, 2)
            t2 = jnp.swapaxes(qkv[2], 1, 2)
            o = jnp.swapaxes(t0 + t1 + t2, 1, 2)
            bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
            return bump.astype(jnp.float32), (qkv + bump,)

        sec = timed_loop(tr_step, (qkv,), args.iters)
        report("transposes_4x", sec, note="4 [B,T,H,hd]<->[B,H,T,hd] relayouts")

    # 4. projection + MLP matmuls alone at exact shapes (achievable ceiling)
    if want("matmuls"):
        wq = jax.random.normal(key, (4, D, D), jnp.bfloat16) * 0.02
        w1 = jax.random.normal(key, (D, F), jnp.bfloat16) * 0.02
        w2 = jax.random.normal(key, (F, D), jnp.bfloat16) * 0.02

        def mm_step(a):
            x, = a
            h = x
            for i in range(4):
                h = h @ wq[i]
            h2 = (x @ w1) @ w2
            o = h + h2
            bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
            return bump.astype(jnp.float32), (x + bump,)

        sec = timed_loop(mm_step, (x,), args.iters)
        report("proj_mlp_matmuls", sec, proj_flops_layer + mlp_flops_layer)

    # 5. layernorm chain (2 per layer)
    if want("layernorm"):
        sc = jnp.ones((D,), jnp.bfloat16)
        b_ = jnp.zeros((D,), jnp.bfloat16)

        def ln_step(a):
            x, = a
            h = layer_norm(x, sc, b_, 1e-5)
            h = layer_norm(h, sc, b_, 1e-5)
            bump = (jnp.mean(h.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
            return bump.astype(jnp.float32), (x + bump,)

        sec = timed_loop(ln_step, (x,), args.iters)
        report("layernorm_2x", sec)

    # 6. full encoder layer WITHOUT attention (identity attention) — the
    # non-attention floor, including LN/GELU/residual/scan overheads.
    if want("layer_noattn") or want("layer_full"):
        wcfg = cfg if args.smoke else WhisperConfig.large_v3_turbo().replace(
            gelu_approx=True
        )
        params = jax.jit(
            lambda k: whisper_mod.init_params(wcfg, k, dtype=jnp.bfloat16)
        )(key)
        lyr = params["layers"]

        def layer_body(x, i, attn_kind):
            p = jax.tree_util.tree_map(lambda a: a[i], lyr)
            h = layer_norm(x, p["attn_ln"]["scale"], p["attn_ln"]["bias"], 1e-5)
            q = h @ p["q_proj"]["w"] + p["q_proj"]["b"]
            k_ = h @ p["k_proj"]["w"]
            v = h @ p["v_proj"]["w"] + p["v_proj"]["b"]
            if attn_kind == "none":
                attn = (q + k_ + v) / 3.0  # keep q/k/v live, skip attention
            else:
                from audio_llama_tpu.ops import flash_attention as fa

                attn = fa.flash_mha(
                    q.reshape(B, T, H, hd), k_.reshape(B, T, H, hd),
                    v.reshape(B, T, H, hd), mask=None, causal=False,
                    scale=hd ** -0.5,
                ).reshape(B, T, D)
            attn = attn @ p["out_proj"]["w"] + p["out_proj"]["b"]
            x = x + attn
            h = layer_norm(x, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"], 1e-5)
            h = jax.nn.gelu(h @ p["fc1"]["w"] + p["fc1"]["b"], approximate=True)
            x = x + (h @ p["fc2"]["w"] + p["fc2"]["b"])
            return x

        for kind in ("none",) + (("flash",) if use_tpu else ()):
            name = f"layer_{'noattn' if kind == 'none' else 'full_flash'}"
            if not want(name) and only:
                continue

            def lstep(a, kind=kind):
                x, = a
                o = layer_body(x, 0, kind)
                bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
                return bump.astype(jnp.float32), (x + bump,)

            sec = timed_loop(lstep, (x,), args.iters)
            fl = proj_flops_layer + mlp_flops_layer + (
                attn_flops_layer if kind == "flash" else 0
            )
            report(name, sec, fl)

    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
