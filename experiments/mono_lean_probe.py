"""TPU lowering + numerics probe for the VPU-lean mono decode kernels
(analytic fresh row + window write-back + int8-domain nibble shifts).

Interpret-mode tests can't see Mosaic lowering rules (the fused-MLP
lesson), so this compiles the real kernels at small shapes on the TPU and
checks against the interpret oracle fetched to host.

    nohup python -u experiments/mono_lean_probe.py > /tmp/mono_lean_probe.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")


def probe4(per_row):
    from audio_llama_tpu.models.llama import quantize_kv_rows4
    from audio_llama_tpu.ops.decode_attention_mono import (
        decode_attention_quantized4_mono,
    )

    L, B, Hkv, S, hd = 2, 4, 8, 256, 128
    Hq = 24
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.bfloat16)
    kv_new, ks_new, vs_new = quantize_kv_rows4(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
    )
    ckv, ks, vs = quantize_kv_rows4(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
    )
    if per_row:
        offs = np.asarray([40, 200, 7, 100], np.int32)
        valid = (np.arange(S)[None, :] <= offs[:, None]).astype(np.int32)
        off = jnp.asarray(offs)
    else:
        valid = np.zeros((B, S), np.int32)
        valid[:, :101] = 1
        off = jnp.int32(100)
    # NOTE: scale must stay a static Python float — threading it through
    # jit args makes it a tracer the kernel closure captures (production
    # passes it via functools.partial at trace time).
    sc = hd ** -0.5
    args = (q, kv_new, ckv, ks[1], vs[1], ks_new, vs_new,
            jnp.int32(1), off, jnp.asarray(valid))
    ref_out, ref_ckv = decode_attention_quantized4_mono(
        *args, sc, interpret=True)
    f = jax.jit(lambda *a: decode_attention_quantized4_mono(*a, sc))
    out, ockv = f(*args)
    d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                              - ref_out.astype(jnp.float32))))
    dc = int(jnp.sum(jnp.abs(ockv.astype(jnp.int32)
                             - ref_ckv.astype(jnp.int32))))
    print(json.dumps({"probe": "int4", "per_row": per_row,
                      "max_out_delta": d, "cache_delta": dc}), flush=True)
    assert d < 0.02 and dc == 0


def probe8(per_row):
    from audio_llama_tpu.models.llama import quantize_kv_rows
    from audio_llama_tpu.ops.decode_attention_mono import (
        decode_attention_quantized_mono,
    )

    L, B, Hkv, S, hd = 2, 4, 8, 256, 128
    Hq = 24
    rng = np.random.RandomState(8)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.bfloat16)
    k_new, ks_new = quantize_kv_rows(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
    v_new, vs_new = quantize_kv_rows(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
    ckq, ks = quantize_kv_rows(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32))
    cvq, vs = quantize_kv_rows(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32))
    if per_row:
        offs = np.asarray([3, 128, 255, 64], np.int32)
        valid = (np.arange(S)[None, :] <= offs[:, None]).astype(np.int32)
        off = jnp.asarray(offs)
    else:
        valid = np.zeros((B, S), np.int32)
        valid[:, :101] = 1
        off = jnp.int32(100)
    sc = hd ** -0.5
    args = (q, k_new, v_new, ckq, cvq, ks[1], vs[1], ks_new, vs_new,
            jnp.int32(1), off, jnp.asarray(valid))
    ref = decode_attention_quantized_mono(*args, sc, interpret=True)
    f = jax.jit(lambda *a: decode_attention_quantized_mono(*a, sc))
    got = f(*args)
    d = float(jnp.max(jnp.abs(got[0].astype(jnp.float32)
                              - ref[0].astype(jnp.float32))))
    dk = int(jnp.sum(jnp.abs(got[1].astype(jnp.int32)
                             - ref[1].astype(jnp.int32))))
    dv = int(jnp.sum(jnp.abs(got[2].astype(jnp.int32)
                             - ref[2].astype(jnp.int32))))
    print(json.dumps({"probe": "int8", "per_row": per_row,
                      "max_out_delta": d, "k_delta": dk, "v_delta": dv}),
          flush=True)
    assert d < 0.02 and dk == 0 and dv == 0


def probe_full(per_row):
    from audio_llama_tpu.ops.decode_attention_mono import (
        decode_attention_mono,
    )

    L, B, Hkv, S, hd = 2, 4, 8, 256, 128
    Hq = 24
    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.bfloat16)
    k_new = jnp.asarray(rng.randn(B, Hkv, hd), jnp.bfloat16)
    v_new = jnp.asarray(rng.randn(B, Hkv, hd), jnp.bfloat16)
    ck = jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.bfloat16)
    cv = jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.bfloat16)
    if per_row:
        offs = np.asarray([40, 200, 7, 100], np.int32)
        valid = (np.arange(S)[None, :] <= offs[:, None]).astype(np.int32)
        off = jnp.asarray(offs)
    else:
        valid = np.zeros((B, S), np.int32)
        valid[:, :101] = 1
        off = jnp.int32(100)
    sc = hd ** -0.5
    args = (q, k_new, v_new, ck, cv, jnp.int32(1), off, jnp.asarray(valid))
    ref = decode_attention_mono(*args, sc, interpret=True)
    f = jax.jit(lambda *a: decode_attention_mono(*a, sc))
    got = f(*args)
    d = float(jnp.max(jnp.abs(got[0].astype(jnp.float32)
                              - ref[0].astype(jnp.float32))))
    dk = float(jnp.max(jnp.abs(got[1].astype(jnp.float32)
                               - ref[1].astype(jnp.float32))))
    dv = float(jnp.max(jnp.abs(got[2].astype(jnp.float32)
                               - ref[2].astype(jnp.float32))))
    print(json.dumps({"probe": "full_bf16", "per_row": per_row,
                      "max_out_delta": d, "k_delta": dk, "v_delta": dv}),
          flush=True)
    assert d < 0.02 and dk == 0 and dv == 0


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    probe4(False)
    probe4(True)
    probe8(False)
    probe8(True)
    probe_full(False)
    probe_full(True)
    print(json.dumps({"done": True}), flush=True)
