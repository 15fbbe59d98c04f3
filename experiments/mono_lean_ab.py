"""Within-session A/B: old mono decode kernel (full-slab where-insert,
HEAD version staged to experiments/_mono_old.py) vs the VPU-lean variant
(analytic fresh row + window write-back). Isolated-kernel timing with the
fori data-dependency pattern; int4 and int8 caches, B sweep.

    git show <old>:audio_llama_tpu/ops/decode_attention_mono.py \
      | sed 's/from \\.decode/from audio_llama_tpu.ops.decode/' \
      > experiments/_mono_old.py
    nohup python -u experiments/mono_lean_ab.py > /tmp/mono_lean_ab.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from experiments.enc_kernel_bench import timed_loop, report  # noqa: E402
import experiments._mono_old as old  # noqa: E402
from audio_llama_tpu.ops import decode_attention_mono as new  # noqa: E402
from audio_llama_tpu.models.llama import (  # noqa: E402
    quantize_kv_rows, quantize_kv_rows4,
)


def run(B, arm, mod):
    Hq, Hkv, hd, max_len = 24, 8, 128, 2048
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.bfloat16)
    offset = jnp.asarray(2014, jnp.int32)
    valid = jnp.asarray(
        (np.arange(max_len)[None, :] <= 2014).astype(np.int32).repeat(B, 0)
    )
    sc = hd ** -0.5
    if arm == "int4":
        kv_new, ksn, vsn = quantize_kv_rows4(
            jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
            jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
        )
        ckv, ks, vs = quantize_kv_rows4(
            jnp.asarray(rng.randn(1, B, Hkv, max_len, hd), jnp.float32) * 0.5,
            jnp.asarray(rng.randn(1, B, Hkv, max_len, hd), jnp.float32) * 0.5,
        )
        ks, vs = ks[0], vs[0]

        def fstep(a, ckv=ckv):
            q, = a
            o, _ = mod.decode_attention_quantized4_mono(
                q, kv_new, ckv, ks, vs, ksn, vsn,
                jnp.asarray(0, jnp.int32), offset, valid, sc,
            )
            bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(q.dtype)
            return bump.astype(jnp.float32), (q + bump,)

        bytes_per = B * Hkv * max_len * hd + 2 * B * Hkv * max_len * 4
    else:
        kq, ksn = quantize_kv_rows(jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
        vq, vsn = quantize_kv_rows(jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
        ck, ks = quantize_kv_rows(
            jnp.asarray(rng.randn(1, B, Hkv, max_len, hd), jnp.float32))
        cv, vs = quantize_kv_rows(
            jnp.asarray(rng.randn(1, B, Hkv, max_len, hd), jnp.float32))
        ks, vs = ks[0], vs[0]

        def fstep(a, ck=ck, cv=cv):
            q, = a
            o, _, _ = mod.decode_attention_quantized_mono(
                q, kq, vq, ck, cv, ks, vs, ksn, vsn,
                jnp.asarray(0, jnp.int32), offset, valid, sc,
            )
            bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(q.dtype)
            return bump.astype(jnp.float32), (q + bump,)

        bytes_per = 2 * B * Hkv * max_len * hd + 2 * B * Hkv * max_len * 4

    sec = timed_loop(fstep, (q,), 50)
    name = "old" if mod is old else "lean"
    floor_ms = bytes_per / 810e9 * 1e3
    report(f"mono_{arm}_B{B}_{name}", sec, elems=bytes_per,
           note=f"HBM floor {floor_ms:.3f} ms")
    return sec


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    bs = [int(a) for a in (sys.argv[1:] or ["32", "64", "1"])]
    for B in bs:
        for arm in ("int4", "int8"):
            s_old = run(B, arm, old)
            s_new = run(B, arm, new)
            print(json.dumps({
                "B": B, "arm": arm,
                "speedup_pct": round((s_old / s_new - 1) * 100, 1),
            }), flush=True)
    print(json.dumps({"done": True}), flush=True)
