"""Real-TPU correctness probe for the mono kernel's hpd (heads-per-DMA)
mode: interpret-mode parity can't validate DMA/semaphore behavior, and the
hpd2 bench numbers look too good — verify outputs on-chip vs the jnp
oracle before believing them."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from audio_llama_tpu.models.llama import quantize_kv_rows4, unpack_kv4
from audio_llama_tpu.ops.decode_attention_mono import (
    decode_attention_quantized4_mono,
)

print("backend:", jax.devices()[0].platform, flush=True)

L, B, Hkv, S, hd = 2, 4, 8, 256, 128
Hq = 24
rng = np.random.RandomState(3)
q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32).astype(jnp.bfloat16)
kv_new, ks_new, vs_new = quantize_kv_rows4(
    jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
    jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
)
ckv, ks, vs = quantize_kv_rows4(
    jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
    jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
)
valid = np.zeros((B, S), np.int32)
valid[:, :200] = 1
valid[1, 3:7] = 0
loc = 199

for hpd in (1, 2, 4):
    t0 = time.time()
    out, ockv = jax.jit(
        lambda *a, h=hpd: decode_attention_quantized4_mono(
            *a, hd ** -0.5, hpd=h
        )
    )(q, kv_new, ckv, ks[1], vs[1], ks_new, vs_new,
      jnp.int32(1), jnp.int32(loc), jnp.asarray(valid))
    out_h = np.asarray(out, np.float32)
    ockv_h = np.asarray(ockv)
    # oracle
    kv_exp = np.asarray(ckv[1]).copy(); kv_exp[:, :, loc] = np.asarray(kv_new)
    ks_exp = np.asarray(ks[1]).copy(); ks_exp[:, :, loc] = np.asarray(ks_new)
    vs_exp = np.asarray(vs[1]).copy(); vs_exp[:, :, loc] = np.asarray(vs_new)
    ku, vu = unpack_kv4(jnp.asarray(kv_exp))
    kdq = np.asarray(ku, np.float32) * ks_exp[..., None]
    vdq = np.asarray(vu, np.float32) * vs_exp[..., None]
    qg = np.asarray(q, np.float32).reshape(B, Hkv, Hq // Hkv, hd)
    s = np.einsum("bhgd,bhkd->bhgk", qg, kdq) * hd ** -0.5
    s = np.where(valid[:, None, None, :] > 0, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True)); p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhgk,bhkd->bhgd", p, vdq).reshape(B, Hq, hd)
    err = np.max(np.abs(out_h - ref))
    cache_ok = np.array_equal(ockv_h[1][:, :, loc], np.asarray(kv_new)) and \
        np.array_equal(ockv_h[0], np.asarray(ckv[0]))
    print(f"hpd={hpd}: max err {err:.5f} cache_ok={cache_ok} "
          f"({time.time()-t0:.1f}s)", flush=True)
    assert err < 0.05 and cache_ok, (hpd, err)
print("PROBE OK", flush=True)
