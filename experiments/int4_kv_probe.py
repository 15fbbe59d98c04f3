"""TPU lowering + correctness probe for the int4-KV (K/V-combined packed)
db decode kernel.

The first int4 layout (per-tensor hd/2 packing) died at Mosaic: a 64-lane
slab slice cannot DMA out of an HBM ref (lane tiling is 128). The combined
layout keeps [max_len, hd] slabs; this probe checks (1) small-dims
correctness vs the jnp oracle on the real chip, (2) flagship-dims lowering.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from audio_llama_tpu.models.llama import quantize_kv_rows4, unpack_kv4
from audio_llama_tpu.ops.decode_attention_db import (
    decode_attention_quantized4_db,
)

print("backend:", jax.devices()[0].platform, flush=True)

# --- correctness at small dims (one compile) -------------------------------
L, B, Hkv, S, hd = 2, 2, 2, 64, 128
Hq = 6
rng = np.random.RandomState(0)
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
valid[:, :20] = 1
loc = 19

t0 = time.time()
out, ockv = jax.jit(
    lambda *a: decode_attention_quantized4_db(*a, hd ** -0.5)
)(q, kv_new, ckv, ks[1], vs[1], ks_new, vs_new,
  jnp.int32(1), jnp.int32(loc), jnp.asarray(valid))
out_h = np.asarray(out, np.float32)
ockv_h = np.asarray(ockv)
print(f"small compile+run {time.time()-t0:.1f}s", flush=True)

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
print("small max err vs oracle:", err, flush=True)
assert err < 0.05, err
assert np.array_equal(ockv_h[1][:, :, loc], np.asarray(kv_new)), "row insert"
assert np.array_equal(ockv_h[0], np.asarray(ckv[0])), "other layer untouched"

# --- flagship-dims lowering (3B llama geometry, 2080-slot timeline) --------
L, B, Hkv, S, hd, Hq = 1, 32, 8, 2080, 128, 24
q = jnp.zeros((B, Hq, hd), jnp.bfloat16)
kv_new = jnp.zeros((B, Hkv, hd), jnp.int8)
ckv = jnp.zeros((L, B, Hkv, S, hd), jnp.int8)
ks = jnp.ones((B, Hkv, S), jnp.float32)
vs = jnp.ones((B, Hkv, S), jnp.float32)
ksn = jnp.ones((B, Hkv), jnp.float32)
vsn = jnp.ones((B, Hkv), jnp.float32)
valid = jnp.ones((B, S), jnp.int32)
t0 = time.time()
out, _ = jax.jit(
    lambda *a: decode_attention_quantized4_db(*a, hd ** -0.5)
)(q, kv_new, ckv, ks, vs, ksn, vsn, jnp.int32(0), jnp.int32(2000), valid)
print("flagship out[0,0,0]:", float(out[0, 0, 0]),
      f"compile+run {time.time()-t0:.1f}s", flush=True)
print("PROBE OK", flush=True)
