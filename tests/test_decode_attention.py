"""Pallas decode-attention kernel parity vs the XLA cached-decode math
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.ops.decode_attention import decode_attention


def _reference(q, k_new, v_new, ck, cv, layer, offset, valid, scale):
    """Straight numpy/jnp reimplementation of append + masked GQA."""
    L, B, Hkv, S, hd = ck.shape
    Hq = q.shape[1]
    G = Hq // Hkv
    ck = ck.at[layer, :, :, offset].set(k_new)
    cv = cv.at[layer, :, :, offset].set(v_new)
    k = ck[layer]  # [B, Hkv, S, hd]
    v = cv[layer]
    qg = q.reshape(B, Hkv, G, hd)
    logits = jnp.einsum("bhgd,bhkd->bhgk", qg.astype(jnp.float32), k.astype(jnp.float32)) * scale
    logits = jnp.where(valid[:, None, None, :] > 0, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgk,bhkd->bhgd", p, v.astype(jnp.float32))
    return out.reshape(B, Hq, hd), ck, cv


@pytest.mark.parametrize("Hq,Hkv,hd", [(4, 2, 16), (8, 8, 32), (6, 2, 128)])
def test_kernel_matches_reference(Hq, Hkv, hd):
    L, B, S = 3, 2, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, Hq, hd).astype(np.float32))
    k_new = jnp.asarray(rng.randn(B, Hkv, hd).astype(np.float32))
    v_new = jnp.asarray(rng.randn(B, Hkv, hd).astype(np.float32))
    ck = jnp.asarray(rng.randn(L, B, Hkv, S, hd).astype(np.float32))
    cv = jnp.asarray(rng.randn(L, B, Hkv, S, hd).astype(np.float32))
    layer, offset = 1, 10
    valid = np.zeros((B, S), np.int32)
    valid[:, : offset + 1] = 1
    valid[1, 3:5] = 0  # padding holes
    valid = jnp.asarray(valid)
    scale = hd ** -0.5

    ref_out, ref_ck, ref_cv = _reference(
        q, k_new, v_new, ck, cv, layer, offset, valid, scale
    )
    out, ock, ocv = decode_attention(
        q, k_new, v_new, ck, cv,
        jnp.int32(layer), jnp.int32(offset), valid, scale, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ock), np.asarray(ref_ck), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ocv), np.asarray(ref_cv), atol=1e-6)


def test_kernel_bf16_cache():
    L, B, Hkv, S, hd = 2, 1, 2, 32, 64
    Hq = 4
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, Hq, hd).astype(np.float32))
    k_new = jnp.asarray(rng.randn(B, Hkv, hd).astype(np.float32))
    v_new = jnp.asarray(rng.randn(B, Hkv, hd).astype(np.float32))
    ck = jnp.asarray(rng.randn(L, B, Hkv, S, hd)).astype(jnp.bfloat16)
    cv = jnp.asarray(rng.randn(L, B, Hkv, S, hd)).astype(jnp.bfloat16)
    valid = jnp.ones((B, S), jnp.int32)
    ref_out, ref_ck, _ = _reference(
        q, k_new.astype(jnp.bfloat16), v_new.astype(jnp.bfloat16),
        ck, cv, 0, 5, valid, hd ** -0.5,
    )
    out, ock, _ = decode_attention(
        q, k_new, v_new, ck, cv, jnp.int32(0), jnp.int32(5), valid,
        hd ** -0.5, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_out, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(ock, np.float32), np.asarray(ref_ck, np.float32), atol=1e-6
    )


def test_llama_decode_step_kernel_matches_xla():
    """Full llama_forward single-token decode: fused kernel vs XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm

    cfg = LlamaConfig.tiny()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, P, total = 2, 10, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 3, 500)
    mask = np.ones((B, total), np.int32)
    mask[1, 7:P] = 0
    mask = jnp.asarray(mask)

    cache0 = lm.KVCache.zeros(cfg, B, total, dtype=jnp.float32)
    _, cache = lm.llama_forward(
        params, cfg, input_ids=ids, attention_mask=mask, kv_cache=cache0,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    tok = jnp.asarray([[7], [9]], jnp.int32)
    ref, ref_cache = lm.llama_forward(
        params, cfg, input_ids=tok, attention_mask=mask, kv_cache=cache,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    with pltpu.force_tpu_interpret_mode():
        out, k_cache = lm.llama_forward(
            params, cfg, input_ids=tok, attention_mask=mask, kv_cache=cache,
            compute_dtype=jnp.float32, attn_impl="decode_kernel",
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(k_cache.k), np.asarray(ref_cache.k), atol=1e-5
    )
    assert int(k_cache.length) == int(ref_cache.length)


def test_quantized_cache_xla_path_close_to_bf16():
    """int8 KV cache through llama_forward (XLA path): prefill+decode stays
    close to the unquantized result (per-row max-abs quantization)."""
    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm

    cfg = LlamaConfig.tiny()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, P, total = 2, 10, 18
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 3, 500)
    mask = jnp.ones((B, total), jnp.int32)

    def run(quantized):
        cache = lm.KVCache.zeros(
            cfg, B, total, dtype=jnp.float32, quantized=quantized
        )
        Tk = cache.k.shape[3]
        m = jnp.pad(mask, ((0, 0), (0, Tk - total)))
        logits, cache = lm.llama_forward(
            params, cfg, input_ids=ids, attention_mask=m, kv_cache=cache,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
        d, _ = lm.llama_forward(
            params, cfg, input_ids=tok, attention_mask=m, kv_cache=cache,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        return logits, d

    ref_l, ref_d = run(False)
    q_l, q_d = run(True)
    # int8 per-row quantization: small relative error, same argmax mostly
    assert np.max(np.abs(np.asarray(q_l) - np.asarray(ref_l))) < 0.15
    assert np.max(np.abs(np.asarray(q_d) - np.asarray(ref_d))) < 0.15


def test_quantized_decode_kernel_matches_xla_quantized():
    """Fused int8 kernel vs the XLA quantized path (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm

    cfg = LlamaConfig.tiny()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, P, total = 2, 10, 20
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 3, 500)
    cache0 = lm.KVCache.zeros(cfg, B, total, dtype=jnp.float32, quantized=True)
    Tk = cache0.k.shape[3]
    mask = jnp.ones((B, Tk), jnp.int32)
    _, cache = lm.llama_forward(
        params, cfg, input_ids=ids, attention_mask=mask, kv_cache=cache0,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    tok = jnp.asarray([[7], [9]], jnp.int32)
    ref, ref_cache = lm.llama_forward(
        params, cfg, input_ids=tok, attention_mask=mask, kv_cache=cache,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    with pltpu.force_tpu_interpret_mode():
        out, k_cache = lm.llama_forward(
            params, cfg, input_ids=tok, attention_mask=mask, kv_cache=cache,
            compute_dtype=jnp.float32, attn_impl="decode_kernel",
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-3, rtol=5e-3
    )
    np.testing.assert_array_equal(
        np.asarray(k_cache.k), np.asarray(ref_cache.k)
    )
    np.testing.assert_allclose(
        np.asarray(k_cache.k_scale), np.asarray(ref_cache.k_scale), atol=1e-6
    )


def test_double_buffered_kernel_matches_simple():
    from audio_llama_tpu.ops.decode_attention_db import decode_attention_db

    L, B, Hkv, S, hd = 3, 2, 2, 64, 32
    Hq = 4
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(B, Hq, hd).astype(np.float32))
    k_new = jnp.asarray(rng.randn(B, Hkv, hd).astype(np.float32))
    v_new = jnp.asarray(rng.randn(B, Hkv, hd).astype(np.float32))
    ck = jnp.asarray(rng.randn(L, B, Hkv, S, hd).astype(np.float32))
    cv = jnp.asarray(rng.randn(L, B, Hkv, S, hd).astype(np.float32))
    valid = np.zeros((B, S), np.int32)
    valid[:, :12] = 1
    valid = jnp.asarray(valid)
    ref_out, ref_ck, ref_cv = decode_attention(
        q, k_new, v_new, ck, cv, jnp.int32(1), jnp.int32(11), valid,
        hd ** -0.5, interpret=True,
    )
    out, ock, ocv = decode_attention_db(
        q, k_new, v_new, ck, cv, jnp.int32(1), jnp.int32(11), valid,
        hd ** -0.5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ock), np.asarray(ref_ck), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ocv), np.asarray(ref_cv), atol=1e-6)


def test_quantized_db_kernel_matches_simple_quantized():
    """The double-buffered int8 kernel must match the simple int8 kernel
    (which stays as the readable parity reference)."""
    from audio_llama_tpu.models.llama import quantize_kv_rows
    from audio_llama_tpu.ops.decode_attention import decode_attention_quantized
    from audio_llama_tpu.ops.decode_attention_db import (
        decode_attention_quantized_db,
    )

    L, B, Hkv, S, hd = 3, 2, 2, 64, 32
    Hq = 4
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(B, Hq, hd).astype(np.float32))
    k_new, ks_new = quantize_kv_rows(jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
    v_new, vs_new = quantize_kv_rows(jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
    ckf, ks = quantize_kv_rows(jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32))
    cvf, vs = quantize_kv_rows(jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32))
    valid = np.zeros((B, S), np.int32)
    valid[:, :20] = 1
    valid = jnp.asarray(valid)
    args = (q, k_new, v_new, ckf, cvf, ks[1], vs[1], ks_new, vs_new,
            jnp.int32(1), jnp.int32(19), valid, hd ** -0.5)
    ref = decode_attention_quantized(*args, interpret=True)
    out = decode_attention_quantized_db(*args, interpret=True)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-5
        )


# ---- timeline-sharded stats variants (docs/LONG_CONTEXT.md step 3) --------

def _stats_ref(q, k, v, valid, scale):
    """Unnormalized flash stats over a (possibly fully invalid) slab."""
    B, Hq, hd = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = np.asarray(q, np.float32).reshape(B, Hkv, G, hd)
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    s = np.einsum("bhgd,bhsd->bhgs", qg, kf) * scale
    s = np.where(np.asarray(valid)[:, None, None, :] > 0, s, -1e30)
    m = np.maximum(s.max(-1), -5e29)
    p = np.where(
        np.asarray(valid)[:, None, None, :] > 0, np.exp(s - m[..., None]), 0.0
    )
    l = p.sum(-1)
    acc = np.einsum("bhgs,bhsd->bhgd", p, vf)
    return (
        m.reshape(B, Hq), l.reshape(B, Hq), acc.reshape(B, Hq, hd)
    )


@pytest.mark.parametrize("local_offset", [5, -27, 70])
def test_db_stats_matches_reference(local_offset):
    """Owner shard (in-range offset) appends + returns stats; non-owner
    (negative / past-end offset) appends nothing. Against a numpy oracle."""
    from audio_llama_tpu.ops.decode_attention_db import (
        decode_attention_db_stats,
    )

    L, B, Hq, Hkv, S, hd = 2, 2, 4, 2, 64, 32
    rng = np.random.RandomState(6)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32)
    ck = jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32)
    cv = jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32)
    valid = np.zeros((B, S), np.int32)
    valid[:, :40] = 1
    m, l, acc, ck2, cv2 = decode_attention_db_stats(
        q, k_new, v_new, ck, cv, jnp.int32(1), jnp.int32(local_offset),
        jnp.asarray(valid), hd ** -0.5, interpret=True,
    )
    # expected slab: new row merged only when the offset is in range
    k_exp = np.asarray(ck[1]).copy()
    v_exp = np.asarray(cv[1]).copy()
    if 0 <= local_offset < S:
        k_exp[:, :, local_offset] = np.asarray(k_new)
        v_exp[:, :, local_offset] = np.asarray(v_new)
    rm, rl, racc = _stats_ref(q, k_exp, v_exp, valid, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(m), rm, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(l), rl, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(acc), racc, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ck2[1]), k_exp, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ck2[0]), np.asarray(ck[0]))


def test_db_stats_all_invalid_slab_is_merge_noop():
    """A shard the timeline hasn't reached: l == 0, acc == 0, m clamped —
    contributes nothing to the cross-shard merge."""
    from audio_llama_tpu.ops.decode_attention_db import (
        decode_attention_db_stats,
    )

    L, B, Hq, Hkv, S, hd = 1, 1, 2, 1, 32, 32
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32)
    ck = jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32)
    cv = jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32)
    valid = jnp.zeros((B, S), jnp.int32)
    m, l, acc, _, _ = decode_attention_db_stats(
        q, k_new, v_new, ck, cv, jnp.int32(0), jnp.int32(-5), valid,
        hd ** -0.5, interpret=True,
    )
    assert np.all(np.asarray(l) == 0.0)
    assert np.all(np.asarray(acc) == 0.0)
    assert np.all(np.isfinite(np.asarray(m)))


# ---- int4 (K/V-combined nibble-packed) KV cache ----------------------------

def test_quantize_kv_rows4_roundtrip():
    """Combined pack/unpack inverts up to the absmax/7 rounding step, per
    row and per tensor."""
    from audio_llama_tpu.models.llama import quantize_kv_rows4, unpack_kv4

    rng = np.random.RandomState(9)
    k = jnp.asarray(rng.randn(2, 3, 8, 32) * 3.0, jnp.float32)
    v = jnp.asarray(rng.randn(2, 3, 8, 32) * 0.7, jnp.float32)
    packed, ks, vs = quantize_kv_rows4(k, v)
    assert packed.shape == (2, 3, 8, 32) and packed.dtype == jnp.int8
    assert ks.shape == (2, 3, 8) and vs.shape == (2, 3, 8)
    ku, vu = unpack_kv4(packed)
    for x, u, s in ((k, ku, ks), (v, vu, vs)):
        deq = np.asarray(u, np.float32) * np.asarray(s)[..., None]
        err = np.abs(deq - np.asarray(x))
        bound = np.broadcast_to(
            np.asarray(s)[..., None] * 0.5 + 1e-6, err.shape
        )
        np.testing.assert_array_less(err, bound)


def _int4_oracle(q, ckv, ks, vs, valid, scale):
    """Dequantize a combined-packed int4 slab (new row already merged) and
    run masked GQA softmax — the parity oracle for the int4 kernels."""
    from audio_llama_tpu.models.llama import unpack_kv4

    B, Hkv, S, _ = ckv.shape
    Hq = q.shape[1]
    G = Hq // Hkv
    ku, vu = unpack_kv4(jnp.asarray(ckv))
    kdq = np.asarray(ku, np.float32) * np.asarray(ks)[..., None]
    vdq = np.asarray(vu, np.float32) * np.asarray(vs)[..., None]
    qg = np.asarray(q, np.float32).reshape(B, Hkv, G, -1)
    s = np.einsum("bhgd,bhkd->bhgk", qg, kdq) * scale
    s = np.where(np.asarray(valid)[:, None, None, :] > 0, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    out = np.einsum("bhgk,bhkd->bhgd", p, vdq)
    return out.reshape(B, Hq, -1)


def _int4_fixture(L, B, Hkv, S, hd, seed):
    from audio_llama_tpu.models.llama import quantize_kv_rows4

    rng = np.random.RandomState(seed)
    kv_new, ks_new, vs_new = quantize_kv_rows4(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
    )
    ckv, ks, vs = quantize_kv_rows4(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
    )
    return rng, kv_new, ks_new, vs_new, ckv, ks, vs


def test_int4_db_kernel_matches_oracle():
    from audio_llama_tpu.ops.decode_attention_db import (
        decode_attention_quantized4_db,
    )

    L, B, Hkv, S, hd = 3, 2, 2, 64, 32
    Hq = 4
    rng, kv_new, ks_new, vs_new, ckv, ks, vs = _int4_fixture(
        L, B, Hkv, S, hd, seed=10
    )
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    valid = np.zeros((B, S), np.int32)
    valid[:, :20] = 1
    valid[1, 3:5] = 0
    loc = 19
    out, ockv = decode_attention_quantized4_db(
        q, kv_new, ckv, ks[1], vs[1], ks_new, vs_new,
        jnp.int32(1), jnp.int32(loc), jnp.asarray(valid), hd ** -0.5,
        interpret=True,
    )
    # expected packed slab with the new combined row merged in
    kv_exp = np.asarray(ckv[1]).copy()
    kv_exp[:, :, loc] = np.asarray(kv_new)
    ks_exp = np.asarray(ks[1]).copy()
    vs_exp = np.asarray(vs[1]).copy()
    ks_exp[:, :, loc] = np.asarray(ks_new)
    vs_exp[:, :, loc] = np.asarray(vs_new)
    ref = _int4_oracle(q, kv_exp, ks_exp, vs_exp, valid, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(ockv[1]), kv_exp)
    np.testing.assert_array_equal(np.asarray(ockv[0]), np.asarray(ckv[0]))


def test_int4_db_stats_matches_oracle():
    from audio_llama_tpu.models.llama import unpack_kv4
    from audio_llama_tpu.ops.decode_attention_db import (
        decode_attention_quantized4_db_stats,
    )

    L, B, Hq, Hkv, S, hd = 2, 2, 4, 2, 64, 32
    rng, kv_new, ks_new, vs_new, ckv, ks, vs = _int4_fixture(
        L, B, Hkv, S, hd, seed=11
    )
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    valid = np.zeros((B, S), np.int32)
    valid[:, :20] = 1
    loc = 19
    m, l, acc, ckv2 = decode_attention_quantized4_db_stats(
        q, kv_new, ckv, ks[1], vs[1], ks_new, vs_new,
        jnp.int32(1), jnp.int32(loc), jnp.asarray(valid), hd ** -0.5,
        interpret=True,
    )
    kv_exp = np.asarray(ckv[1]).copy()
    kv_exp[:, :, loc] = np.asarray(kv_new)
    ks_exp = np.asarray(ks[1]).copy()
    vs_exp = np.asarray(vs[1]).copy()
    ks_exp[:, :, loc] = np.asarray(ks_new)
    vs_exp[:, :, loc] = np.asarray(vs_new)
    ku, vu = unpack_kv4(jnp.asarray(kv_exp))
    kdq = np.asarray(ku, np.float32) * ks_exp[..., None]
    vdq = np.asarray(vu, np.float32) * vs_exp[..., None]
    rm, rl, racc = _stats_ref(q, kdq, vdq, valid, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(m), rm, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(l), rl, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(acc), racc, atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(ckv2[1][:, :, loc]), np.asarray(kv_new)
    )


def test_int4_db_stats_nonowner_appends_nothing():
    from audio_llama_tpu.ops.decode_attention_db import (
        decode_attention_quantized4_db_stats,
    )

    L, B, Hq, Hkv, S, hd = 1, 1, 2, 1, 32, 32
    rng, kv_new, ks_new, vs_new, ckv, ks, vs = _int4_fixture(
        L, B, Hkv, S, hd, seed=12
    )
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    valid = jnp.zeros((B, S), jnp.int32)
    m, l, acc, ckv2 = decode_attention_quantized4_db_stats(
        q, kv_new, ckv, ks[0], vs[0], ks_new, vs_new,
        jnp.int32(0), jnp.int32(-5), valid, hd ** -0.5, interpret=True,
    )
    assert np.all(np.asarray(l) == 0.0)
    assert np.all(np.asarray(acc) == 0.0)
    assert np.all(np.isfinite(np.asarray(m)))
    np.testing.assert_array_equal(np.asarray(ckv2), np.asarray(ckv))


def test_int4_cache_xla_path_close_to_f32():
    """int4 KV through llama_forward (XLA path): prefill+decode stays
    usably close to full precision (absmax/7 rows; looser than int8)."""
    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm

    cfg = LlamaConfig.tiny()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, P, total = 2, 10, 18
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 3, 500)
    mask = jnp.ones((B, total), jnp.int32)

    def run(quantized):
        cache = lm.KVCache.zeros(
            cfg, B, total, dtype=jnp.float32, quantized=quantized
        )
        Tk = cache.k.shape[3]
        m = jnp.pad(mask, ((0, 0), (0, Tk - total)))
        logits, cache = lm.llama_forward(
            params, cfg, input_ids=ids, attention_mask=m, kv_cache=cache,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        # fixed decode token: an argmax'd one would let the two runs
        # legitimately diverge and void the comparison
        tok = jnp.asarray([[7], [9]], jnp.int32)
        d, _ = lm.llama_forward(
            params, cfg, input_ids=tok, attention_mask=m, kv_cache=cache,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        return logits, d

    ref_l, ref_d = run(False)
    q_l, q_d = run(4)
    assert np.max(np.abs(np.asarray(q_l) - np.asarray(ref_l))) < 1.0
    assert np.max(np.abs(np.asarray(q_d) - np.asarray(ref_d))) < 1.0
    # int8 should be strictly tighter than int4 on the same program
    i8_l, _ = run(True)
    assert (
        np.max(np.abs(np.asarray(i8_l) - np.asarray(ref_l)))
        <= np.max(np.abs(np.asarray(q_l) - np.asarray(ref_l))) + 1e-3
    )


def test_int4_decode_kernel_matches_xla_int4():
    """Fused int4 kernel vs the XLA int4 path through llama_forward
    (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm

    cfg = LlamaConfig.tiny()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, P, total = 2, 10, 20
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 3, 500)
    cache0 = lm.KVCache.zeros(cfg, B, total, dtype=jnp.float32, quantized=4)
    Tk = cache0.k.shape[3]
    mask = jnp.ones((B, Tk), jnp.int32)
    _, cache = lm.llama_forward(
        params, cfg, input_ids=ids, attention_mask=mask, kv_cache=cache0,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    tok = jnp.asarray([[7], [9]], jnp.int32)
    ref, ref_cache = lm.llama_forward(
        params, cfg, input_ids=tok, attention_mask=mask, kv_cache=cache,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    with pltpu.force_tpu_interpret_mode():
        out, k_cache = lm.llama_forward(
            params, cfg, input_ids=tok, attention_mask=mask, kv_cache=cache,
            compute_dtype=jnp.float32, attn_impl="decode_kernel",
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-3, rtol=5e-3
    )
    np.testing.assert_array_equal(
        np.asarray(k_cache.k), np.asarray(ref_cache.k)
    )
    np.testing.assert_allclose(
        np.asarray(k_cache.k_scale), np.asarray(ref_cache.k_scale), atol=1e-6
    )


def test_int4_kv_packed_kernel_rejected():
    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm

    cfg = LlamaConfig.tiny()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    cache = lm.KVCache.zeros(cfg, 1, 32, quantized=4)
    with pytest.raises(ValueError, match="int4-KV"):
        lm.llama_forward(
            params, cfg, input_ids=jnp.ones((1, 1), jnp.int32),
            kv_cache=cache, attn_impl="decode_packed",
        )


def test_quantized_db_stats_matches_reference():
    from audio_llama_tpu.models.llama import quantize_kv_rows
    from audio_llama_tpu.ops.decode_attention_db import (
        decode_attention_quantized_db_stats,
    )

    L, B, Hq, Hkv, S, hd = 2, 2, 4, 2, 64, 32
    rng = np.random.RandomState(8)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    k_new, ks_new = quantize_kv_rows(jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
    v_new, vs_new = quantize_kv_rows(jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
    ckq, ks = quantize_kv_rows(jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32))
    cvq, vs = quantize_kv_rows(jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32))
    valid = np.zeros((B, S), np.int32)
    valid[:, :20] = 1
    loc = 19
    m, l, acc, ck2, cv2 = decode_attention_quantized_db_stats(
        q, k_new, v_new, ckq, cvq, ks[1], vs[1], ks_new, vs_new,
        jnp.int32(1), jnp.int32(loc), jnp.asarray(valid), hd ** -0.5,
        interpret=True,
    )
    # dequantized expected slab with the new row in place
    kdq = np.asarray(ckq[1], np.float32) * np.asarray(ks[1])[..., None]
    vdq = np.asarray(cvq[1], np.float32) * np.asarray(vs[1])[..., None]
    kdq[:, :, loc] = np.asarray(k_new, np.float32) * np.asarray(ks_new)[..., None]
    vdq[:, :, loc] = np.asarray(v_new, np.float32) * np.asarray(vs_new)[..., None]
    rm, rl, racc = _stats_ref(q, kdq, vdq, valid, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(m), rm, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(l), rl, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(acc), racc, atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(ck2[1][:, :, loc]), np.asarray(k_new)
    )
