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
