"""Head-packed chunked decode-attention kernel parity vs the simple kernel
(interpret mode on CPU). Covers NC>1 chunking, the appended row landing in
each chunk, masked holes, bf16 caches, and the int8 variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_quantized,
)
from audio_llama_tpu.ops.decode_attention_packed import (
    decode_attention_packed,
    decode_attention_quantized_packed,
)


def _mk(rng, L, B, Hq, Hkv, S, hd, dtype=np.float32):
    q = jnp.asarray(rng.randn(B, Hq, hd).astype(dtype))
    k_new = jnp.asarray(rng.randn(B, Hkv, hd).astype(dtype))
    v_new = jnp.asarray(rng.randn(B, Hkv, hd).astype(dtype))
    ck = jnp.asarray(rng.randn(L, B, Hkv, S, hd).astype(dtype))
    cv = jnp.asarray(rng.randn(L, B, Hkv, S, hd).astype(dtype))
    return q, k_new, v_new, ck, cv


@pytest.mark.parametrize("offset,chunk", [(11, 32), (40, 32), (63, 64), (0, 32)])
def test_packed_matches_simple(offset, chunk):
    L, B, Hq, Hkv, S, hd = 3, 2, 4, 2, 64, 32
    rng = np.random.RandomState(2)
    q, k_new, v_new, ck, cv = _mk(rng, L, B, Hq, Hkv, S, hd)
    valid = np.zeros((B, S), np.int32)
    valid[:, : offset + 1] = 1
    if offset > 5:
        valid[1, 3:5] = 0  # padding holes
    valid = jnp.asarray(valid)
    ref = decode_attention(
        q, k_new, v_new, ck, cv, jnp.int32(1), jnp.int32(offset), valid,
        hd ** -0.5, interpret=True,
    )
    out = decode_attention_packed(
        q, k_new, v_new, ck, cv, jnp.int32(1), jnp.int32(offset), valid,
        hd ** -0.5, chunk=chunk, interpret=True,
    )
    for a, b in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5
        )


def test_packed_bf16_cache():
    L, B, Hq, Hkv, S, hd = 2, 1, 4, 2, 96, 64
    rng = np.random.RandomState(3)
    q, k_new, v_new, ck, cv = _mk(rng, L, B, Hq, Hkv, S, hd)
    ck = ck.astype(jnp.bfloat16)
    cv = cv.astype(jnp.bfloat16)
    q = q.astype(jnp.bfloat16)
    valid = jnp.ones((B, S), jnp.int32)
    ref = decode_attention(
        q, k_new, v_new, ck, cv, jnp.int32(0), jnp.int32(5), valid,
        hd ** -0.5, interpret=True,
    )
    out = decode_attention_packed(
        q, k_new, v_new, ck, cv, jnp.int32(0), jnp.int32(5), valid,
        hd ** -0.5, chunk=32, interpret=True,
    )
    for a, b in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-2, rtol=2e-2,
        )


@pytest.mark.parametrize("offset,chunk", [(19, 32), (50, 32)])
def test_quantized_packed_matches_simple(offset, chunk):
    from audio_llama_tpu.models.llama import quantize_kv_rows

    L, B, Hq, Hkv, S, hd = 3, 2, 4, 2, 64, 32
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(B, Hq, hd).astype(np.float32))
    k_new, ks_new = quantize_kv_rows(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32)
    )
    v_new, vs_new = quantize_kv_rows(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32)
    )
    ckf, ks = quantize_kv_rows(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32)
    )
    cvf, vs = quantize_kv_rows(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32)
    )
    valid = np.zeros((B, S), np.int32)
    valid[:, : offset + 1] = 1
    valid = jnp.asarray(valid)
    args = (q, k_new, v_new, ckf, cvf, ks[1], vs[1], ks_new, vs_new,
            jnp.int32(1), jnp.int32(offset), valid, hd ** -0.5)
    ref = decode_attention_quantized(*args, interpret=True)
    out = decode_attention_quantized_packed(*args, chunk=chunk, interpret=True)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-5
        )


def test_packed_fully_masked_leading_chunk():
    """A fully-invalid leading chunk must contribute nothing (the online
    softmax's -1e30 sentinel + exp(0)=1 trap)."""
    L, B, Hq, Hkv, S, hd = 1, 1, 2, 1, 64, 32
    rng = np.random.RandomState(5)
    q, k_new, v_new, ck, cv = _mk(rng, L, B, Hq, Hkv, S, hd)
    valid = np.zeros((B, S), np.int32)
    valid[:, 33:40] = 1  # first 32-chunk entirely masked
    valid = jnp.asarray(valid)
    ref = decode_attention(
        q, k_new, v_new, ck, cv, jnp.int32(0), jnp.int32(39), valid,
        hd ** -0.5, interpret=True,
    )
    out = decode_attention_packed(
        q, k_new, v_new, ck, cv, jnp.int32(0), jnp.int32(39), valid,
        hd ** -0.5, chunk=32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), atol=2e-5, rtol=2e-5
    )


def test_llama_decode_step_packed_matches_xla():
    """Full llama_forward single-token decode with attn_impl='decode_packed'
    (interpret mode) vs the XLA path — validates the production dispatch
    wiring, including the in-place cache append."""
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
        out, p_cache = lm.llama_forward(
            params, cfg, input_ids=tok, attention_mask=mask, kv_cache=cache,
            compute_dtype=jnp.float32, attn_impl="decode_packed",
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(p_cache.k), np.asarray(ref_cache.k), atol=1e-5
    )
    assert int(p_cache.length) == int(ref_cache.length)


def test_llama_decode_step_packed_quantized_matches_xla():
    """int8-KV variant of the dispatch test."""
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
        out, p_cache = lm.llama_forward(
            params, cfg, input_ids=tok, attention_mask=mask, kv_cache=cache,
            compute_dtype=jnp.float32, attn_impl="decode_packed",
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-3, rtol=5e-3
    )
    np.testing.assert_array_equal(
        np.asarray(p_cache.k), np.asarray(ref_cache.k)
    )
    np.testing.assert_allclose(
        np.asarray(p_cache.k_scale), np.asarray(ref_cache.k_scale), atol=1e-6
    )
