"""Mono-grid decode-attention kernels (ops/decode_attention_mono.py):
parity vs the db kernels (interpret mode) and end-to-end dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("depth,hpd", [(None, None), (2, 2), (8, 1)])
def test_mono4_matches_db4(depth, hpd):
    from audio_llama_tpu.models.llama import quantize_kv_rows4
    from audio_llama_tpu.ops.decode_attention_db import (
        decode_attention_quantized4_db,
    )
    from audio_llama_tpu.ops.decode_attention_mono import (
        decode_attention_quantized4_mono,
    )

    L, B, Hkv, S, hd = 2, 3, 2, 64, 32
    Hq = 4
    rng = np.random.RandomState(20)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    kv_new, ks_new, vs_new = quantize_kv_rows4(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
    )
    ckv, ks, vs = quantize_kv_rows4(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
    )
    valid = np.zeros((B, S), np.int32)
    valid[:, :22] = 1
    valid[1, 3:5] = 0
    args = (q, kv_new, ckv, ks[1], vs[1], ks_new, vs_new,
            jnp.int32(1), jnp.int32(21), jnp.asarray(valid), hd ** -0.5)
    ref_out, ref_ckv = decode_attention_quantized4_db(*args, interpret=True)
    # mono in SLAB mode: full [L, ...] scale slabs, layer via index map
    slab_args = (q, kv_new, ckv, ks, vs, ks_new, vs_new,
                 jnp.int32(1), jnp.int32(21), jnp.asarray(valid), hd ** -0.5)
    out, ockv = decode_attention_quantized4_mono(
        *slab_args, interpret=True, depth=depth, hpd=hpd
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), atol=2e-5, rtol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(ockv), np.asarray(ref_ckv))


def test_mono4_chain_ilp_matches_single_chain():
    """ilp=2 (two independent half-slab softmax chains, flash-stats merge)
    is numerically equivalent to the single chain — max_len >= 256 so the
    128-lane-aligned split actually engages."""
    from audio_llama_tpu.models.llama import quantize_kv_rows4
    from audio_llama_tpu.ops.decode_attention_mono import (
        decode_attention_quantized4_mono,
    )

    L, B, Hkv, S, hd = 1, 2, 2, 512, 32
    Hq = 4
    rng = np.random.RandomState(21)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    kv_new, ks_new, vs_new = quantize_kv_rows4(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
    )
    ckv, ks, vs = quantize_kv_rows4(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
    )
    valid = np.zeros((B, S), np.int32)
    valid[0, :300] = 1  # spans both chains
    valid[1, :100] = 1  # second chain fully dead for this row
    args = (q, kv_new, ckv, ks[0], vs[0], ks_new, vs_new,
            jnp.int32(0), jnp.int32(299), jnp.asarray(valid), hd ** -0.5)
    ref_out, ref_ckv = decode_attention_quantized4_mono(
        *args, interpret=True, ilp=1
    )
    out, ockv = decode_attention_quantized4_mono(
        *args, interpret=True, ilp=2
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), atol=2e-5, rtol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(ockv), np.asarray(ref_ckv))


def test_mono_q8_matches_db_q8():
    from audio_llama_tpu.models.llama import quantize_kv_rows
    from audio_llama_tpu.ops.decode_attention_db import (
        decode_attention_quantized_db,
    )
    from audio_llama_tpu.ops.decode_attention_mono import (
        decode_attention_quantized_mono,
    )

    L, B, Hkv, S, hd = 2, 3, 2, 64, 32
    Hq = 4
    rng = np.random.RandomState(21)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    k_new, ks_new = quantize_kv_rows(jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
    v_new, vs_new = quantize_kv_rows(jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
    ckq, ks = quantize_kv_rows(jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32))
    cvq, vs = quantize_kv_rows(jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32))
    valid = np.zeros((B, S), np.int32)
    valid[:, :20] = 1
    args = (q, k_new, v_new, ckq, cvq, ks[1], vs[1], ks_new, vs_new,
            jnp.int32(1), jnp.int32(19), jnp.asarray(valid), hd ** -0.5)
    ref = decode_attention_quantized_db(*args, interpret=True)
    out = decode_attention_quantized_mono(*args, interpret=True)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-5
        )


@pytest.mark.parametrize("kvq", [False, True, 4])
def test_llama_decode_mono_matches_xla(kvq):
    """llama_forward dispatch: attn_impl='decode_mono' (interpret) matches
    the XLA quantized path on a full single-token decode step."""
    from jax.experimental.pallas import tpu as pltpu

    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm

    cfg = LlamaConfig.tiny()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, P, total = 2, 10, 20
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 3, 500)
    cache0 = lm.KVCache.zeros(cfg, B, total, dtype=jnp.float32, quantized=kvq)
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
        out, m_cache = lm.llama_forward(
            params, cfg, input_ids=tok, attention_mask=mask, kv_cache=cache,
            compute_dtype=jnp.float32, attn_impl="decode_mono",
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-3, rtol=5e-3
    )
    if kvq:
        np.testing.assert_array_equal(
            np.asarray(m_cache.k), np.asarray(ref_cache.k)
        )
    else:
        # full-precision fresh row: the two separately-jitted programs
        # RoPE the appended k with different fusion orderings (~1e-6)
        np.testing.assert_allclose(
            np.asarray(m_cache.k), np.asarray(ref_cache.k), atol=1e-5
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("depth,hpd", [(None, None), (2, 2), (8, 1)])
def test_mono_full_matches_db(dtype, depth, hpd):
    """Full-precision mono kernel (bf16/f32 cache — no scales, no unpack)
    vs the db kernel, scalar offset."""
    from audio_llama_tpu.ops.decode_attention_db import decode_attention_db
    from audio_llama_tpu.ops.decode_attention_mono import (
        decode_attention_mono,
    )

    L, B, Hkv, S, hd = 2, 3, 2, 64, 32
    Hq = 4
    rng = np.random.RandomState(23)
    q = jnp.asarray(rng.randn(B, Hq, hd), dtype)
    k_new = jnp.asarray(rng.randn(B, Hkv, hd), dtype)
    v_new = jnp.asarray(rng.randn(B, Hkv, hd), dtype)
    ck = jnp.asarray(rng.randn(L, B, Hkv, S, hd), dtype)
    cv = jnp.asarray(rng.randn(L, B, Hkv, S, hd), dtype)
    valid = np.zeros((B, S), np.int32)
    valid[:, :22] = 1
    valid[1, 3:5] = 0
    args = (q, k_new, v_new, ck, cv,
            jnp.int32(1), jnp.int32(21), jnp.asarray(valid), hd ** -0.5)
    ref = decode_attention_db(*args, interpret=True)
    out = decode_attention_mono(*args, interpret=True, depth=depth, hpd=hpd)
    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out[0], np.float32), np.asarray(ref[0], np.float32),
        atol=tol, rtol=tol,
    )
    for a, b in zip(out[1:], ref[1:]):  # cache write-backs bit-exact
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )


def test_mono_full_per_row_offsets():
    """[B] offsets on the full-precision kernel == B scalar calls."""
    from audio_llama_tpu.ops.decode_attention_mono import (
        decode_attention_mono,
    )

    L, B, Hkv, S, hd = 2, 3, 2, 64, 32
    Hq = 4
    rng = np.random.RandomState(24)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32)
    ck = jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32)
    cv = jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32)
    offs = np.asarray([5, 21, 40], np.int32)
    valid = (np.arange(S)[None, :] <= offs[:, None]).astype(np.int32)
    out, ock, ocv = decode_attention_mono(
        q, k_new, v_new, ck, cv, jnp.int32(1), jnp.asarray(offs),
        jnp.asarray(valid), hd ** -0.5, interpret=True,
    )
    for b in range(B):
        sl = slice(b, b + 1)
        r_out, r_ck, r_cv = decode_attention_mono(
            q[sl], k_new[sl], v_new[sl], ck[:, sl], cv[:, sl],
            jnp.int32(1), jnp.int32(int(offs[b])), jnp.asarray(valid[sl]),
            hd ** -0.5, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out[sl]), np.asarray(r_out), atol=2e-5, rtol=2e-5
        )
        np.testing.assert_array_equal(np.asarray(ock[:, sl]), np.asarray(r_ck))
        np.testing.assert_array_equal(np.asarray(ocv[:, sl]), np.asarray(r_cv))


def test_mono4_per_row_offsets_match_per_row_calls():
    """[B] offset vector == stitching B independent scalar-offset calls
    (each row appends at its own slot and attends its own window)."""
    from audio_llama_tpu.models.llama import quantize_kv_rows4
    from audio_llama_tpu.ops.decode_attention_mono import (
        decode_attention_quantized4_mono,
    )

    L, B, Hkv, S, hd = 2, 3, 2, 64, 32
    Hq = 4
    rng = np.random.RandomState(22)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    kv_new, ks_new, vs_new = quantize_kv_rows4(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
    )
    ckv, ks, vs = quantize_kv_rows4(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
    )
    offs = np.asarray([5, 21, 40], np.int32)
    kpos = np.arange(S)[None, :]
    valid = (kpos <= offs[:, None]).astype(np.int32)

    out, ockv = decode_attention_quantized4_mono(
        q, kv_new, ckv, ks[1], vs[1], ks_new, vs_new,
        jnp.int32(1), jnp.asarray(offs), jnp.asarray(valid), hd ** -0.5,
        interpret=True,
    )
    for b in range(B):
        sl = slice(b, b + 1)
        ref_out, ref_ckv = decode_attention_quantized4_mono(
            q[sl], kv_new[sl], ckv[:, sl], ks[1, sl], vs[1, sl],
            ks_new[sl], vs_new[sl],
            jnp.int32(1), jnp.int32(int(offs[b])), jnp.asarray(valid[sl]),
            hd ** -0.5, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out[sl]), np.asarray(ref_out), atol=2e-5, rtol=2e-5
        )
        np.testing.assert_array_equal(
            np.asarray(ockv[:, sl]), np.asarray(ref_ckv)
        )


@pytest.mark.parametrize("kvq", [False, True, 4])
def test_llama_decode_mono_per_row_offsets_match_xla(kvq):
    """Full decode step with cache_offsets (divergent row timelines, the
    continuous-batching serving shape) dispatches to the mono kernel and
    matches the XLA cache_offsets path."""
    from jax.experimental.pallas import tpu as pltpu

    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm

    cfg = LlamaConfig.tiny()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, P, total = 3, 10, 32
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 3, 500)
    cache0 = lm.KVCache.zeros(cfg, B, total, dtype=jnp.float32, quantized=kvq)
    Tk = cache0.k.shape[3]
    _, cache = lm.llama_forward(
        params, cfg, input_ids=ids,
        attention_mask=jnp.ones((B, Tk), jnp.int32),
        kv_cache=cache0, compute_dtype=jnp.float32, attn_impl="xla",
    )
    # rows at different fill levels (e.g. admitted at different times)
    offs = jnp.asarray([10, 13, 17], jnp.int32)
    pos = offs[:, None]
    tok = jnp.asarray([[7], [9], [11]], jnp.int32)
    ref, ref_cache = lm.llama_forward(
        params, cfg, input_ids=tok, positions=pos, kv_cache=cache,
        cache_offsets=offs, compute_dtype=jnp.float32, attn_impl="xla",
    )
    with pltpu.force_tpu_interpret_mode():
        out, m_cache = lm.llama_forward(
            params, cfg, input_ids=tok, positions=pos, kv_cache=cache,
            cache_offsets=offs, compute_dtype=jnp.float32,
            attn_impl="decode_mono",
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-3, rtol=5e-3
    )
    if kvq:
        np.testing.assert_array_equal(
            np.asarray(m_cache.k), np.asarray(ref_cache.k)
        )
        np.testing.assert_allclose(
            np.asarray(m_cache.k_scale), np.asarray(ref_cache.k_scale),
            atol=1e-6, rtol=1e-6,
        )
    else:
        np.testing.assert_allclose(
            np.asarray(m_cache.k), np.asarray(ref_cache.k), atol=1e-5
        )


def test_mono4_kepi_matches_direct_unpack():
    """kepi (K logits via the raw-byte dot + epilogue; the cache stores K
    offset-binary) is numerically equivalent to direct unpack — including
    dead slots (zero bytes decode to k=-8, masked either way) and the
    analytic fresh row."""
    from audio_llama_tpu.models.llama import quantize_kv_rows4
    from audio_llama_tpu.ops.decode_attention_mono import (
        decode_attention_quantized4_mono,
    )

    L, B, Hkv, S, hd = 1, 2, 2, 128, 32
    Hq = 4
    rng = np.random.RandomState(22)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    kv_new, ks_new, vs_new = quantize_kv_rows4(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
    )
    ckv, ks, vs = quantize_kv_rows4(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
    )
    valid = np.zeros((B, S), np.int32)
    valid[0, :50] = 1
    valid[1, :33] = 1
    args = (q, kv_new, ckv, ks[0], vs[0], ks_new, vs_new,
            jnp.int32(0), jnp.int32(49), jnp.asarray(valid), hd ** -0.5)
    ref_out, ref_ckv = decode_attention_quantized4_mono(
        *args, interpret=True, kepi=0
    )
    out, ockv = decode_attention_quantized4_mono(
        *args, interpret=True, kepi=1
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), atol=5e-5, rtol=5e-5
    )
    np.testing.assert_array_equal(np.asarray(ockv), np.asarray(ref_ckv))


def test_mono_q8_slab_scales_match_per_layer():
    """int8 mono SLAB mode (full [L, ...] scale slabs, layer picked by the
    BlockSpec index map) is bit-identical to per-layer scale slices — the
    mode models/llama.py's int8 mono decode branch now uses (no per-layer
    dynamic_index materialization)."""
    from audio_llama_tpu.models.llama import quantize_kv_rows
    from audio_llama_tpu.ops.decode_attention_mono import (
        decode_attention_quantized_mono,
    )

    L, B, Hkv, S, hd = 3, 2, 2, 64, 32
    Hq = 4
    rng = np.random.RandomState(22)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    k_new, ks_new = quantize_kv_rows(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
    v_new, vs_new = quantize_kv_rows(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
    ckq, ks = quantize_kv_rows(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32))
    cvq, vs = quantize_kv_rows(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32))
    valid = np.zeros((B, S), np.int32)
    valid[:, :20] = 1
    tail = (jnp.int32(2), jnp.int32(19), jnp.asarray(valid), hd ** -0.5)
    ref = decode_attention_quantized_mono(
        q, k_new, v_new, ckq, cvq, ks[2], vs[2], ks_new, vs_new, *tail,
        interpret=True,
    )
    out = decode_attention_quantized_mono(
        q, k_new, v_new, ckq, cvq, ks, vs, ks_new, vs_new, *tail,
        interpret=True,
    )
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("bits", [4, 8])
def test_mono_ignores_poisoned_append_scale(bits):
    """The write→read reorder in models/llama.py (scales written into the
    slabs BEFORE the mono kernel reads them) depends on the mono kernels
    masking the append slot DEAD: the slab scale at `off` must never feed
    the output (the fresh row enters the softmax analytically through
    k/v_new_scale). Pin it by poisoning the append-slot scale with extreme
    finite garbage — outputs must be bit-identical. (Finite, not NaN: the
    dead slot's softmax weight is exactly 0, and 0 * NaN would manufacture
    a NaN the mask correctly never lets a real value produce.)"""
    from audio_llama_tpu.models.llama import (
        quantize_kv_rows,
        quantize_kv_rows4,
    )

    L, B, Hkv, S, hd = 2, 2, 2, 64, 32
    Hq = 4
    off = 19
    rng = np.random.RandomState(23)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    valid = np.zeros((B, S), np.int32)
    valid[:, : off + 1] = 1  # the append slot itself is marked valid
    tail = (jnp.int32(1), jnp.int32(off), jnp.asarray(valid), hd ** -0.5)

    def poison(s):
        s = np.asarray(s).copy()
        s[1, :, :, off] = 1e30
        return jnp.asarray(s)

    if bits == 4:
        from audio_llama_tpu.ops.decode_attention_mono import (
            decode_attention_quantized4_mono,
        )

        kv_new, ks_new, vs_new = quantize_kv_rows4(
            jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
            jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
        )
        ckv, ks, vs = quantize_kv_rows4(
            jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
            jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
        )
        ref = decode_attention_quantized4_mono(
            q, kv_new, ckv, ks, vs, ks_new, vs_new, *tail, interpret=True
        )
        out = decode_attention_quantized4_mono(
            q, kv_new, ckv, poison(ks), poison(vs), ks_new, vs_new, *tail,
            interpret=True,
        )
    else:
        from audio_llama_tpu.ops.decode_attention_mono import (
            decode_attention_quantized_mono,
        )

        k_new, ks_new = quantize_kv_rows(
            jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
        v_new, vs_new = quantize_kv_rows(
            jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32))
        ckq, ks = quantize_kv_rows(
            jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32))
        cvq, vs = quantize_kv_rows(
            jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32))
        ref = decode_attention_quantized_mono(
            q, k_new, v_new, ckq, cvq, ks, vs, ks_new, vs_new, *tail,
            interpret=True,
        )
        out = decode_attention_quantized_mono(
            q, k_new, v_new, ckq, cvq, poison(ks), poison(vs), ks_new,
            vs_new, *tail, interpret=True,
        )
    for a, b in zip(out, ref):
        assert np.all(np.isfinite(np.asarray(a, np.float32)))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("bb", [2, 3])
def test_mono4_bb_matches_bb1(bb):
    """bb (batch rows per grid program, MONO_BB): B/bb programs with the
    same global cross-program slab-DMA pipeline must reproduce the bb=1
    kernel bit-exactly — including per-row append offsets and rows whose
    fresh slot is invalid. bb=3 exercises the non-divisible fallback
    (B=4 % 3 != 0 -> bb=1)."""
    from audio_llama_tpu.models.llama import quantize_kv_rows4
    from audio_llama_tpu.ops.decode_attention_mono import (
        decode_attention_quantized4_mono,
    )

    L, B, Hkv, S, hd = 2, 4, 2, 64, 32
    Hq = 4
    rng = np.random.RandomState(30)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.float32)
    kv_new, ks_new, vs_new = quantize_kv_rows4(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
    )
    ckv, ks, vs = quantize_kv_rows4(
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
        jnp.asarray(rng.randn(L, B, Hkv, S, hd), jnp.float32),
    )
    valid = np.zeros((B, S), np.int32)
    valid[0, :20] = 1
    valid[1, :33] = 1
    valid[2, :7] = 1
    valid[3, :40] = 1
    valid[3, 39] = 0  # row 3's append slot marked invalid (fresh off)
    offs = jnp.asarray([19, 32, 6, 39], jnp.int32)  # per-row append slots
    args = (q, kv_new, ckv, ks, vs, ks_new, vs_new,
            jnp.int32(1), offs, jnp.asarray(valid), hd ** -0.5)
    ref_out, ref_ckv = decode_attention_quantized4_mono(
        *args, interpret=True, bb=1
    )
    out, ockv = decode_attention_quantized4_mono(
        *args, interpret=True, bb=bb
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    np.testing.assert_array_equal(np.asarray(ockv), np.asarray(ref_ckv))
    # scalar-offset variant too
    args_s = (q, kv_new, ckv, ks, vs, ks_new, vs_new,
              jnp.int32(1), jnp.int32(19), jnp.asarray(valid), hd ** -0.5)
    ref2 = decode_attention_quantized4_mono(*args_s, interpret=True, bb=1)
    got2 = decode_attention_quantized4_mono(*args_s, interpret=True, bb=bb)
    for a, b in zip(got2, ref2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_bb_policy():
    """Pin the measured round-5 auto-bb ladder (BASELINE r5 session 2):
    bb8 for B>=128, bb4 for B>=16, 1 below; divisibility falls down."""
    from audio_llama_tpu.ops.decode_attention_mono import _auto_bb

    assert _auto_bb(128) == 8
    assert _auto_bb(256) == 8
    assert _auto_bb(132) == 4   # 132 % 8 != 0 -> next rung
    assert _auto_bb(64) == 4
    assert _auto_bb(16) == 4
    assert _auto_bb(18) == 2
    assert _auto_bb(8) == 1
    assert _auto_bb(1) == 1
    assert _auto_bb(27) == 1
