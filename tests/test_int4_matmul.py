"""W4A16 int4 dequant matmul (ops/int4_matmul.py): pack/unpack round trip,
kernel-vs-XLA-oracle parity (interpret mode), and quantization error bounds
at llama-like shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.ops.int4_matmul import (
    dequantize_ref,
    int4_matmul,
    int4_matmul_ref,
    quantize_pack,
    unpack_ref,
)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    q = rng.randint(-7, 8, (256, 512)).astype(np.int8)
    # build a float matrix whose int4 quantization is exactly q: scale 1 per
    # group when values are already integers in [-7, 7]
    w = jnp.asarray(q, jnp.float32) * 1.0
    packed, scales = quantize_pack(w, group=128)
    assert packed.shape == (256, 256) and packed.dtype == jnp.int8
    got = unpack_ref(packed)
    # scales won't be exactly 1 (absmax/7 per group) but dequant must
    # reproduce w exactly when w/scale rounds to integers
    deq = dequantize_ref(packed, scales, group=128)
    np.testing.assert_allclose(np.asarray(deq), np.asarray(w), atol=1e-5)
    assert got.min() >= -7 and got.max() <= 7


def test_kernel_matches_ref_interpret():
    rng = np.random.RandomState(1)
    K, N = 256, 512
    w = jnp.asarray(rng.randn(K, N).astype(np.float32)) * 0.05
    packed, scales = quantize_pack(w, group=128)
    for M in (1, 2, 8, 64):
        x = jnp.asarray(rng.randn(M, K).astype(np.float32)) * 0.5
        ref = int4_matmul_ref(x, packed, scales, compute_dtype=jnp.float32)
        got = int4_matmul(x, packed, scales, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4,
            err_msg=f"M={M}",
        )


def test_kernel_leading_dims_and_bf16():
    rng = np.random.RandomState(2)
    K, N = 256, 256
    w = jnp.asarray(rng.randn(K, N).astype(np.float32)) * 0.05
    packed, scales = quantize_pack(w)
    x = jnp.asarray(rng.randn(2, 3, K).astype(np.float32) * 0.5, jnp.bfloat16)
    ref = int4_matmul_ref(x, packed, scales)
    got = int4_matmul(x, packed, scales, interpret=True)
    assert got.shape == (2, 3, N) and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_quantization_error_bounded():
    """int4 RTN group-128 on Gaussian weights has a KNOWN error envelope:
    quant step = absmax/7 ~ 0.4 sigma (group absmax ~ 2.8 sigma at n=128),
    per-weight RMS error = step/sqrt(12) ~ 0.115 sigma, and because matmul
    error and signal scale identically with ||x|| and K, the OUTPUT relative
    error sits at ~11-12% regardless of K. This is the same envelope
    AWQ/GPTQ-class W4A16 serving lives with (LLMs tolerate it; end-task
    accuracy is gated separately by the toy-WER harness). The assert pins
    the implementation to the theory — a packing/scale bug would blow past
    it immediately."""
    rng = np.random.RandomState(3)
    K, N = 1024, 1024
    w = jnp.asarray(rng.randn(K, N).astype(np.float32)) * 0.02
    x = jnp.asarray(rng.randn(4, K).astype(np.float32)) * 0.5
    packed, scales = quantize_pack(w)
    exact = x @ w
    quant = int4_matmul_ref(x, packed, scales, compute_dtype=jnp.float32)
    rel = np.linalg.norm(np.asarray(quant) - np.asarray(exact)) / np.linalg.norm(
        np.asarray(exact)
    )
    assert 0.08 < rel < 0.15, rel


def test_stacked_kernel_matches_ref_interpret():
    """int4_matmul_stacked (scalar-prefetch layer selection — the decode
    production path) vs the per-layer oracle, in INTERPRET mode so the
    actual pallas_call structure is validated on CPU (the first TPU run
    caught an in_specs/operand mismatch the ref-path tests couldn't)."""
    from audio_llama_tpu.ops.int4_matmul import int4_matmul_stacked

    rng = np.random.RandomState(5)
    L, K, N = 3, 256, 512
    packed_l, scales_l = [], []
    ws = []
    for l in range(L):
        w = jnp.asarray(rng.randn(K, N).astype(np.float32)) * 0.05
        ws.append(w)
        p, s = quantize_pack(w, group=128)
        packed_l.append(p)
        scales_l.append(s)
    packed_all = jnp.stack(packed_l)
    scales_all = jnp.stack(scales_l)
    x = jnp.asarray(rng.randn(4, K).astype(np.float32)) * 0.5
    for l in range(L):
        ref = int4_matmul_ref(x, packed_l[l], scales_l[l],
                              compute_dtype=jnp.float32)
        got = int4_matmul_stacked(
            x, packed_all, scales_all, jnp.asarray(l, jnp.int32),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4,
            err_msg=f"layer {l}",
        )


@pytest.mark.parametrize("fmt", ["pair", "obin"])
def test_stacked_kernel_ksplit_matches_whole_k(fmt):
    """block_k (INT4_BK): the contraction-split grid (mi, ni, ki-minor
    with scratch accumulation) matches the whole-K grid — the round-5 B1
    pipeline-fill lever. Covers both pack formats (obin's epilogue terms
    are per scale group, so the K split must not change them)."""
    from audio_llama_tpu.ops.int4_matmul import int4_matmul_stacked

    rng = np.random.RandomState(6)
    L, K, N = 2, 512, 512  # 4 scale groups -> block_k=256 is 2 K blocks
    packed_l, scales_l = [], []
    for l in range(L):
        w = jnp.asarray(rng.randn(K, N).astype(np.float32)) * 0.05
        p, s = quantize_pack(w, group=128, fmt=fmt)
        packed_l.append(p)
        scales_l.append(s)
    packed_all = jnp.stack(packed_l)
    scales_all = jnp.stack(scales_l)
    for M in (1, 4):
        x = jnp.asarray(rng.randn(M, K).astype(np.float32)) * 0.5
        for l in range(L):
            li = jnp.asarray(l, jnp.int32)
            ref = int4_matmul_stacked(
                x, packed_all, scales_all, li, interpret=True, fmt=fmt,
            )
            got = int4_matmul_stacked(
                x, packed_all, scales_all, li, interpret=True, fmt=fmt,
                block_k=256,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5,
                err_msg=f"layer {l} M={M}",
            )
    # geometry fallbacks: block_k not dividing K / not a group multiple
    x = jnp.asarray(rng.randn(2, K).astype(np.float32))
    for bad in (384, 200):
        out = int4_matmul_stacked(
            x, packed_all, scales_all, jnp.asarray(0, jnp.int32),
            interpret=True, block_k=bad,
        )
        ref = int4_matmul_stacked(
            x, packed_all, scales_all, jnp.asarray(0, jnp.int32),
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
