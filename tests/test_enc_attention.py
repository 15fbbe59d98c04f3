"""Encoder attention kernel (ops/enc_attention.py) parity vs XLA mha
(interpret mode on CPU), incl. the static-padding bias and the denominator-
in-matmul trick."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_llama_tpu.ops.attention import mha, padding_bias
from audio_llama_tpu.ops.enc_attention import enc_attention


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.5


import pytest


@pytest.mark.parametrize("algo", ["bounded", "twopass", "v3"])
def test_full_matches_xla(algo):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    B, T, H, hd = 2, 128, 4, 32
    q, k, v = _rand(k1, B, T, H, hd), _rand(k2, B, T, H, hd), _rand(k3, B, T, H, hd)
    ref = mha(q, k, v)
    out = enc_attention(q, k, v, interpret=True, algo=algo)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_valid_len_matches_masked_xla():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    B, T, H, hd = 2, 256, 2, 16
    valid = 200
    q, k, v = _rand(k1, B, T, H, hd), _rand(k2, B, T, H, hd), _rand(k3, B, T, H, hd)
    mask = jnp.asarray(
        np.concatenate([np.ones((B, valid)), np.zeros((B, T - valid))], axis=1),
        jnp.int32,
    )
    ref = mha(q, k, v, bias=padding_bias(mask))
    out = enc_attention(q, k, v, valid_len=valid, interpret=True)
    for algo in ("twopass", "v3"):
        out2 = enc_attention(q, k, v, valid_len=valid, interpret=True, algo=algo)
        np.testing.assert_allclose(
            np.asarray(out2)[:, :valid], np.asarray(ref)[:, :valid],
            atol=2e-5, rtol=2e-5,
        )
    # padded-query rows are garbage by contract; compare real rows only
    np.testing.assert_allclose(
        np.asarray(out)[:, :valid], np.asarray(ref)[:, :valid],
        atol=2e-5, rtol=2e-5,
    )


def test_bf16_io_and_exp():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    B, T, H, hd = 1, 128, 2, 32
    q = _rand(k1, B, T, H, hd).astype(jnp.bfloat16)
    k = _rand(k2, B, T, H, hd).astype(jnp.bfloat16)
    v = _rand(k3, B, T, H, hd).astype(jnp.bfloat16)
    ref = mha(q, k, v).astype(jnp.float32)
    out32 = enc_attention(q, k, v, interpret=True).astype(jnp.float32)
    out16 = enc_attention(
        q, k, v, exp_dtype=jnp.bfloat16, interpret=True
    ).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out32), np.asarray(ref), atol=3e-2, rtol=3e-2)
    # bf16 exp costs a little accuracy, bounded
    np.testing.assert_allclose(np.asarray(out16), np.asarray(ref), atol=6e-2, rtol=6e-2)


def test_block_q_variants_agree():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    B, T, H, hd = 1, 256, 2, 64
    q, k, v = _rand(k1, B, T, H, hd), _rand(k2, B, T, H, hd), _rand(k3, B, T, H, hd)
    a = enc_attention(q, k, v, block_q=128, interpret=True)
    b = enc_attention(q, k, v, block_q=256, interpret=True)
    c = enc_attention(q, k, v, block_q=128, interpret=True, algo="twopass")
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)


def test_int8_encoder_dispatch():
    """encode_int8 attn_impl='enc_kernel_interpret' stays close to xla."""
    from audio_llama_tpu.config import WhisperConfig
    from audio_llama_tpu.models import whisper as wm
    from audio_llama_tpu.models import whisper_int8 as w8

    cfg = WhisperConfig.tiny()
    params = wm.init_params(cfg, jax.random.PRNGKey(6), jnp.float32)
    qp = w8.quantize_encoder(params)
    mel = jax.random.normal(jax.random.PRNGKey(7), (1, cfg.num_mel_bins, 128)) * 0.5
    ref = w8.encode_int8(qp, cfg, mel, jnp.float32, attn_impl="xla")
    out = w8.encode_int8(qp, cfg, mel, jnp.float32, attn_impl="enc_kernel_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_whisper_encode_dispatch():
    """whisper.encode attn_impl='enc_kernel' (interpret) matches 'xla'."""
    from audio_llama_tpu.config import WhisperConfig
    from audio_llama_tpu.models import whisper as wm

    cfg = WhisperConfig.tiny()
    params = wm.init_params(cfg, jax.random.PRNGKey(4), jnp.float32)
    mel = jax.random.normal(jax.random.PRNGKey(5), (2, cfg.num_mel_bins, 128)) * 0.5
    ref = wm.encode(params, cfg, mel, jnp.float32, attn_impl="xla")
    out = wm.encode(params, cfg, mel, jnp.float32, attn_impl="enc_kernel_interpret")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_outlier_magnitudes_safe_softmax():
    """Round-3: the v3 production kernel must stay exact at outlier
    activation magnitudes (huge-norm key near-orthogonal to queries), where
    the round-2 'bounded' Cauchy-Schwarz shift underflows f32 exp and
    silently zeroes rows — same failure class the llama causal kernel
    fixed. 'safe' (true row max; exact two-pass when unchunked, running max
    when chunked) is the default; 'bounded' stays for A/B and must still
    FAIL here (if it stops failing, fold it back and delete this guard)."""
    import jax

    from audio_llama_tpu.ops.attention import mha

    B, T, H, hd = 1, 256, 2, 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, T, H, hd), jnp.float32) * 2.0
    k = jax.random.normal(k2, (B, T, H, hd), jnp.float32) * 2.0
    d = jax.random.normal(jax.random.PRNGKey(9), (hd,))
    d = d / jnp.linalg.norm(d)
    k = k.at[:, 0].set(d[None, :] * 1200.0)
    v = jax.random.normal(k3, (B, T, H, hd), jnp.float32)
    ref = mha(q, k, v, bias=None, scale=hd ** -0.5)

    for kw in (dict(), dict(chunk_k=128)):  # unchunked + chunked safe paths
        out = enc_attention(q, k, v, scale=hd ** -0.5, interpret=True, **kw)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4,
            err_msg=str(kw),
        )

    bad = enc_attention(
        q, k, v, scale=hd ** -0.5, interpret=True, softmax="bounded"
    )
    assert float(jnp.max(jnp.abs(bad - ref))) > 0.1


def test_v3q_int8_close_to_xla():
    """v3q (int8 QK + int8 PV, SageAttention-family scheme) tracks the f32
    oracle within the int8-attention error envelope, padding included.
    Exactness is impossible (int8 quantization); the gate is relative RMS
    of the real rows."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    B, T, H, hd = 2, 256, 4, 64
    valid = 200
    q, k, v = _rand(k1, B, T, H, hd), _rand(k2, B, T, H, hd), _rand(k3, B, T, H, hd)
    # give K a nonzero mean so the smoothing path actually does work
    k = k + 0.7
    mask = jnp.asarray(
        np.concatenate([np.ones((B, valid)), np.zeros((B, T - valid))], axis=1),
        jnp.int32,
    )
    ref = np.asarray(mha(q, k, v, bias=padding_bias(mask)))[:, :valid]
    out = np.asarray(
        enc_attention(q, k, v, valid_len=valid, interpret=True, algo="v3q")
    )[:, :valid]
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    # and the full-length (no padding) path
    ref2 = np.asarray(mha(q, k, v))
    out2 = np.asarray(enc_attention(q, k, v, interpret=True, algo="v3q"))
    rel2 = np.linalg.norm(out2 - ref2) / np.linalg.norm(ref2)
    assert rel2 < 0.02, rel2
