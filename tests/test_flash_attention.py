"""Flash-attention wrapper parity vs the XLA attention (interpret mode on CPU).

Covers the two call sites: whisper-style (non-causal, no mask) and
llama-style (causal + padding, GQA), plus gradient parity through the
kernel's custom VJP (the training path differentiates through attention to
reach LoRA).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from audio_llama_tpu.ops.attention import causal_bias, combine_bias, mha, padding_bias
from audio_llama_tpu.ops.flash_attention import flash_mha


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.5


def test_noncausal_matches_xla():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    B, T, H, hd = 2, 96, 4, 32
    q, k, v = _rand(k1, B, T, H, hd), _rand(k2, B, T, H, hd), _rand(k3, B, T, H, hd)
    ref = mha(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_mha(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_causal_padding_gqa_matches_xla():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    B, T, Hq, Hkv, hd = 2, 64, 4, 2, 16
    q = _rand(k1, B, T, Hq, hd)
    k = _rand(k2, B, T, Hkv, hd)
    v = _rand(k3, B, T, Hkv, hd)
    mask = np.ones((B, T), np.int32)
    mask[0, 40:] = 0  # right padding on row 0
    mask = jnp.asarray(mask)

    bias = combine_bias(causal_bias(T, T), padding_bias(mask))
    ref = mha(q, k, v, bias=bias)
    with pltpu.force_tpu_interpret_mode():
        out = flash_mha(q, k, v, mask=mask, causal=True)
    # compare only non-pad query rows (pad rows are garbage by contract)
    m = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(ref)[m], atol=2e-5, rtol=2e-5
    )


def test_gradients_match_xla():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    B, T, H, hd = 1, 32, 2, 16
    q = _rand(k1, B, T, H, hd)
    k = _rand(k2, B, T, H, hd)
    v = _rand(k3, B, T, H, hd)

    def loss_ref(q, k, v):
        return jnp.sum(mha(q, k, v, bias=causal_bias(T, T)) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, causal=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_llama_forward_flash_matches_xla():
    """Full decoder forward: attn_impl='flash' (interpret) vs 'xla'."""
    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm

    cfg = LlamaConfig.tiny()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 3, 500)
    mask = np.ones((2, 24), np.int32)
    mask[1, 20:] = 0
    mask = jnp.asarray(mask)

    ref, _ = lm.llama_forward(
        params, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    with pltpu.force_tpu_interpret_mode():
        out, _ = lm.llama_forward(
            params, cfg, input_ids=ids, attention_mask=mask,
            compute_dtype=jnp.float32, attn_impl="flash",
        )
    m = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(ref)[m], atol=2e-4, rtol=2e-4
    )


def test_whisper_encode_flash_matches_xla():
    """Encoder with hoisted stack padding (flash) vs the XLA path."""
    from audio_llama_tpu.config import WhisperConfig
    from audio_llama_tpu.models import whisper as wm

    cfg = WhisperConfig.tiny()  # T=64 -> pads to the 512 tile
    params = wm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.num_mel_bins, 128)) * 0.5
    ref = wm.encode(params, cfg, mel, jnp.float32, attn_impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = wm.encode(params, cfg, mel, jnp.float32, attn_impl="flash")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )
