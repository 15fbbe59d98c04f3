"""Causal GQA kernel (ops/causal_attention.py): forward parity vs XLA mha
and GRADIENT parity vs jax.grad through the XLA path (the training path
differentiates through attention to reach LoRA)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.ops.attention import (
    causal_bias, combine_bias, mha, padding_bias,
)
from audio_llama_tpu.ops.causal_attention import causal_mha


def _setup(B=2, T=256, Hq=4, Hkv=2, hd=32, pad_row=0, pad_from=200, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (B, T, Hq, hd), jnp.float32) * 0.5
    k = jax.random.normal(k2, (B, T, Hkv, hd), jnp.float32) * 0.5
    v = jax.random.normal(k3, (B, T, Hkv, hd), jnp.float32) * 0.5
    mask = np.ones((B, T), np.int32)
    if pad_from:
        mask[pad_row, pad_from:] = 0
    mask = jnp.asarray(mask)
    bias = combine_bias(causal_bias(T, T), padding_bias(mask))
    return q, k, v, mask, bias


@pytest.mark.parametrize("impl", ["blocks", "dma", "dma2"])
def test_forward_matches_xla(impl):
    q, k, v, mask, bias = _setup()
    ref = mha(q, k, v, bias=bias)
    out = causal_mha(q, k, v, mask=mask, interpret=True,
                     block_q=128, chunk_k=128, fwd_impl=impl)
    m = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(ref)[m], atol=2e-5, rtol=2e-5
    )


def test_forward_no_mask_mha_heads():
    q, k, v, _, _ = _setup(Hq=2, Hkv=2, pad_from=0)
    bias = causal_bias(256, 256)
    ref = mha(q, k, v, bias=bias)
    out = causal_mha(q, k, v, interpret=True, block_q=256, chunk_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_gradients_match_xla():
    q, k, v, mask, bias = _setup()
    w = mask.astype(jnp.float32)[..., None, None]

    def loss_ref(q, k, v):
        return jnp.sum((mha(q, k, v, bias=bias) * w) ** 2)

    def loss_new(q, k, v):
        o = causal_mha(q, k, v, mask=mask, interpret=True,
                       block_q=128, chunk_k=128)
        return jnp.sum((o * w) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_new, argnums=(0, 1, 2))(q, k, v)
    m = np.asarray(mask, bool)
    for a, b, name in zip(gr, gn, "qkv"):
        a, b = np.asarray(a), np.asarray(b)
        if name == "q":  # padded-query rows are garbage by contract
            a, b = a[m], b[m]
        np.testing.assert_allclose(b, a, atol=5e-4, rtol=5e-4, err_msg=name)


def test_block_variants_agree():
    q, k, v, mask, _ = _setup()
    a = causal_mha(q, k, v, mask=mask, interpret=True, block_q=128, chunk_k=128)
    b = causal_mha(q, k, v, mask=mask, interpret=True, block_q=256, chunk_k=256)
    m = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(a)[m], np.asarray(b)[m],
                               atol=1e-5, rtol=1e-5)


def test_bf16_io():
    q, k, v, mask, bias = _setup(pad_from=0)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = mha(q, k, v, bias=causal_bias(256, 256)).astype(np.float32)
    out = causal_mha(qb, kb, vb, interpret=True,
                     block_q=128, chunk_k=128).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_llama_forward_dispatch_and_lora_grads():
    """llama_forward attn_impl='causal_kernel_interpret' matches 'xla' on
    logits AND on LoRA gradients (the training path differentiates through
    attention to reach the adapters)."""
    from audio_llama_tpu.config import LlamaConfig, LoraConfig
    from audio_llama_tpu.models import llama as lm
    from audio_llama_tpu.models import lora as lora_mod

    cfg = LlamaConfig.tiny(vocab_size=512)
    params = lm.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    lcfg = LoraConfig(rank=4, alpha=8.0, init="standard")
    lp = lora_mod.init_params(cfg, lcfg, jax.random.PRNGKey(1))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 128), 3, 500)
    mask = np.ones((2, 128), np.int32)
    mask[1, 100:] = 0
    mask = jnp.asarray(mask)
    labels = jax.random.randint(jax.random.PRNGKey(3), (2, 128), 3, 500)

    def loss(lp, impl):
        logits, _ = lm.llama_forward(
            params, cfg, input_ids=ids, attention_mask=mask,
            lora=lora_mod.with_scaling(lp, lcfg),
            compute_dtype=jnp.float32, attn_impl=impl,
        )
        return lm.causal_lm_loss(
            logits, jnp.where(mask.astype(bool), labels, -100)
        )

    l_ref, g_ref = jax.value_and_grad(loss)(lp, "xla")
    l_new, g_new = jax.value_and_grad(loss)(lp, "causal_kernel_interpret")
    np.testing.assert_allclose(float(l_new), float(l_ref), rtol=1e-4)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_new),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-3,
            err_msg=str(pa),
        )


def test_odd_length_self_pads():
    """T=200 (not a tile multiple) — e.g. the 2014-token generation prefill
    — pads internally like flash_mha (regression: the first integration
    raised on the decode bench's prefill)."""
    q, k, v, mask, bias = _setup(T=200, pad_from=180)
    ref = mha(q, k, v, bias=bias)
    out = causal_mha(q, k, v, mask=mask, interpret=True,
                     block_q=128, chunk_k=128)
    m = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(ref)[m], atol=2e-5, rtol=2e-5
    )


def _outlier_setup(B=1, T=256, Hq=2, Hkv=1, hd=128, seed=7):
    """Realistic/outlier magnitudes (round-2 ADVICE, severity medium):
    logits reach ~30-50 AND one huge-norm key is near-orthogonal to every
    query, so the Cauchy-Schwarz bound ||q||*max||k|| exceeds the true row
    max by hundreds of nats — the regime where the 'bounded' softmax
    underflows f32 exp and silently zeroes rows."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    # queries/keys scaled so aligned pairs score ~|q||k|/8/sqrt(hd) ~ 40
    q = jax.random.normal(k1, (B, T, Hq, hd), jnp.float32) * 2.0
    k = jax.random.normal(k2, (B, T, Hkv, hd), jnp.float32) * 2.0
    # plant an attention-sink-style outlier key at position 0: norm ~60x
    # typical, in a direction orthogonal to the span of the queries
    # (approximately: a fresh random direction in hd=128)
    outlier_dir = jax.random.normal(jax.random.PRNGKey(99), (hd,))
    outlier_dir = outlier_dir / jnp.linalg.norm(outlier_dir)
    k = k.at[:, 0, :, :].set(outlier_dir[None, None, :] * 1500.0)
    v = jax.random.normal(k3, (B, T, Hkv, hd), jnp.float32)
    return q, k, v


def test_outlier_magnitudes_online_matches_xla():
    q, k, v = _outlier_setup()
    T = q.shape[1]
    ref = mha(q, k, v, bias=causal_bias(T, T))
    out = causal_mha(q, k, v, interpret=True, block_q=128, chunk_k=128,
                     softmax_mode="online")
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_outlier_magnitudes_online_grads_finite_and_match():
    q, k, v = _outlier_setup(T=128)
    T = q.shape[1]
    bias = causal_bias(T, T)

    def loss_ref(q, k, v):
        return jnp.sum(mha(q, k, v, bias=bias) ** 2)

    def loss_new(q, k, v):
        o = causal_mha(q, k, v, interpret=True, block_q=128, chunk_k=128,
                       softmax_mode="online")
        return jnp.sum(o ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_new, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gn, "qkv"):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all(), name
        np.testing.assert_allclose(b, a, atol=5e-3, rtol=5e-3, err_msg=name)


def test_twopass_forward_matches_xla():
    """'twopass' (separate global-max k-pass, no rescale chain) must match
    XLA exactly like 'online' — including padded keys and GQA."""
    q, k, v, mask, bias = _setup()
    ref = mha(q, k, v, bias=bias)
    out = causal_mha(q, k, v, mask=mask, interpret=True,
                     block_q=128, chunk_k=128, softmax_mode="twopass")
    m = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(ref)[m], atol=2e-5, rtol=2e-5
    )


def test_twopass_grads_match_xla():
    """twopass reuses the shared backward via identical (l, c) residuals."""
    q, k, v, mask, bias = _setup(T=128, pad_from=100)
    w = mask.astype(jnp.float32)[..., None, None]

    def loss_ref(q, k, v):
        return jnp.sum((mha(q, k, v, bias=bias) * w) ** 2)

    def loss_new(q, k, v):
        o = causal_mha(q, k, v, mask=mask, interpret=True,
                       block_q=128, chunk_k=128, softmax_mode="twopass")
        return jnp.sum((o * w) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_new, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gn, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-3, rtol=5e-3, err_msg=name
        )


def test_outlier_magnitudes_twopass_matches_xla():
    q, k, v = _outlier_setup()
    T = q.shape[1]
    ref = mha(q, k, v, bias=causal_bias(T, T))
    out = causal_mha(q, k, v, interpret=True, block_q=128, chunk_k=128,
                     softmax_mode="twopass")
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_outlier_magnitudes_bounded_mode_underflows():
    """Documents WHY 'online' is the production default: at outlier
    magnitudes the bounded mode loses the real rows to exp underflow
    (this is the failure the online mode eliminates, not a regression)."""
    q, k, v = _outlier_setup()
    T = q.shape[1]
    ref = mha(q, k, v, bias=causal_bias(T, T))
    out = causal_mha(q, k, v, interpret=True, block_q=128, chunk_k=128,
                     softmax_mode="bounded")
    err = np.max(np.abs(np.asarray(out) - np.asarray(ref)))
    assert err > 0.1, (
        f"bounded mode unexpectedly accurate (max err {err}); if the bound "
        "got tightened, fold it into 'online' and update this test"
    )
