"""Chunked cross-entropy parity: scan-over-chunks loss (no [B,T,V] logits in
memory) must match the dense loss in value AND gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import AudioLLMConfig, LlamaConfig
from audio_llama_tpu.models import allm
from audio_llama_tpu.models import llama as lm


def test_loss_from_hidden_matches_dense():
    cfg = LlamaConfig.tiny()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(0)
    B, T = 2, 37  # deliberately not a multiple of the chunk size
    hidden = jnp.asarray(rng.randn(B, T, cfg.hidden_size).astype(np.float32))
    labels = rng.randint(3, 500, (B, T)).astype(np.int32)
    labels[0, :10] = -100
    labels[1, 30:] = -100
    labels = jnp.asarray(labels)

    dense = lm.causal_lm_loss(
        lm.unembed(params, cfg, hidden, jnp.float32), labels
    )
    for chunk in (8, 16, 64):
        chunked = lm.causal_lm_loss_from_hidden(
            params, cfg, hidden, labels, chunk_size=chunk,
            compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(float(chunked), float(dense), rtol=1e-5)


def test_chunked_forward_grads_match_dense():
    cfg = AudioLLMConfig.tiny()
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    rng = np.random.RandomState(1)
    T = 20
    batch = allm.AudioLLMBatch(
        input_ids=jnp.asarray(rng.randint(3, 250, (2, T)), jnp.int32),
        attention_mask=jnp.ones((2, T), jnp.int32),
        audio_features=jnp.asarray(rng.randn(2, cfg.mel.max_samples), jnp.float32) * 0.1,
        labels=jnp.asarray(rng.randint(3, 250, (2, T)), jnp.int32),
    )

    def loss_dense(t):
        return allm.forward(frozen, t, cfg, batch, 260, 261, jnp.float32)[0]

    def loss_chunked(t):
        return allm.forward(
            frozen, t, cfg, batch, 260, 261, jnp.float32, loss_chunk_size=16
        )[0]

    l1, g1 = jax.value_and_grad(loss_dense)(trainable)
    l2, g2 = jax.value_and_grad(loss_chunked)(trainable)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
