"""Rematerialization parity: remat=True (recompute layer activations in
backward) must not change loss or gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm


def test_remat_loss_and_grads_match():
    cfg = AudioLLMConfig.tiny()
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    rng = np.random.RandomState(0)
    batch = allm.AudioLLMBatch(
        input_ids=jnp.asarray(rng.randint(3, 250, (2, 10)), jnp.int32),
        attention_mask=jnp.ones((2, 10), jnp.int32),
        audio_features=jnp.asarray(
            rng.randn(2, cfg.mel.max_samples).astype(np.float32) * 0.1
        ),
        labels=jnp.asarray(rng.randint(3, 250, (2, 10)), jnp.int32),
    )

    def loss(t, remat):
        return allm.forward(
            frozen, t, cfg, batch, 260, 261, jnp.float32, remat=remat
        )[0]

    l1, g1 = jax.value_and_grad(lambda t: loss(t, False))(trainable)
    l2, g2 = jax.value_and_grad(lambda t: loss(t, True))(trainable)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_remat_composes_with_chunked_loss():
    cfg = AudioLLMConfig.tiny()
    kf, kt = jax.random.split(jax.random.PRNGKey(1))
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    rng = np.random.RandomState(1)
    batch = allm.AudioLLMBatch(
        input_ids=jnp.asarray(rng.randint(3, 250, (1, 12)), jnp.int32),
        attention_mask=jnp.ones((1, 12), jnp.int32),
        audio_features=jnp.asarray(
            rng.randn(1, cfg.mel.max_samples).astype(np.float32) * 0.1
        ),
        labels=jnp.asarray(rng.randint(3, 250, (1, 12)), jnp.int32),
    )

    def loss(t, **kw):
        return allm.forward(frozen, t, cfg, batch, 260, 261, jnp.float32, **kw)[0]

    l_ref = float(loss(trainable))
    l_both, g = jax.value_and_grad(
        lambda t: loss(t, remat=True, loss_chunk_size=16)
    )(trainable)
    np.testing.assert_allclose(float(l_both), l_ref, rtol=1e-5)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
