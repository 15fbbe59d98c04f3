"""Chunked long-audio encoding: waveforms of N windows encode to N
concatenated encoder-frame blocks and feed the splice/forward unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm


@pytest.fixture(scope="module")
def model():
    cfg = AudioLLMConfig.tiny()
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    return cfg, frozen, trainable


def test_chunked_encode_matches_per_window(model):
    cfg, frozen, trainable = model
    S, A = cfg.mel.max_samples, cfg.audio_seq_len
    rng = np.random.RandomState(0)
    long_audio = jnp.asarray(rng.randn(2, 3 * S).astype(np.float32) * 0.1)

    enc = allm.process_audio_features(frozen, cfg, long_audio, jnp.float32)
    assert enc.shape == (2, 3 * A, cfg.whisper.d_model)
    for w in range(3):
        ref = allm.process_audio_features(
            frozen, cfg, long_audio[:, w * S : (w + 1) * S], jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(enc[:, w * A : (w + 1) * A]), np.asarray(ref), atol=1e-5
        )


def test_forward_with_long_audio(model):
    cfg, frozen, trainable = model
    S = cfg.mel.max_samples
    rng = np.random.RandomState(1)
    T = 12
    batch = allm.AudioLLMBatch(
        input_ids=jnp.asarray(rng.randint(3, 250, (2, T)), jnp.int32),
        attention_mask=jnp.ones((2, T), jnp.int32),
        audio_features=jnp.asarray(rng.randn(2, 2 * S).astype(np.float32) * 0.1),
        labels=jnp.asarray(rng.randint(3, 250, (2, T)), jnp.int32),
    )
    loss, logits = allm.forward(
        frozen, trainable, cfg, batch, 260, 261, compute_dtype=jnp.float32
    )
    assert logits.shape[1] == 2 * cfg.audio_seq_len + 2 + T
    assert np.isfinite(float(loss))


def test_non_multiple_length_raises(model):
    cfg, frozen, _ = model
    S = cfg.mel.max_samples
    bad = jnp.zeros((1, S + 7), jnp.float32)
    with pytest.raises(ValueError, match="multiple"):
        allm.process_audio_features(frozen, cfg, bad, jnp.float32)
