"""AudioLLM facade tests: the reference-style object surface over the
functional core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.data.tokenizer import ByteTokenizer
from audio_llama_tpu.models import allm
from audio_llama_tpu.models.api import AudioLLM


@pytest.fixture(scope="module")
def model():
    cfg = AudioLLMConfig.tiny()
    tk = ByteTokenizer()
    cfg = cfg.replace(llama=cfg.llama.replace(vocab_size=max(tk.vocab_size, 384)))
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    return AudioLLM(cfg, frozen, trainable, tk)


def test_forward_and_trainable_params(model):
    rng = np.random.RandomState(0)
    batch = allm.AudioLLMBatch(
        input_ids=jnp.asarray(rng.randint(3, 250, (2, 10)), jnp.int32),
        attention_mask=jnp.ones((2, 10), jnp.int32),
        audio_features=jnp.asarray(
            rng.randn(2, model.cfg.mel.max_samples).astype(np.float32) * 0.1
        ),
        labels=jnp.asarray(rng.randint(3, 250, (2, 10)), jnp.int32),
    )
    loss, logits = model(batch, compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    assert set(model.get_trainable_params()) == {"projector", "lora"}
    assert model.num_trainable_params() > 0


def test_generate_text_only(model):
    out = model.generate("hello world", max_new_tokens=6, greedy=True)
    assert isinstance(out, str)


def test_merge_lora_preserves_forward(model):
    """Zero-init-delta LoRA ('ref' init has A=0): merged == unmerged."""
    rng = np.random.RandomState(1)
    batch = allm.AudioLLMBatch(
        input_ids=jnp.asarray(rng.randint(3, 250, (1, 8)), jnp.int32),
        attention_mask=jnp.ones((1, 8), jnp.int32),
        audio_features=None,
        labels=jnp.asarray(rng.randint(3, 250, (1, 8)), jnp.int32),
    )
    loss1, _ = model(batch, compute_dtype=jnp.float32)
    merged = model.merge_lora()
    assert merged.cfg.lora is None and "lora" not in merged.trainable
    loss2, _ = merged(batch, compute_dtype=jnp.float32)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)


def test_to_mesh(model):
    from audio_llama_tpu.parallel import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    sharded = model.to_mesh(mesh)
    rng = np.random.RandomState(2)
    batch = allm.AudioLLMBatch(
        input_ids=jnp.asarray(rng.randint(3, 250, (4, 8)), jnp.int32),
        attention_mask=jnp.ones((4, 8), jnp.int32),
        audio_features=None,
        labels=jnp.asarray(rng.randint(3, 250, (4, 8)), jnp.int32),
    )
    loss, _ = sharded(batch, compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
