"""Golden parity: our JAX Llama vs HF torch LlamaForCausalLM (tiny, random).

Covers: GQA attention, llama3-scaled RoPE, RMSNorm order, SwiGLU, tied and
untied heads, padding masks, loss, and KV-cached incremental decode
consistency.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_llama_tpu.config import LlamaConfig, RopeScalingConfig
from audio_llama_tpu.models import llama
from audio_llama_tpu.models.hf_loader import llama_params_from_state_dict

from hf_ref import tiny_hf_llama, state_dict_numpy


def _numpy_logits_hf(model, input_ids, attention_mask=None):
    import torch

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(input_ids),
            attention_mask=None if attention_mask is None else torch.tensor(attention_mask),
        )
    return out.logits.float().numpy()


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny()
    hf = tiny_hf_llama(cfg)
    params = llama_params_from_state_dict(state_dict_numpy(hf), cfg, dtype="float32")
    return cfg, hf, params


def test_logits_parity(setup):
    cfg, hf, params = setup
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 9)).astype(np.int32)
    ours, _ = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(ids), compute_dtype=jnp.float32
    )
    theirs = _numpy_logits_hf(hf, ids)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_logits_parity_with_padding_mask(setup):
    cfg, hf, params = setup
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, (2, 7)).astype(np.int32)
    mask = np.ones((2, 7), np.int32)
    mask[0, 5:] = 0  # right padding
    ours, _ = llama.llama_forward(
        params,
        cfg,
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        compute_dtype=jnp.float32,
    )
    theirs = _numpy_logits_hf(hf, ids, mask)
    # Compare only non-pad positions (HF fills pads differently).
    np.testing.assert_allclose(
        np.asarray(ours)[:, :5], theirs[:, :5], rtol=2e-4, atol=2e-4
    )


def test_rope_llama3_scaling_differs_from_default():
    cfg_scaled = LlamaConfig.tiny().replace(
        rope_scaling=RopeScalingConfig(), rope_theta=500000.0
    )
    from audio_llama_tpu.ops.rope import rope_for_config

    f_scaled = rope_for_config(cfg_scaled)
    f_plain = rope_for_config(cfg_scaled.replace(rope_scaling=None))
    assert f_scaled.shape == f_plain.shape
    assert not np.allclose(f_scaled, f_plain)


def test_rope_llama3_parity_with_hf():
    """RoPE with llama3 scaling must match HF end-to-end at realistic theta."""
    cfg = LlamaConfig.tiny().replace(
        rope_theta=500000.0, rope_scaling=RopeScalingConfig()
    )
    hf = tiny_hf_llama(cfg, seed=3)
    params = llama_params_from_state_dict(state_dict_numpy(hf), cfg, dtype="float32")
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (1, 12)).astype(np.int32)
    ours, _ = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(ids), compute_dtype=jnp.float32
    )
    theirs = _numpy_logits_hf(hf, ids)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=3e-4, atol=3e-4)


def test_tied_embeddings():
    cfg = LlamaConfig.tiny().replace(tie_word_embeddings=True)
    hf = tiny_hf_llama(cfg, seed=1)
    params = llama_params_from_state_dict(state_dict_numpy(hf), cfg, dtype="float32")
    assert "lm_head" not in params
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (1, 5)).astype(np.int32)
    ours, _ = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(ids), compute_dtype=jnp.float32
    )
    theirs = _numpy_logits_hf(hf, ids)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_loss_matches_hf(setup):
    import torch

    cfg, hf, params = setup
    rng = np.random.default_rng(4)
    ids = rng.integers(0, cfg.vocab_size, (2, 8)).astype(np.int32)
    labels = ids.copy()
    labels[:, :3] = -100
    ours_logits, _ = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(ids), compute_dtype=jnp.float32
    )
    ours_loss = llama.causal_lm_loss(ours_logits, jnp.asarray(labels))
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), labels=torch.tensor(labels.astype(np.int64)))
    np.testing.assert_allclose(float(ours_loss), float(out.loss), rtol=1e-4, atol=1e-5)


def test_kv_cache_decode_matches_full_forward(setup):
    cfg, _, params = setup
    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, (2, 10)).astype(np.int32)

    full_logits, _ = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(ids), compute_dtype=jnp.float32
    )

    cache = llama.KVCache.zeros(cfg, batch=2, max_len=16, dtype=jnp.float32)
    # Prefill 6 tokens, then decode 4 one at a time.
    logits_p, cache = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(ids[:, :6]), kv_cache=cache,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :6]), rtol=2e-4, atol=2e-4
    )
    for t in range(6, 10):
        step_logits, cache = llama.llama_forward(
            params, cfg, input_ids=jnp.asarray(ids[:, t : t + 1]), kv_cache=cache,
            compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, t]),
            rtol=3e-4,
            atol=3e-4,
        )
    assert int(cache.length) == 10


def test_resize_embeddings(setup):
    cfg, _, params = setup
    new_vocab = cfg.vocab_size + 2
    p2 = llama.resize_embeddings(params, new_vocab, cfg)
    assert p2["embed"]["weight"].shape[0] == new_vocab
    if "lm_head" in p2:
        assert p2["lm_head"].shape[1] == new_vocab
    # Old rows untouched.
    np.testing.assert_array_equal(
        np.asarray(p2["embed"]["weight"][: cfg.vocab_size]),
        np.asarray(params["embed"]["weight"]),
    )


def test_lora_overlay_zero_init_is_identity(setup):
    from audio_llama_tpu.config import LoraConfig
    from audio_llama_tpu.models import lora as lora_mod

    cfg, _, params = setup
    lcfg = LoraConfig(rank=4, alpha=8)
    lora = lora_mod.with_scaling(
        lora_mod.init_params(cfg, lcfg, jax.random.PRNGKey(0)), lcfg
    )
    rng = np.random.default_rng(6)
    ids = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int32)
    base, _ = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(ids), compute_dtype=jnp.float32
    )
    with_lora, _ = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(ids), lora=lora, compute_dtype=jnp.float32
    )
    # Reference init (A=0) => delta == 0 exactly.
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


def test_lora_merge_matches_overlay(setup):
    from audio_llama_tpu.config import LoraConfig
    from audio_llama_tpu.models import lora as lora_mod

    cfg, _, params = setup
    lcfg = LoraConfig(rank=4, alpha=8)
    lora = lora_mod.with_scaling(
        lora_mod.init_params(cfg, lcfg, jax.random.PRNGKey(1)), lcfg
    )
    # Make the deltas nonzero.
    lora = jax.tree.map(
        lambda x: x + 0.01 if isinstance(x, jnp.ndarray) else x, lora
    )
    rng = np.random.default_rng(7)
    ids = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int32)
    overlay, _ = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(ids), lora=lora, compute_dtype=jnp.float32
    )
    merged = lora_mod.merge_into_llama(params, lora)
    folded, _ = llama.llama_forward(
        merged, cfg, input_ids=jnp.asarray(ids), compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(overlay), np.asarray(folded), rtol=2e-4, atol=2e-4
    )
