"""Data-parallel generation (shard_map over dp) matches single-device output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.inference import generate as gen
from audio_llama_tpu.models import allm
from audio_llama_tpu.parallel import MeshConfig, make_mesh


@pytest.fixture(scope="module")
def model():
    cfg = AudioLLMConfig.tiny()
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    return cfg, frozen, trainable


def test_dp_generate_matches_single_device(model):
    cfg, frozen, trainable = model
    mesh = make_mesh(MeshConfig(dp=4, fsdp=1, tp=1), devices=jax.devices()[:4])
    B, T = 8, 10
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(3, 250, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    audio = jnp.asarray(rng.randn(B, cfg.mel.max_samples).astype(np.float32) * 0.1)
    static = dict(
        max_new_tokens=6, greedy=True, eos_id=-1, pad_id=0,
        audio_start_id=260, audio_end_id=261, compute_dtype=jnp.float32,
        has_audio=True,
    )
    key = jax.random.PRNGKey(0)
    ref = gen.generate(frozen, trainable, cfg, ids, mask, audio, key, **static)
    dp_fn = gen.make_dp_generate(cfg, mesh, **static)
    out = dp_fn(frozen, trainable, ids, mask, audio, key)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(
        np.asarray(out.num_generated), np.asarray(ref.num_generated)
    )


def test_dp_generate_rejects_tp_mesh(model):
    cfg, _, _ = model
    mesh = make_mesh(MeshConfig(dp=4, fsdp=1, tp=2), devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="dp-only"):
        gen.make_dp_generate(cfg, mesh, greedy=True)


def test_generate_kv_quant_close_to_bf16(model):
    """End-to-end generation with the int8 KV cache: same greedy tokens as
    the full-precision cache on the toy model (logit gaps >> quant noise)."""
    cfg, frozen, trainable = model
    B, T = 2, 10
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(3, 250, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    audio = jnp.asarray(rng.randn(B, cfg.mel.max_samples).astype(np.float32) * 0.1)
    static = dict(
        max_new_tokens=6, greedy=True, eos_id=-1, pad_id=0,
        audio_start_id=260, audio_end_id=261, compute_dtype=jnp.float32,
        has_audio=True,
    )
    key = jax.random.PRNGKey(0)
    ref = gen.generate(frozen, trainable, cfg, ids, mask, audio, key, **static)
    out = gen.generate(
        frozen, trainable, cfg, ids, mask, audio, key, kv_quant=True, **static
    )
    # int8 K/V noise is ~1e-2 relative; random-model logit margins dominate.
    agree = np.mean(np.asarray(out.tokens) == np.asarray(ref.tokens))
    assert agree >= 0.8, agree


def test_dp_generate_with_int8_decoder(model):
    """The quantized (W8A16) frozen tree rides dp-sharded generation
    unchanged: weights are replicated with structure-agnostic P() specs, so
    the int8 leaf dicts pass straight through shard_map."""
    from audio_llama_tpu.models import llama_int8 as l8

    cfg, frozen, trainable = model
    qfrozen = dict(frozen)
    qfrozen["llama"] = l8.quantize_llama(frozen["llama"])
    mesh = make_mesh(MeshConfig(dp=4, fsdp=1, tp=1), devices=jax.devices()[:4])
    B, T = 4, 8
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(3, 250, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    audio = jnp.asarray(rng.randn(B, cfg.mel.max_samples).astype(np.float32) * 0.1)
    static = dict(
        max_new_tokens=5, greedy=True, eos_id=-1, pad_id=0,
        audio_start_id=260, audio_end_id=261, compute_dtype=jnp.float32,
        has_audio=True,
    )
    key = jax.random.PRNGKey(0)
    ref = gen.generate(qfrozen, trainable, cfg, ids, mask, audio, key, **static)
    dp_fn = gen.make_dp_generate(cfg, mesh, **static)
    out = dp_fn(qfrozen, trainable, ids, mask, audio, key)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
