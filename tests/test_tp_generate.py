"""Tensor-parallel generation (shard_map over tp with Megatron-sliced
weights) must reproduce single-device generation exactly (greedy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.inference import generate as gen
from audio_llama_tpu.models import allm
from audio_llama_tpu.parallel import MeshConfig, make_mesh
from audio_llama_tpu.parallel import sharding as shd


@pytest.fixture(scope="module")
def model():
    cfg = AudioLLMConfig.tiny()  # Hq=4, Hkv=2 -> tp=2 divides both
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    return cfg, frozen, trainable


def _inputs(cfg, B=4, T=9):
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(3, 250, (B, T)), jnp.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, 7:] = 0  # a right-padded row
    audio = jnp.asarray(rng.randn(B, cfg.mel.max_samples).astype(np.float32) * 0.1)
    return ids, jnp.asarray(mask), audio


STATIC = dict(
    max_new_tokens=6, greedy=True, eos_id=-1, pad_id=0,
    audio_start_id=260, audio_end_id=261, compute_dtype=jnp.float32,
    has_audio=True,
)


def test_tp_generate_matches_single_device(model):
    cfg, frozen, trainable = model
    ids, mask, audio = _inputs(cfg)
    key = jax.random.PRNGKey(0)
    ref = gen.generate(frozen, trainable, cfg, ids, mask, audio, key, **STATIC)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=2), devices=jax.devices()[:2])
    fn = gen.make_tp_generate(cfg, mesh, **STATIC)
    out = fn(frozen, trainable, ids, mask, audio, key)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))


def test_dp_tp_generate_matches_single_device(model):
    cfg, frozen, trainable = model
    ids, mask, audio = _inputs(cfg, B=4)
    key = jax.random.PRNGKey(1)
    ref = gen.generate(frozen, trainable, cfg, ids, mask, audio, key, **STATIC)

    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2), devices=jax.devices()[:4])
    fn = gen.make_tp_generate(cfg, mesh, **STATIC)
    out = fn(frozen, trainable, ids, mask, audio, key)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))


def test_tp_generate_rejects_indivisible_heads(model):
    cfg, _, _ = model
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=8))
    with pytest.raises(ValueError, match="divide"):
        gen.make_tp_generate(cfg, mesh, **STATIC)


def test_tp_generate_with_int8_decoder(model):
    """Megatron-sliced decode over the weight-only-int8 tree: w_q shards
    with its out/in dim, per-out-channel w_s rides the column shards
    (col-parallel) or replicates (row-parallel — exact under the psum:
    psum(partial)*w_s == psum(partial*w_s)). Greedy output must match the
    single-device quantized model exactly."""
    from audio_llama_tpu.models import llama_int8 as l8

    cfg, frozen, trainable = model
    qfrozen = dict(frozen)
    qfrozen["llama"] = l8.quantize_llama(frozen["llama"])
    ids, mask, audio = _inputs(cfg)
    key = jax.random.PRNGKey(2)
    ref = gen.generate(qfrozen, trainable, cfg, ids, mask, audio, key, **STATIC)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=2), devices=jax.devices()[:2])
    fn = gen.make_tp_generate(cfg, mesh, **STATIC)
    out = fn(qfrozen, trainable, ids, mask, audio, key)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))


def test_tp_generate_with_int4_decoder(model):
    """Pack-after-shard W4A16 (models/llama_int4.py tp layout): each tp
    shard receives a self-contained canonically-packed slab via the 4-D
    block axis; greedy output must match single-device generation over the
    DEQUANTIZED tree (a tp-packed tree cannot run unsharded by design)."""
    from audio_llama_tpu.models import llama_int4 as l4

    cfg, frozen, trainable = model
    qfrozen = dict(frozen)
    qfrozen["llama"] = l4.quantize_llama_int4(
        frozen["llama"], tp=2, group=32
    )
    dfrozen = dict(frozen)
    dfrozen["llama"] = l4.dequantize_llama_int4(qfrozen["llama"])
    ids, mask, audio = _inputs(cfg)
    key = jax.random.PRNGKey(3)
    ref = gen.generate(dfrozen, trainable, cfg, ids, mask, audio, key, **STATIC)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=2), devices=jax.devices()[:2])
    fn = gen.make_tp_generate(cfg, mesh, **STATIC)
    out = fn(qfrozen, trainable, ids, mask, audio, key)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))


def test_tp_generate_rejects_canonical_int4_tree(model):
    from audio_llama_tpu.models import llama_int4 as l4

    cfg, frozen, trainable = model
    ids, mask, audio = _inputs(cfg)
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=2), devices=jax.devices()[:2])
    fn = gen.make_tp_generate(cfg, mesh, **STATIC)
    # default tree is FUSED (qkv/gateup) — tp rejects it outright
    qfrozen = dict(frozen)
    qfrozen["llama"] = l4.quantize_llama_int4(frozen["llama"], group=32)
    with pytest.raises(ValueError, match="fused int4"):
        fn(qfrozen, trainable, ids, mask, audio, jax.random.PRNGKey(0))
    # unfused canonical (tp=1 packing) is rejected for the layout reason
    qfrozen["llama"] = l4.quantize_llama_int4(
        frozen["llama"], group=32, fuse=False
    )
    with pytest.raises(ValueError, match="packed for tp=1"):
        fn(qfrozen, trainable, ids, mask, audio, jax.random.PRNGKey(0))
