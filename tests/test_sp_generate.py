"""Timeline-sharded (sp) generation — docs/LONG_CONTEXT.md step 3.

make_sp_generate shards the KV-cache TIMELINE over an 'sp' mesh axis (each
shard holds max_len/sp slots); decode attention assembles the exact global
softmax from per-shard flash statistics (ops.attention.sp_partial_attention).
These tests use a 40-token prompt against 32-slot shard windows so the
prefill window-write spans shards AND every decode append lands on shard 1 —
the cross-shard merge is load-bearing, not a degenerate single-shard case.

Reference analog: none (reference decode is single-GPU HF generate,
src/models/allm.py:326-348); parity oracle is our own single-device
inference.generate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.inference import generate as gen
from audio_llama_tpu.models import allm
from audio_llama_tpu.parallel.seq_parallel import make_sp_generate


def _mesh(axes):
    n = int(np.prod([s for _, s in axes]))
    devs = np.array(jax.devices()[:n]).reshape([s for _, s in axes])
    return jax.sharding.Mesh(devs, tuple(a for a, _ in axes))


@pytest.fixture(scope="module")
def model():
    cfg = AudioLLMConfig.tiny()
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    return cfg, frozen, trainable


def _static(**over):
    s = dict(
        max_new_tokens=8, greedy=True, eos_id=-1, pad_id=0,
        audio_start_id=260, audio_end_id=261, compute_dtype=jnp.float32,
        has_audio=False,
    )
    s.update(over)
    return s


def _text_inputs(cfg, B, T, seed=0, pad_last=0):
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(3, 250, (B, T)), jnp.int32)
    mask = np.ones((B, T), np.int32)
    if pad_last:
        # right-pad the final rows with decreasing real lengths so slot
        # positions and logical RoPE positions diverge per row
        for r in range(1, pad_last + 1):
            mask[-r, T - 2 * r:] = 0
    return ids, jnp.asarray(mask)


@pytest.mark.parametrize("axes", [[("sp", 2)], [("dp", 2), ("sp", 2)]])
def test_sp_generate_matches_single_device(model, axes):
    """Prompt T=40 > one 32-slot shard window: prefill writes span both
    shards and all decode appends land on shard 1, so agreement with the
    single-device program proves the pmax+psum softmax merge is exact."""
    cfg, frozen, trainable = model
    B, T = 4, 40
    ids, mask = _text_inputs(cfg, B, T, seed=1)
    static = _static()
    key = jax.random.PRNGKey(0)
    ref = gen.generate(frozen, trainable, cfg, ids, mask, None, key, **static)
    sp_fn = make_sp_generate(cfg, _mesh(axes), **static)
    out = sp_fn(frozen, trainable, ids, mask, None, key)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(
        np.asarray(out.num_generated), np.asarray(ref.num_generated)
    )


def test_sp_generate_right_padded_prompts(model):
    """Right-padded rows: slot causality is over PHYSICAL cache slots while
    RoPE positions follow logical lengths — per-row divergence must survive
    the sharded timeline (the global mask is sliced into shard windows)."""
    cfg, frozen, trainable = model
    B, T = 4, 40
    ids, mask = _text_inputs(cfg, B, T, seed=2, pad_last=2)
    static = _static()
    key = jax.random.PRNGKey(0)
    ref = gen.generate(frozen, trainable, cfg, ids, mask, None, key, **static)
    sp_fn = make_sp_generate(cfg, _mesh([("sp", 2)]), **static)
    out = sp_fn(frozen, trainable, ids, mask, None, key)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))


def test_sp_generate_with_audio_sp4(model):
    """Audio prefix (splice) + sp=4: the 1-window audio prefix pushes the
    prompt past two shard windows; exercises the has_audio build."""
    cfg, frozen, trainable = model
    B, T = 2, 10
    ids, mask = _text_inputs(cfg, B, T, seed=3)
    rng = np.random.RandomState(3)
    audio = jnp.asarray(rng.randn(B, cfg.mel.max_samples).astype(np.float32) * 0.1)
    static = _static(has_audio=True, max_new_tokens=5)
    key = jax.random.PRNGKey(0)
    ref = gen.generate(frozen, trainable, cfg, ids, mask, audio, key, **static)
    sp_fn = make_sp_generate(cfg, _mesh([("sp", 4)]), **static)
    out = sp_fn(frozen, trainable, ids, mask, audio, key)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))


def test_sp_generate_kv_quant_matches_single_device(model):
    """int8 KV cache under a sharded timeline: each shard quantizes and
    stores its own window (values + per-row scales) and decode dequantizes
    the local slab before the cross-shard merge — same rows quantize to the
    same int8+scale on every path, so greedy tokens match the single-device
    kv_quant program."""
    cfg, frozen, trainable = model
    B, T = 2, 40
    ids, mask = _text_inputs(cfg, B, T, seed=4)
    static = _static(kv_quant=True)
    key = jax.random.PRNGKey(0)
    ref = gen.generate(frozen, trainable, cfg, ids, mask, None, key, **static)
    sp_fn = make_sp_generate(cfg, _mesh([("sp", 2)]), **static)
    out = sp_fn(frozen, trainable, ids, mask, None, key)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))


def test_sp_generate_validates(model):
    cfg, _, _ = model
    with pytest.raises(ValueError, match="no 'sp' axis"):
        make_sp_generate(cfg, _mesh([("dp", 2)]), **_static())
    with pytest.raises(ValueError, match="extra non-trivial axes"):
        make_sp_generate(cfg, _mesh([("sp", 2), ("tp", 2)]), **_static())


@pytest.mark.parametrize("kv_quant", [False, True, 4])
def test_sp_generate_decode_kernel_path(model, kv_quant):
    """The sp decode PERF tier: each shard runs the db kernel's stats
    variant over its local slab (owner-gated append via local offset) and
    the global softmax is merged in XLA — tokens must match the plain
    single-device program (interpret-mode kernels inside shard_map)."""
    from jax.experimental.pallas import tpu as pltpu

    cfg, frozen, trainable = model
    B, T = 2, 40
    ids, mask = _text_inputs(cfg, B, T, seed=5, pad_last=1)
    static = _static(kv_quant=kv_quant)
    key = jax.random.PRNGKey(0)
    ref = gen.generate(frozen, trainable, cfg, ids, mask, None, key, **static)
    sp_fn = make_sp_generate(
        cfg, _mesh([("sp", 2)]), attn_impl="decode_kernel", **static
    )
    with pltpu.force_tpu_interpret_mode():
        out = sp_fn(frozen, trainable, ids, mask, None, key)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
