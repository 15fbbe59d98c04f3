"""W4A16 llama tree (models/llama_int4.py): llama_forward over the int4
tree must match llama_forward over the DEQUANTIZED tree (the kernel/oracle
dispatch is the only difference — quantization error cancels out of the
comparison), plus decode-path and generation smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import LlamaConfig
from audio_llama_tpu.models import llama as lm
from audio_llama_tpu.models.llama_int4 import (
    dequantize_llama_int4,
    is_int4,
    quantize_llama_int4,
)


def _cfg():
    # dims sized so every linear satisfies int4 packing (group 128 | in-dim)
    return LlamaConfig(
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=32,
        max_position_embeddings=2048,
        rope_scaling=None,
        tie_word_embeddings=True,
    )


@pytest.fixture(scope="module")
def trees():
    cfg = _cfg()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_llama_int4(params)
    deq = dequantize_llama_int4(q)
    return cfg, params, q, deq


def test_is_int4_and_reject_double_quant(trees):
    cfg, params, q, deq = trees
    assert is_int4(q) and not is_int4(params)
    with pytest.raises(ValueError, match="already-quantized"):
        quantize_llama_int4(q)


def test_forward_matches_dequantized_tree(trees):
    cfg, params, q, deq = trees
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 3, 500)
    mask = jnp.ones((2, 24), jnp.int32)
    logits_q, _ = lm.llama_forward(
        q, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    logits_d, _ = lm.llama_forward(
        deq, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(logits_q), np.asarray(logits_d), atol=2e-3, rtol=2e-3
    )


def test_decode_with_cache_matches_dequantized(trees):
    cfg, params, q, deq = trees
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 3, 500)
    mask = jnp.ones((2, 8), jnp.int32)

    def run(tree):
        cache = lm.KVCache.zeros(cfg, 2, 16, dtype=jnp.float32)
        full_mask = jnp.pad(mask, ((0, 0), (0, 8)), constant_values=1)
        logits, cache = lm.llama_forward(
            tree, cfg, input_ids=ids, attention_mask=full_mask,
            kv_cache=cache, compute_dtype=jnp.float32, attn_impl="xla",
        )
        step_logits, cache = lm.llama_forward(
            tree, cfg, input_ids=ids[:, :1] + 1,
            attention_mask=full_mask, kv_cache=cache,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        return step_logits

    np.testing.assert_allclose(
        np.asarray(run(q)), np.asarray(run(deq)), atol=2e-3, rtol=2e-3
    )


def test_generation_smoke_int4(trees):
    from audio_llama_tpu.config import AudioLLMConfig, MelConfig, WhisperConfig
    from audio_llama_tpu.inference import generate as gen
    from audio_llama_tpu.models import allm

    cfg = AudioLLMConfig(
        llama=_cfg(), whisper=WhisperConfig.tiny(),
        mel=MelConfig(num_mel_bins=80, max_audio_seconds=1.28), lora=None,
    )
    frozen = allm.init_frozen(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    frozen = dict(frozen)
    frozen["llama"] = quantize_llama_int4(
        allm.init_frozen(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)["llama"]
    )
    trainable = allm.init_trainable(cfg.replace(lora=None), jax.random.PRNGKey(1))
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 6), 3, 500)
    mask = jnp.ones((2, 6), jnp.int32)
    res = gen.generate(
        frozen, trainable, cfg, ids, mask, None, jax.random.PRNGKey(4),
        max_new_tokens=4, greedy=True, eos_id=2, pad_id=0,
        has_audio=False, compute_dtype=jnp.float32,
    )
    assert res.tokens.shape == (2, 4)
    assert np.asarray(res.tokens).min() >= 0


def test_tp_generate_rejects_int4(trees):
    cfg_l, params, q, deq = trees
    import numpy as onp

    from audio_llama_tpu.config import AudioLLMConfig, MelConfig, WhisperConfig
    from audio_llama_tpu.inference import generate as gen

    cfg = AudioLLMConfig(
        llama=cfg_l, whisper=WhisperConfig.tiny(),
        mel=MelConfig(num_mel_bins=80, max_audio_seconds=1.28), lora=None,
    )
    devs = onp.array(jax.devices()[:2]).reshape(2)
    mesh = jax.sharding.Mesh(devs, ("tp",))
    fn = gen.make_tp_generate(cfg, mesh, has_audio=False)
    frozen = {"llama": q, "whisper": None}
    with pytest.raises(ValueError, match="int4"):
        fn(frozen, None, None, None, None, None)


# ---- pack-after-shard (tp) layout -----------------------------------------

def test_tp_pack_matches_canonical_numerics(trees):
    """Blockwise (tp) packing changes the byte layout, not the values:
    dequantizing a tp=2 tree must equal dequantizing the tp=1 tree."""
    cfg, params, q, deq = trees
    q2 = quantize_llama_int4(params, tp=2, group=64)
    d2 = dequantize_llama_int4(q2)
    q1 = quantize_llama_int4(params, group=64, fuse=False)
    d1 = dequantize_llama_int4(q1)
    for name in lm.LINEAR_NAMES:
        # allclose, not equal: canonical quantization runs per-layer via
        # lax.map (HBM-peak reasons) while tp blocks use vmap — compiler
        # fusion differences shift f32 scale math by ~1 ulp
        np.testing.assert_allclose(
            np.asarray(d1["layers"][name]), np.asarray(d2["layers"][name]),
            atol=1e-6, rtol=1e-6,
        )


def test_tp_pack_shard_slices_are_canonical(trees):
    """Block s of a tp-packed COL slab == canonical pack of that shard's
    column slice (the property make_tp_generate's in_specs rely on)."""
    from audio_llama_tpu.models.llama_int4 import CLIP_CANDS
    from audio_llama_tpu.ops import int4_matmul as i4

    cfg, params, q, deq = trees
    tp, g = 2, 64
    q2 = quantize_llama_int4(params, tp=tp, group=g)
    w = np.asarray(params["layers"]["q_proj"])  # [L, K, N] col-parallel
    L, K, N = w.shape
    for s in range(tp):
        blk = w[:, :, s * N // tp:(s + 1) * N // tp]
        # clip is default-on in quantize_llama_int4; mirror it here (the
        # property under test is the BLOCK layout, scales are per-column)
        pk, sc = jax.vmap(
            lambda m: i4.quantize_pack(m, group=g, clip_cands=CLIP_CANDS)
        )(jnp.asarray(blk))
        np.testing.assert_array_equal(
            np.asarray(q2["layers"]["q_proj"]["w_p"][:, :, s]),
            np.asarray(pk),
        )
        np.testing.assert_array_equal(
            np.asarray(
                q2["layers"]["q_proj"]["w_s"][:, :, s * N // tp:(s + 1) * N // tp]
            ),
            np.asarray(sc),
        )


def test_tp_packed_tree_rejected_unsharded(trees):
    cfg, params, q, deq = trees
    q2 = quantize_llama_int4(params, tp=2, group=64)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 3, 500)
    with pytest.raises(ValueError, match="tensor-parallel"):
        lm.llama_forward(
            q2, cfg, input_ids=ids,
            attention_mask=jnp.ones((1, 8), jnp.int32),
            compute_dtype=jnp.float32, attn_impl="xla",
        )


def test_tp_pack_validates_row_group_alignment(trees):
    cfg, params, q, deq = trees
    # o_proj K=128: K/tp=64 is not a multiple of group=128
    with pytest.raises(ValueError, match="row-parallel"):
        quantize_llama_int4(params, tp=2, group=128)


def test_fused_tree_matches_unfused(trees):
    """Per-(group, column) quantization makes the fused qkv/gateup slabs
    numerically IDENTICAL to the per-projection ones (columns are
    independent under absmax grouping) — the fusion only changes the
    kernel-launch structure, so forwards must agree tightly."""
    cfg, params, q_fused, _ = trees
    q_unfused = quantize_llama_int4(params, fuse=False)
    assert "qkv_proj" in q_fused["layers"]
    assert "q_proj" in q_unfused["layers"]
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 16), 3, 500)
    mask = jnp.ones((2, 16), jnp.int32)
    lf, _ = lm.llama_forward(
        q_fused, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    lu, _ = lm.llama_forward(
        q_unfused, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(lf), np.asarray(lu), atol=2e-5, rtol=2e-5
    )
    # and the dequantized oracles agree exactly
    du = dequantize_llama_int4(q_unfused)
    df = dequantize_llama_int4(q_fused)
    for n in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        np.testing.assert_array_equal(
            np.asarray(df["layers"][n]), np.asarray(du["layers"][n])
        )


def test_fused_tree_with_lora(trees):
    """LoRA overlays apply per-projection after the fused split — must
    match the unfused tree with the same LoRA."""
    from audio_llama_tpu.config import LoraConfig
    from audio_llama_tpu.models import lora as lora_mod

    cfg, params, q_fused, _ = trees
    q_unfused = quantize_llama_int4(params, fuse=False)
    lcfg = LoraConfig(rank=4, alpha=8)
    lt = lora_mod.init_params(cfg, lcfg, jax.random.PRNGKey(7))
    # make the deltas nonzero (ref init has a=0)
    lt = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim == 3 else x, lt
    )
    lo = lora_mod.with_scaling(lt, lcfg)
    ids = jax.random.randint(jax.random.PRNGKey(6), (1, 12), 3, 500)
    mask = jnp.ones((1, 12), jnp.int32)
    lf, _ = lm.llama_forward(
        q_fused, cfg, input_ids=ids, attention_mask=mask, lora=lo,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    lu, _ = lm.llama_forward(
        q_unfused, cfg, input_ids=ids, attention_mask=mask, lora=lo,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(lf), np.asarray(lu), atol=2e-5, rtol=2e-5
    )
