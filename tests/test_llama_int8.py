"""Weight-only int8 (W8A16) frozen Llama: quantized tree is a drop-in for
llama_forward / KV-cached decode / generation, with small output error.

VERDICT round-1 item 3: the decode path is weight-read-bound; this mode
halves the per-step HBM weight stream (models/llama_int8.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import LlamaConfig
from audio_llama_tpu.models import llama as lm
from audio_llama_tpu.models import llama_int8 as l8


@pytest.fixture(scope="module")
def toy():
    cfg = LlamaConfig.tiny(vocab_size=512)
    params = lm.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def test_quantize_structure(toy):
    cfg, params = toy
    qp = l8.quantize_llama(params)
    assert l8.is_quantized(qp) and not l8.is_quantized(params)
    for name in lm.LINEAR_NAMES:
        mod = qp["layers"][name]
        assert mod["w_q"].dtype == jnp.int8
        assert mod["w_q"].shape == params["layers"][name].shape
        assert mod["w_s"].shape == params["layers"][name].shape[:-2] + (
            params["layers"][name].shape[-1],
        )
    assert qp["embed"]["weight"].dtype == jnp.int8
    assert qp["embed"]["scale"].shape == (cfg.vocab_size,)
    # norms untouched
    assert qp["final_ln"].dtype == params["final_ln"].dtype


def test_embed_gather_dequant_exact(toy):
    """Per-row scales are exact under the gather: each row's error is bounded
    by half its own quantization step."""
    cfg, params = toy
    qp = l8.quantize_llama(params)
    ids = jnp.arange(32, dtype=jnp.int32)[None, :]
    ref = np.asarray(lm.embed_tokens(params, ids, jnp.float32))
    out = np.asarray(lm.embed_tokens(qp, ids, jnp.float32))
    step = np.asarray(qp["embed"]["scale"])[np.asarray(ids[0])][None, :, None]
    assert np.all(np.abs(out - ref) <= 0.5 * step + 1e-7)


def test_full_forward_close(toy):
    cfg, params = toy
    qp = l8.quantize_llama(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 3, cfg.vocab_size - 4)
    ref, _ = lm.llama_forward(params, cfg, input_ids=ids, compute_dtype=jnp.float32)
    out, _ = lm.llama_forward(qp, cfg, input_ids=ids, compute_dtype=jnp.float32)
    ref, out = np.asarray(ref), np.asarray(out)
    denom = np.abs(ref).mean() + 1e-6
    assert np.abs(out - ref).mean() / denom < 0.05
    # top-1 token agreement stays high on the toy model
    agree = (ref.argmax(-1) == out.argmax(-1)).mean()
    assert agree > 0.8, agree


def test_cached_decode_matches_full_forward(toy):
    """Quantized prefill+decode through the KV cache equals the quantized
    full-sequence forward (the cache plumbing is weight-layout agnostic)."""
    cfg, params = toy
    qp = l8.quantize_llama(params)
    T = 12
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, T), 3, cfg.vocab_size - 4)
    full, _ = lm.llama_forward(qp, cfg, input_ids=ids, compute_dtype=jnp.float32)

    cache = lm.KVCache.zeros(cfg, 1, T + 8, dtype=jnp.float32)
    logits_p, cache = lm.llama_forward(
        qp, cfg, input_ids=ids[:, :-1], kv_cache=cache, compute_dtype=jnp.float32
    )
    logits_d, _ = lm.llama_forward(
        qp, cfg, input_ids=ids[:, -1:], kv_cache=cache, compute_dtype=jnp.float32,
        attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(logits_d[:, 0]), np.asarray(full[:, -1]), rtol=2e-2, atol=2e-2
    )


def test_lora_overlay_still_applies(toy):
    """LoRA deltas add after the frozen matmul, so the overlay works
    unchanged on a quantized tree."""
    from audio_llama_tpu.config import LoraConfig
    from audio_llama_tpu.models import lora as lora_mod

    cfg, params = toy
    lcfg = LoraConfig(rank=4, alpha=8.0)
    lp = lora_mod.init_params(cfg, lcfg, jax.random.PRNGKey(3))
    # make the deltas visibly nonzero (init makes b zeros)
    lp = jax.tree_util.tree_map(
        lambda x: jnp.ones_like(x) * 0.01 if x.ndim else x, lp
    )
    qp = l8.quantize_llama(params)
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 8), 3, cfg.vocab_size - 4)
    base, _ = lm.llama_forward(qp, cfg, input_ids=ids, compute_dtype=jnp.float32)
    with_lora, _ = lm.llama_forward(
        qp, cfg, input_ids=ids, compute_dtype=jnp.float32,
        lora=lora_mod.with_scaling(lp, lcfg),
    )
    assert float(jnp.abs(with_lora - base).max()) > 1e-4


def test_untied_lm_head_quantized():
    cfg = LlamaConfig.tiny(vocab_size=512).replace(tie_word_embeddings=False)
    params = lm.init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    qp = l8.quantize_llama(params)
    assert qp["lm_head"]["w_q"].dtype == jnp.int8
    ids = jax.random.randint(jax.random.PRNGKey(6), (1, 8), 3, cfg.vocab_size - 4)
    ref, _ = lm.llama_forward(params, cfg, input_ids=ids, compute_dtype=jnp.float32)
    out, _ = lm.llama_forward(qp, cfg, input_ids=ids, compute_dtype=jnp.float32)
    rel = np.abs(np.asarray(out - ref)).mean() / (np.abs(np.asarray(ref)).mean() + 1e-6)
    assert rel < 0.05


def test_resize_guard(toy):
    cfg, params = toy
    qp = l8.quantize_llama(params)
    with pytest.raises(ValueError, match="int8"):
        lm.resize_embeddings(qp, cfg.vocab_size + 4, cfg)


def test_facade_quantize_decoder():
    """AudioLLM.quantize_decoder: end-to-end generate works and stays close
    to the bf16 model's greedy output on a toy model."""
    from audio_llama_tpu.config import AudioLLMConfig
    from audio_llama_tpu.data.tokenizer import ByteTokenizer
    from audio_llama_tpu.models import allm
    from audio_llama_tpu.models.api import AudioLLM

    cfg = AudioLLMConfig.tiny()
    tk = ByteTokenizer()
    cfg = cfg.replace(llama=cfg.llama.replace(vocab_size=max(tk.vocab_size, 384)))
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    model = AudioLLM(
        cfg, allm.init_frozen(cfg, kf, dtype=jnp.float32),
        allm.init_trainable(cfg, kt), tk,
    )
    q = model.quantize_decoder()
    assert l8.is_quantized(q.frozen["llama"])
    out_ref = model.generate("hello", max_new_tokens=6, greedy=True)
    out_q = q.generate("hello", max_new_tokens=6, greedy=True)
    assert isinstance(out_q, str)
    # Greedy continuations usually agree on a toy model; require a common
    # prefix of at least one token's worth of text unless both are empty.
    if out_ref and out_q:
        assert out_q[0] == out_ref[0]
