"""Flash prefill into a fresh KV cache must match the XLA cached-prefill path
(logits AND subsequent decode steps), interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from audio_llama_tpu.config import LlamaConfig
from audio_llama_tpu.models import llama as lm


def test_flash_prefill_matches_xla_cached_prefill():
    cfg = LlamaConfig.tiny()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, P, total = 2, 12, 20
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 3, 500)
    mask = np.ones((B, total), np.int32)
    mask[1, 9:P] = 0  # right padding inside the prefix region
    mask = jnp.asarray(mask)

    cache0 = lm.KVCache.zeros(cfg, B, total, dtype=jnp.float32)
    ref_logits, ref_cache = lm.llama_forward(
        params, cfg, input_ids=ids, attention_mask=mask, kv_cache=cache0,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    with pltpu.force_tpu_interpret_mode():
        fl_logits, fl_cache = lm.llama_forward(
            params, cfg, input_ids=ids, attention_mask=mask, kv_cache=cache0,
            compute_dtype=jnp.float32, attn_impl="flash",
            assume_fresh_cache=True,
        )
    # Non-pad prefix rows match.
    m = np.asarray(mask[:, :P], bool)
    np.testing.assert_allclose(
        np.asarray(fl_logits)[m], np.asarray(ref_logits)[m], atol=2e-4, rtol=2e-4
    )
    # Cache K written identically at VALID slots. Pad slots legitimately
    # differ from layer 1 on: pad-query outputs are garbage-by-contract in
    # both paths (different garbage), and later attention masks those slots.
    valid = np.asarray(mask[:, :P], bool)  # [B, P]
    # cache layout [L, B, Hkv, max_len, hd]: slice slots then move slot last
    fk = np.moveaxis(np.asarray(fl_cache.k)[:, :, :, :P], 3, -1)  # [L,B,H,hd,P]
    rk = np.moveaxis(np.asarray(ref_cache.k)[:, :, :, :P], 3, -1)
    sel = np.broadcast_to(valid[None, :, None, None, :], fk.shape)
    np.testing.assert_allclose(fk[sel], rk[sel], atol=2e-5)
    # A decode step from either cache agrees.
    tok = jnp.full((B, 1), 7, jnp.int32)
    d_ref, _ = lm.llama_forward(
        params, cfg, input_ids=tok, attention_mask=mask, kv_cache=ref_cache,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    d_fl, _ = lm.llama_forward(
        params, cfg, input_ids=tok, attention_mask=mask, kv_cache=fl_cache,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(d_fl), np.asarray(d_ref), atol=2e-4, rtol=2e-4
    )
