"""Per-row cache_offsets parity (batched divergent timelines).

llama_forward(cache_offsets=[B]) lets each batch row append its T new K/V
rows at its OWN physical slot and attend slot-causally relative to it — the
primitive batched speculative decoding needs (per-row acceptance lengths
diverge, so rows' cache timelines diverge). Ground truth: running each row
alone with the scalar-offset path must give identical logits and identical
cache slabs. Reference analog: none (reference delegates decode to HF
generate, src/models/allm.py:326-331).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_llama_tpu.config import LlamaConfig
from audio_llama_tpu.models import llama


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.default_rng(7)
    return cfg, params, rng


def _stack_caches(caches):
    """Concatenate B single-row caches along the batch axis."""
    k = jnp.concatenate([c.k for c in caches], axis=1)
    v = jnp.concatenate([c.v for c in caches], axis=1)
    ks = vs = None
    if caches[0].k_scale is not None:
        ks = jnp.concatenate([c.k_scale for c in caches], axis=1)
        vs = jnp.concatenate([c.v_scale for c in caches], axis=1)
    return llama.KVCache(
        k=k, v=v, length=jnp.max(jnp.stack([c.length for c in caches])),
        k_scale=ks, v_scale=vs,
    )


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("T", [1, 3])
def test_per_row_offsets_match_per_row_scalar_runs(setup, quantized, T):
    cfg, params, rng = setup
    prompt_lens = [4, 7, 5]
    B, max_len = len(prompt_lens), 32
    new_ids = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)

    # Ground truth: each row alone, scalar-offset path (prefill its prompt,
    # then forward the T new tokens at offset = prompt length).
    ref_logits, ref_caches, prefill_caches = [], [], []
    for b, p in enumerate(prompt_lens):
        ids = rng.integers(0, cfg.vocab_size, (1, p)).astype(np.int32)
        cache = llama.KVCache.zeros(
            cfg, 1, max_len, dtype=jnp.float32, quantized=quantized
        )
        _, cache = llama.llama_forward(
            params, cfg, input_ids=jnp.asarray(ids), kv_cache=cache,
            compute_dtype=jnp.float32,
        )
        assert int(cache.length) == p
        prefill_caches.append(cache)
        logits, cache = llama.llama_forward(
            params, cfg, input_ids=jnp.asarray(new_ids[b : b + 1]),
            kv_cache=cache, compute_dtype=jnp.float32, attn_impl="xla",
        )
        ref_logits.append(logits)
        ref_caches.append(cache)

    # Batched: stack the PREFILL-ONLY caches, pass per-row offsets.
    stacked = _stack_caches(prefill_caches)
    offsets = jnp.asarray(prompt_lens, jnp.int32)
    logits_b, cache_b = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(new_ids),
        kv_cache=stacked, cache_offsets=offsets,
        compute_dtype=jnp.float32, attn_impl="xla",
    )

    # B=1 vs B=3 runs fuse differently in XLA — allow ~1e-6 FP noise
    # (measured max delta 2e-6 f32; int8 cache rows may flip one LSB when a
    # value sits on a rounding boundary).
    # Quantized logits are looser still: an LSB flip in a K/V row changes the
    # dequantized value by ~scale (~1% of the row max) and that feeds through
    # attention (measured max 5e-4 abs). Wrong slots/masks would err at O(1).
    lt = dict(rtol=1e-1, atol=2e-3) if quantized else dict(rtol=1e-4, atol=1e-5)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(logits_b[b : b + 1]), np.asarray(ref_logits[b]), **lt
        )
        # the written cache rows must land at each row's own slots
        if quantized:
            assert (
                np.max(np.abs(
                    np.asarray(cache_b.k[:, b], np.int32)
                    - np.asarray(ref_caches[b].k[:, 0], np.int32)
                )) <= 1
            )
            np.testing.assert_allclose(
                np.asarray(cache_b.k_scale[:, b]),
                np.asarray(ref_caches[b].k_scale[:, 0]),
                rtol=1e-4, atol=1e-7,
            )
        else:
            np.testing.assert_allclose(
                np.asarray(cache_b.k[:, b]), np.asarray(ref_caches[b].k[:, 0]),
                rtol=1e-4, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(cache_b.v[:, b]), np.asarray(ref_caches[b].v[:, 0]),
                rtol=1e-4, atol=1e-5,
            )
    assert int(cache_b.length) == max(prompt_lens) + T


def test_equal_offsets_match_scalar_path(setup):
    """cache_offsets with identical entries must reproduce the scalar path
    bit-for-bit (same slots, same masks)."""
    cfg, params, rng = setup
    B, P, T, max_len = 2, 5, 2, 32
    ids = rng.integers(0, cfg.vocab_size, (B, P)).astype(np.int32)
    new_ids = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
    cache = llama.KVCache.zeros(cfg, B, max_len, dtype=jnp.float32)
    _, cache = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(ids), kv_cache=cache,
        compute_dtype=jnp.float32,
    )
    ref, ref_cache = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(new_ids), kv_cache=cache,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    got, got_cache = llama.llama_forward(
        params, cfg, input_ids=jnp.asarray(new_ids), kv_cache=cache,
        cache_offsets=jnp.full((B,), P, jnp.int32),
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_cache.k), np.asarray(ref_cache.k), rtol=1e-4, atol=1e-5
    )
    assert int(got_cache.length) == int(ref_cache.length) == P + T


def test_cache_offsets_validation(setup):
    cfg, params, rng = setup
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 3)).astype(np.int32))
    with pytest.raises(ValueError, match="requires kv_cache"):
        llama.llama_forward(
            params, cfg, input_ids=ids,
            cache_offsets=jnp.zeros((2,), jnp.int32),
        )
    cache = llama.KVCache.zeros(cfg, 2, 32, dtype=jnp.float32)
    with pytest.raises(ValueError, match="assume_fresh_cache"):
        llama.llama_forward(
            params, cfg, input_ids=ids, kv_cache=cache,
            cache_offsets=jnp.zeros((2,), jnp.int32), assume_fresh_cache=True,
        )
