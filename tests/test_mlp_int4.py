"""Fused int4 decode-MLP kernel (ops/mlp_int4.py) vs the two-call oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_llama_tpu.ops import int4_matmul as i4
from audio_llama_tpu.ops.mlp_int4 import mlp_int4_stacked, mlp_int4_stacked_ref


def _tree(L, K, F, D, seed=0):
    rng = np.random.RandomState(seed)
    gup_p, gup_s, dn_p, dn_s = [], [], [], []
    for li in range(L):
        wg = rng.randn(K, F).astype(np.float32) * 0.05
        wu = rng.randn(K, F).astype(np.float32) * 0.05
        p, s = i4.quantize_pack(jnp.asarray(np.concatenate([wg, wu], 1)))
        gup_p.append(p)
        gup_s.append(s)
        wd = rng.randn(F, D).astype(np.float32) * 0.05
        p, s = i4.quantize_pack(jnp.asarray(wd))
        dn_p.append(p)
        dn_s.append(s)
    return (
        jnp.stack(gup_p), jnp.stack(gup_s), jnp.stack(dn_p), jnp.stack(dn_s)
    )


@pytest.mark.parametrize("M,chunk", [(1, 128), (8, 256), (13, 128)])
def test_fused_mlp_matches_two_call_oracle(M, chunk):
    L, K, F, D = 2, 256, 512, 256
    gup_p, gup_s, dn_p, dn_s = _tree(L, K, F, D)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(M, K).astype(np.float32) * 0.3)
    for li in range(L):
        out = mlp_int4_stacked(
            x, gup_p, gup_s, dn_p, dn_s, jnp.int32(li), chunk=chunk,
            interpret=True,
        )
        ref = mlp_int4_stacked_ref(
            x, gup_p, gup_s, dn_p, dn_s, jnp.int32(li),
            compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-2
        )


def test_fused_mlp_batched_lead_dims():
    L, K, F, D = 1, 256, 256, 256
    gup_p, gup_s, dn_p, dn_s = _tree(L, K, F, D, seed=2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(3, 1, K).astype(np.float32) * 0.3)
    out = mlp_int4_stacked(
        x, gup_p, gup_s, dn_p, dn_s, jnp.int32(0), chunk=128, interpret=True
    )
    assert out.shape == (3, 1, D)
    ref = mlp_int4_stacked_ref(
        x, gup_p, gup_s, dn_p, dn_s, jnp.int32(0), compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-2
    )


def test_geometry_ok_flagship_and_fallback():
    """TPU lowering needs lane-divisible (128) scale blocks: the flagship
    3B geometry must pass; a D/2 % 128 != 0 geometry must be rejected so
    dispatch falls back to the planes path instead of a Mosaic error
    (round-3 TPU finding: cg=4 sublane blocks are unlowerable — fixed by
    the [L, nc, cg, D] reshape; nd/chunk lane rules remain)."""
    from audio_llama_tpu.ops.mlp_int4 import geometry_ok

    assert geometry_ok(3072, 8192, 3072)          # llama-3B dims
    assert geometry_ok(2048, 8192, 2048)          # llama-1B dims
    assert not geometry_ok(3072, 8192, 192)       # D/2 = 96: lane-indivisible
    assert not geometry_ok(3072, 8120, 3072)      # no legal chunk
    # kernel-side guard mirrors the predicate (trace-time, pre-lowering)
    L, K, F, D = 1, 256, 256, 192
    gup_p, gup_s, dn_p, dn_s = _tree(L, K, F, D, seed=5)
    x = jnp.zeros((1, K), jnp.float32)
    with pytest.raises(ValueError, match="128"):
        mlp_int4_stacked(
            x, gup_p, gup_s, dn_p, dn_s, jnp.int32(0), chunk=128,
            interpret=False,
        )


def test_fused_mlp_shape_guards():
    L, K, F, D = 1, 256, 256, 256
    gup_p, gup_s, dn_p, dn_s = _tree(L, K, F, D, seed=4)
    x = jnp.zeros((1, K), jnp.float32)
    with pytest.raises(ValueError, match="chunk"):
        mlp_int4_stacked(
            x, gup_p, gup_s, dn_p, dn_s, jnp.int32(0), chunk=96,
            interpret=True,
        )


def test_llama_decode_fused_mlp_dispatch_matches_planes_path(monkeypatch):
    """Full int4 decode step with the fused-MLP kernel (MLP_FUSED=interp)
    vs the two-call planes path (MLP_FUSED=0)."""
    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm
    from audio_llama_tpu.models.llama_int4 import quantize_llama_int4

    cfg = LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
        max_position_embeddings=2048, rope_scaling=None,
        tie_word_embeddings=True,
    )
    params = lm.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_llama_int4(params)
    B, P, total = 2, 10, 32
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 3, 500)
    cache0 = lm.KVCache.zeros(cfg, B, total, dtype=jnp.float32)
    Tk = cache0.k.shape[3]
    mask = jnp.ones((B, Tk), jnp.int32)

    def step(mode):
        monkeypatch.setenv("MLP_FUSED", mode)
        _, cache = lm.llama_forward(
            q, cfg, input_ids=ids, attention_mask=mask, kv_cache=cache0,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        tok = jnp.asarray([[7], [9]], jnp.int32)
        out, _ = lm.llama_forward(
            q, cfg, input_ids=tok, attention_mask=mask, kv_cache=cache,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        return np.asarray(out)

    ref = step("0")
    out = step("interp")
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-2)
