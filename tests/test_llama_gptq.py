"""GPTQ error-feedback int4 (models/llama_gptq.py).

Pins: (a) with an identity Hessian GPTQ degenerates to plain RTN exactly;
(b) with correlated/hot-channel inputs the error feedback beats RTN on the
GPTQ objective tr(E^T H E) AND on real output error; (c) the emitted tree
is layout-identical to quantize_llama_int4(fuse=True) so every consumer
(kernels, serving, dequant oracle) takes it unchanged; (d) the calibration
stats from llama_forward(collect_quant_stats=...) have the right shapes
and are masked.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import LlamaConfig
from audio_llama_tpu.models import llama as lm
from audio_llama_tpu.models.llama_gptq import (
    collect_llama_stats,
    gptq_pack,
    gptq_proxy_loss,
    quantize_llama_int4_gptq,
)
from audio_llama_tpu.models.llama_int4 import dequantize_llama_int4
from audio_llama_tpu.ops import int4_matmul as i4


def _cfg():
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


def test_identity_hessian_equals_rtn():
    w = jax.random.normal(jax.random.PRNGKey(0), (128, 64)) * 0.02
    pg, sg = gptq_pack(w, jnp.eye(128), group=32)
    p0, s0 = i4.quantize_pack(w, group=32)
    np.testing.assert_array_equal(np.asarray(pg), np.asarray(p0))
    np.testing.assert_allclose(np.asarray(sg), np.asarray(s0), rtol=1e-6)


def test_error_feedback_beats_rtn_under_correlation():
    key = jax.random.PRNGKey(1)
    K, N, G = 128, 64, 32
    w = jax.random.normal(key, (K, N)) * 0.02
    X = jax.random.normal(jax.random.PRNGKey(2), (512, K))
    mix = jax.random.normal(jax.random.PRNGKey(3), (K, K)) * 0.2 + jnp.eye(K)
    X = (X @ mix).at[:, :4].multiply(20.0)  # hot activation channels
    H = X.T @ X
    pg, sg = gptq_pack(w, H, group=G)
    p0, s0 = i4.quantize_pack(w, group=G)
    l_g = float(gptq_proxy_loss(w, pg, sg, H, G))
    l_r = float(gptq_proxy_loss(w, p0, s0, H, G))
    assert l_g < 0.5 * l_r, (l_g, l_r)
    y = X @ w
    e_g = float(jnp.sqrt(jnp.mean((X @ i4.dequantize_ref(pg, sg, G) - y) ** 2)))
    e_r = float(jnp.sqrt(jnp.mean((X @ i4.dequantize_ref(p0, s0, G) - y) ** 2)))
    assert e_g < 0.7 * e_r, (e_g, e_r)


def test_dead_inputs_are_inert():
    """Rows never activated in calibration quantize to zero and do not
    poison the feedback (H has zero rows/cols for them)."""
    K, N, G = 64, 32, 32
    w = jax.random.normal(jax.random.PRNGKey(4), (K, N)) * 0.02
    X = jax.random.normal(jax.random.PRNGKey(5), (256, K))
    X = X.at[:, 10].set(0.0)
    H = X.T @ X
    pg, sg = gptq_pack(w, H, group=G)
    deq = np.asarray(i4.dequantize_ref(pg, sg, G))
    assert np.isfinite(deq).all()
    assert np.abs(deq[10]).max() == 0.0


@pytest.fixture(scope="module")
def calib():
    cfg = _cfg()
    params = lm.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 3, 500)
    mask = jnp.ones((2, 16), jnp.int32).at[1, 12:].set(0)
    stats = collect_llama_stats(params, cfg, ids, mask)
    return cfg, params, ids, mask, stats


def test_collect_stats_shapes_and_mask(calib):
    cfg, params, ids, mask, stats = calib
    D, F = cfg.hidden_size, cfg.intermediate_size
    Dq = cfg.num_heads * cfg.head_dim
    assert stats["qkv"].shape == (2, D, D)
    assert stats["o"].shape == (2, Dq, Dq)
    assert stats["gateup"].shape == (2, D, D)
    assert stats["down"].shape == (2, F, F)
    # Grams are PSD with positive diagonals on active inputs
    for role in ("qkv", "o", "gateup", "down"):
        d = np.asarray(jnp.diagonal(stats[role], axis1=1, axis2=2))
        assert (d >= -1e-5).all()
    # masking: zeroing more positions strictly reduces the trace
    st2 = collect_llama_stats(
        params, cfg, ids, mask.at[:, 8:].set(0)
    )
    assert float(jnp.trace(st2["qkv"][0])) < float(jnp.trace(stats["qkv"][0]))


def test_gptq_tree_layout_and_forward(calib):
    """The GPTQ tree drops into llama_forward (fused int4 dispatch) and
    matches its own dequant oracle; its logit error vs the fp tree is no
    worse than plain RTN's on the calibration inputs."""
    cfg, params, ids, mask, stats = calib
    qt = quantize_llama_int4_gptq(params, stats, group=32)
    assert "qkv_proj" in qt["layers"] and "gateup_proj" in qt["layers"]
    deq = dequantize_llama_int4(qt)
    lq, _ = lm.llama_forward(
        qt, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    ld, _ = lm.llama_forward(
        deq, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(lq), np.asarray(ld), atol=2e-3, rtol=2e-3
    )

    from audio_llama_tpu.models.llama_int4 import quantize_llama_int4

    lf, _ = lm.llama_forward(
        params, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    rt = quantize_llama_int4(params)
    lr, _ = lm.llama_forward(
        rt, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    err_g = float(jnp.sqrt(jnp.mean((lq - lf) ** 2)))
    err_r = float(jnp.sqrt(jnp.mean((lr - lf) ** 2)))
    assert err_g <= err_r * 1.05, (err_g, err_r)


def test_gptq_rejects_quantized_tree(calib):
    cfg, params, ids, mask, stats = calib
    qt = quantize_llama_int4_gptq(params, stats, group=32)
    with pytest.raises(ValueError, match="full-precision"):
        quantize_llama_int4_gptq(qt, stats, group=32)


def test_collect_stats_rejects_int4_tree(calib):
    cfg, params, ids, mask, stats = calib
    from audio_llama_tpu.models.llama_int4 import quantize_llama_int4

    qt = quantize_llama_int4(params)
    with pytest.raises(ValueError, match="FULL-PRECISION"):
        lm.llama_forward(
            qt, cfg, input_ids=ids, attention_mask=mask,
            compute_dtype=jnp.float32, attn_impl="xla",
            collect_quant_stats=("qkv",),
        )
