"""Offset-binary int4 pack format (INT4_FMT='obin', ops/int4_matmul.py).

obin stores the low nibble as lo+8 so the sign-extended packed BYTE equals
16*hi + (lo+8): the kernel matmuls the raw byte plane (no lo unpack at all)
and recovers the lo output in the f32 epilogue
    dot(x, lo) = dot(x, byte) - 16*dot(x, hi) - 8*sum(x_group).
These tests pin: the pack/unpack round trip, dequant EQUALITY between the
two formats (same quantized values, different storage), and kernel-vs-oracle
parity for the plain / stacked / fused-MLP kernels in interpret mode.

Reference analog: none (reference serves f16 through HF Linear layers); the
format exists because the int4 kernels are VPU-unpack-bound at decode M=1
(round-4 finding, BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_llama_tpu.ops.int4_matmul import (
    dequantize_ref,
    int4_matmul,
    int4_matmul_ref,
    int4_matmul_stacked,
    pack_nibbles,
    quantize_pack,
    unpack_ref,
)
from audio_llama_tpu.ops.mlp_int4 import mlp_int4_stacked, mlp_int4_stacked_ref


def test_pack_nibbles_roundtrip_obin():
    rng = np.random.RandomState(0)
    q = rng.randint(-7, 8, (128, 256)).astype(np.int8)
    lo, hi = jnp.asarray(q[:, :128]), jnp.asarray(q[:, 128:])
    packed = pack_nibbles(lo, hi, fmt="obin")
    got = unpack_ref(packed, fmt="obin")
    np.testing.assert_array_equal(np.asarray(got), q)
    # the byte identity the kernel relies on: byte == 16*hi + (lo+8)
    b = np.asarray(packed).astype(np.int32)
    np.testing.assert_array_equal(
        b, 16 * q[:, 128:].astype(np.int32) + (q[:, :128].astype(np.int32) + 8)
    )


def test_dequant_equal_across_formats():
    """Same float weights -> identical dequantized values in both formats
    (storage differs, values must not)."""
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(256, 256).astype(np.float32)) * 0.05
    p_pair, s_pair = quantize_pack(w, fmt="pair")
    p_obin, s_obin = quantize_pack(w, fmt="obin")
    np.testing.assert_array_equal(np.asarray(s_pair), np.asarray(s_obin))
    d_pair = dequantize_ref(p_pair, s_pair, fmt="pair")
    d_obin = dequantize_ref(p_obin, s_obin, fmt="obin")
    np.testing.assert_array_equal(np.asarray(d_pair), np.asarray(d_obin))


def test_kernel_obin_matches_oracle_interpret():
    rng = np.random.RandomState(2)
    K, N = 256, 512
    w = jnp.asarray(rng.randn(K, N).astype(np.float32)) * 0.05
    packed, scales = quantize_pack(w, fmt="obin")
    for M in (1, 8, 64):
        x = jnp.asarray(rng.randn(M, K).astype(np.float32)) * 0.5
        ref = int4_matmul_ref(x, packed, scales, compute_dtype=jnp.float32,
                              fmt="obin")
        got = int4_matmul(x, packed, scales, interpret=True, fmt="obin")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4,
            err_msg=f"M={M}",
        )


def test_stacked_kernel_obin_matches_pair_outputs():
    """The production decode path: stacked kernel in obin vs the SAME
    weights through the pair-format kernel — outputs must agree to f32
    accumulation noise (identical quantized values)."""
    rng = np.random.RandomState(3)
    L, K, N = 2, 256, 512
    ws = [jnp.asarray(rng.randn(K, N).astype(np.float32)) * 0.05
          for _ in range(L)]
    pk_p = jnp.stack([quantize_pack(w, fmt="pair")[0] for w in ws])
    pk_o = jnp.stack([quantize_pack(w, fmt="obin")[0] for w in ws])
    sc = jnp.stack([quantize_pack(w, fmt="pair")[1] for w in ws])
    x = jnp.asarray(rng.randn(4, K).astype(np.float32)) * 0.5
    for layer in range(L):
        li = jnp.asarray(layer, jnp.int32)
        got_p = int4_matmul_stacked(x, pk_p, sc, li, interpret=True,
                                    fmt="pair")
        got_o = int4_matmul_stacked(x, pk_o, sc, li, interpret=True,
                                    fmt="obin")
        np.testing.assert_allclose(
            np.asarray(got_p), np.asarray(got_o), atol=3e-4, rtol=3e-4,
            err_msg=f"layer {layer}",
        )


def test_mlp_fused_obin_matches_oracle_interpret():
    rng = np.random.RandomState(4)
    L, K, F, D = 2, 256, 512, 256
    gup = [jnp.asarray(rng.randn(K, 2 * F).astype(np.float32)) * 0.05
           for _ in range(L)]
    dn = [jnp.asarray(rng.randn(F, D).astype(np.float32)) * 0.05
          for _ in range(L)]
    gp = jnp.stack([quantize_pack(w, fmt="obin")[0] for w in gup])
    gs = jnp.stack([quantize_pack(w, fmt="obin")[1] for w in gup])
    dp = jnp.stack([quantize_pack(w, fmt="obin")[0] for w in dn])
    ds = jnp.stack([quantize_pack(w, fmt="obin")[1] for w in dn])
    x = jnp.asarray(rng.randn(2, K).astype(np.float32)) * 0.3
    dn_r = jnp.asarray(1.0 + 0.1 * rng.rand(L, F).astype(np.float32))
    for layer in range(L):
        li = jnp.asarray(layer, jnp.int32)
        for r in (None, dn_r):
            ref = mlp_int4_stacked_ref(
                x, gp, gs, dp, ds, li, compute_dtype=jnp.float32,
                dn_r=r, fmt="obin",
            )
            got = mlp_int4_stacked(
                x, gp, gs, dp, ds, li, chunk=256, interpret=True,
                dn_r=r, fmt="obin",
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=3e-3, rtol=3e-3,
                err_msg=f"layer {layer} dn_r={r is not None}",
            )


def test_fmt_is_a_tree_property():
    """The pack format rides the tree (marker leaf 'int4_obin'), so forward
    dispatch matches the storage REGARDLESS of the process INT4_FMT env —
    a pair-env process must decode an obin tree correctly and vice versa."""
    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm
    from audio_llama_tpu.models.llama_int4 import (
        dequantize_llama_int4,
        quantize_llama_int4,
    )

    cfg = LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
        max_position_embeddings=2048, rope_scaling=None,
        tie_word_embeddings=True,
    )
    params = lm.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 3, 500)
    mask = jnp.ones((2, 16), jnp.int32)

    outs = {}
    for fmt in ("pair", "obin"):
        q = quantize_llama_int4(params, fmt=fmt)
        assert ("int4_obin" in q) == (fmt == "obin")
        deq = dequantize_llama_int4(q)
        assert "int4_obin" not in deq
        got, _ = lm.llama_forward(
            q, cfg, input_ids=ids, attention_mask=mask,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        ref, _ = lm.llama_forward(
            deq, cfg, input_ids=ids, attention_mask=mask,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-3, rtol=2e-3
        )
        outs[fmt] = np.asarray(got)
    # same quantized VALUES in both formats -> identical logits
    np.testing.assert_allclose(outs["pair"], outs["obin"], atol=1e-4)


def test_gptq_fmt_threading():
    """GPTQ packing honors fmt= and stamps the marker."""
    from audio_llama_tpu.models.llama_gptq import gptq_pack
    from audio_llama_tpu.ops.int4_matmul import dequantize_ref

    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32)) * 0.05
    h = jnp.eye(128, dtype=jnp.float32) * 4.0
    for fmt in ("pair", "obin"):
        p, s = gptq_pack(w, h, fmt=fmt)
        d = dequantize_ref(p, s, fmt=fmt)
        err = float(jnp.linalg.norm(d - w) / jnp.linalg.norm(w))
        assert err < 0.12, (fmt, err)
