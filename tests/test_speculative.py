"""Speculative decoding (inference/speculative.py): greedy mode must be
LOSSLESS — bit-identical tokens to plain greedy generation of the target —
regardless of the draft model's quality. Tested with (a) a disagreeing
random draft (exercises the rejection/correction path nearly every round)
and (b) the target itself as draft (all-accept fast path), with and
without audio."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import AudioLLMConfig, LlamaConfig, MelConfig, WhisperConfig
from audio_llama_tpu.inference import generate as gen
from audio_llama_tpu.inference.speculative import (
    generate_speculative,
    generate_speculative_batched,
)
from audio_llama_tpu.models import allm, llama as lm


@pytest.fixture(scope="module")
def setup():
    cfg = AudioLLMConfig.tiny().replace(lora=None)
    frozen = allm.init_frozen(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, jax.random.PRNGKey(1))
    draft_cfg = LlamaConfig.tiny()  # same vocab, independent weights
    draft = lm.init_params(draft_cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 12), 3, 250)
    mask = jnp.ones((1, 12), jnp.int32)
    audio = jax.random.normal(
        jax.random.PRNGKey(3), (1, cfg.mel.max_samples)
    ) * 0.1
    return cfg, frozen, trainable, draft_cfg, draft, ids, mask, audio


def _ref_tokens(cfg, frozen, trainable, ids, mask, audio, n, has_audio):
    res = gen.generate(
        frozen, trainable, cfg, ids, mask, audio if has_audio else None,
        jax.random.PRNGKey(0), max_new_tokens=n, greedy=True,
        eos_id=2, pad_id=0, audio_start_id=260, audio_end_id=261,
        compute_dtype=jnp.float32, has_audio=has_audio,
    )
    return np.asarray(res.tokens), np.asarray(res.num_generated)


@pytest.mark.parametrize("has_audio", [False, True])
@pytest.mark.parametrize("gamma", [1, 3, 4])
def test_lossless_vs_greedy_random_draft(setup, has_audio, gamma):
    cfg, frozen, trainable, draft_cfg, draft, ids, mask, audio = setup
    n = 12
    ref_tok, ref_num = _ref_tokens(
        cfg, frozen, trainable, ids, mask, audio, n, has_audio
    )
    res = generate_speculative(
        frozen, draft, trainable, cfg, draft_cfg, ids, mask,
        audio if has_audio else None,
        max_new_tokens=n, gamma=gamma, eos_id=2, pad_id=0,
        audio_start_id=260, audio_end_id=261,
        compute_dtype=jnp.float32, has_audio=has_audio,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), ref_tok)
    np.testing.assert_array_equal(np.asarray(res.num_generated), ref_num)
    assert int(res.num_drafted) >= gamma


def test_self_draft_accepts_everything(setup):
    """Draft == target: every proposal must be accepted (acceptance rate 1)
    and the output still identical — the mechanism's upper bound."""
    cfg, frozen, trainable, draft_cfg, draft, ids, mask, audio = setup
    n = 12
    ref_tok, _ = _ref_tokens(cfg, frozen, trainable, ids, mask, audio, n, False)
    res = generate_speculative(
        frozen, frozen["llama"], trainable, cfg, cfg.llama, ids, mask, None,
        max_new_tokens=n, gamma=4, eos_id=2, pad_id=0,
        audio_start_id=260, audio_end_id=261,
        compute_dtype=jnp.float32, has_audio=False,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), ref_tok)
    # every drafted token accepted; target calls ~ n/(gamma+1)
    assert int(res.num_accepted) == int(res.num_drafted)
    assert int(res.num_target_calls) <= -(-n // 5) + 1


def test_batch_gt1_rejected(setup):
    cfg, frozen, trainable, draft_cfg, draft, ids, mask, audio = setup
    with pytest.raises(ValueError, match="batch-1"):
        generate_speculative(
            frozen, draft, trainable, cfg, draft_cfg,
            jnp.tile(ids, (2, 1)), jnp.tile(mask, (2, 1)), None,
            max_new_tokens=4, has_audio=False, compute_dtype=jnp.float32,
        )


# ---- stochastic speculative sampling (Leviathan accept/reject) -------------

def test_stochastic_requires_key(setup):
    cfg, frozen, trainable, draft_cfg, draft, ids, mask, audio = setup
    with pytest.raises(ValueError, match="PRNG key"):
        generate_speculative(
            frozen, draft, trainable, cfg, draft_cfg, ids, mask, None,
            max_new_tokens=4, gamma=2, eos_id=2, pad_id=0,
            audio_start_id=260, audio_end_id=261,
            compute_dtype=jnp.float32, has_audio=False, greedy=False,
        )


def test_stochastic_self_draft_accepts_everything(setup):
    """Draft == target => p == q => accept probability min(1, p/q) == 1:
    every proposal must be accepted even under sampling."""
    cfg, frozen, trainable, draft_cfg, draft, ids, mask, audio = setup
    res = generate_speculative(
        frozen, frozen["llama"], trainable, cfg, cfg.llama, ids, mask, None,
        jax.random.PRNGKey(11),
        max_new_tokens=10, gamma=3, eos_id=2, pad_id=0,
        audio_start_id=260, audio_end_id=261,
        compute_dtype=jnp.float32, has_audio=False,
        greedy=False, temperature=0.8, top_k=16,
    )
    assert int(res.num_drafted) > 0
    assert int(res.num_accepted) == int(res.num_drafted)


# ---- batched speculative decoding (per-row divergent timelines) ------------

@pytest.fixture(scope="module")
def batch_setup(setup):
    """3 rows with DIFFERENT real prompt lengths (right-padded): per-row
    acceptance lengths diverge immediately, exercising cache_offsets."""
    cfg, frozen, trainable, draft_cfg, draft, _, _, _ = setup
    rng = np.random.default_rng(21)
    lens = [12, 8, 10]
    T = max(lens)
    ids = rng.integers(3, 250, (3, T)).astype(np.int32)
    mask = np.zeros((3, T), np.int32)
    for b, l in enumerate(lens):
        mask[b, :l] = 1
        ids[b, l:] = 0
    audio = jax.random.normal(
        jax.random.PRNGKey(4), (3, cfg.mel.max_samples)
    ) * 0.1
    return jnp.asarray(ids), jnp.asarray(mask), audio


@pytest.mark.parametrize("has_audio", [False, True])
@pytest.mark.parametrize("gamma", [2, 4])
def test_batched_lossless_vs_greedy(setup, batch_setup, has_audio, gamma):
    """Greedy batched spec decode must be bit-identical PER ROW to plain
    batched greedy decoding, with divergent prompt lengths in the batch."""
    cfg, frozen, trainable, draft_cfg, draft, _, _, _ = setup
    ids, mask, audio = batch_setup
    n = 12
    ref_tok, ref_num = _ref_tokens(
        cfg, frozen, trainable, ids, mask, audio, n, has_audio
    )
    res = generate_speculative_batched(
        frozen, draft, trainable, cfg, draft_cfg, ids, mask,
        audio if has_audio else None,
        max_new_tokens=n, gamma=gamma, eos_id=2, pad_id=0,
        audio_start_id=260, audio_end_id=261,
        compute_dtype=jnp.float32, has_audio=has_audio,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), ref_tok)
    np.testing.assert_array_equal(np.asarray(res.num_generated), ref_num)
    assert res.num_drafted.shape == (3,)


def test_batched_self_draft_accepts_everything(setup, batch_setup):
    """Draft == target: every row must accept every proposal, and the round
    count collapses to ~n/(gamma+1) for the LONGEST row."""
    cfg, frozen, trainable, draft_cfg, draft, _, _, _ = setup
    ids, mask, _ = batch_setup
    n, gamma = 12, 4
    ref_tok, _ = _ref_tokens(cfg, frozen, trainable, ids, mask, None, n, False)
    res = generate_speculative_batched(
        frozen, frozen["llama"], trainable, cfg, cfg.llama, ids, mask, None,
        max_new_tokens=n, gamma=gamma, eos_id=2, pad_id=0,
        audio_start_id=260, audio_end_id=261,
        compute_dtype=jnp.float32, has_audio=False,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), ref_tok)
    np.testing.assert_array_equal(
        np.asarray(res.num_accepted), np.asarray(res.num_drafted)
    )
    assert int(res.num_target_calls) <= -(-n // (gamma + 1)) + 1


def test_batched_matches_batch1_per_row(setup, batch_setup):
    """Each row of the batched run must equal its own batch-1 spec run
    (greedy; same draft) — the batched path adds no cross-row interference."""
    cfg, frozen, trainable, draft_cfg, draft, _, _, _ = setup
    ids, mask, _ = batch_setup
    n = 10
    res_b = generate_speculative_batched(
        frozen, draft, trainable, cfg, draft_cfg, ids, mask, None,
        max_new_tokens=n, gamma=3, eos_id=2, pad_id=0,
        audio_start_id=260, audio_end_id=261,
        compute_dtype=jnp.float32, has_audio=False,
    )
    for b in range(ids.shape[0]):
        l = int(jnp.sum(mask[b]))
        res_1 = generate_speculative(
            frozen, draft, trainable, cfg, draft_cfg,
            ids[b : b + 1, :l], mask[b : b + 1, :l], None,
            max_new_tokens=n, gamma=3, eos_id=2, pad_id=0,
            audio_start_id=260, audio_end_id=261,
            compute_dtype=jnp.float32, has_audio=False,
        )
        np.testing.assert_array_equal(
            np.asarray(res_b.tokens[b]), np.asarray(res_1.tokens[0])
        )


def test_batched_stochastic_self_draft_accepts_everything(setup, batch_setup):
    cfg, frozen, trainable, draft_cfg, draft, _, _, _ = setup
    ids, mask, _ = batch_setup
    res = generate_speculative_batched(
        frozen, frozen["llama"], trainable, cfg, cfg.llama, ids, mask, None,
        jax.random.PRNGKey(13),
        max_new_tokens=10, gamma=3, eos_id=2, pad_id=0,
        audio_start_id=260, audio_end_id=261,
        compute_dtype=jnp.float32, has_audio=False,
        greedy=False, temperature=0.8, top_k=16,
    )
    np.testing.assert_array_equal(
        np.asarray(res.num_accepted), np.asarray(res.num_drafted)
    )
    assert np.all(np.asarray(res.num_drafted) > 0)


def test_stochastic_marginal_matches_target_sampling(setup):
    """The spec-sampled SECOND token (produced by draft-accept-or-residual)
    must be distributed like direct target sampling. Empirical total-
    variation check over seeds with top_k=8 (support <= 8 per position)."""
    from collections import Counter

    cfg, frozen, trainable, draft_cfg, draft, ids, mask, audio = setup
    N = 400
    kw = dict(temperature=0.9, top_k=8)
    spec_counts, ref_counts = Counter(), Counter()
    for s in range(N):
        res = generate_speculative(
            frozen, draft, trainable, cfg, draft_cfg, ids, mask, None,
            jax.random.PRNGKey(1000 + s),
            max_new_tokens=2, gamma=2, eos_id=-1, pad_id=0,
            audio_start_id=260, audio_end_id=261,
            compute_dtype=jnp.float32, has_audio=False, greedy=False, **kw,
        )
        spec_counts[int(res.tokens[0, 1])] += 1
        ref = gen.generate(
            frozen, trainable, cfg, ids, mask, None,
            jax.random.PRNGKey(5000 + s), max_new_tokens=2, greedy=False,
            eos_id=-1, pad_id=0, audio_start_id=260, audio_end_id=261,
            compute_dtype=jnp.float32, has_audio=False, **kw,
        )
        ref_counts[int(ref.tokens[0, 1])] += 1
    support = set(spec_counts) | set(ref_counts)
    tv = 0.5 * sum(
        abs(spec_counts[t] / N - ref_counts[t] / N) for t in support
    )
    # sampling noise at N=400 over <=16 joint-support points is ~0.1;
    # a broken accept/reject (e.g. raw-logit ratios) lands far above 0.25
    assert tv < 0.22, f"TV {tv:.3f}, support {len(support)}"


@pytest.mark.parametrize("kvq", [True, 4])
def test_kv_quant_lossless_vs_greedy_kv_quant(setup, kvq):
    """Speculative decoding with int8/int4 KV caches: greedy mode must be
    bit-identical to plain greedy generation *with the same quantized
    cache* (both paths quantize the same rows with the same per-row
    scales; the verify pass's multi-token appends ride the quantized
    _cache_write — combined-packed for int4)."""
    cfg, frozen, trainable, draft_cfg, draft, ids, mask, audio = setup
    n = 12
    ref = gen.generate(
        frozen, trainable, cfg, ids, mask, None,
        jax.random.PRNGKey(0), max_new_tokens=n, greedy=True,
        eos_id=2, pad_id=0, audio_start_id=260, audio_end_id=261,
        compute_dtype=jnp.float32, has_audio=False, kv_quant=kvq,
    )
    res = generate_speculative(
        frozen, draft, trainable, cfg, draft_cfg, ids, mask, None,
        max_new_tokens=n, gamma=3, eos_id=2, pad_id=0,
        audio_start_id=260, audio_end_id=261,
        compute_dtype=jnp.float32, has_audio=False, kv_quant=kvq,
    )
    np.testing.assert_array_equal(
        np.asarray(res.tokens), np.asarray(ref.tokens)
    )
    np.testing.assert_array_equal(
        np.asarray(res.num_generated), np.asarray(ref.num_generated)
    )


@pytest.mark.parametrize("kvq", [True, 4])
def test_batched_kv_quant_lossless(setup, batch_setup, kvq):
    """Batched speculative decoding with int8/int4 KV caches (divergent
    per-row timelines via cache_offsets writing quantized rows + scales)."""
    cfg, frozen, trainable, draft_cfg, draft, *_ = setup
    ids, mask, audio = batch_setup
    n = 10
    ref = gen.generate(
        frozen, trainable, cfg, ids, mask, None,
        jax.random.PRNGKey(0), max_new_tokens=n, greedy=True,
        eos_id=2, pad_id=0, audio_start_id=260, audio_end_id=261,
        compute_dtype=jnp.float32, has_audio=False, kv_quant=kvq,
    )
    res = generate_speculative_batched(
        frozen, draft, trainable, cfg, draft_cfg, ids, mask, None,
        max_new_tokens=n, gamma=3, eos_id=2, pad_id=0,
        audio_start_id=260, audio_end_id=261,
        compute_dtype=jnp.float32, has_audio=False, kv_quant=kvq,
    )
    np.testing.assert_array_equal(
        np.asarray(res.tokens), np.asarray(ref.tokens)
    )
