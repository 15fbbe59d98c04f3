"""Per-request sampling in the serving pool (round-4 VERDICT #5): sampling
params ride every program as per-row ARRAY arguments, so one pool serves a
MIX of greedy and sampled requests with no retrace per config — and greedy
rows stay token-exact vs the one-shot generate oracle regardless of what
their neighbors sample. The reference exposes per-call sampling on
generate() (reference src/models/allm.py:263-270, src/inference.py:176-194);
this is the pool-level analog the reference never had."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm, llama as llama_mod
from audio_llama_tpu.inference import generate as gen_mod
from audio_llama_tpu.inference.serving import ServingEngine
from audio_llama_tpu.ops import sampling

CFG = AudioLLMConfig.tiny()
AUDIO_START, AUDIO_END = 512, 513


@pytest.fixture(scope="module")
def model():
    cfg = CFG
    frozen = allm.init_frozen(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    frozen["llama"] = llama_mod.resize_embeddings(
        frozen["llama"], cfg.llama.vocab_size + 2, cfg.llama
    )
    trainable = allm.init_trainable(cfg, jax.random.PRNGKey(1))
    return cfg, frozen, trainable


def _reference_tokens(model, ids, max_new):
    cfg, frozen, trainable = model
    ids = np.asarray(ids, np.int32)[None]
    res = gen_mod.generate(
        frozen, trainable, cfg, jnp.asarray(ids), jnp.ones_like(ids),
        None, jax.random.PRNGKey(0), max_new_tokens=max_new, greedy=True,
        eos_id=-1, pad_id=0, has_audio=False, compute_dtype=jnp.float32,
        audio_start_id=AUDIO_START, audio_end_id=AUDIO_END,
    )
    return list(np.asarray(res.tokens[0], np.int32))


def _engine(model, **kw):
    cfg, frozen, trainable = model
    kw.setdefault("rows", 4)
    kw.setdefault("max_len", 64)
    kw.setdefault("prefill_buckets", (8, 16))
    kw.setdefault("chunk_steps", 4)
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("eos_id", -1)
    kw.setdefault("audio_start_id", AUDIO_START)
    kw.setdefault("audio_end_id", AUDIO_END)
    return ServingEngine(frozen, trainable, cfg, **kw)


def test_per_row_sampler_matches_static():
    """sample_token_per_row with uniform params reproduces sample_token
    bit-exactly (same filters, same categorical draw) — and greedy rows
    are exact argmax."""
    key = jax.random.PRNGKey(3)
    logits = jax.random.normal(jax.random.PRNGKey(4), (6, 40)) * 3.0
    for temp, top_p, top_k in [(1.0, 1.0, 0), (0.7, 0.9, 0), (1.3, 1.0, 5)]:
        ref = sampling.sample_token(
            logits, key, temperature=temp, top_p=top_p, top_k=top_k
        )
        out = sampling.sample_token_per_row(
            logits, key,
            jnp.full((6,), temp, jnp.float32),
            jnp.full((6,), top_p, jnp.float32),
            jnp.full((6,), top_k, jnp.int32),
            jnp.zeros((6,), jnp.bool_),
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    greedy = sampling.sample_token_per_row(
        logits, key, jnp.ones((6,)), jnp.ones((6,)),
        jnp.zeros((6,), jnp.int32), jnp.ones((6,), jnp.bool_),
    )
    np.testing.assert_array_equal(
        np.asarray(greedy), np.asarray(jnp.argmax(logits, -1))
    )


def test_mixed_pool_greedy_rows_exact(model):
    """A pool whose ENGINE default is stochastic still serves greedy
    requests token-exactly (vs the one-shot generate oracle) while
    neighboring rows sample."""
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(3, CFG.llama.vocab_size, (n,)).astype(np.int32)
        for n in (4, 7, 5, 6)
    ]
    eng = _engine(model, greedy=False, temperature=0.9, top_p=0.95)
    rids = {}
    for i, p in enumerate(prompts):
        greedy = i % 2 == 0
        rids[eng.submit(p, max_new_tokens=6, greedy=greedy)] = (p, greedy)
    out = eng.run()
    n_greedy_checked = 0
    for rid, (p, greedy) in rids.items():
        assert len(out[rid]) == 6
        if greedy:
            assert out[rid] == _reference_tokens(model, p, 6), rid
            n_greedy_checked += 1
    assert n_greedy_checked == 2


def test_mixed_configs_do_not_retrace(model):
    """temperature/top_p/top_k/greedy are ARRAY args: serving every mix of
    configs through one pool keeps exactly ONE compiled decode-chunk
    program."""
    rng = np.random.default_rng(1)
    eng = _engine(model, greedy=True)
    for i, cfgkw in enumerate([
        dict(),  # engine default (greedy)
        dict(greedy=False),  # engine stochastic defaults
        dict(greedy=False, temperature=1.3),
        dict(greedy=False, temperature=0.5, top_p=0.8),
        dict(greedy=False, top_k=3),
    ]):
        p = rng.integers(3, CFG.llama.vocab_size, (5,)).astype(np.int32)
        eng.submit(p, max_new_tokens=4, **cfgkw)
    out = eng.run()
    assert len(out) == 5 and all(len(v) == 4 for v in out.values())
    assert eng._chunk_fn._cache_size() == 1


def test_per_request_sampling_with_prefix(model):
    """Per-request overrides compose with prefix-cached admission (the
    suffix program also takes the samp arrays)."""
    rng = np.random.default_rng(2)
    pre = rng.integers(3, CFG.llama.vocab_size, (6,)).astype(np.int32)
    sfx = rng.integers(3, CFG.llama.vocab_size, (4,)).astype(np.int32)
    eng = _engine(model, greedy=False, temperature=0.9)
    h = eng.register_prefix(pre)
    rid_g = eng.submit(sfx, max_new_tokens=5, prefix=h, greedy=True)
    rid_s = eng.submit(sfx, max_new_tokens=5, prefix=h)
    out = eng.run()
    full = np.concatenate([pre, sfx])
    assert out[rid_g] == _reference_tokens(model, full, 5)
    assert len(out[rid_s]) == 5


def test_per_request_sampling_with_chunked_prefill(model):
    """Per-request overrides compose with chunked (staged) prefill: the
    piece program samples tok0 with the request's params."""
    rng = np.random.default_rng(3)
    p = rng.integers(3, CFG.llama.vocab_size, (11,)).astype(np.int32)
    eng = _engine(model, greedy=False, temperature=0.9,
                  prefill_chunk_tokens=4)
    rid = eng.submit(p, max_new_tokens=5, greedy=True)
    out = eng.run()
    assert out[rid] == _reference_tokens(model, p, 5)


def test_spec_pool_rejects_per_request_sampling(model):
    from audio_llama_tpu.config import LlamaConfig

    dcfg = LlamaConfig.tiny(vocab_size=CFG.llama.vocab_size)
    dparams = llama_mod.init_params(dcfg, jax.random.PRNGKey(9),
                                    dtype=jnp.float32)
    eng = _engine(model, draft_params=dparams, draft_cfg=dcfg, gamma=2)
    with pytest.raises(ValueError, match="per-request sampling"):
        eng.submit(np.asarray([3, 4, 5], np.int32), max_new_tokens=4,
                   temperature=0.5)


def test_stochastic_rows_follow_their_own_config(model):
    """Distribution sanity: a near-zero-temperature sampled row behaves
    like greedy; a high-temperature row diverges from greedy across seeds."""
    rng = np.random.default_rng(4)
    p = rng.integers(3, CFG.llama.vocab_size, (5,)).astype(np.int32)
    ref = _reference_tokens(model, p, 6)

    cold = _engine(model, greedy=False, temperature=0.9)
    rid = cold.submit(p, max_new_tokens=6, temperature=1e-4, top_p=1.0)
    assert cold.run()[rid] == ref

    diverged = False
    for seed in range(4):
        hot = _engine(model, greedy=False, seed=seed)
        rid = hot.submit(p, max_new_tokens=6, temperature=3.0)
        if hot.run()[rid] != ref:
            diverged = True
            break
    assert diverged, "temperature=3.0 never diverged from greedy"
