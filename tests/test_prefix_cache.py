"""Prompt-prefix KV caching in the serving engine (inference/serving.py
register_prefix / submit(prefix=)): suffix-only admission must be
token-exact vs full-prompt admission — the prefix slab holds the same K/V
rows causal attention would recompute (prefix K/V depend only on prefix
tokens). The reference regenerates the full prompt per request (reference
src/inference.py:175-220); prefix reuse is our serving-layer extension."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm, llama as llama_mod
from audio_llama_tpu.inference.serving import ServingEngine

CFG = AudioLLMConfig.tiny()
AUDIO_START, AUDIO_END = 512, 513


@pytest.fixture(scope="module")
def model():
    frozen = allm.init_frozen(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    frozen["llama"] = llama_mod.resize_embeddings(
        frozen["llama"], CFG.llama.vocab_size + 2, CFG.llama
    )
    trainable = allm.init_trainable(CFG, jax.random.PRNGKey(1))
    return frozen, trainable


def _engine(model, **kw):
    frozen, trainable = model
    kw.setdefault("rows", 2)
    kw.setdefault("max_len", 128)
    kw.setdefault("prefill_buckets", (8, 16))
    kw.setdefault("chunk_steps", 4)
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("greedy", True)
    kw.setdefault("eos_id", -1)
    kw.setdefault("audio_start_id", AUDIO_START)
    kw.setdefault("audio_end_id", AUDIO_END)
    return ServingEngine(frozen, trainable, CFG, **kw)


def _prompts(seed, sizes):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(3, CFG.llama.vocab_size, (n,)).astype(np.int32)
        for n in sizes
    ]


def test_text_prefix_matches_full_prompt(model):
    pfx, *sfx = _prompts(0, (6, 4, 7, 5))
    ref = _engine(model)
    rref = [ref.submit(np.concatenate([pfx, s]), max_new_tokens=6)
            for s in sfx]
    oref = ref.run()

    eng = _engine(model)
    h = eng.register_prefix(pfx)
    rids = [eng.submit(s, max_new_tokens=6, prefix=h) for s in sfx]
    out = eng.run()
    for a, b in zip(rref, rids):
        assert oref[a] == out[b]
    assert eng.prefix_admits == len(sfx)


def test_prefix_slab_trimmed_to_real_length(model):
    """A short prefix through a large bucket must not carry the bucket's
    slots into every admission (the slab is trimmed at registration)."""
    (pfx,) = _prompts(1, (5,))
    eng = _engine(model)
    h = eng.register_prefix(pfx)
    p = eng._prefixes[h]
    assert p.length == 5
    assert p.cap == llama_mod.KVCache.rounded_len(5) == 32
    assert p.cache.k.shape[3] == 32


def test_audio_prefix_matches_full_audio_request(model):
    """Multi-turn 'chat with your audio': audio + instruction registered
    once, per-turn text suffixes reuse the encoder output via the slab."""
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(CFG.mel.max_samples).astype(np.float32) * 0.1
    pfx, *sfx = _prompts(3, (5, 4, 6))

    ref = _engine(model)
    rref = [
        ref.submit(np.concatenate([pfx, s]), audio_features=wav,
                   max_new_tokens=5)
        for s in sfx
    ]
    oref = ref.run()

    eng = _engine(model)
    h = eng.register_prefix(pfx, audio_features=wav)
    rids = [eng.submit(s, max_new_tokens=5, prefix=h) for s in sfx]
    out = eng.run()
    for a, b in zip(rref, rids):
        assert oref[a] == out[b]


@pytest.mark.parametrize("kv_quant", [8, 4])
def test_quantized_pool_prefix_parity(model, kv_quant):
    pfx, *sfx = _prompts(4, (6, 4, 7))
    ref = _engine(model, kv_quant=kv_quant)
    rref = [ref.submit(np.concatenate([pfx, s]), max_new_tokens=5)
            for s in sfx]
    oref = ref.run()

    eng = _engine(model, kv_quant=kv_quant)
    h = eng.register_prefix(pfx)
    rids = [eng.submit(s, max_new_tokens=5, prefix=h) for s in sfx]
    out = eng.run()
    for a, b in zip(rref, rids):
        assert oref[a] == out[b]


def test_mixed_prefix_and_plain_requests(model):
    """Prefix-cached and plain admissions interleave in one pool."""
    pfx, s1, s2, plain = _prompts(5, (6, 4, 5, 9))
    ref = _engine(model)
    r1 = ref.submit(np.concatenate([pfx, s1]), max_new_tokens=5)
    r2 = ref.submit(plain, max_new_tokens=5)
    r3 = ref.submit(np.concatenate([pfx, s2]), max_new_tokens=5)
    oref = ref.run()

    eng = _engine(model)
    h = eng.register_prefix(pfx)
    q1 = eng.submit(s1, max_new_tokens=5, prefix=h)
    q2 = eng.submit(plain, max_new_tokens=5)
    q3 = eng.submit(s2, max_new_tokens=5, prefix=h)
    out = eng.run()
    assert oref[r1] == out[q1]
    assert oref[r2] == out[q2]
    assert oref[r3] == out[q3]


def test_two_prefixes_coexist(model):
    pa, pb, s = _prompts(6, (6, 9, 4))
    ref = _engine(model)
    ra = ref.submit(np.concatenate([pa, s]), max_new_tokens=5)
    rb = ref.submit(np.concatenate([pb, s]), max_new_tokens=5)
    oref = ref.run()

    eng = _engine(model)
    ha = eng.register_prefix(pa)
    hb = eng.register_prefix(pb)
    qa = eng.submit(s, max_new_tokens=5, prefix=ha)
    qb = eng.submit(s, max_new_tokens=5, prefix=hb)
    out = eng.run()
    assert oref[ra] == out[qa]
    assert oref[rb] == out[qb]


def test_prefixes_survive_reset(model):
    pfx, s = _prompts(7, (6, 4))
    eng = _engine(model)
    h = eng.register_prefix(pfx)
    r1 = eng.submit(s, max_new_tokens=5, prefix=h)
    o1 = eng.run()
    eng.reset()
    r2 = eng.submit(s, max_new_tokens=5, prefix=h)
    o2 = eng.run()
    assert o1[r1] == o2[r2]


def test_dp_mesh_prefix_parity(model):
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 virtual devices")
    mesh = Mesh(np.array(devs[:2]), ("dp",))
    pfx, *sfx = _prompts(8, (6, 4, 7))

    ref = _engine(model)
    h0 = ref.register_prefix(pfx)
    rref = [ref.submit(s, max_new_tokens=5, prefix=h0) for s in sfx]
    oref = ref.run()

    eng = _engine(model, mesh=mesh)
    h = eng.register_prefix(pfx)
    rids = [eng.submit(s, max_new_tokens=5, prefix=h) for s in sfx]
    out = eng.run()
    for a, b in zip(rref, rids):
        assert oref[a] == out[b]


def test_prefix_rejections(model):
    frozen, trainable = model
    eng = _engine(model)
    rng = np.random.default_rng(9)
    wav = rng.standard_normal(CFG.mel.max_samples).astype(np.float32)

    with pytest.raises(ValueError, match="unknown prefix"):
        eng.submit(np.asarray([1, 2], np.int32), prefix=99)
    with pytest.raises(ValueError, match="empty"):
        eng.register_prefix(np.asarray([], np.int32))

    h = eng.register_prefix(np.asarray([1, 2, 3], np.int32))
    with pytest.raises(ValueError, match="register the audio"):
        eng.submit(np.asarray([4], np.int32), audio_features=wav, prefix=h)

    # over-long suffix: rejected at admission (empty result), not a crash
    rid = eng.submit(
        np.arange(3, 20, dtype=np.int32), max_new_tokens=5, prefix=h
    )
    out = eng.run()
    assert out[rid] == []

    # a suffix whose combined length exceeds the pool is rejected even
    # though the suffix alone fits a bucket
    small = _engine(model, max_len=32)
    hs = small.register_prefix(np.arange(3, 9, dtype=np.int32))
    rid2 = small.submit(
        np.asarray([5, 6, 7], np.int32), max_new_tokens=30, prefix=hs
    )
    out2 = small.run()
    assert out2[rid2] == []

    # text-only engine refuses an audio prefix
    text_eng = ServingEngine(
        {"llama": frozen["llama"]}, None, CFG, rows=2, max_len=64,
        prefill_buckets=(8,), chunk_steps=2, compute_dtype=jnp.float32,
        greedy=True, eos_id=-1,
    )
    with pytest.raises(ValueError, match="text-only"):
        text_eng.register_prefix(np.asarray([1, 2], np.int32),
                                 audio_features=wav)


def test_auto_prefix_matching(model):
    """auto_prefix=True: text requests transparently split on the longest
    registered matching prefix — same tokens, admissions counted."""
    pfx, s1 = _prompts(14, (8, 5))
    longer = np.concatenate([pfx, np.asarray([7, 8], np.int32)])

    ref = _engine(model)
    rr = [
        ref.submit(np.concatenate([pfx, s1]), max_new_tokens=5),
        ref.submit(np.concatenate([longer, s1]), max_new_tokens=5),
        ref.submit(s1, max_new_tokens=5),  # no matching prefix
        ref.submit(pfx, max_new_tokens=5),  # == a prefix exactly
    ]
    oref = ref.run()

    eng = _engine(model, auto_prefix=True)
    eng.register_prefix(pfx)
    eng.register_prefix(longer)  # longest match must win
    rq = [
        eng.submit(np.concatenate([pfx, s1]), max_new_tokens=5),
        eng.submit(np.concatenate([longer, s1]), max_new_tokens=5),
        eng.submit(s1, max_new_tokens=5),
        # an exact-prefix prompt must NOT match (empty suffix would have
        # nothing to sample from) — it admits as a plain request
        eng.submit(pfx, max_new_tokens=5),
    ]
    out = eng.run()
    for a, b in zip(rr, rq):
        assert oref[a] == out[b]
    assert eng.prefix_admits == 2


def test_unregister_prefix(model):
    pfx, s = _prompts(15, (6, 4))
    eng = _engine(model)
    h = eng.register_prefix(pfx)
    # queued request pinned to a prefix that is then unregistered: the
    # request is rejected (empty result), the pool stays healthy
    rid = eng.submit(s, max_new_tokens=4, prefix=h)
    eng.unregister_prefix(h)
    out = eng.run()
    assert out[rid] == []
    with pytest.raises(ValueError, match="unknown prefix"):
        eng.submit(s, max_new_tokens=4, prefix=h)
    with pytest.raises(KeyError):
        eng.unregister_prefix(h)
    # pool still serves plain requests
    rid2 = eng.submit(s, max_new_tokens=4)
    assert len(eng.run()[rid2]) == 4


def test_speculative_pool_prefix_lossless(model):
    """Prefix caching composes with the speculative pool: greedy output
    stays token-exact vs the PLAIN pool serving the full prompt (the
    draft's prefix slab only affects acceptance, never results)."""
    frozen, trainable = model
    pfx, *sfx = _prompts(10, (6, 4, 7))

    plain = _engine(model)
    rref = [plain.submit(np.concatenate([pfx, s]), max_new_tokens=6)
            for s in sfx]
    oref = plain.run()

    # self-draft (accepts everything) and an independent random draft
    # (mostly misses) — lossless either way
    ind = llama_mod.resize_embeddings(
        allm.init_frozen(CFG, jax.random.PRNGKey(9), dtype=jnp.float32)
        ["llama"],
        CFG.llama.vocab_size + 2, CFG.llama,
    )
    for draft in (frozen["llama"], ind):
        eng = _engine(model, draft_params=draft, draft_cfg=CFG.llama,
                      gamma=2)
        h = eng.register_prefix(pfx)
        p = eng._prefixes[h]
        assert p.d_cache is not None and p.d_length == len(pfx)
        rids = [eng.submit(s, max_new_tokens=6, prefix=h) for s in sfx]
        out = eng.run()
        for a, b in zip(rref, rids):
            assert oref[a] == out[b]


def test_speculative_audio_prefix_lossless(model):
    """Audio lives in the target prefix slab only; the draft slab covers
    the prefix text — still token-exact vs the plain audio pool."""
    frozen, trainable = model
    rng = np.random.default_rng(11)
    wav = rng.standard_normal(CFG.mel.max_samples).astype(np.float32) * 0.1
    pfx, s = _prompts(12, (5, 4))

    plain = _engine(model)
    r0 = plain.submit(np.concatenate([pfx, s]), audio_features=wav,
                      max_new_tokens=5)
    oref = plain.run()

    eng = _engine(model, draft_params=frozen["llama"], draft_cfg=CFG.llama,
                  gamma=2)
    h = eng.register_prefix(pfx, audio_features=wav)
    p = eng._prefixes[h]
    assert p.d_length == len(pfx) < p.length  # draft slab is text-only
    rid = eng.submit(s, max_new_tokens=5, prefix=h)
    out = eng.run()
    assert oref[r0] == out[rid]
