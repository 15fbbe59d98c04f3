"""Speculative decoding INSIDE the continuous-batching pool
(inference/serving.py draft_params=): greedy draft-and-verify is lossless,
so the speculative pool must be token-exact vs the plain pool for every
request — regardless of the draft model, scheduling, audio conditioning,
or cache quantization. Composes generate_speculative_batched's stateless
per-row offsets with the pool's slot-causal invariant."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm, llama as llama_mod
from audio_llama_tpu.inference.serving import ServingEngine

CFG = AudioLLMConfig.tiny()
AUDIO_START, AUDIO_END = 300, 301


@pytest.fixture(scope="module")
def model():
    frozen = allm.init_frozen(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    trainable = allm.init_trainable(CFG, jax.random.PRNGKey(1))
    return frozen, trainable


@pytest.fixture(scope="module")
def draft():
    dcfg = CFG.llama.replace(
        num_layers=1, hidden_size=64, intermediate_size=128,
        num_heads=2, num_kv_heads=1, head_dim=32,
    )
    return llama_mod.init_params(
        dcfg, jax.random.PRNGKey(7), dtype=jnp.float32
    ), dcfg


def _engine(model, **kw):
    frozen, trainable = model
    kw.setdefault("rows", 2)
    kw.setdefault("max_len", 96)
    kw.setdefault("prefill_buckets", (8, 16))
    kw.setdefault("chunk_steps", 3)
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("greedy", True)
    kw.setdefault("eos_id", -1)
    kw.setdefault("audio_start_id", AUDIO_START)
    kw.setdefault("audio_end_id", AUDIO_END)
    return ServingEngine(frozen, trainable, CFG, **kw)


def _workload(seed=0, n=5):
    rng = np.random.default_rng(seed)
    return [
        (
            rng.integers(3, CFG.llama.vocab_size, (int(p),)).astype(np.int32),
            int(b),
        )
        for p, b in zip(rng.integers(3, 14, n), rng.integers(2, 9, n))
    ]


def _run(eng, reqs, feats_at=()):
    rng = np.random.default_rng(9)
    rids = []
    for i, (ids, budget) in enumerate(reqs):
        feats = None
        if i in feats_at:
            feats = rng.standard_normal(
                (CFG.whisper.num_mel_bins,
                 2 * CFG.whisper.max_source_positions)
            ).astype(np.float32)
        rids.append(eng.submit(ids, audio_features=feats,
                               max_new_tokens=budget))
    out = eng.run(max_chunks=256)
    return [out[r] for r in rids]


def test_self_draft_matches_plain_pool(model):
    """Draft == target: every draft token accepted; still token-exact."""
    frozen, _ = model
    reqs = _workload()
    ref = _run(_engine(model), reqs)
    eng = _engine(model, draft_params=frozen["llama"], draft_cfg=CFG.llama,
                  gamma=3)
    got = _run(eng, reqs)
    assert got == ref
    # telemetry: a self-draft accepts everything
    assert eng.spec_rounds > 0
    acc = (eng.spec_emitted - eng.spec_rounds) / (eng.spec_rounds * 3)
    assert acc >= 0.95


def test_independent_draft_lossless(model, draft):
    """A random unrelated draft mostly MISSES — greedy output must still
    be exactly the plain pool's (lossless verify)."""
    dparams, dcfg = draft
    reqs = _workload(seed=1)
    ref = _run(_engine(model), reqs)
    got = _run(
        _engine(model, draft_params=dparams, draft_cfg=dcfg, gamma=4),
        reqs,
    )
    assert got == ref


def test_spec_pool_audio_requests(model, draft):
    dparams, dcfg = draft
    reqs = _workload(seed=2, n=4)
    ref = _run(_engine(model), reqs, feats_at=(0, 2))
    got = _run(
        _engine(model, draft_params=dparams, draft_cfg=dcfg, gamma=2),
        reqs, feats_at=(0, 2),
    )
    assert got == ref


def test_spec_pool_quantized_cache(model, draft):
    dparams, dcfg = draft
    reqs = _workload(seed=3, n=4)
    ref = _run(_engine(model, kv_quant=8), reqs)
    got = _run(
        _engine(model, kv_quant=8, draft_params=dparams, draft_cfg=dcfg,
                gamma=3),
        reqs,
    )
    assert got == ref


def test_spec_pool_eos_and_budget(model):
    """EOS latch inside an accepted block + exact budget truncation."""
    frozen, _ = model
    # greedy self-draft with a real eos id: outputs must terminate at the
    # first eos and never exceed budget
    eng = _engine(model, draft_params=frozen["llama"], draft_cfg=CFG.llama,
                  gamma=3, eos_id=5)
    ref = _engine(model, eos_id=5)
    reqs = _workload(seed=4, n=4)
    got = _run(eng, reqs)
    want = _run(ref, reqs)
    assert got == want
    for toks, (_, budget) in zip(got, reqs):
        assert len(toks) <= budget
        if 5 in toks:
            assert toks.index(5) == len(toks) - 1


def test_spec_pool_stochastic_smoke(model, draft):
    dparams, dcfg = draft
    reqs = _workload(seed=5, n=3)
    eng = _engine(model, draft_params=dparams, draft_cfg=dcfg, gamma=2,
                  greedy=False, temperature=0.9, top_p=0.95, seed=11)
    out = _run(eng, reqs)
    for toks, (_, budget) in zip(out, reqs):
        assert 1 <= len(toks) <= budget
        assert all(0 <= t < CFG.llama.vocab_size for t in toks)


def test_spec_pool_stochastic_marginal_matches_plain_pool(model, draft):
    """Distribution-level losslessness of the STOCHASTIC speculative
    pool: the second emitted token (the first draft-accept-or-residual
    sample) must be distributed like the plain pool's second token.
    Empirical total-variation over many identical requests, top_k=8
    (the pool analog of tests/test_speculative.py's marginal test)."""
    from collections import Counter

    dparams, dcfg = draft
    prompt = np.asarray([5, 9, 3, 7], np.int32)
    N = 240
    kw = dict(greedy=False, temperature=0.9, top_k=8)

    def marginal(eng):
        rids = [eng.submit(prompt, max_new_tokens=2) for _ in range(N)]
        out = eng.run(max_chunks=4096)
        c = Counter()
        for r in rids:
            assert len(out[r]) == 2
            c[out[r][1]] += 1
        return c

    ref = marginal(_engine(model, rows=4, seed=3, **kw))
    spec = marginal(_engine(model, rows=4, seed=17, draft_params=dparams,
                            draft_cfg=dcfg, gamma=2, **kw))
    support = set(ref) | set(spec)
    tv = 0.5 * sum(abs(ref[t] / N - spec[t] / N) for t in support)
    # sampling noise at N=240 over <=8 support points is ~0.1; a broken
    # accept/reject lands far above 0.25
    assert tv < 0.22, f"TV {tv:.3f}, support {len(support)}"


def test_spec_pool_guards(model, draft):
    dparams, dcfg = draft
    bad = dcfg.replace(vocab_size=CFG.llama.vocab_size + 1)
    with pytest.raises(ValueError, match="vocabulary"):
        _engine(model, draft_params=dparams, draft_cfg=bad)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    from jax.sharding import Mesh

    return Mesh(np.array(devs[:n]), ("dp",))


def test_spec_pool_dp_mesh_lossless(model, draft):
    """Speculative pool sharded over a dp mesh (draft cache rows shard
    with the pool rows): token-exact vs the PLAIN unsharded pool."""
    dparams, dcfg = draft
    reqs = _workload(4, 6)
    ref = _run(_engine(model), reqs)
    eng = _engine(model, rows=4, draft_params=dparams, draft_cfg=dcfg,
                  gamma=2, mesh=_mesh(2))
    assert _run(eng, reqs) == ref


def test_spec_pool_dp_mesh_audio_and_quant(model, draft):
    dparams, dcfg = draft
    reqs = _workload(5, 4)
    ref = _run(_engine(model, kv_quant=8), reqs, feats_at=(1,))
    eng = _engine(model, rows=4, kv_quant=8, draft_params=dparams,
                  draft_cfg=dcfg, gamma=2, mesh=_mesh(4))
    assert _run(eng, reqs, feats_at=(1,)) == ref


def test_spec_pool_dp_mesh_prefix_lossless(model, draft):
    """Full composition: mesh x speculative x prefix caching."""
    dparams, dcfg = draft
    rng = np.random.default_rng(13)
    pfx = rng.integers(3, CFG.llama.vocab_size, (6,)).astype(np.int32)
    sfx = [rng.integers(3, CFG.llama.vocab_size, (n,)).astype(np.int32)
           for n in (4, 7, 5)]

    plain = _engine(model)
    rref = [plain.submit(np.concatenate([pfx, s]), max_new_tokens=6)
            for s in sfx]
    oref = plain.run(max_chunks=256)

    eng = _engine(model, rows=4, draft_params=dparams, draft_cfg=dcfg,
                  gamma=2, mesh=_mesh(2))
    h = eng.register_prefix(pfx)
    rids = [eng.submit(s, max_new_tokens=6, prefix=h) for s in sfx]
    out = eng.run(max_chunks=256)
    for a, b in zip(rref, rids):
        assert oref[a] == out[b]
