"""Chunked prefill in the serving engine (prefill_chunk_tokens): prompt
processing is split into fixed-size block-appends — at most one piece
between decode chunks — bounding the decode stall any admission causes.
Results must be token-exact vs whole-prompt admission for every request
(the pieces recompute exactly the K/V the one-shot prefill writes).
The reference has no serving layer (SURVEY §1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


@pytest.mark.parametrize("piece", [3, 5, 16])
def test_chunked_matches_whole_prompt(model, piece):
    prompts = _prompts(0, (4, 13, 7, 11))
    ref = _engine(model)
    rr = [ref.submit(p, max_new_tokens=6) for p in prompts]
    oref = ref.run()

    eng = _engine(model, prefill_chunk_tokens=piece)
    rq = [eng.submit(p, max_new_tokens=6) for p in prompts]
    out = eng.run(max_chunks=512)
    for a, b in zip(rr, rq):
        assert oref[a] == out[b]
    assert not eng._staging_rows


def test_chunked_audio_admission(model):
    """The audio encode runs once up front; the combined embeds stream
    through pieces — exact vs the one-shot audio admission."""
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(CFG.mel.max_samples).astype(np.float32) * 0.1
    (p,) = _prompts(2, (5,))

    ref = _engine(model)
    r0 = ref.submit(p, audio_features=wav, max_new_tokens=5)
    oref = ref.run()

    eng = _engine(model, prefill_chunk_tokens=7)
    q0 = eng.submit(p, audio_features=wav, max_new_tokens=5)
    out = eng.run(max_chunks=512)
    assert oref[r0] == out[q0]


def test_one_piece_per_round(model):
    """The stall bound: each scheduling round advances staging by at most
    ONE piece, round-robin across staged rows."""
    prompts = _prompts(3, (13, 11))
    eng = _engine(model, prefill_chunk_tokens=4)
    for p in prompts:
        eng.submit(p, max_new_tokens=3)

    eng.step_chunk()  # admits both into staging, advances one piece
    assert len(eng._staging_rows) == 2
    writes = [eng._staging_rows[r].written for r in sorted(eng._staging_rows)]
    assert sum(writes) == 4  # exactly one piece this round

    eng.step_chunk()  # round-robin: the OTHER row advances
    writes2 = [eng._staging_rows[r].written
               for r in sorted(eng._staging_rows)]
    assert sum(writes2) == 8 and writes2[0] == writes2[1] == 4

    out = eng.run(max_chunks=512)
    assert all(len(v) == 3 for v in out.values())


def test_decode_proceeds_while_staging(model):
    """A row decoding in the pool keeps emitting while another row's
    chunked prefill is in progress (the point of the feature)."""
    short, long_p = _prompts(4, (3, 15))
    eng = _engine(model, prefill_chunk_tokens=2, chunk_steps=2)
    r_short = eng.submit(short, max_new_tokens=8)
    eng.step_chunk()  # short admits whole? no: chunked too (2 pieces)
    r_long = eng.submit(long_p, max_new_tokens=4)

    progressed = False
    for _ in range(64):
        live_tokens = sum(
            len(r.emitted) for r in eng._rows if not r.free and not r.staging
        )
        if eng._staging_rows and live_tokens > 0:
            progressed = True
        if not eng._queue and all(r.free for r in eng._rows):
            break
        eng.step_chunk()
    out = dict(eng._results)
    assert progressed, "no decode progress observed during staging"
    assert len(out[r_short]) == 8 and len(out[r_long]) == 4

    # parity against the plain engine
    ref = _engine(model)
    rs = ref.submit(short, max_new_tokens=8)
    rl = ref.submit(long_p, max_new_tokens=4)
    oref = ref.run()
    assert oref[rs] == out[r_short] and oref[rl] == out[r_long]


def test_chunked_with_quantized_pool(model):
    prompts = _prompts(5, (6, 12))
    ref = _engine(model, kv_quant=8)
    rr = [ref.submit(p, max_new_tokens=5) for p in prompts]
    oref = ref.run()
    eng = _engine(model, kv_quant=8, prefill_chunk_tokens=5)
    rq = [eng.submit(p, max_new_tokens=5) for p in prompts]
    out = eng.run(max_chunks=512)
    for a, b in zip(rr, rq):
        assert oref[a] == out[b]


def test_chunked_with_prefix_cache(model):
    """Prefix-cached suffixes STAGE like any admission in a chunked
    engine (pieces block-append at base=prefix_len into a slab
    pre-loaded with the registered prefix KV); plain requests stage at
    base=0 — both in one pool, both exact."""
    pfx, sfx, plain = _prompts(6, (6, 9, 13))
    ref = _engine(model)
    r1 = ref.submit(np.concatenate([pfx, sfx]), max_new_tokens=5)
    r2 = ref.submit(plain, max_new_tokens=5)
    oref = ref.run()

    eng = _engine(model, prefill_chunk_tokens=4)
    h = eng.register_prefix(pfx)
    q1 = eng.submit(sfx, max_new_tokens=5, prefix=h)
    q2 = eng.submit(plain, max_new_tokens=5)
    eng.step_chunk()  # admissions reserve rows and stage
    bases = sorted(st.base for st in eng._staging_rows.values())
    assert bases and bases[-1] == len(pfx)  # suffix staged at prefix_len
    out = eng.run(max_chunks=512)
    assert oref[r1] == out[q1] and oref[r2] == out[q2]


@pytest.mark.parametrize("piece", [2, 5])
def test_chunked_prefix_suffix_piece_sizes(model, piece):
    """Staged prefix suffixes are exact across piece sizes, including a
    suffix longer than one piece and one shorter (padding-only tail)."""
    pfx, s1, s2 = _prompts(12, (7, 9, 3))
    ref = _engine(model)
    r1 = ref.submit(np.concatenate([pfx, s1]), max_new_tokens=6)
    r2 = ref.submit(np.concatenate([pfx, s2]), max_new_tokens=6)
    oref = ref.run()

    eng = _engine(model, prefill_chunk_tokens=piece)
    h = eng.register_prefix(pfx)
    q1 = eng.submit(s1, max_new_tokens=6, prefix=h)
    q2 = eng.submit(s2, max_new_tokens=6, prefix=h)
    out = eng.run(max_chunks=512)
    assert oref[r1] == out[q1] and oref[r2] == out[q2]


def test_chunked_prefix_quantized_pool(model):
    """Chunked prefix suffixes over an int8-KV pool: the staging slab
    carries the prefix's quantized rows + scales; exact vs the one-shot
    prefix path on the SAME quantized engine (quantization error must
    match, not just be small)."""
    pfx, sfx = _prompts(13, (6, 5))
    ref = _engine(model, kv_quant=8)
    h0 = ref.register_prefix(pfx)
    r1 = ref.submit(sfx, max_new_tokens=5, prefix=h0)
    oref = ref.run()

    eng = _engine(model, kv_quant=8, prefill_chunk_tokens=3)
    h = eng.register_prefix(pfx)
    q1 = eng.submit(sfx, max_new_tokens=5, prefix=h)
    out = eng.run(max_chunks=512)
    assert oref[r1] == out[q1]


def test_chunked_prefix_with_speculative_pool(model):
    """The full chunked x prefix x speculative composition: the target
    suffix stages in pieces, the draft suffix block-appends one-shot
    into the draft's registered prefix slab at the final piece."""
    frozen, trainable = model
    pfx, s1, s2 = _prompts(14, (6, 7, 4))
    ref = _engine(model)
    r1 = ref.submit(np.concatenate([pfx, s1]), max_new_tokens=6)
    r2 = ref.submit(np.concatenate([pfx, s2]), max_new_tokens=6)
    oref = ref.run()

    eng = _engine(model, prefill_chunk_tokens=3,
                  draft_params=frozen["llama"], draft_cfg=CFG.llama,
                  gamma=2)
    h = eng.register_prefix(pfx)
    q1 = eng.submit(s1, max_new_tokens=6, prefix=h)
    q2 = eng.submit(s2, max_new_tokens=6, prefix=h)
    out = eng.run(max_chunks=512)
    assert oref[r1] == out[q1] and oref[r2] == out[q2]


def test_chunked_audio_prefix_suffix(model):
    """The headline 'chat with your audio' case under chunked prefill:
    an AUDIO prefix (whisper block + instruction) registered once, text
    suffixes staged in pieces at base = audio block + text length."""
    rng = np.random.default_rng(16)
    wav = rng.standard_normal(CFG.mel.max_samples).astype(np.float32) * 0.1
    pfx, *sfx = _prompts(17, (5, 9, 4))

    ref = _engine(model)
    rref = [
        ref.submit(np.concatenate([pfx, s]), audio_features=wav,
                   max_new_tokens=5)
        for s in sfx
    ]
    oref = ref.run()

    eng = _engine(model, prefill_chunk_tokens=3)
    h = eng.register_prefix(pfx, audio_features=wav)
    base = eng._prefixes[h].length
    assert base > len(pfx)  # the audio block is part of the prefix
    rids = [eng.submit(s, max_new_tokens=5, prefix=h) for s in sfx]
    out = eng.run(max_chunks=512)
    for a, b in zip(rref, rids):
        assert oref[a] == out[b]


def test_chunked_prefix_eviction_mid_stage(model):
    """unregister_prefix while a suffix is mid-stage must not corrupt
    the staged admission: the staging captured the prefix slabs at
    admission time."""
    pfx, sfx = _prompts(15, (6, 9))
    ref = _engine(model)
    r1 = ref.submit(np.concatenate([pfx, sfx]), max_new_tokens=5)
    oref = ref.run()

    eng = _engine(model, prefill_chunk_tokens=3)
    h = eng.register_prefix(pfx)
    q1 = eng.submit(sfx, max_new_tokens=5, prefix=h)
    eng.step_chunk()  # stages the first piece
    assert eng._staging_rows
    eng.unregister_prefix(h)
    out = eng.run(max_chunks=512)
    assert oref[r1] == out[q1]


def test_chunked_guards(model):
    with pytest.raises(ValueError, match=">= 1"):
        _engine(model, prefill_chunk_tokens=0)


def test_chunked_with_speculative_pool(model):
    """Spec pools compose with chunked prefill: the target stages in
    pieces, the small draft prefills one-shot at the final piece —
    greedy output stays exact vs the plain pool."""
    frozen, trainable = model
    prompts = _prompts(8, (13, 7, 11))
    ref = _engine(model)
    rr = [ref.submit(p, max_new_tokens=5) for p in prompts]
    oref = ref.run()

    eng = _engine(model, prefill_chunk_tokens=4,
                  draft_params=frozen["llama"], draft_cfg=CFG.llama,
                  gamma=2)
    rq = [eng.submit(p, max_new_tokens=5) for p in prompts]
    out = eng.run(max_chunks=512)
    for a, b in zip(rr, rq):
        assert oref[a] == out[b]


def test_chunked_reset_clears_staging(model):
    (p,) = _prompts(7, (13,))
    eng = _engine(model, prefill_chunk_tokens=4)
    eng.submit(p, max_new_tokens=3)
    eng.step_chunk()
    assert eng._staging_rows
    eng.reset()
    assert not eng._staging_rows
    rid = eng.submit(p, max_new_tokens=3)
    out = eng.run(max_chunks=512)
    assert len(out[rid]) == 3
