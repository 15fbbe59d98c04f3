"""Continuous-batching serving engine (inference/serving.py): greedy parity
vs the one-shot generate program, scheduling invariance, quantized pools on
the per-row kernel path, audio requests, rejection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm, llama as llama_mod
from audio_llama_tpu.inference import generate as gen_mod
from audio_llama_tpu.inference.serving import ServingEngine

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


def _reference_tokens(model, ids, max_new, kv_quant=False):
    """Per-request greedy oracle via the one-shot generate program."""
    cfg, frozen, trainable = model
    ids = np.asarray(ids, np.int32)[None]
    res = gen_mod.generate(
        frozen, trainable, cfg, jnp.asarray(ids), jnp.ones_like(ids),
        None, jax.random.PRNGKey(0), max_new_tokens=max_new, greedy=True,
        eos_id=-1, pad_id=0, has_audio=False, compute_dtype=jnp.float32,
        audio_start_id=AUDIO_START, audio_end_id=AUDIO_END,
        kv_quant=kv_quant,
    )
    return list(np.asarray(res.tokens[0], np.int32))


def _engine(model, **kw):
    cfg, frozen, trainable = model
    kw.setdefault("rows", 2)
    kw.setdefault("max_len", 64)
    kw.setdefault("prefill_buckets", (8, 16))
    kw.setdefault("chunk_steps", 4)
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("greedy", True)
    kw.setdefault("eos_id", -1)
    kw.setdefault("audio_start_id", AUDIO_START)
    kw.setdefault("audio_end_id", AUDIO_END)
    return ServingEngine(frozen, trainable, cfg, **kw)


def test_greedy_matches_generate(model):
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(3, CFG.llama.vocab_size, (n,)).astype(np.int32)
        for n in (4, 7, 5, 11, 3)
    ]
    eng = _engine(model)
    rids = [eng.submit(p, max_new_tokens=6) for p in prompts]
    out = eng.run()
    for p, rid in zip(prompts, rids):
        ref = _reference_tokens(model, p, 6)
        assert out[rid] == ref, f"rid {rid}: {out[rid]} vs {ref}"


def test_scheduling_invariance(model):
    """Same requests through different pool/chunk geometries produce the
    same tokens (continuous batching must not change results)."""
    rng = np.random.default_rng(1)
    prompts = [
        rng.integers(3, CFG.llama.vocab_size, (n,)).astype(np.int32)
        for n in (5, 9, 4, 6)
    ]
    outs = []
    for rows, chunk in ((1, 3), (2, 4), (4, 8)):
        eng = _engine(model, rows=rows, chunk_steps=chunk)
        rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
        res = eng.run()
        outs.append([res[r] for r in rids])
    assert outs[0] == outs[1] == outs[2]


@pytest.mark.parametrize("kvq", [8, 4])
def test_quantized_pool_matches_generate(model, kvq):
    rng = np.random.default_rng(2)
    prompts = [
        rng.integers(3, CFG.llama.vocab_size, (n,)).astype(np.int32)
        for n in (4, 8, 6)
    ]
    eng = _engine(model, kv_quant=kvq)
    rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
    out = eng.run()
    for p, rid in zip(prompts, rids):
        ref = _reference_tokens(model, p, 5, kv_quant=kvq)
        assert out[rid] == ref


def test_kernel_path_matches_xla(model):
    """Quantized pool + attn_impl='decode_mono' (interpret): the per-row
    mono kernel inside the chunked decode matches the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    prompts = [
        rng.integers(3, CFG.llama.vocab_size, (n,)).astype(np.int32)
        for n in (4, 7, 5)
    ]
    ref_eng = _engine(model, kv_quant=8, attn_impl="xla", rows=2)
    rids = [ref_eng.submit(p, max_new_tokens=4) for p in prompts]
    ref = ref_eng.run()

    with pltpu.force_tpu_interpret_mode():
        k_eng = _engine(model, kv_quant=8, attn_impl="decode_mono", rows=2,
                        chunk_steps=2)
        k_rids = [k_eng.submit(p, max_new_tokens=4) for p in prompts]
        out = k_eng.run()
    for a, b in zip(rids, k_rids):
        assert ref[a] == out[b]


def test_audio_block_len_cached_per_shape(model):
    """Regression (review r3): chunked long audio has N-dependent block
    lengths — a single cached value would under-reserve longer requests."""
    cfg, frozen, trainable = model
    eng = _engine(model)
    # long audio arrives as whole-window waveforms [N*S] (server contract)
    S = cfg.mel.max_samples
    one = eng._resolve_audio_len((S,))
    two = eng._resolve_audio_len((2 * S,))
    assert two > one
    assert len(eng._audio_block_lens) == 2
    # combined length uses the per-request value
    assert eng._combined_len(5, two) == 5 + two


def test_audio_request_matches_generate(model):
    cfg, frozen, trainable = model
    rng = np.random.default_rng(4)
    ids = rng.integers(3, cfg.llama.vocab_size, (5,)).astype(np.int32)
    feats = rng.standard_normal(
        (cfg.whisper.num_mel_bins, 2 * cfg.whisper.max_source_positions)
    ).astype(np.float32)

    res = gen_mod.generate(
        frozen, trainable, cfg, jnp.asarray(ids[None]),
        jnp.ones((1, len(ids)), jnp.int32), jnp.asarray(feats[None]),
        jax.random.PRNGKey(0), max_new_tokens=4, greedy=True,
        eos_id=-1, pad_id=0, has_audio=True, compute_dtype=jnp.float32,
        audio_start_id=AUDIO_START, audio_end_id=AUDIO_END,
    )
    ref = list(np.asarray(res.tokens[0], np.int32))

    eng = _engine(model, max_len=128)
    rid = eng.submit(ids, audio_features=feats, max_new_tokens=4)
    out = eng.run()
    assert out[rid] == ref


def test_eos_stops_row_early(model):
    rng = np.random.default_rng(5)
    p = rng.integers(3, CFG.llama.vocab_size, (6,)).astype(np.int32)
    ref = _reference_tokens(model, p, 6)
    eos = ref[2]  # third generated token becomes EOS
    eng = _engine(model, eos_id=eos)
    rid = eng.submit(p, max_new_tokens=6)
    out = eng.run()
    assert out[rid] == ref[:3]
    assert out[rid][-1] == eos


def test_reject_oversized_prompt(model):
    eng = _engine(model)  # buckets up to 16, max_len 64
    rng = np.random.default_rng(6)
    big = rng.integers(3, CFG.llama.vocab_size, (20,)).astype(np.int32)
    ok = rng.integers(3, CFG.llama.vocab_size, (4,)).astype(np.int32)
    r_big = eng.submit(big, max_new_tokens=4)
    r_ok = eng.submit(ok, max_new_tokens=4)
    out = eng.run()
    assert out[r_big] == []
    assert out[r_ok] == _reference_tokens(model, ok, 4)


def test_row_reuse_more_requests_than_rows(model):
    """Rows retire and re-admit from the queue; results are independent of
    pool contention."""
    rng = np.random.default_rng(7)
    prompts = [
        rng.integers(3, CFG.llama.vocab_size, (n,)).astype(np.int32)
        for n in (4, 5, 6, 7, 8, 4, 5)
    ]
    eng = _engine(model, rows=2, chunk_steps=3)
    rids = [eng.submit(p, max_new_tokens=3) for p in prompts]
    out = eng.run()
    for p, rid in zip(prompts, rids):
        assert out[rid] == _reference_tokens(model, p, 3)
