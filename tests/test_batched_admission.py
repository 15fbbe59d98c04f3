"""Batched admission (admit_batch=N): consecutive queued requests that
share a prefill geometry (bucket + audio-ness) admit through ONE B>=2
prefill program, then splice row by row. Greedy results must be
token-exact vs single-request admission for every composition (the
batched rows compute exactly the same prefill math)."""

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
    kw.setdefault("rows", 4)
    kw.setdefault("max_len", 96)
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


def test_batched_matches_single(model):
    """Mixed buckets and budgets: grouping respects the bucket boundary
    and results match the single-admission engine exactly."""
    prompts = _prompts(0, (4, 6, 5, 11, 13, 3))
    budgets = [5, 3, 6, 4, 5, 2]
    ref = _engine(model)
    rr = [ref.submit(p, max_new_tokens=b) for p, b in zip(prompts, budgets)]
    oref = ref.run()

    eng = _engine(model, admit_batch=4)
    rq = [eng.submit(p, max_new_tokens=b) for p, b in zip(prompts, budgets)]
    out = eng.run()
    for a, b in zip(rr, rq):
        assert oref[a] == out[b]
    # the bucket-8 head run (4, 6, 5) actually batched
    assert any(k[2] > 1 for k in eng._batch_prefill_fns)


def test_batched_audio(model):
    rng = np.random.default_rng(1)
    wavs = [rng.standard_normal(CFG.mel.max_samples).astype(np.float32) * 0.1
            for _ in range(3)]
    prompts = _prompts(2, (4, 5, 6))
    ref = _engine(model)
    rr = [ref.submit(p, audio_features=w, max_new_tokens=4)
          for p, w in zip(prompts, wavs)]
    oref = ref.run()
    eng = _engine(model, admit_batch=4)
    rq = [eng.submit(p, audio_features=w, max_new_tokens=4)
          for p, w in zip(prompts, wavs)]
    out = eng.run()
    for a, b in zip(rr, rq):
        assert oref[a] == out[b]


@pytest.mark.parametrize("kv_quant", [8, 4])
def test_batched_quantized(model, kv_quant):
    prompts = _prompts(3, (4, 6, 5))
    ref = _engine(model, kv_quant=kv_quant)
    rr = [ref.submit(p, max_new_tokens=4) for p in prompts]
    oref = ref.run()
    eng = _engine(model, kv_quant=kv_quant, admit_batch=4)
    rq = [eng.submit(p, max_new_tokens=4) for p in prompts]
    out = eng.run()
    for a, b in zip(rr, rq):
        assert oref[a] == out[b]


def test_batched_speculative(model):
    frozen, trainable = model
    prompts = _prompts(4, (4, 6, 5))
    ref = _engine(model)
    rr = [ref.submit(p, max_new_tokens=5) for p in prompts]
    oref = ref.run()
    eng = _engine(model, admit_batch=4, draft_params=frozen["llama"],
                  draft_cfg=CFG.llama, gamma=2)
    rq = [eng.submit(p, max_new_tokens=5) for p in prompts]
    out = eng.run()
    for a, b in zip(rr, rq):
        assert oref[a] == out[b]


def test_batched_dp_mesh(model):
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 virtual devices")
    mesh = Mesh(np.array(devs[:2]), ("dp",))
    prompts = _prompts(5, (4, 6, 5, 7))
    ref = _engine(model)
    rr = [ref.submit(p, max_new_tokens=4) for p in prompts]
    oref = ref.run()
    eng = _engine(model, admit_batch=4, mesh=mesh)
    rq = [eng.submit(p, max_new_tokens=4) for p in prompts]
    out = eng.run()
    for a, b in zip(rr, rq):
        assert oref[a] == out[b]


def test_batched_with_prefix_requests_interleaved(model):
    """Prefix-cached requests break a batch run (they admit one-shot via
    the suffix program) but everything still matches."""
    pfx, s1, p1, p2 = _prompts(6, (6, 4, 5, 4))
    ref = _engine(model)
    r1 = ref.submit(p1, max_new_tokens=4)
    r2 = ref.submit(np.concatenate([pfx, s1]), max_new_tokens=4)
    r3 = ref.submit(p2, max_new_tokens=4)
    oref = ref.run()

    eng = _engine(model, admit_batch=4)
    h = eng.register_prefix(pfx)
    q1 = eng.submit(p1, max_new_tokens=4)
    q2 = eng.submit(s1, max_new_tokens=4, prefix=h)
    q3 = eng.submit(p2, max_new_tokens=4)
    out = eng.run()
    assert oref[r1] == out[q1]
    assert oref[r2] == out[q2]
    assert oref[r3] == out[q3]


def test_admit_batch_guard(model):
    with pytest.raises(ValueError, match="admit_batch"):
        _engine(model, admit_batch=0)
