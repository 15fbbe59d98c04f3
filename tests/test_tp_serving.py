"""Tensor-parallel continuous-batching pool: ServingEngine over a mesh
with a 'tp' axis shards the LLAMA WEIGHTS Megatron-style (column/row
specs, parallel/sharding.py) and the pool KV cache's HEAD axis, serving
models bigger than one chip's HBM. Rows can shard over 'dp' on top.
Greedy results must be token-exact vs the unsharded engine across the
whole serving matrix (audio, quantized caches, int8 weights, prefix
caching, chunked prefill, speculation). Reference has no serving layer
(SURVEY §1); the tp pattern is make_tp_generate's
(inference/generate.py:213-)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm, llama as llama_mod
from audio_llama_tpu.inference.serving import ServingEngine
from audio_llama_tpu.parallel import MeshConfig, make_mesh

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


def _mesh(dp, tp):
    need = dp * tp
    if len(jax.devices()) < need:
        pytest.skip(f"needs {need} virtual devices")
    return make_mesh(MeshConfig(dp=dp, fsdp=1, tp=tp),
                     devices=jax.devices()[:need])


def _engine(model, frozen=None, **kw):
    f, trainable = model
    kw.setdefault("rows", 2)
    kw.setdefault("max_len", 96)
    kw.setdefault("prefill_buckets", (8, 16))
    kw.setdefault("chunk_steps", 4)
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("greedy", True)
    kw.setdefault("eos_id", -1)
    kw.setdefault("audio_start_id", AUDIO_START)
    kw.setdefault("audio_end_id", AUDIO_END)
    return ServingEngine(frozen if frozen is not None else f,
                         trainable, CFG, **kw)


def _prompts(seed, sizes):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(3, CFG.llama.vocab_size, (n,)).astype(np.int32)
        for n in sizes
    ]


def _oracle(model, prompts, budget=5, feats_at=(), **kw):
    rng = np.random.default_rng(99)
    eng = _engine(model, **kw)
    rids = []
    for i, p in enumerate(prompts):
        feats = (
            rng.standard_normal(CFG.mel.max_samples).astype(np.float32)
            * 0.1 if i in feats_at else None
        )
        rids.append(eng.submit(p, audio_features=feats,
                               max_new_tokens=budget))
    out = eng.run(max_chunks=512)
    return [out[r] for r in rids]


def _run(eng, prompts, budget=5, feats_at=()):
    rng = np.random.default_rng(99)
    rids = []
    for i, p in enumerate(prompts):
        feats = (
            rng.standard_normal(CFG.mel.max_samples).astype(np.float32)
            * 0.1 if i in feats_at else None
        )
        rids.append(eng.submit(p, audio_features=feats,
                               max_new_tokens=budget))
    out = eng.run(max_chunks=512)
    return [out[r] for r in rids]


def test_tp2_matches_unsharded(model):
    prompts = _prompts(0, (4, 9, 6))
    ref = _oracle(model, prompts, feats_at=(1,))
    eng = _engine(model, mesh=_mesh(1, 2))
    assert _run(eng, prompts, feats_at=(1,)) == ref


def test_dp2_tp2_matches_unsharded(model):
    prompts = _prompts(1, (4, 9, 6, 11))
    ref = _oracle(model, prompts)
    eng = _engine(model, rows=4, mesh=_mesh(2, 2))
    assert _run(eng, prompts) == ref


@pytest.mark.parametrize("kv_quant", [8, 4])
def test_tp2_quantized_cache(model, kv_quant):
    prompts = _prompts(2, (5, 8))
    ref = _oracle(model, prompts, kv_quant=kv_quant)
    eng = _engine(model, kv_quant=kv_quant, mesh=_mesh(1, 2))
    assert _run(eng, prompts) == ref


def test_tp2_int8_weights(model):
    from audio_llama_tpu.models import llama_int8

    frozen, trainable = model
    q = dict(frozen)
    q["llama"] = jax.jit(llama_int8.quantize_llama)(frozen["llama"])
    prompts = _prompts(3, (5, 8))
    ref = _run(_engine(model, frozen=q), prompts)
    eng = _engine(model, frozen=q, mesh=_mesh(1, 2))
    assert _run(eng, prompts) == ref


def test_tp2_prefix_cache(model):
    pfx, *sfx = _prompts(4, (6, 4, 7))
    ref = _engine(model)
    rr = [ref.submit(np.concatenate([pfx, s]), max_new_tokens=5)
          for s in sfx]
    oref = ref.run()

    eng = _engine(model, mesh=_mesh(1, 2))
    h = eng.register_prefix(pfx)
    rq = [eng.submit(s, max_new_tokens=5, prefix=h) for s in sfx]
    out = eng.run()
    for a, b in zip(rr, rq):
        assert oref[a] == out[b]


def test_tp2_chunked_prefill(model):
    prompts = _prompts(5, (13, 7))
    ref = _oracle(model, prompts)
    eng = _engine(model, mesh=_mesh(1, 2), prefill_chunk_tokens=4)
    assert _run(eng, prompts) == ref


def test_tp2_chunked_prefix_cache(model):
    """Chunked prefix-cached suffixes under tp: the staging slab build
    and every piece append run inside shard_map with the pool's
    KV-head sharding specs."""
    pfx, *sfx = _prompts(7, (6, 9, 4))
    ref = _engine(model)
    rr = [ref.submit(np.concatenate([pfx, s]), max_new_tokens=5)
          for s in sfx]
    oref = ref.run()

    eng = _engine(model, mesh=_mesh(1, 2), prefill_chunk_tokens=3)
    h = eng.register_prefix(pfx)
    rq = [eng.submit(s, max_new_tokens=5, prefix=h) for s in sfx]
    out = eng.run(max_chunks=512)
    for a, b in zip(rr, rq):
        assert oref[a] == out[b]


def test_tp2_speculative_lossless(model):
    frozen, trainable = model
    dcfg = CFG.llama.replace(
        num_layers=1, hidden_size=64, intermediate_size=128,
        num_heads=2, num_kv_heads=1, head_dim=32,
    )
    dparams = llama_mod.init_params(dcfg, jax.random.PRNGKey(7),
                                    dtype=jnp.float32)
    prompts = _prompts(6, (5, 8))
    ref = _oracle(model, prompts)
    eng = _engine(model, mesh=_mesh(1, 2), draft_params=dparams,
                  draft_cfg=dcfg, gamma=2)
    assert _run(eng, prompts) == ref


def test_tp_guards(model):
    from audio_llama_tpu.inference.serving import _check_tp_int4_layout

    if len(jax.devices()) >= 8:  # tiny config has 2 kv heads
        with pytest.raises(ValueError, match="divide"):
            _engine(model, mesh=_mesh(1, 8))

    # canonical (tp=1) int4 packing pairs columns j and j+N/2 — a tp
    # shard would split the pairs, so the layout check must refuse it
    one = np.zeros((2, 8, 16), np.int8)
    with pytest.raises(ValueError, match="packed for tp=1"):
        _check_tp_int4_layout(
            {"llama": {"layers": {"q_proj": {"w_p": one, "w_s": one}}}}, 2
        )
    fused = {"llama": {"layers": {"qkv_proj": {"w_p": one}}}}
    with pytest.raises(ValueError, match="fused int4"):
        _check_tp_int4_layout(fused, 2)
    ok = np.zeros((2, 8, 2, 8), np.int8)  # pack-after-shard for tp=2
    _check_tp_int4_layout(
        {"llama": {"layers": {
            "q_proj": {"w_p": ok, "w_s": one},
            "down_proj": {"w_p": np.zeros((2, 8, 16), np.int8),
                          "w_s": np.zeros((2, 4, 16), np.float32)},
        }}}, 2
    )
