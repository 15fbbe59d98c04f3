"""Row-sharded (multi-chip) continuous-batching pool: ServingEngine with
mesh= shards pool rows over a 'dp' axis via shard_map (weights replicated,
per-device local shapes — the make_dp_generate pattern). Greedy results
must be token-exact vs the unsharded engine, including the quantized pool
running the mono decode kernel INSIDE shard_map (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm
from audio_llama_tpu.inference.serving import ServingEngine

CFG = AudioLLMConfig.tiny()
AUDIO_START, AUDIO_END = 300, 301


@pytest.fixture(scope="module")
def model():
    frozen = allm.init_frozen(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    trainable = allm.init_trainable(CFG, jax.random.PRNGKey(1))
    return frozen, trainable


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.array(devs[:n]), ("dp",))


def _engine(model, **kw):
    frozen, trainable = model
    kw.setdefault("rows", 4)
    kw.setdefault("max_len", 64)
    kw.setdefault("prefill_buckets", (8, 16))
    kw.setdefault("chunk_steps", 4)
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("greedy", True)
    kw.setdefault("eos_id", -1)
    kw.setdefault("audio_start_id", AUDIO_START)
    kw.setdefault("audio_end_id", AUDIO_END)
    return ServingEngine(frozen, trainable, CFG, **kw)


def _workload(seed=0, n=6):
    rng = np.random.default_rng(seed)
    return [
        (
            rng.integers(3, CFG.llama.vocab_size, (int(p),)).astype(np.int32),
            int(b),
        )
        for p, b in zip(rng.integers(3, 14, n), rng.integers(2, 7, n))
    ]


def _run(eng, reqs, feats_at=()):
    rng = np.random.default_rng(7)
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


def test_dp_pool_matches_unsharded(model):
    reqs = _workload()
    ref = _run(_engine(model), reqs)
    got = _run(_engine(model, mesh=_mesh(2)), reqs)
    assert got == ref


def test_dp4_pool_more_rows_than_requests(model):
    reqs = _workload(seed=1, n=3)
    ref = _run(_engine(model, rows=8), reqs)
    got = _run(_engine(model, rows=8, mesh=_mesh(4)), reqs)
    assert got == ref


def test_dp_pool_audio_requests(model):
    reqs = _workload(seed=2, n=4)
    ref = _run(_engine(model), reqs, feats_at=(1, 3))
    got = _run(_engine(model, mesh=_mesh(2)), reqs, feats_at=(1, 3))
    assert got == ref


def test_dp_pool_quantized_kernel_path(model):
    """int8 pool + mono decode kernel (interpret) inside shard_map vs the
    unsharded XLA-path engine: the production multi-chip serving config."""
    from jax.experimental.pallas import tpu as pltpu

    reqs = _workload(seed=3, n=5)
    ref = _run(_engine(model, kv_quant=8, attn_impl="xla"), reqs)
    with pltpu.force_tpu_interpret_mode():
        got = _run(
            _engine(model, kv_quant=8, attn_impl="decode_mono",
                    mesh=_mesh(2), chunk_steps=2),
            reqs,
        )
    assert got == ref


def test_dp_pool_geometry_guards(model):
    with pytest.raises(ValueError, match="multiple"):
        _engine(model, rows=3, mesh=_mesh(2))
