"""Row-chunked pool prefill (bench.py --prefill_rows): prefilling a B-row
KV cache in row-chunks via dynamic_update_slice on the batch axis must be
bit-identical to the one-shot [B, P] prefill, for every cache mode
(bf16/f32, int8, int4-combined). This is what lets decode pools whose
one-shot prefill exceeds HBM (B128 at flagship dims) still be built —
each (batch, head) timeline is independent, so per-row-chunk prefill is
exact by construction (reference has no KV cache at all; HF generate owns
it, reference src/models/allm.py:326-331)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import LlamaConfig
from audio_llama_tpu.models import llama as lm

CFG = LlamaConfig.tiny(vocab_size=512)
B, P, R = 8, 48, 4
MAX_LEN = P + 16


@pytest.fixture(scope="module")
def setup():
    params = lm.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 3,
                             CFG.vocab_size - 8)
    return params, ids


def _prefill(params, ids, kvq, batch):
    cache = lm.KVCache.zeros(CFG, batch, MAX_LEN, dtype=jnp.float32,
                             quantized=kvq)
    _, cache, hidden = lm.llama_forward(
        params, CFG, input_ids=ids, kv_cache=cache,
        compute_dtype=jnp.float32, assume_fresh_cache=True,
        return_hidden=True, unembed_logits=False,
    )
    return cache, hidden[:, -1]


@pytest.mark.parametrize("kvq", [False, True, 4])
def test_chunked_prefill_matches_one_shot(setup, kvq):
    params, ids = setup
    ref_cache, ref_h = _prefill(params, ids, kvq, B)

    big = lm.KVCache.zeros(CFG, B, MAX_LEN, dtype=jnp.float32,
                           quantized=kvq)
    hs = []
    for i in range(B // R):
        small, h = _prefill(params, ids[i * R:(i + 1) * R], kvq, R)
        hs.append(h)

        def put(bg, s):
            return jax.lax.dynamic_update_slice_in_dim(bg, s, i * R, axis=1)

        big = big._replace(
            k=put(big.k, small.k),
            v=None if big.v is None else put(big.v, small.v),
            k_scale=None if big.k_scale is None
            else put(big.k_scale, small.k_scale),
            v_scale=None if big.v_scale is None
            else put(big.v_scale, small.v_scale),
            length=small.length,
        )

    np.testing.assert_array_equal(np.asarray(ref_cache.k), np.asarray(big.k))
    if ref_cache.v is not None:
        np.testing.assert_array_equal(np.asarray(ref_cache.v),
                                      np.asarray(big.v))
    if ref_cache.k_scale is not None:
        np.testing.assert_array_equal(np.asarray(ref_cache.k_scale),
                                      np.asarray(big.k_scale))
        np.testing.assert_array_equal(np.asarray(ref_cache.v_scale),
                                      np.asarray(big.v_scale))
    assert int(ref_cache.length) == int(big.length) == P
    np.testing.assert_allclose(np.asarray(ref_h),
                               np.asarray(jnp.concatenate(hs, 0)),
                               rtol=2e-5, atol=2e-5)


def test_bench_cli_chunked_prefill_smoke():
    """The bench surface itself: --prefill_rows runs end-to-end on CPU."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "bench.py", "--mode", "decode", "--tiny",
         "--backend", "cpu", "--batch", "4", "--prefill_rows", "2",
         "--iters", "4"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "decode_tokens_per_sec" and rec["value"] > 0
