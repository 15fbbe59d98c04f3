"""Row-chunked pool prefill (bench.py --prefill_rows): prefilling a B-row
KV cache in row-chunks must be bit-identical to the one-shot [B, P]
prefill, for every cache mode (bf16, int8, int4-combined). This is what
lets decode pools whose one-shot prefill exceeds HBM (B128 at flagship
dims) still be built — each (batch, head) timeline is independent, so
per-row-chunk prefill is exact by construction (reference has no KV cache
at all; HF generate owns it, reference src/models/allm.py:326-331).

The parity test exercises the REAL bench program (bench.make_prefill_fns:
jitted fori_loop with a traced chunk index and loop-carry cache aliasing),
not a Python re-implementation of the chunking.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import bench  # noqa: E402

from audio_llama_tpu.config import LlamaConfig  # noqa: E402
from audio_llama_tpu.models import llama as lm  # noqa: E402

CFG = LlamaConfig.tiny(vocab_size=512)
B, P, R = 8, 48, 4
MAX_LEN = P + 16


@pytest.fixture(scope="module")
def setup():
    import jax

    params = lm.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 3,
                             CFG.vocab_size - 8)
    return params, ids


@pytest.mark.parametrize("kvq", [False, True, 4])
def test_chunked_prefill_matches_one_shot(setup, kvq):
    params, ids = setup
    one_shot, chunked = bench.make_prefill_fns(
        CFG, B, MAX_LEN, kvq, jnp.bfloat16, prefill_rows=R
    )
    ref_tok, ref_cache = one_shot(params, ids)
    tok, cache = chunked(params, ids)

    np.testing.assert_array_equal(np.asarray(ref_tok), np.asarray(tok))
    np.testing.assert_array_equal(np.asarray(ref_cache.k), np.asarray(cache.k))
    if ref_cache.v is not None:
        np.testing.assert_array_equal(np.asarray(ref_cache.v),
                                      np.asarray(cache.v))
    if ref_cache.k_scale is not None:
        np.testing.assert_array_equal(np.asarray(ref_cache.k_scale),
                                      np.asarray(cache.k_scale))
        np.testing.assert_array_equal(np.asarray(ref_cache.v_scale),
                                      np.asarray(cache.v_scale))
    assert int(ref_cache.length) == int(cache.length) == P


def test_bench_cli_chunked_prefill_smoke():
    """The bench surface itself: --prefill_rows runs end-to-end on CPU."""
    import json
    import subprocess

    out = subprocess.run(
        [sys.executable, "bench.py", "--mode", "decode", "--tiny",
         "--backend", "cpu", "--batch", "4", "--prefill_rows", "2",
         "--iters", "4"],
        capture_output=True, text=True, timeout=600, cwd=REPO_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "decode_tokens_per_sec" and rec["value"] > 0
