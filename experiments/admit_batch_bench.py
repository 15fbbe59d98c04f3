"""Batched-admission serving A/B on the real TPU.

Same geometry as experiments/prefix_cache_bench.py (rows 32, buckets
(128, 512), max_len 768, int4 w + int4 KV) so everything except the
B=4 prefill program comes from the persistent compile cache. Workload:
64 full prompts (440-500 tokens -> bucket 512) submitted at once — the
burst-arrival case admit_batch targets.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import llama as lm
from audio_llama_tpu.models import llama_int4 as l4
from audio_llama_tpu.inference.serving import ServingEngine
from prefix_cache_bench import retry  # same transport-drop mitigation

ROWS, BUCKETS, MAX_LEN, CHUNK = 32, (128, 512), 768, 32
P_LEN, N_REQ = 400, 64


def main():
    cfg = AudioLLMConfig()
    lcfg = cfg.llama
    print("init int4 params...", flush=True)
    params = jax.jit(
        lambda k: l4.quantize_llama_int4(
            lm.init_params(lcfg, k, dtype=jnp.bfloat16)
        )
    )(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    pfx = rng.integers(3, lcfg.vocab_size - 8, (P_LEN,)).astype(np.int32)
    reqs = [
        (
            np.concatenate([
                pfx,
                rng.integers(
                    3, lcfg.vocab_size - 8, (int(rng.integers(40, 101)),)
                ).astype(np.int32),
            ]),
            int(rng.integers(32, 129)),
        )
        for _ in range(N_REQ)
    ]

    def make(ab):
        return ServingEngine(
            {"llama": params}, None, cfg, rows=ROWS, max_len=MAX_LEN,
            prefill_buckets=BUCKETS, chunk_steps=CHUNK, kv_quant=4,
            compute_dtype=jnp.bfloat16, greedy=True, eos_id=-1, pad_id=0,
            admit_batch=ab,
        )

    res = {"metric": "admit_batch_serve_ab", "n_req": N_REQ}
    for ab in (1, 4):
        eng = make(ab)

        def warm():
            eng.reset()
            for ids, _ in reqs[:ab]:
                eng.submit(ids, max_new_tokens=2)
            eng.run()

        t0 = time.time()
        retry(f"warmup ab={ab}", warm)
        print(f"warmup ab={ab}: {time.time()-t0:.1f}s", flush=True)
        for run_i in (1, 2):  # pass 2 is fully warm incl. mid-run group
            eng.reset()       # sizes pass 1 compiled
            eng.admit_sizes = []
            t0 = time.time()
            for ids, budget in reqs:
                eng.submit(ids, max_new_tokens=budget)
            out = eng.run()
            dt = time.time() - t0
            got = sum(len(v) for v in out.values())
            assert all(len(v) for v in out.values())
            from collections import Counter

            res[f"ab{ab}_r{run_i}"] = {
                "wall_s": round(dt, 2),
                "tokens_per_sec": round(got / dt, 1),
                "tokens": got,
                "admit_sizes": dict(Counter(eng.admit_sizes)),
            }
            print(json.dumps(res[f"ab{ab}_r{run_i}"]), flush=True)
    res["speedup_warm"] = round(
        res["ab1_r2"]["wall_s"] / res["ab4_r2"]["wall_s"], 3
    )
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
