"""Continuous batching vs static batching at flagship serving dims.

Workload: N requests with mixed prompt lengths (two prefill buckets) and
mixed generation budgets. Static batching (the one-shot generate program,
groups of `rows`) decodes every group for max(budget in group) steps —
short requests ride dead slots. The serving engine retires rows at budget
and admits queued requests into them mid-stream.

Both phases run int4 weights + int4 KV (the decode-headline config) and
greedy sampling; useful tokens == sum of budgets in both (no EOS with
random weights), so tokens/sec compares the same delivered work.

    nohup python -u experiments/serving_bench.py > /tmp/serving_bench.log 2>&1 &
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax'),
)
import numpy as np

ROWS = 32
BUCKETS = (256, 1024)
CHUNK = 32
N_REQ = 64


def make_workload(vocab, n=N_REQ, seed=0):
    rng = np.random.default_rng(seed)
    reqs = []
    for i in range(n):
        if i % 2 == 0:
            plen = int(rng.integers(180, 256))
        else:
            plen = int(rng.integers(700, 1024))
        budget = int(rng.integers(32, 257))
        ids = rng.integers(3, vocab - 8, (plen,)).astype(np.int32)
        reqs.append((ids, budget))
    return reqs


def main():
    from audio_llama_tpu.config import AudioLLMConfig
    from audio_llama_tpu.models import llama as lm
    from audio_llama_tpu.models import llama_int4 as l4
    from audio_llama_tpu.inference.serving import ServingEngine
    from audio_llama_tpu.inference import generate as gen_mod

    cfg = AudioLLMConfig()
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    t0 = time.time()
    params = jax.jit(
        lambda k: l4.quantize_llama_int4(
            lm.init_params(cfg.llama, k, dtype=jnp.bfloat16)
        )
    )(jax.random.PRNGKey(0))
    jax.device_get(params["final_ln"][:1])  # sync the quantize program
    print(json.dumps({"phase": "quantize_s", "s": round(time.time() - t0, 1)}),
          flush=True)
    frozen = {"llama": params}
    reqs = make_workload(cfg.llama.vocab_size)
    useful = sum(b for _, b in reqs)

    # ---------------- continuous batching (serving engine) ----------------
    eng = ServingEngine(
        frozen, None, cfg, rows=ROWS, max_len=BUCKETS[-1] + 256 + 32,
        prefill_buckets=BUCKETS, chunk_steps=CHUNK, kv_quant=4,
        compute_dtype=jnp.bfloat16, greedy=True, eos_id=-1, pad_id=0,
    )
    # warm-up: compile each admit bucket + the chunk program, one phase at
    # a time (per-program timing; remote compiles take minutes each)
    def prog(n, live, queued):
        print(json.dumps({"chunk": n, "live": live, "queued": queued,
                          "t": round(time.time() - t0, 1)}), flush=True)

    for name, req in (("admit256+chunk", reqs[0]), ("admit1024", reqs[1])):
        t0 = time.time()
        eng.submit(req[0], max_new_tokens=4)
        eng.run(max_chunks=50, progress=prog)
        print(json.dumps(
            {"phase": f"warmup_{name}_s", "s": round(time.time() - t0, 1)}
        ), flush=True)
    eng.reset()

    t0 = time.time()
    for ids, budget in reqs:
        eng.submit(ids, max_new_tokens=budget)
    out = eng.run(max_chunks=500, progress=prog)
    dt = time.time() - t0
    got = sum(len(v) for v in out.values())
    print(json.dumps({
        "exp": "continuous_batching", "rows": ROWS, "chunk": CHUNK,
        "requests": N_REQ, "useful_tokens": useful, "emitted": got,
        "s": round(dt, 2), "tok_per_s": round(got / dt, 1),
    }), flush=True)
    del eng
    gc.collect()

    # ---------------- static batching (one-shot generate) ----------------
    P = BUCKETS[-1]
    MAXNEW = 256  # static program decodes max budget for every group

    def run_group(group, max_new):
        ids = np.zeros((ROWS, P), np.int32)
        mask = np.zeros((ROWS, P), np.int32)
        for r, (p, _) in enumerate(group):
            ids[r, : len(p)] = p
            mask[r, : len(p)] = 1
        res = gen_mod.generate(
            frozen, None, cfg, jnp.asarray(ids), jnp.asarray(mask), None,
            jax.random.PRNGKey(0), max_new_tokens=max_new, greedy=True,
            eos_id=-1, pad_id=0, has_audio=False,
            compute_dtype=jnp.bfloat16, kv_quant=4,
        )
        np.asarray(res.tokens)  # sync

    # warm-up compile on the first group shape
    t0 = time.time()
    run_group(reqs[:ROWS], MAXNEW)
    print(json.dumps({"phase": "static_warmup_s", "s": round(time.time() - t0, 1)}),
          flush=True)

    t0 = time.time()
    for g0 in range(0, N_REQ, ROWS):
        run_group(reqs[g0 : g0 + ROWS], MAXNEW)
    dt = time.time() - t0
    print(json.dumps({
        "exp": "static_batching", "rows": ROWS, "groups": N_REQ // ROWS,
        "decode_steps_per_group": MAXNEW, "useful_tokens": useful,
        "s": round(dt, 2), "tok_per_s": round(useful / dt, 1),
    }), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
