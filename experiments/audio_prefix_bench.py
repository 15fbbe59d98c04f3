"""Audio-prefix serving A/B on the real TPU (flagship dims).

The multi-turn "chat with your audio" case: one 30 s clip + a 64-token
instruction shared by N requests with short text suffixes. Arm A admits
full audio requests (whisper-large-v3-turbo encode + ~1.5k-slot audio
block llama prefill PER REQUEST); arm B registers the audio+instruction
prefix once and admits 128-bucket suffixes. This is the case where
prefix caching saves the most (the text-only A/B measured +23%;
BASELINE.md) — and doubles as the flagship-dims audio-serving
validation on a real chip.

int4 weights + int4 KV, rows 32, max_len 1760. The admission programs
here are the big compiles that have died mid-compile this session —
retry() + the persistent cache carry it.
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
from audio_llama_tpu.models import allm
from audio_llama_tpu.models import llama_int4 as l4
from audio_llama_tpu.inference.serving import ServingEngine
from prefix_cache_bench import retry

ROWS, BUCKETS, MAX_LEN, CHUNK = 32, (128,), 1760, 32
PTXT, N_REQ = 64, 48


def main():
    cfg = AudioLLMConfig()
    lcfg = cfg.llama
    print("init flagship frozen (llama int4 + whisper bf16)...", flush=True)
    frozen = allm.init_frozen(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    frozen["llama"] = jax.jit(l4.quantize_llama_int4)(frozen["llama"])
    trainable = allm.init_trainable(cfg, jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(cfg.mel.max_samples) * 0.1).astype(np.float32)
    pfx = rng.integers(3, lcfg.vocab_size - 8, (PTXT,)).astype(np.int32)
    sfx = [
        rng.integers(
            3, lcfg.vocab_size - 8, (int(rng.integers(20, 61)),)
        ).astype(np.int32)
        for _ in range(N_REQ)
    ]
    budgets = [int(rng.integers(32, 97)) for _ in range(N_REQ)]

    eng = ServingEngine(
        frozen, trainable, cfg, rows=ROWS, max_len=MAX_LEN,
        prefill_buckets=BUCKETS, chunk_steps=CHUNK, kv_quant=4,
        compute_dtype=jnp.bfloat16, greedy=True, eos_id=-1, pad_id=0,
        audio_start_id=lcfg.vocab_size - 2,
        audio_end_id=lcfg.vocab_size - 1,
    )

    def warm_full():
        eng.reset()
        eng.submit(np.concatenate([pfx, sfx[0]]), audio_features=wav,
                   max_new_tokens=2)
        eng.run()

    t0 = time.time()
    retry("full-audio warmup", warm_full, n=5)
    print(f"full-audio warmup {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    h = retry("register audio prefix",
              lambda: eng.register_prefix(pfx, audio_features=wav), n=5)
    print(f"register {time.time()-t0:.1f}s "
          f"(len={eng._prefixes[h].length}, cap={eng._prefixes[h].cap})",
          flush=True)

    def warm_sfx():
        eng.reset()
        eng.submit(sfx[0], max_new_tokens=2, prefix=h)
        eng.run()

    t0 = time.time()
    retry("suffix warmup", warm_sfx, n=5)
    print(f"suffix warmup {time.time()-t0:.1f}s", flush=True)

    res = {"metric": "audio_prefix_serve_ab", "n_req": N_REQ,
           "prefix_slots": eng._prefixes[h].length}
    for arm in ("full", "prefix"):
        eng.reset()
        t0 = time.time()
        for s, b in zip(sfx, budgets):
            if arm == "full":
                eng.submit(np.concatenate([pfx, s]), audio_features=wav,
                           max_new_tokens=b)
            else:
                eng.submit(s, max_new_tokens=b, prefix=h)
        out = eng.run()
        dt = time.time() - t0
        got = sum(len(v) for v in out.values())
        assert all(len(v) for v in out.values()), f"{arm}: rejections"
        res[arm] = {"wall_s": round(dt, 2),
                    "tokens_per_sec": round(got / dt, 1), "tokens": got}
        print(json.dumps(res[arm]), flush=True)
    res["speedup"] = round(res["full"]["wall_s"] / res["prefix"]["wall_s"], 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
