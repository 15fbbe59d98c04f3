"""Per-program compile timing for the serving engine's admission programs
(the two serving-bench TPU attempts both died ~27 min into what should be
a minutes-long bucket-256 prefill compile). Enables the persistent
compilation cache so any successful compile survives tunnel drops."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import llama as lm
from audio_llama_tpu.models import llama_int4 as l4
from audio_llama_tpu.inference.serving import ServingEngine

def main():
    cfg = AudioLLMConfig()
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    t0 = time.time()
    params = jax.jit(lambda k: l4.quantize_llama_int4(
        lm.init_params(cfg.llama, k, dtype=jnp.bfloat16)))(jax.random.PRNGKey(0))
    jax.device_get(params["final_ln"][:1])
    print(json.dumps({"phase": "quantize_s", "s": round(time.time()-t0, 1)}), flush=True)
    eng = ServingEngine({"llama": params}, None, cfg, rows=32,
                        max_len=1024+256+32, prefill_buckets=(256, 1024),
                        chunk_steps=32, kv_quant=4,
                        compute_dtype=jnp.bfloat16, greedy=True, eos_id=-1)
    for bucket in (256, 1024):
        fn = eng._get_admit_fn(bucket, False)
        # drive prefill_fn alone via a closure peek: call admit parts thru
        # one submit+step to reuse the production path but time stages
        t0 = time.time()
        rid = eng.submit(np.arange(3, 3+bucket//2, dtype=np.int32), max_new_tokens=2)
        eng.step_chunk()
        print(json.dumps({"phase": f"admit{bucket}+firstchunk_s",
                          "s": round(time.time()-t0, 1)}), flush=True)
    t0 = time.time()
    eng.run(max_chunks=20)
    print(json.dumps({"phase": "drain_s", "s": round(time.time()-t0, 1)}), flush=True)
    print(json.dumps({"done": True}), flush=True)

if __name__ == "__main__":
    main()
