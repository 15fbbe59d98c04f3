"""Round-3 TPU batch 5: PROFILE the flagship train step at B2 vs B8
(VERDICT #2 — attribute the batch-scaling MFU regression with a trace, not
a theory). Batch 3 proved device xplane/trace capture works through the
axon tunnel; this traces 2 warm steps per batch size into
experiments/traces/trainB{2,8} for offline analysis
(experiments/analyze_trace.py).

    nohup python -u experiments/round3_tpu_batch5.py > /tmp/r3b5.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def trace_train(B):
    import optax

    from audio_llama_tpu.config import AudioLLMConfig
    from audio_llama_tpu.models import allm
    from audio_llama_tpu.training import train_step as steps_mod

    cfg = AudioLLMConfig()
    T = 512
    vocab = cfg.llama.vocab_size
    sid, eid = vocab - 2, vocab - 1
    kf, kt, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    frozen = jax.jit(lambda k: allm.init_frozen(cfg, k, dtype=jnp.bfloat16))(kf)
    trainable = jax.jit(lambda k: allm.init_trainable(cfg, k))(kt)
    batch = allm.AudioLLMBatch(
        input_ids=jax.random.randint(kb, (B, T), 3, vocab - 8),
        attention_mask=jnp.ones((B, T), jnp.int32),
        audio_features=jax.random.normal(kb, (B, cfg.mel.max_samples)) * 0.1,
        labels=jax.random.randint(kb, (B, T), 3, vocab - 8),
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(2.0), optax.adamw(2e-5, weight_decay=0.01)
    )
    state = steps_mod.init_train_state(trainable, optimizer)
    # donate the state: B8 at flagship dims + profiler buffers OOM'd HBM
    # with two live TrainStates (r3b5.log, first attempt)
    step = jax.jit(steps_mod.make_train_step(
        cfg, optimizer, sid, eid, compute_dtype=jnp.bfloat16,
        loss_chunk_size=512, remat=True,
    ), donate_argnums=(0,))

    # warm/compile, then synchronize via a scalar fetch
    state, m = step(state, frozen, batch)
    print(json.dumps({"exp": f"trace_train_B{B}_warm",
                      "loss": float(m["loss"])}), flush=True)

    d = f"/root/repo/experiments/traces/trainB{B}"
    os.makedirs(d, exist_ok=True)
    jax.profiler.start_trace(d)
    s, m1 = step(state, frozen, batch)
    s, m2 = step(s, frozen, batch)
    # scalar fetches force the dispatched work to complete inside the trace
    l1, l2 = float(m1["loss"]), float(m2["loss"])
    jax.profiler.stop_trace()
    print(json.dumps({"exp": f"trace_train_B{B}", "losses": [l1, l2],
                      "dir": d}), flush=True)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    import sys as _sys

    for b in [int(a) for a in (_sys.argv[1:] or ["2", "8"])]:
        trace_train(b)
    print(json.dumps({"done": True}), flush=True)
