"""Virtual-mesh dp weak-scaling sanity (VERDICT round-1 item 8).

Runs the sharded train step on the 8-virtual-CPU mesh at global batch 8·b
vs a single-device run at batch b and reports the weak-scaling efficiency.
CPU devices share host FLOPs, so absolute numbers mean nothing — the
tracked signal is that the GSPMD program's per-device work stays constant
(efficiency near 1.0) and doesn't regress round over round.

    python experiments/virtual_mesh_tput.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from audio_llama_tpu import parallel
from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.data.tokenizer import ByteTokenizer
from audio_llama_tpu.models import allm


def steps_per_sec(n_dev: int, per_dev_batch: int = 2, n_steps: int = 8) -> float:
    cfg = AudioLLMConfig.tiny()
    tk = ByteTokenizer()
    cfg = cfg.replace(llama=cfg.llama.replace(vocab_size=max(tk.vocab_size, 384)))
    sid = tk.token_to_id(cfg.audio_start_token)
    eid = tk.token_to_id(cfg.audio_end_token)
    B, T = per_dev_batch * n_dev, 32
    rng = np.random.RandomState(0)
    batch = allm.AudioLLMBatch(
        input_ids=rng.randint(3, 250, (B, T)).astype(np.int32),
        attention_mask=np.ones((B, T), np.int32),
        audio_features=(rng.randn(B, cfg.mel.max_samples) * 0.1).astype(np.float32),
        labels=rng.randint(3, 250, (B, T)).astype(np.int32),
    )
    mesh = parallel.make_mesh(
        parallel.MeshConfig(dp=n_dev, fsdp=1, tp=1), devices=jax.devices()[:n_dev]
    )
    frozen = parallel.sharding.shard_frozen(
        mesh, allm.init_frozen(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    )
    optimizer = optax.adamw(1e-4)
    state = parallel.init_sharded_state(
        mesh, allm.init_trainable(cfg, jax.random.PRNGKey(1)), optimizer
    )
    step = parallel.make_sharded_train_step(
        cfg, optimizer, mesh, batch, sid, eid, compute_dtype=jnp.float32,
        accum_steps=1,
    )
    dev_batch = jax.device_put(
        batch, parallel.sharding.batch_shardings(mesh, batch, accum=False)
    )
    state, m = step(state, frozen, dev_batch)  # compile
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, frozen, dev_batch)
    float(m["loss"])
    return n_steps / (time.perf_counter() - t0)


def main():
    s1 = steps_per_sec(1)
    s8 = steps_per_sec(8)
    # weak scaling: same per-device work, so ideal is s8 == s1 (virtual CPU
    # devices share host cores, so this is an upper-bound sanity signal)
    print(json.dumps({
        "metric": "virtual_mesh_dp8_weak_scaling",
        "steps_per_sec_1dev": round(s1, 3),
        "steps_per_sec_8dev_dp8": round(s8, 3),
        "efficiency": round(s8 / s1, 3),
    }))


if __name__ == "__main__":
    main()
