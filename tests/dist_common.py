"""Shared harness for the multi-host tests: a deterministic sharded train
step that can run single-process (the pytest process, reference) or inside
N jax.distributed processes (tests/dist_worker.py), producing comparable
losses. See parallel/distributed.py."""

import numpy as np


def run_steps(process_count: int = 1, n_steps: int = 3, n_mesh_devices: int = 4):
    """Build a toy AudioLLM + deterministic global batch, run n_steps of the
    sharded train step on a dp mesh over n_mesh_devices devices, return the
    per-step losses. In multi-process mode each process holds only its rows
    and the global batch is assembled via make_global_batch."""
    import jax
    import jax.numpy as jnp
    import optax

    from audio_llama_tpu import parallel
    from audio_llama_tpu.config import AudioLLMConfig
    from audio_llama_tpu.data.tokenizer import ByteTokenizer
    from audio_llama_tpu.models import allm

    cfg = AudioLLMConfig.tiny()
    tk = ByteTokenizer()
    cfg = cfg.replace(llama=cfg.llama.replace(vocab_size=max(tk.vocab_size, 384)))
    sid = tk.token_to_id(cfg.audio_start_token)
    eid = tk.token_to_id(cfg.audio_end_token)

    frozen = allm.init_frozen(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, jax.random.PRNGKey(1))

    B, T = 4, 16
    rng = np.random.RandomState(0)
    global_batch = allm.AudioLLMBatch(
        input_ids=rng.randint(3, 250, (B, T)).astype(np.int32),
        attention_mask=np.ones((B, T), np.int32),
        audio_features=(rng.randn(B, cfg.mel.max_samples) * 0.1).astype(np.float32),
        labels=rng.randint(3, 250, (B, T)).astype(np.int32),
    )

    mesh = parallel.make_mesh(
        parallel.MeshConfig(dp=n_mesh_devices, fsdp=1, tp=1),
        devices=jax.devices()[:n_mesh_devices],
    )
    frozen = parallel.sharding.shard_frozen(mesh, frozen)
    optimizer = optax.adamw(1e-3)
    state = parallel.init_sharded_state(mesh, trainable, optimizer)
    step = parallel.make_sharded_train_step(
        cfg, optimizer, mesh, global_batch, sid, eid,
        compute_dtype=jnp.float32, accum_steps=1,
    )
    shardings = parallel.sharding.batch_shardings(mesh, global_batch, accum=False)

    if process_count > 1:
        pi = jax.process_index()
        lb = B // process_count
        local = jax.tree_util.tree_map(
            lambda x: x[pi * lb : (pi + 1) * lb], global_batch
        )
        dev_batch = parallel.distributed.make_global_batch(local, shardings)
    else:
        dev_batch = jax.device_put(global_batch, shardings)

    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, frozen, dev_batch)
        losses.append(float(metrics["loss"]))
    return {"losses": losses}
