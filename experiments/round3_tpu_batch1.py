"""Round-3 TPU batch 1 (run on the real chip):

  1. Causal-kernel softmax A/B at llama training geometry (Hq24/Hkv8/hd128/
     T2560, B2/B8, fwd and fwd+bwd): the new numerically-safe 'online'
     (running true max + rescale) vs round-2's 'bounded' (Cauchy-Schwarz
     shift — underflows at real-checkpoint magnitudes, ADVICE r2). Decides
     whether safety costs measurable TF/s.
  2. Lowering proof for VERDICT r2 #1(c): the GSPMD-sharded train step at
     FLAGSHIP dims (3B llama + whisper-turbo) with the production Pallas
     kernel paths wrapped in nested shard_map (ops/partitioning.py),
     compiled and stepped on a real-TPU 1-device mesh.

    nohup python -u experiments/round3_tpu_batch1.py > /tmp/r3b1.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments.enc_kernel_bench import timed_loop, report


def softmax_ab():
    from audio_llama_tpu.ops.causal_attention import causal_mha

    Hq, Hkv, hd, T = 24, 8, 128, 2560
    print(json.dumps({"exp": "softmax_ab", "backend": jax.default_backend()}),
          flush=True)
    for B in (2, 8):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, T, Hq, hd), jnp.bfloat16) * 0.05
        k = jax.random.normal(key, (B, T, Hkv, hd), jnp.bfloat16) * 0.05
        v = jax.random.normal(key, (B, T, Hkv, hd), jnp.bfloat16) * 0.05
        mask = jnp.ones((B, T), jnp.int32)
        fwd_flops = 2 * 2 * B * Hq * T * T * hd // 2

        for mode in ("online", "bounded"):
            def fstep(a, mode=mode):
                q, k, v = a
                o = causal_mha(q, k, v, mask=mask, softmax_mode=mode)
                bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
                return bump.astype(jnp.float32), (q + bump, k + bump, v + bump)

            sec = timed_loop(fstep, (q, k, v), 20)
            report(f"causal_{mode}_fwd_B{B}", sec, flops=fwd_flops,
                   note="r2 bounded fwd: 81.9 (B2) / 65.2 (B8) TF/s")

            def loss_fn(q, k, v, mode=mode):
                o = causal_mha(q, k, v, mask=mask, softmax_mode=mode)
                return jnp.sum(o.astype(jnp.float32)) * 1e-6

            grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))

            def gstep(a):
                q, k, v = a
                val, (dq, dk, dv) = grad_fn(q, k, v)
                gsum = (
                    jnp.mean(dq.astype(jnp.float32))
                    + jnp.mean(dk.astype(jnp.float32))
                    + jnp.mean(dv.astype(jnp.float32))
                )
                bump = ((val + gsum) * 1e-3).astype(jnp.bfloat16)
                return val + gsum, (q + bump, k + bump, v + bump)

            sec = timed_loop(gstep, (q, k, v), 12)
            report(f"causal_{mode}_fwdbwd_B{B}", sec, flops=int(fwd_flops * 3.5),
                   note="r2 bounded fwd+bwd: 76.5 (B2) / 58.0 (B8) TF/s")


def shardmap_train_lowering():
    """Compile + run the sharded train step (production kernels inside
    nested shard_map inside GSPMD jit) at flagship dims on a 1-device TPU
    mesh. Passing = lowering works; timing vs the unsharded bench catches
    wrapper overhead."""
    import numpy as np
    import optax

    from audio_llama_tpu.config import AudioLLMConfig
    from audio_llama_tpu.models import allm
    from audio_llama_tpu.parallel import (
        MeshConfig, init_sharded_state, make_mesh, make_sharded_train_step,
    )
    from audio_llama_tpu.parallel import sharding as shd

    cfg = AudioLLMConfig()  # 3B llama + whisper-turbo dims
    B, T = 2, 512
    vocab = cfg.llama.vocab_size
    sid, eid = vocab - 2, vocab - 1
    print(json.dumps({"exp": "shardmap_train_lowering", "B": B, "T": T}),
          flush=True)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=1), devices=jax.devices()[:1])
    kf, kt, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    frozen = jax.jit(lambda k: allm.init_frozen(cfg, k, dtype=jnp.bfloat16))(kf)
    trainable = jax.jit(lambda k: allm.init_trainable(cfg, k))(kt)
    frozen = shd.shard_frozen(mesh, frozen)
    optimizer = optax.chain(
        optax.clip_by_global_norm(2.0), optax.adamw(2e-5, weight_decay=0.01)
    )
    state = init_sharded_state(mesh, trainable, optimizer)
    batch = allm.AudioLLMBatch(
        input_ids=jax.random.randint(kb, (B, T), 3, vocab - 8),
        attention_mask=jnp.ones((B, T), jnp.int32),
        audio_features=jax.random.normal(kb, (B, cfg.mel.max_samples)) * 0.1,
        labels=jax.random.randint(kb, (B, T), 3, vocab - 8),
    )
    step = make_sharded_train_step(
        cfg, optimizer, mesh, batch, sid, eid,
        compute_dtype=jnp.bfloat16, remat=True, loss_chunk_size=512,
        donate_state=False,  # reuse state across timing calls
    )
    t0 = time.perf_counter()
    state2, metrics = step(state, frozen, batch)
    loss = float(metrics["loss"])
    print(json.dumps({
        "exp": "shardmap_train_lowering", "loss": round(loss, 4),
        "finite": bool(np.isfinite(loss)),
        "compile_plus_first_step_s": round(time.perf_counter() - t0, 1),
    }), flush=True)

    # throughput: chained steps, scalar-fetch timing (see bench.py notes)
    def chain(state, frozen, batch, n):
        def body(_, carry):
            state, batch = carry
            state, metrics = step_inner(state, frozen, batch)
            bump = metrics["loss"] * 1e-9
            batch = batch._replace(
                audio_features=batch.audio_features
                + bump.astype(batch.audio_features.dtype)
            )
            return (state, batch)

        state, _ = jax.lax.fori_loop(0, n, body, (state, batch))
        checksum = sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(state.trainable)
        )
        return checksum + state.step

    # rebuild an un-jitted step for the in-loop body (the jitted one works
    # too — jit-in-jit inlines — but keep one program)
    from audio_llama_tpu.ops import partitioning as ptn
    from audio_llama_tpu.training import train_step as base_steps

    inner = base_steps.make_train_step(
        cfg, optimizer, sid, eid, compute_dtype=jnp.bfloat16,
        remat=True, loss_chunk_size=512,
    )

    def step_inner(state, frozen, batch):
        with ptn.kernel_partitioning(mesh):
            return inner(state, frozen, batch)

    run = jax.jit(chain)  # n traced: ONE executable serves all loop lengths
    float(run(state, frozen, batch, 1))
    t0 = time.perf_counter()
    float(run(state, frozen, batch, 2))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(state, frozen, batch, 8))
    d2 = time.perf_counter() - t0
    sec_per_step = max(d2 - d1, 1e-9) / 6
    toks = B * (T + cfg.audio_seq_len + 2)
    print(json.dumps({
        "exp": "shardmap_train_tput",
        "sec_per_step": round(sec_per_step, 4),
        "tokens_per_sec": round(toks / sec_per_step, 1),
        "note": "r2 unsharded B2 accum1: 5889 tok/s",
    }), flush=True)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend(),
                      "devices": len(jax.devices())}), flush=True)
    softmax_ab()
    shardmap_train_lowering()
    print(json.dumps({"done": True}), flush=True)
