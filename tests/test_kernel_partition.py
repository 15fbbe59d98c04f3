"""Production Pallas kernels INSIDE the GSPMD-sharded train step.

Round-2 VERDICT missing #1: GSPMD cannot partition pallas_call, so every
earlier multi-device artifact validated the XLA fallback, never the kernels.
ops/partitioning.py fixes that by letting each kernel self-wrap in a nested
shard_map. These tests run the REAL kernel code paths (interpret mode — same
Pallas program, CPU-executed) inside the dp×tp sharded train/eval steps on
the 8-device virtual CPU mesh and demand loss/grad parity with the XLA
fallback path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm
from audio_llama_tpu.parallel import (
    MeshConfig,
    init_sharded_state,
    make_mesh,
    make_sharded_eval_step,
    make_sharded_train_step,
)
from audio_llama_tpu.parallel import sharding as shd
from audio_llama_tpu.training import train_step as base_steps

KERNEL_IMPLS = dict(
    attn_impl="causal_kernel_interpret",
    enc_attn_impl="enc_kernel_interpret",
    mel_impl="pallas_interpret",
)


def _setup(batch=8, accum=1, T=16):
    cfg = AudioLLMConfig.tiny()
    key = jax.random.PRNGKey(0)
    kf, kt = jax.random.split(key)
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    S = cfg.mel.max_samples
    shape = (accum, batch) if accum > 1 else (batch,)
    rng = np.random.RandomState(0)
    batch_t = allm.AudioLLMBatch(
        input_ids=jnp.asarray(rng.randint(3, 250, shape + (T,)), jnp.int32),
        attention_mask=jnp.ones(shape + (T,), jnp.int32),
        audio_features=jnp.asarray(rng.randn(*shape, S), jnp.float32) * 0.1,
        labels=jnp.asarray(rng.randint(3, 250, shape + (T,)), jnp.int32),
    )
    return cfg, frozen, trainable, batch_t


def _ref_step_result(cfg, frozen, trainable, batch, opt, sid, eid, **mk_kw):
    """Single-device XLA-path step — the numerics oracle."""
    step = jax.jit(
        base_steps.make_train_step(
            cfg, opt, sid, eid, compute_dtype=jnp.float32, **mk_kw
        )
    )
    state = base_steps.init_train_state(trainable, opt)
    return step(state, frozen, batch)


@pytest.mark.parametrize("mesh_cfg", [MeshConfig(dp=4, tp=2), MeshConfig(dp=8)])
def test_sharded_step_with_kernels_matches_xla(mesh_cfg):
    """The headline gate: interpret-mode Pallas kernels (causal llama attn,
    encoder attn + fused LN, Pallas mel) wrapped in nested shard_map inside
    the GSPMD dp×tp train step == the XLA-fallback single-device step."""
    cfg, frozen, trainable, batch = _setup(batch=8)
    opt = optax.adamw(1e-3)
    sid, eid = 260, 261

    ref_state, ref_metrics = _ref_step_result(
        cfg, frozen, trainable, batch, opt, sid, eid
    )

    mesh = make_mesh(mesh_cfg)
    frozen_sh = shd.shard_frozen(mesh, frozen)
    state = init_sharded_state(mesh, trainable, opt)
    step = make_sharded_train_step(
        cfg, opt, mesh, batch, sid, eid, compute_dtype=jnp.float32,
        donate_state=False, **KERNEL_IMPLS,
    )
    state, metrics = step(state, frozen_sh, batch)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), float(ref_metrics["grad_norm"]), rtol=2e-3
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(ref_state.trainable)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(state.trainable)),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5, rtol=2e-4, err_msg=str(pa)
        )


def test_sharded_step_with_kernels_remat_accum():
    """Kernels inside shard_map inside jax.checkpoint inside the accum scan —
    the full production train-step composition."""
    cfg, frozen, trainable, batch = _setup(batch=4, accum=2)
    opt = optax.adamw(1e-3)
    sid, eid = 260, 261

    ref_state, ref_metrics = _ref_step_result(
        cfg, frozen, trainable, batch, opt, sid, eid,
        accum_steps=2, remat=True, loss_chunk_size=8,
    )

    mesh = make_mesh(MeshConfig(dp=2, tp=2), devices=jax.devices()[:4])
    frozen_sh = shd.shard_frozen(mesh, frozen)
    state = init_sharded_state(mesh, trainable, opt)
    step = make_sharded_train_step(
        cfg, opt, mesh, batch, sid, eid, compute_dtype=jnp.float32,
        donate_state=False, accum_steps=2, remat=True, loss_chunk_size=8,
        **KERNEL_IMPLS,
    )
    state, metrics = step(state, frozen_sh, batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(ref_state.trainable)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(state.trainable)),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5, rtol=2e-4, err_msg=str(pa)
        )


def test_sharded_eval_step_with_kernels():
    cfg, frozen, trainable, batch = _setup(batch=8)
    sid, eid = 260, 261
    ref = jax.jit(
        base_steps.make_eval_step(cfg, sid, eid, compute_dtype=jnp.float32)
    )(trainable, frozen, batch)

    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    frozen_sh = shd.shard_frozen(mesh, frozen)
    trainable_sh = shd.shard_trainable(mesh, trainable)
    step = make_sharded_eval_step(
        cfg, mesh, batch, sid, eid, compute_dtype=jnp.float32, **KERNEL_IMPLS
    )
    got = step(trainable_sh, frozen_sh, batch)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-4)


def test_indivisible_heads_degrade_to_replicated():
    """tp=4 does not divide the tiny model's 2 kv heads: the head dim must
    stay replicated inside the kernel shard_map (correct, unpartitioned)
    rather than erroring."""
    cfg, frozen, trainable, batch = _setup(batch=8)
    opt = optax.adamw(1e-3)
    sid, eid = 260, 261
    ref_state, ref_metrics = _ref_step_result(
        cfg, frozen, trainable, batch, opt, sid, eid
    )
    mesh = make_mesh(MeshConfig(dp=2, tp=4))
    frozen_sh = shd.shard_frozen(mesh, frozen)
    state = init_sharded_state(mesh, trainable, opt)
    step = make_sharded_train_step(
        cfg, opt, mesh, batch, sid, eid, compute_dtype=jnp.float32,
        donate_state=False, **KERNEL_IMPLS,
    )
    state, metrics = step(state, frozen_sh, batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )
