"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest.py).

Validates that the dp×tp sharded train step produces the same numerics as the
single-device step (GSPMD collectives are semantically invisible), and that
tensor-parallel partition specs actually apply to the frozen stacks.
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
    best_mesh_shape,
    init_sharded_state,
    make_mesh,
    make_sharded_train_step,
)
from audio_llama_tpu.parallel import sharding as shd
from audio_llama_tpu.training import train_step as base_steps


def _setup(batch=8, accum=1):
    cfg = AudioLLMConfig.tiny()
    key = jax.random.PRNGKey(0)
    kf, kt, kb = jax.random.split(key, 3)
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    T = 16
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


def test_mesh_shapes():
    assert MeshConfig(dp=2, tp=4).resolve(8) == (2, 1, 4, 1)
    assert MeshConfig(dp=-1, tp=2).resolve(8) == (4, 1, 2, 1)
    ms = best_mesh_shape(8, model_heads=8)
    assert ms.dp * ms.fsdp * ms.tp == 8
    with pytest.raises(ValueError):
        MeshConfig(dp=3, tp=3).resolve(8)


def test_frozen_specs_tp_axes():
    cfg, frozen, trainable, _ = _setup()
    specs = shd.frozen_specs(frozen)
    lsp = specs["llama"]["layers"]
    assert lsp["q_proj"] == jax.sharding.PartitionSpec(None, "fsdp", "tp")
    assert lsp["o_proj"] == jax.sharding.PartitionSpec(None, "tp", "fsdp")
    assert lsp["down_proj"] == jax.sharding.PartitionSpec(None, "tp", "fsdp")
    assert lsp["input_ln"] == jax.sharding.PartitionSpec()
    wsp = specs["whisper"]["layers"]
    assert wsp["fc1"]["w"] == jax.sharding.PartitionSpec(None, "fsdp", "tp")
    assert wsp["fc2"]["w"] == jax.sharding.PartitionSpec(None, "tp", "fsdp")
    assert wsp["fc2"]["b"] == jax.sharding.PartitionSpec()
    tsp = shd.trainable_specs(trainable)
    assert tsp["lora"]["layers"]["q_proj"]["b"] == jax.sharding.PartitionSpec(
        None, None, "tp"
    )
    assert tsp["lora"]["layers"]["down_proj"]["a"] == jax.sharding.PartitionSpec(
        None, "tp", None
    )


def test_sharded_step_matches_single_device():
    cfg, frozen, trainable, batch = _setup(batch=8)
    opt = optax.adamw(1e-3)
    sid, eid = 260, 261

    # single-device reference
    ref_step = jax.jit(
        base_steps.make_train_step(cfg, opt, sid, eid, compute_dtype=jnp.float32)
    )
    ref_state = base_steps.init_train_state(trainable, opt)
    ref_state, ref_metrics = ref_step(ref_state, frozen, batch)

    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    frozen_sh = shd.shard_frozen(mesh, frozen)
    state = init_sharded_state(mesh, trainable, opt)
    step = make_sharded_train_step(
        cfg, opt, mesh, batch, sid, eid, compute_dtype=jnp.float32,
        donate_state=False,
    )
    state, metrics = step(state, frozen_sh, batch)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )
    # updated trainables match the single-device update
    for a, b in zip(
        jax.tree.leaves(state.trainable), jax.tree.leaves(ref_state.trainable)
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-4
        )


def test_sharded_step_dp_fsdp_tp_matches_single_device():
    """Full 3-axis mesh (dp=2, fsdp=2, tp=2): ZeRO-style 2D weight sharding
    + batch over dp*fsdp must still match the single-device update."""
    cfg, frozen, trainable, batch = _setup(batch=8)
    opt = optax.adamw(1e-3)
    sid, eid = 260, 261

    ref_step = jax.jit(
        base_steps.make_train_step(cfg, opt, sid, eid, compute_dtype=jnp.float32)
    )
    ref_state = base_steps.init_train_state(trainable, opt)
    ref_state, ref_metrics = ref_step(ref_state, frozen, batch)

    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    frozen_sh = shd.shard_frozen(mesh, frozen)
    state = init_sharded_state(mesh, trainable, opt)
    step = make_sharded_train_step(
        cfg, opt, mesh, batch, sid, eid, compute_dtype=jnp.float32,
        donate_state=False,
    )
    state, metrics = step(state, frozen_sh, batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )
    for a, b in zip(
        jax.tree.leaves(state.trainable), jax.tree.leaves(ref_state.trainable)
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-4
        )


def test_sharded_step_with_accumulation():
    cfg, frozen, trainable, batch = _setup(batch=4, accum=2)
    opt = optax.adamw(1e-3)
    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    frozen_sh = shd.shard_frozen(mesh, frozen)
    state = init_sharded_state(mesh, trainable, opt)
    step = make_sharded_train_step(
        cfg, opt, mesh, batch, 260, 261, compute_dtype=jnp.float32,
        accum_steps=2, donate_state=False,
    )
    state, metrics = step(state, frozen_sh, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
