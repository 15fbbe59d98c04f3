"""Checkpoint save/load/resume round-trips (incl. the bare-trainable layout
variant the reference's inference loader accepts, src/inference.py:57-68)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm
from audio_llama_tpu.training import checkpoint as ckpt_mod
from audio_llama_tpu.training import optim, train_step

CFG = AudioLLMConfig.tiny()


def _trainable():
    return allm.init_trainable(CFG, jax.random.PRNGKey(0))


def test_save_load_roundtrip(tmp_path):
    trainable = _trainable()
    optimizer = optim.make_optimizer(1e-3)
    state = train_step.init_train_state(trainable, optimizer)
    path = ckpt_mod.save_checkpoint(
        str(tmp_path), trainable=state.trainable, opt_state=state.opt_state,
        step=7, epoch=1, model_cfg=CFG, args={"lr": 1e-3},
        dataset_config={"audio_key": "audio_paths"},
    )
    assert os.path.basename(path) == "checkpoint-7"

    template = _trainable()
    opt_template = optimizer.init(template)
    restored, opt_state, step, epoch = ckpt_mod.load_checkpoint(
        path, trainable_template=template, opt_state_template=opt_template
    )
    assert step == 7 and epoch == 1
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jax.tree.structure(opt_state) == jax.tree.structure(state.opt_state)

    meta = ckpt_mod.load_metadata(path)
    assert meta["args"]["lr"] == 1e-3
    cfg2 = AudioLLMConfig.from_dict(meta["model_config"])
    assert cfg2.llama.hidden_size == CFG.llama.hidden_size
    assert cfg2.lora.rank == CFG.lora.rank


def test_load_without_optimizer(tmp_path):
    trainable = _trainable()
    optimizer = optim.make_optimizer(1e-3)
    state = train_step.init_train_state(trainable, optimizer)
    path = ckpt_mod.save_checkpoint(
        str(tmp_path), trainable=state.trainable, opt_state=state.opt_state,
        step=3, epoch=0, model_cfg=CFG, final=True,
    )
    assert os.path.basename(path) == "final_checkpoint"
    restored, opt_state, step, _ = ckpt_mod.load_checkpoint(
        path, trainable_template=_trainable()
    )
    assert opt_state is None and step == 3


def test_bare_trainable_variant(tmp_path):
    from flax import serialization

    trainable = _trainable()
    p = tmp_path / "bare.msgpack"
    with open(p, "wb") as f:
        f.write(serialization.to_bytes(jax.tree.map(np.asarray, trainable)))
    restored, opt_state, step, epoch = ckpt_mod.load_checkpoint(
        str(p), trainable_template=_trainable()
    )
    assert opt_state is None and step == 0
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_training(tmp_path):
    """Save mid-run, restore, verify the optimizer state drives identical
    updates (true resume — absent in the reference, SURVEY.md §5)."""
    trainable = _trainable()
    optimizer = optim.make_optimizer(1e-2)
    frozen = allm.init_frozen(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
    from audio_llama_tpu.models import llama as llama_mod

    frozen["llama"] = llama_mod.resize_embeddings(
        frozen["llama"], CFG.llama.vocab_size + 2, CFG.llama
    )
    step_fn = jax.jit(
        train_step.make_train_step(CFG, optimizer, 512, 513, jnp.float32)
    )
    rng = np.random.default_rng(0)
    batch = allm.AudioLLMBatch(
        input_ids=jnp.asarray(rng.integers(0, 512, (2, 8)).astype(np.int32)),
        attention_mask=jnp.ones((2, 8), jnp.int32),
        audio_features=jnp.asarray(
            rng.normal(size=(2, CFG.whisper.num_mel_bins, 128)).astype(np.float32)
        ),
        labels=jnp.asarray(rng.integers(0, 512, (2, 8)).astype(np.int32)),
    )
    state = train_step.init_train_state(trainable, optimizer)
    state, _ = step_fn(state, frozen, batch)
    path = ckpt_mod.save_checkpoint(
        str(tmp_path), trainable=state.trainable, opt_state=state.opt_state,
        step=int(state.step), epoch=0, model_cfg=CFG,
    )
    state_cont, _ = step_fn(state, frozen, batch)

    template = _trainable()
    restored, opt_state, step, _ = ckpt_mod.load_checkpoint(
        path, trainable_template=template, opt_state_template=optimizer.init(template)
    )
    resumed = train_step.TrainState(restored, opt_state, jnp.asarray(step, jnp.int32))
    state_res, _ = step_fn(resumed, frozen, batch)
    for a, b in zip(
        jax.tree.leaves(state_res.trainable), jax.tree.leaves(state_cont.trainable)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
