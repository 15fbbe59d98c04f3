"""Composite AudioLLM tests — the re-designed analog of the reference's
tests/test_allm.py + test_integration.py (SURVEY.md §4), but with real tiny
models instead of MagicMocks: splice shapes, trainable-param scoping, loss
masking, grad flow, accumulation, and a full train-step loss decrease.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm, llama as llama_mod
from audio_llama_tpu.training import optim, train_step


CFG = AudioLLMConfig.tiny()
# tiny llama vocab 512; delimiters at the end after a resize by 2
AUDIO_START = 512
AUDIO_END = 513


@pytest.fixture(scope="module")
def model():
    cfg = CFG
    frozen = allm.init_frozen(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    frozen["llama"] = llama_mod.resize_embeddings(
        frozen["llama"], cfg.llama.vocab_size + 2, cfg.llama
    )
    trainable = allm.init_trainable(cfg, jax.random.PRNGKey(1))
    return cfg, frozen, trainable


def _batch(cfg, B=2, T=12, with_audio=True, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, cfg.llama.vocab_size, (B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    labels = ids.copy()
    mel = None
    if with_audio:
        mel = rng.normal(
            size=(B, cfg.whisper.num_mel_bins, 2 * cfg.whisper.max_source_positions)
        ).astype(np.float32)
    return allm.AudioLLMBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        audio_features=None if mel is None else jnp.asarray(mel),
        labels=jnp.asarray(labels),
    )


def test_trainable_params_are_projector_and_lora_only(model):
    cfg, frozen, trainable = model
    assert set(trainable.keys()) == {"projector", "lora"}
    n = allm.num_trainable_params(trainable)
    # projector: in*h + h + h*out + out + 2*out ; lora: 6 targets * L * r * (in+out)
    assert n > 0
    # every leaf is an array (no python scalars sneaking into the optimizer)
    for leaf in jax.tree.leaves(trainable):
        assert hasattr(leaf, "shape")


def test_forward_with_audio_shapes_and_loss(model):
    cfg, frozen, trainable = model
    batch = _batch(cfg)
    loss, logits = allm.forward(
        frozen, trainable, cfg, batch, AUDIO_START, AUDIO_END,
        compute_dtype=jnp.float32,
    )
    A = cfg.whisper.max_source_positions
    B, T = batch.input_ids.shape
    assert logits.shape == (B, A + 2 + T, cfg.llama.vocab_size + 2)
    assert np.isfinite(float(loss))


def test_text_only_forward(model):
    cfg, frozen, trainable = model
    batch = _batch(cfg, with_audio=False)
    loss, logits = allm.forward(
        frozen, trainable, cfg, batch, AUDIO_START, AUDIO_END,
        compute_dtype=jnp.float32,
    )
    B, T = batch.input_ids.shape
    assert logits.shape == (B, T, cfg.llama.vocab_size + 2)
    assert np.isfinite(float(loss))


def test_combined_mask_and_labels(model):
    cfg, frozen, trainable = model
    batch = _batch(cfg, B=1, T=4)
    A = cfg.whisper.max_source_positions
    labels = allm.extend_labels(batch.labels, A + 2)
    assert labels.shape == (1, A + 2 + 4)
    assert (np.asarray(labels[0, : A + 2]) == allm.IGNORE_INDEX).all()
    np.testing.assert_array_equal(np.asarray(labels[0, A + 2 :]), np.asarray(batch.labels[0]))


def test_delimiter_id_validation(model):
    cfg, frozen, trainable = model
    batch = _batch(cfg, B=1, T=4)
    with pytest.raises(ValueError, match="out of range"):
        allm.forward(
            frozen, trainable, cfg, batch, 100000, 100001, compute_dtype=jnp.float32
        )


def test_grads_flow_only_from_unmasked_positions(model):
    """Audio positions are loss-masked; whisper is stop_gradient'ed; gradient
    exists for projector + lora (the reference's trainable set)."""
    cfg, frozen, trainable = model
    batch = _batch(cfg)
    loss_fn = train_step.make_loss_fn(cfg, AUDIO_START, AUDIO_END, jnp.float32)
    grads = jax.grad(loss_fn)(trainable, frozen, batch)
    g_proj = jax.tree.leaves(grads["projector"])
    assert any(float(jnp.abs(g).max()) > 0 for g in g_proj)
    # LoRA 'a' (zero-init) gets gradient through nonzero 'b'
    ga = grads["lora"]["layers"]["q_proj"]["a"]
    assert np.isfinite(np.asarray(ga)).all()


def test_train_step_decreases_loss(model):
    cfg, frozen, trainable = model
    optimizer = optim.make_optimizer(1e-2, weight_decay=0.0, max_grad_norm=1.0)
    state = train_step.init_train_state(trainable, optimizer)
    step = jax.jit(
        train_step.make_train_step(
            cfg, optimizer, AUDIO_START, AUDIO_END, compute_dtype=jnp.float32
        )
    )
    batch = _batch(cfg)
    losses = []
    for _ in range(5):
        state, metrics = step(state, frozen, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_grad_accumulation_matches_big_batch(model):
    cfg, frozen, trainable = model
    optimizer = optim.make_optimizer(1e-3, weight_decay=0.0)
    batch = _batch(cfg, B=4, seed=3)

    # accum=2 over two micro-batches of 2
    micro = jax.tree.map(
        lambda x: None if x is None else x.reshape(2, 2, *x.shape[1:]), batch
    )
    state = train_step.init_train_state(trainable, optimizer)
    step_accum = jax.jit(
        train_step.make_train_step(
            cfg, optimizer, AUDIO_START, AUDIO_END, jnp.float32, accum_steps=2
        )
    )
    state_a, m_a = step_accum(state, frozen, micro)

    state = train_step.init_train_state(trainable, optimizer)
    step_full = jax.jit(
        train_step.make_train_step(
            cfg, optimizer, AUDIO_START, AUDIO_END, jnp.float32, accum_steps=1
        )
    )
    state_f, m_f = step_full(state, frozen, batch)

    # loss means agree; updated params agree to fp tolerance
    np.testing.assert_allclose(float(m_a["loss"]), float(m_f["loss"]), rtol=1e-5)
    for a, f in zip(jax.tree.leaves(state_a.trainable), jax.tree.leaves(state_f.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(f), rtol=1e-4, atol=1e-6)


def test_eval_step(model):
    cfg, frozen, trainable = model
    ev = jax.jit(train_step.make_eval_step(cfg, AUDIO_START, AUDIO_END, jnp.float32))
    loss = ev(trainable, frozen, _batch(cfg, seed=9))
    assert np.isfinite(float(loss))
