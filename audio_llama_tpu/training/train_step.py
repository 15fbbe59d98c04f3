"""jit-compiled train/eval steps.

One XLA program per step: [accum, micro_batch] -> scan over microbatches
accumulating f32 gradients -> mean -> clip -> AdamW update of the trainable
pytree. This folds the reference's Python-side gradient-accumulation loop
(reference src/train.py:267-303) into the compiled program, so accumulation
costs no host round-trips.

Gradients flow only into `trainable` (projector + LoRA); `frozen` is a
non-differentiated argument and whisper is additionally stop_gradient'ed
(models/allm.py) — the functional equivalent of requires_grad=False +
torch.no_grad in the reference (src/models/base.py:8-9, allm.py:216).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import AudioLLMConfig
from ..models import allm


class TrainState(NamedTuple):
    trainable: dict
    opt_state: optax.OptState
    step: jnp.ndarray  # [] int32


def init_train_state(trainable: dict, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        trainable=trainable,
        opt_state=optimizer.init(trainable),
        step=jnp.zeros((), jnp.int32),
    )


def make_loss_fn(cfg: AudioLLMConfig, audio_start_id: int, audio_end_id: int,
                 compute_dtype=jnp.bfloat16, with_audio: bool = True,
                 loss_chunk_size: int = 0, remat: bool = False,
                 attn_impl: str = "auto", enc_attn_impl: str = "auto",
                 mel_impl: str = "auto") -> Callable:
    def loss_fn(trainable, frozen, batch: allm.AudioLLMBatch):
        loss, _ = allm.forward(
            frozen, trainable, cfg, batch, audio_start_id, audio_end_id,
            compute_dtype, loss_chunk_size=loss_chunk_size, remat=remat,
            attn_impl=attn_impl, enc_attn_impl=enc_attn_impl,
            mel_impl=mel_impl,
        )
        return loss

    return loss_fn


def make_train_step(
    cfg: AudioLLMConfig,
    optimizer: optax.GradientTransformation,
    audio_start_id: int,
    audio_end_id: int,
    compute_dtype=jnp.bfloat16,
    accum_steps: int = 1,
    with_audio: bool = True,
    loss_chunk_size: int = 0,
    remat: bool = False,
    attn_impl: str = "auto",
    enc_attn_impl: str = "auto",
    mel_impl: str = "auto",
):
    """Returns step(state, frozen, batch) -> (state, metrics).

    batch leaves are [accum, micro, ...] when accum_steps > 1, else [micro, ...].
    """
    loss_fn = make_loss_fn(cfg, audio_start_id, audio_end_id, compute_dtype,
                           with_audio, loss_chunk_size, remat,
                           attn_impl, enc_attn_impl, mel_impl)
    grad_fn = jax.value_and_grad(loss_fn)

    def step(state: TrainState, frozen: dict, batch: allm.AudioLLMBatch):
        if accum_steps == 1:
            loss, grads = grad_fn(state.trainable, frozen, batch)
        else:
            def micro(carry, mb):
                loss_acc, grad_acc = carry
                loss, grads = grad_fn(state.trainable, frozen, mb)
                return (
                    loss_acc + loss,
                    jax.tree.map(jnp.add, grad_acc, grads),
                ), None

            zero = jax.tree.map(
                lambda x: jnp.zeros_like(x, dtype=jnp.float32), state.trainable
            )
            (loss_sum, grad_sum), _ = jax.lax.scan(
                micro, (jnp.zeros((), jnp.float32), zero), batch
            )
            loss = loss_sum / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, grad_sum)

        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.trainable
        )
        trainable = optax.apply_updates(state.trainable, updates)
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return TrainState(trainable, opt_state, state.step + 1), metrics

    return step


def make_eval_step(
    cfg: AudioLLMConfig,
    audio_start_id: int,
    audio_end_id: int,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    enc_attn_impl: str = "auto",
    mel_impl: str = "auto",
):
    """eval step: (trainable, frozen, batch) -> per-batch mean loss."""
    loss_fn = make_loss_fn(cfg, audio_start_id, audio_end_id, compute_dtype,
                           attn_impl=attn_impl, enc_attn_impl=enc_attn_impl,
                           mel_impl=mel_impl)

    def step(trainable, frozen, batch):
        return loss_fn(trainable, frozen, batch)

    return step
