"""Logit-KL between two frozen-model variants: the distribution-level
quantization gate.

WER alone can miss quantization damage (greedy argmax is insensitive until
errors cross decision boundaries); the KL of the quantized model's next-token
distribution against the full-precision one measures the shift directly.
Used by tests/test_outlier_gate.py to gate every quantized serving mode
(W8A8-smoothed encoder, W8A16/W4A16 decoder, int8/int4 KV) under
outlier-injected weights on the synthetic-speech corpus.

The reference has no analog (its eval is a dead stub, reference
old/eval.py:1-33); this guards OUR quantization opt-ins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import allm


def batch_logit_kl(
    cfg,
    frozen_ref: dict,
    frozen_test: dict,
    trainable: dict,
    batch,
    audio_start_id: int,
    audio_end_id: int,
    compute_dtype=jnp.float32,
    trainable_test: dict | None = None,
) -> dict:
    """Teacher-forced mean/max KL(ref || test) over the batch's loss-masked
    (response) positions. Returns {'kl_mean', 'kl_max', 'n_positions'}.

    trainable_test: overlay to pair with frozen_test when it differs from
    the reference's (a QuaRot-rotated tree needs its rotated LoRA —
    models/llama_rotate.rotate_lora)."""

    @jax.jit
    def logits_of(frozen, tr):
        _, logits = allm.forward(
            frozen, tr, cfg, batch, audio_start_id, audio_end_id,
            compute_dtype=compute_dtype,
        )
        return logits.astype(jnp.float32)

    la = logits_of(frozen_ref, trainable)
    lb = logits_of(frozen_test, trainable if trainable_test is None
                   else trainable_test)

    @jax.jit
    def kl(la, lb):
        pa = jax.nn.log_softmax(la, axis=-1)
        pb = jax.nn.log_softmax(lb, axis=-1)
        per_pos = jnp.sum(jnp.exp(pa) * (pa - pb), axis=-1)  # [B, T]
        labels = batch.labels
        # align labels to logits: forward pads labels with -100 for the
        # audio block; logits cover the same combined timeline
        T = per_pos.shape[1]
        mask = jnp.pad(
            labels != -100, ((0, 0), (T - labels.shape[1], 0))
        ) if labels.shape[1] != T else (labels != -100)
        per_pos = jnp.where(mask, per_pos, 0.0)
        n = jnp.maximum(jnp.sum(mask), 1)
        return jnp.sum(per_pos) / n, jnp.max(per_pos), n

    m, mx, n = kl(la, lb)
    return {
        "kl_mean": float(m),
        "kl_max": float(mx),
        "n_positions": int(n),
    }
