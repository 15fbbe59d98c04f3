"""Normalization layers (functional). f32 accumulation regardless of input dtype."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Llama RMSNorm: x * rsqrt(mean(x^2) + eps) * scale, stats in f32."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * lax.rsqrt(var + eps)
    # HF computes (x * rsqrt) in f32, casts to input dtype, THEN multiplies by
    # weight; match that order for bit-level parity.
    return scale * normed.astype(x.dtype)


def layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Standard LayerNorm (Whisper/projector), stats in f32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * lax.rsqrt(var + eps)
    out = normed * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
