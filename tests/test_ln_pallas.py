"""Fused LayerNorm kernel (ops/ln_pallas.py) parity vs ops.norms.layer_norm."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_llama_tpu.ops.ln_pallas import layer_norm_pallas
from audio_llama_tpu.ops.norms import layer_norm


def test_f32_parity():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 128), jnp.float32) * 2 + 0.5
    s = jax.random.normal(jax.random.PRNGKey(1), (128,)) * 0.1 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    ref = layer_norm(x, s, b, 1e-5)
    out = layer_norm_pallas(x, s, b, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_bf16_parity():
    x = (jax.random.normal(jax.random.PRNGKey(3), (1, 512, 256)) * 3).astype(jnp.bfloat16)
    s = jnp.ones((256,), jnp.bfloat16) * 1.5
    b = jnp.full((256,), 0.25, jnp.bfloat16)
    ref = layer_norm(x, s, b, 1e-5).astype(jnp.float32)
    out = layer_norm_pallas(x, s, b, 1e-5, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2, rtol=3e-2)


def test_ragged_rows_fall_back():
    """Row counts not divisible by the block fall back to the XLA path."""
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 7, 64), jnp.float32)
    s = jnp.ones((64,))
    b = jnp.zeros((64,))
    ref = layer_norm(x, s, b, 1e-5)
    out = layer_norm_pallas(x, s, b, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6)
