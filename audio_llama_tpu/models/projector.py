"""Audio projector: Whisper hidden -> Llama embedding space.

Reference: `AudioProjector` = Linear(in,hid) -> GELU -> Linear(hid,out) ->
LayerNorm(out) with hid=(in+out)//2 (reference src/models/projector.py:5-19).
Trainable (kept in f32 master precision; compute in bf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ProjectorConfig
from ..ops.norms import layer_norm


def init_params(cfg: ProjectorConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    i, h, o = cfg.input_dim, cfg.hidden, cfg.output_dim

    def dense(key, fan_in, fan_out):
        # Kaiming-uniform-ish (what torch nn.Linear defaults to).
        bound = (1.0 / fan_in) ** 0.5
        return jax.random.uniform(
            key, (fan_in, fan_out), jnp.float32, -bound, bound
        ).astype(dtype)

    return {
        "fc1": {"w": dense(k1, i, h), "b": jnp.zeros((h,), dtype)},
        "fc2": {"w": dense(k2, h, o), "b": jnp.zeros((o,), dtype)},
        "ln": {"scale": jnp.ones((o,), dtype), "bias": jnp.zeros((o,), dtype)},
    }


def project(params: dict, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """[B, T, whisper_d] -> [B, T, llama_d]."""
    x = x.astype(compute_dtype)
    x = x @ params["fc1"]["w"].astype(compute_dtype) + params["fc1"]["b"].astype(compute_dtype)
    x = jax.nn.gelu(x, approximate=False)
    x = x @ params["fc2"]["w"].astype(compute_dtype) + params["fc2"]["b"].astype(compute_dtype)
    return layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
