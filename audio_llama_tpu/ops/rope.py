"""Rotary position embeddings (RoPE), including Llama-3 frequency scaling.

Matches the HF convention (rotate-half over a [.., head_dim] vector with the
cos/sin table built as concat(freqs, freqs)) so that weights ingested from HF
Llama checkpoints produce identical attention logits.

Everything here is shape-static and jit-friendly; tables are computed inside
the traced program (they fold into constants under jit).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import LlamaConfig, RopeScalingConfig


def rope_inv_freq(head_dim: int, theta: float, scaling: RopeScalingConfig | None) -> np.ndarray:
    """Inverse frequencies [head_dim//2], f32, with optional llama3 scaling.

    Computed with numpy on host: this is a tiny constant table and keeping it
    concrete lets it be baked into the compiled program.
    """
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    if scaling is not None and scaling.rope_type == "llama3":
        # Llama-3.x "rope_scaling": stretch low frequencies by `factor`,
        # keep high frequencies, smoothly interpolate in between.
        low_wavelen = scaling.original_max_position_embeddings / scaling.low_freq_factor
        high_wavelen = scaling.original_max_position_embeddings / scaling.high_freq_factor
        wavelen = 2.0 * np.pi / inv_freq
        scaled = inv_freq / scaling.factor
        smooth = (
            scaling.original_max_position_embeddings / wavelen
            - scaling.low_freq_factor
        ) / (scaling.high_freq_factor - scaling.low_freq_factor)
        smoothed = (1.0 - smooth) * scaled + smooth * inv_freq
        inv_freq = np.where(
            wavelen > low_wavelen,
            scaled,
            np.where(wavelen < high_wavelen, inv_freq, smoothed),
        )
    return inv_freq.astype(np.float32)


def rope_tables(positions: jnp.ndarray, inv_freq) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer positions.

    positions: [...] int32 -> (cos, sin) each [..., head_dim] f32 (the
    concat(freqs, freqs) layout HF uses).
    """
    inv_freq = jnp.asarray(inv_freq, dtype=jnp.float32)
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [..., hd]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate q or k. x: [B, T, H, hd]; cos/sin: [B, T, hd] or [T, hd]."""
    if cos.ndim == x.ndim - 1:  # add head axis
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)


def rope_for_config(cfg: LlamaConfig):
    """Convenience: inv_freq for a Llama config."""
    return rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
