"""Whisper audio encoder, TPU-native functional implementation.

The reference uses HF `WhisperModel.from_pretrained(...).encoder`, frozen,
under no_grad (reference src/models/base.py:22-24, src/models/allm.py:198-221).
This is a from-scratch JAX encoder with the same architecture and
HF-weight-loadable parameters:

  log-mel [B, n_mels, 3000]
    -> Conv1d(k=3,s=1) + GELU -> Conv1d(k=3,s=2) + GELU   (the conv stem)
    -> + sinusoidal position embedding
    -> N x [pre-LN MHA, pre-LN GELU-MLP] transformer blocks (bidirectional)
    -> final LayerNorm -> [B, 1500, d_model]

TPU notes: the stem convs are small and XLA maps them onto the MXU as implicit
GEMMs; the transformer stack is a single `lax.scan` over stacked layer params;
everything is static-shape (3000 mel frames -> 1500 states).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import WhisperConfig
from ..ops.attention import mha
from ..ops.norms import layer_norm


def sinusoid_position_embedding(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoidal table (same formula as HF's initializer)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def init_params(cfg: WhisperConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random init (tests). Real weights via models.hf_loader.load_whisper_encoder."""
    D, F, L, M = cfg.d_model, cfg.ffn_dim, cfg.num_layers, cfg.num_mel_bins
    ks = jax.random.split(key, 10)

    def dense(key, shape):
        fan_in = shape[-2]
        return (jax.random.normal(key, shape, jnp.float32) * fan_in ** -0.5).astype(dtype)

    def conv(key, out_ch, in_ch, k):
        w = jax.random.normal(key, (out_ch, in_ch, k), jnp.float32) * (in_ch * k) ** -0.5
        return w.astype(dtype)

    return {
        "conv1": {"w": conv(ks[0], D, M, 3), "b": jnp.zeros((D,), dtype)},
        "conv2": {"w": conv(ks[1], D, D, 3), "b": jnp.zeros((D,), dtype)},
        "pos_embed": jnp.asarray(
            sinusoid_position_embedding(cfg.max_source_positions, D), dtype
        ),
        "layers": {
            "attn_ln": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
            "q_proj": {"w": dense(ks[2], (L, D, D)), "b": jnp.zeros((L, D), dtype)},
            "k_proj": {"w": dense(ks[3], (L, D, D))},
            "v_proj": {"w": dense(ks[4], (L, D, D)), "b": jnp.zeros((L, D), dtype)},
            "out_proj": {"w": dense(ks[5], (L, D, D)), "b": jnp.zeros((L, D), dtype)},
            "mlp_ln": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
            "fc1": {"w": dense(ks[6], (L, D, F)), "b": jnp.zeros((L, F), dtype)},
            "fc2": {"w": dense(ks[7], (L, F, D)), "b": jnp.zeros((L, D), dtype)},
        },
        "ln_post": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }


def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x [B, C_in, T], w [C_out, C_in, K] (HF layout), SAME-ish padding=1."""
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + b[None, :, None]


def encode(
    params: dict,
    cfg: WhisperConfig,
    mel: jnp.ndarray,  # [B, n_mels, T_mel] log-mel features
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    attn_algo: str = "v3",  # fastest measured: 0.906 ms/layer attention (v3_sweep)
) -> jnp.ndarray:
    """Frozen encoder forward -> [B, T_mel//2, d_model].

    The reference equivalent returns `last_hidden_state`
    (reference src/models/allm.py:214-219).

    attn_impl: 'auto' (the two-pass encoder kernel on TPU backends, XLA
    elsewhere) | 'enc_kernel' | 'flash' (stock online-softmax kernel) |
    'xla'. The encoder kernel (ops/enc_attention.py) beats stock flash ~2x
    at whisper geometry (VPU-bound softmax; see its docstring); both kernels
    avoid the [B, H, T, T] f32 logits round-trip that dominates the XLA path.
    """
    from ..ops import enc_attention as ea
    from ..ops import flash_attention as fa

    # the encoder kernel's in-kernel head slicing wants MXU-friendly head
    # widths; off-sized (toy) dims fall back to stock flash on TPU
    kernel_dims_ok = cfg.head_dim % 64 == 0 and cfg.d_model % 128 == 0
    use_kernel = (
        attn_impl in ("enc_kernel", "enc_kernel_interpret")
        or (attn_impl == "auto" and fa.available() and kernel_dims_ok)
    )
    use_flash = not use_kernel and (
        attn_impl == "flash" or (attn_impl == "auto" and fa.available())
    )

    if use_kernel:
        # fused single-read/single-write LN kernel (ops/ln_pallas.py)
        from ..ops.ln_pallas import layer_norm_pallas

        _interp = attn_impl == "enc_kernel_interpret"
        ln = functools.partial(layer_norm_pallas, interpret=_interp)
    else:
        ln = layer_norm
    approx = cfg.gelu_approx
    x = mel.astype(compute_dtype)
    x = jax.nn.gelu(
        _conv1d(x, params["conv1"]["w"].astype(compute_dtype), params["conv1"]["b"].astype(compute_dtype), 1),
        approximate=approx,
    )
    x = jax.nn.gelu(
        _conv1d(x, params["conv2"]["w"].astype(compute_dtype), params["conv2"]["b"].astype(compute_dtype), 2),
        approximate=approx,
    )
    x = jnp.swapaxes(x, 1, 2)  # [B, T, D]
    B, T, D = x.shape
    x = x + params["pos_embed"][:T].astype(compute_dtype)

    # Pad the whole stack to the kernel tile ONCE (1500 -> 1536) so the
    # kernel wrapper doesn't copy q/k/v every layer; pad rows live in their
    # own residual lanes and are masked out of attention (statically for the
    # encoder kernel, via SegmentIds for stock flash).
    T_real = T
    seg_mask = None
    if use_flash or use_kernel:
        from ..ops.flash_attention import _TILE, _round_up

        T_pad = _round_up(T, 128 if use_kernel else _TILE)
        if T_pad != T:
            x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
            if use_flash:
                seg_mask = jnp.concatenate(
                    [jnp.ones((B, T), jnp.int32),
                     jnp.zeros((B, T_pad - T), jnp.int32)],
                    axis=1,
                )
            T = T_pad

    H, hd = cfg.num_heads, cfg.head_dim

    def layer_step(carry, p):
        (x,) = carry
        h = ln(
            x, p["attn_ln"]["scale"], p["attn_ln"]["bias"], cfg.layer_norm_eps
        )
        q = h @ p["q_proj"]["w"].astype(compute_dtype) + p["q_proj"]["b"].astype(compute_dtype)
        k = h @ p["k_proj"]["w"].astype(compute_dtype)
        v = h @ p["v_proj"]["w"].astype(compute_dtype) + p["v_proj"]["b"].astype(compute_dtype)
        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, H, hd)
        v = v.reshape(B, T, H, hd)
        if use_kernel:
            attn = ea.enc_attention(
                q, k, v,
                valid_len=T_real if T_real != T else None,
                scale=hd ** -0.5,
                interpret=attn_impl == "enc_kernel_interpret",
                algo=attn_algo,
            )
        elif use_flash:
            attn = fa.flash_mha(q, k, v, mask=seg_mask, causal=False, scale=hd ** -0.5)
        else:
            attn = mha(q, k, v, bias=None, scale=hd ** -0.5)
        attn = attn.reshape(B, T, D)
        attn = attn @ p["out_proj"]["w"].astype(compute_dtype) + p["out_proj"]["b"].astype(compute_dtype)
        x = x + attn

        h = ln(x, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"], cfg.layer_norm_eps)
        h = jax.nn.gelu(
            h @ p["fc1"]["w"].astype(compute_dtype) + p["fc1"]["b"].astype(compute_dtype),
            approximate=approx,
        )
        h = h @ p["fc2"]["w"].astype(compute_dtype) + p["fc2"]["b"].astype(compute_dtype)
        x = x + h
        return (x,), None

    (x,), _ = lax.scan(layer_step, (x,), params["layers"])
    if T_real != T:
        x = x[:, :T_real]
    x = layer_norm(x, params["ln_post"]["scale"], params["ln_post"]["bias"], cfg.layer_norm_eps)
    return x
