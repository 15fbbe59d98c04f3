"""Opt-in W8A8 int8 Whisper encoder (serving throughput mode).

v5e's MXU runs int8 at 2x bf16 peak (~394 TOPS vs ~197 TFLOPs). For the
FROZEN encoder — the dominant FLOPs of audio encoding — weight-only-accuracy
tolerance is usually comfortable for ASR, so this provides:

  quantize_encoder(params):  per-OUTPUT-CHANNEL symmetric int8 weights for
      q/k/v/out_proj/fc1/fc2 (conv stem, norms, biases stay bf16/f32);
  encode_int8(...):  same architecture as whisper.encode, but every linear is
      dynamic-activation W8A8: per-row activation scales, int8 x int8 matmul
      with int32 accumulation, rescale in f32. Attention itself (flash) stays
      bf16 on the dequantized q/k/v.

Accuracy: ~1% relative output error on random weights (tested); on real
checkpoints validate WER before enabling. Exposed as bench.py --int8_encoder
(NOT the default — the headline number stays bf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import WhisperConfig
from ..ops.norms import layer_norm


def _quantize_weight(w: jnp.ndarray):
    """[..., in, out] -> (int8 [..., in, out], f32 scales [..., out]):
    symmetric per-output-channel."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return q, scale


_QUANT_TARGETS = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")


def quantize_encoder(params: dict) -> dict:
    """Whisper param tree -> same tree with int8 {'w_q','w_s'} replacing 'w'
    in the transformer linears."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in _QUANT_TARGETS:
        mod = dict(layers[name])
        wq, ws = _quantize_weight(mod.pop("w"))
        mod["w_q"] = wq
        mod["w_s"] = ws
        layers[name] = mod
    out["layers"] = layers
    return out


def _int8_linear(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray, b=None):
    """Dynamic per-row activation quant + int8 matmul + f32 rescale.

    x [B, T, in] (bf16/f32), wq [in, out] int8, ws [out] f32.
    """
    xf = x.astype(jnp.float32)
    s_r = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / s_r), -127, 127).astype(jnp.int8)
    acc = lax.dot_general(
        xq, wq, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * s_r * ws.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def encode_int8(
    params: dict,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    attn_algo: str = "v3",  # fastest measured: 0.906 ms/layer attention (v3_sweep)
) -> jnp.ndarray:
    """W8A8 twin of whisper.encode over quantize_encoder(params)."""
    from . import whisper as wm
    from ..ops import enc_attention as ea
    from ..ops import flash_attention as fa
    from ..ops.attention import mha

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
    approx = cfg.gelu_approx
    x = mel.astype(compute_dtype)
    x = jax.nn.gelu(
        wm._conv1d(x, params["conv1"]["w"].astype(compute_dtype),
                   params["conv1"]["b"].astype(compute_dtype), 1),
        approximate=approx,
    )
    x = jax.nn.gelu(
        wm._conv1d(x, params["conv2"]["w"].astype(compute_dtype),
                   params["conv2"]["b"].astype(compute_dtype), 2),
        approximate=approx,
    )
    x = jnp.swapaxes(x, 1, 2)
    B, T, D = x.shape
    x = x + params["pos_embed"][:T].astype(compute_dtype)

    T_real = T
    seg_mask = None
    if use_flash or use_kernel:
        T_pad = fa._round_up(T, 128 if use_kernel else fa._TILE)
        if T_pad != T:
            x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
            if use_flash:
                seg_mask = jnp.concatenate(
                    [jnp.ones((B, T), jnp.int32),
                     jnp.zeros((B, T_pad - T), jnp.int32)], axis=1,
                )
            T = T_pad

    H, hd = cfg.num_heads, cfg.head_dim

    def lin(p, name, xx, bias=True):
        m = p[name]
        return _int8_linear(xx, m["w_q"], m["w_s"], m.get("b") if bias else None)

    def layer_step(carry, p):
        (x,) = carry
        h = layer_norm(x, p["attn_ln"]["scale"], p["attn_ln"]["bias"], cfg.layer_norm_eps)
        q = lin(p, "q_proj", h).astype(compute_dtype)
        k = lin(p, "k_proj", h, bias=False).astype(compute_dtype)
        v = lin(p, "v_proj", h).astype(compute_dtype)
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
        attn = lin(p, "out_proj", attn.reshape(B, T, D)).astype(compute_dtype)
        x = x + attn
        h = layer_norm(x, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"], cfg.layer_norm_eps)
        h = jax.nn.gelu(lin(p, "fc1", h), approximate=approx).astype(compute_dtype)
        x = x + lin(p, "fc2", h).astype(compute_dtype)
        return (x,), None

    (x,), _ = lax.scan(layer_step, (x,), params["layers"])
    if T_real != T:
        x = x[:, :T_real]
    x = layer_norm(x, params["ln_post"]["scale"], params["ln_post"]["bias"], cfg.layer_norm_eps)
    return x
