"""Outlier-channel weight injection: the hard accuracy regime for the
quantization gates.

Real trained transformers are not Gaussian: a handful of channels carry
20-100x the median magnitude (LayerNorm gammas, residual-stream "attention
sink" channels, a few huge MLP output channels). Round 3 proved this regime
is exactly where naive numerics silently break (the bounded-shift softmax
zeroed rows at outlier activation magnitudes). Random-init quantization
gates therefore prove too little: int8/int4 RTN error on N(0, 1/fan_in)
weights is the EASY case.

This module injects a deterministic, heavy-tailed outlier structure into
random-init whisper/llama trees so the quantization accuracy gates (WER +
logit-KL, tests/test_outlier_gate.py; flagship-dims error probe,
experiments/int8_outlier_probe.py) run in the regime that real checkpoints
occupy. Injection sites are chosen to stress each quantizer where it is
weakest:

  whisper (W8A8 encoder, models/whisper_int8.py):
    - attn_ln/mlp_ln scale outliers -> per-token activation outliers at the
      q/k/v and fc1 inputs (dynamic per-row activation quant: one huge
      channel inflates the row absmax and crushes everyone else's
      resolution — the LLM.int8 failure mode);
    - v_proj/fc1 OUTPUT-channel outliers -> activation outliers at the
      out_proj and fc2 inputs (attention is linear in v; gelu(s*x) ~ s*x
      for large positive x, so the magnitude survives to fc2);
    - mild weight input-ROW outliers on every quantized linear (per-output-
      channel weight scales cover all input rows, so one hot row coarsens
      the whole matrix).

  llama (W8A16/W4A16 weight-only + int8/int4 KV):
    - k_proj/v_proj OUTPUT-channel outliers -> outlier K/V cache channels
      (per-row KV scales: a hot head-dim channel crushes that row);
    - RMSNorm scale outliers -> activation outliers into every
      LN-preceded linear (ride-along realism; weight-only quant ignores
      activations but the KV path and any future A8 path see them);
    - mild weight input-row outliers on all seven linears (stresses the
      int4 GROUP-wise scales: one hot row coarsens its whole group).

The reference has no quantization at all (100%% fp16 torch, reference
src/train.py:254); these gates guard OUR serving opt-ins. Magnitude
defaults follow the published regime (LLM.int8 / SmoothQuant: activation
outliers 20-100x at d>=4k): scale=40 lognormal-jittered, n=4 channels per
site per layer, weight rows 8x.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _channel_mults(key, L: int, C: int, n: int, scale: float) -> jnp.ndarray:
    """[L, C] multiplier field: ones except n random channels per layer set
    to heavy-tailed factors around `scale` (lognormal sigma 0.5)."""
    ki, kf = jax.random.split(key)
    idx = jax.random.randint(ki, (L, n), 0, C)
    f = scale * jnp.exp(0.5 * jax.random.normal(kf, (L, n), jnp.float32))
    m = jnp.ones((L, C), jnp.float32)
    return m.at[jnp.arange(L)[:, None], idx].set(f)


def _mul(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Multiply preserving dtype; m broadcasts against x's trailing dims."""
    return (x.astype(jnp.float32) * m).astype(x.dtype)


def inject_whisper_outliers(
    params: dict, key: jax.Array, n: int = 4, scale: float = 40.0,
    weight_row_scale: float = 8.0,
) -> dict:
    """Whisper-encoder tree (stacked [L, ...] layers) -> same tree with the
    outlier structure described in the module docstring. Deterministic in
    `key`; jit-safe."""
    layers = dict(params["layers"])
    L, D = layers["attn_ln"]["scale"].shape
    F = layers["fc1"]["b"].shape[-1]
    ks = jax.random.split(key, 10)

    m_attn = _channel_mults(ks[0], L, D, n, scale)
    m_mlp = _channel_mults(ks[1], L, D, n, scale)
    m_vout = _channel_mults(ks[2], L, D, n, scale)
    m_f1out = _channel_mults(ks[3], L, F, n, scale)

    layers["attn_ln"] = dict(layers["attn_ln"])
    layers["attn_ln"]["scale"] = _mul(layers["attn_ln"]["scale"], m_attn)
    layers["mlp_ln"] = dict(layers["mlp_ln"])
    layers["mlp_ln"]["scale"] = _mul(layers["mlp_ln"]["scale"], m_mlp)

    # output-channel outliers: w [L, in, out] -> multiply columns (+ bias)
    layers["v_proj"] = dict(layers["v_proj"])
    layers["v_proj"]["w"] = _mul(layers["v_proj"]["w"], m_vout[:, None, :])
    layers["v_proj"]["b"] = _mul(layers["v_proj"]["b"], m_vout)
    layers["fc1"] = dict(layers["fc1"])
    layers["fc1"]["w"] = _mul(layers["fc1"]["w"], m_f1out[:, None, :])
    layers["fc1"]["b"] = _mul(layers["fc1"]["b"], m_f1out)

    # mild weight input-row outliers on every W8A8-quantized linear
    for i, name in enumerate(
        ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")
    ):
        cin = layers[name]["w"].shape[1]
        m_row = _channel_mults(ks[4 + i], L, cin, n, weight_row_scale)
        layers[name] = dict(layers[name])
        layers[name]["w"] = _mul(layers[name]["w"], m_row[:, :, None])

    out = dict(params)
    out["layers"] = layers
    return out


def inject_llama_outliers(
    params: dict, key: jax.Array, n: int = 4, scale: float = 20.0,
    weight_row_scale: float = 8.0,
) -> dict:
    """Llama tree (stacked [L, ...] layers) -> same tree with outlier
    K/V-channel, RMSNorm-scale, and weight-row structure. Deterministic in
    `key`; jit-safe. Apply BEFORE any quantize_llama* call."""
    layers = dict(params["layers"])
    L, D = layers["input_ln"].shape
    ks = jax.random.split(key, 11)

    layers["input_ln"] = _mul(
        layers["input_ln"], _channel_mults(ks[0], L, D, n, scale)
    )
    layers["post_attn_ln"] = _mul(
        layers["post_attn_ln"], _channel_mults(ks[1], L, D, n, scale)
    )

    kv_dim = layers["k_proj"].shape[-1]
    layers["k_proj"] = _mul(
        layers["k_proj"], _channel_mults(ks[2], L, kv_dim, n, scale)[:, None, :]
    )
    layers["v_proj"] = _mul(
        layers["v_proj"], _channel_mults(ks[3], L, kv_dim, n, scale)[:, None, :]
    )

    for i, name in enumerate(
        ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
         "down_proj")
    ):
        cin = layers[name].shape[1]
        m_row = _channel_mults(ks[4 + i], L, cin, n, weight_row_scale)
        layers[name] = _mul(layers[name], m_row[:, :, None])

    out = dict(params)
    out["layers"] = layers
    return out
