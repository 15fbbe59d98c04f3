"""Opt-in weight-only int8 (W8A16) for the frozen Llama decoder.

Single-token decode at 3B dims is weight-READ-bound: every step streams the
~6.4 GB bf16 parameter set from HBM (BASELINE.md: ~8 ms/step floor). Storing
the frozen matmul weights as symmetric per-output-channel int8 halves that
traffic; compute stays bf16 on the MXU (the int8 tiles are upcast in VMEM
inside the matmul fusion), so accuracy degrades only by the weight rounding
(~0.4% relative output error at 3B dims — far gentler than W8A8, and decode
is bandwidth- not MXU-bound so int8 arithmetic would buy nothing).

The quantized tree is a drop-in for `llama.llama_forward` / generation /
AudioLLM: each stacked linear slab `[L, in, out]` becomes
`{"w_q": int8 [L, in, out], "w_s": f32 [L, out]}` (consumed by
`llama._linear`), the embedding becomes `{"weight": int8 [V, D],
"scale": f32 [V]}` (per-row, exact under both the gather and the tied
unembed matmul), and an untied `lm_head` becomes `{"w_q", "w_s"}`.
LoRA overlays are untouched (they add AFTER the frozen matmul).

Reference parity note: the reference has no quantized serving mode at all
(its inference runs fp16 HF modules, reference src/inference.py:24-49); this
is a TPU-serving extension, opt-in via `bench.py --mode decode
--int8_weights`, `AudioLLM.quantize_decoder()`, or `inference/cli.py
--int8_decoder`. Both multi-chip generation modes support the quantized
tree (tested): make_dp_generate replicates it, and make_tp_generate's
path-keyed specs shard w_q with its out/in dim and ride the per-out-channel
w_s on the column shards (row-parallel w_s replicates — exact under the
psum, since the scales are per-output column).
"""

from __future__ import annotations

import jax.numpy as jnp

from .llama import LINEAR_NAMES, Params


def _quantize_stacked(w: jnp.ndarray) -> dict:
    """[..., in, out] -> {'w_q' int8, 'w_s' f32 [..., out]} symmetric
    per-output-channel (same recipe as whisper_int8._quantize_weight)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return {"w_q": q, "w_s": scale}


def _quantize_rows(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[V, D] -> (int8 [V, D], f32 [V]) symmetric per-row."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_llama(params: Params, include_embed: bool = True) -> Params:
    """Llama param tree -> weight-only-int8 tree (see module docstring).

    include_embed also quantizes the embedding table (per-row) and untied
    lm_head (per-vocab-column) — at 3B dims that is another ~0.8 GB of the
    per-step weight stream (the tied unembed reads the whole [V, D] table).
    """
    out = dict(params)
    layers = dict(params["layers"])
    for name in LINEAR_NAMES:
        layers[name] = _quantize_stacked(layers[name])
    out["layers"] = layers
    if include_embed:
        q, s = _quantize_rows(params["embed"]["weight"])
        out["embed"] = {"weight": q, "scale": s}
        if "lm_head" in params:
            out["lm_head"] = _quantize_stacked(params["lm_head"])
    return out


def is_quantized(params: Params) -> bool:
    return isinstance(params["layers"]["q_proj"], dict)
