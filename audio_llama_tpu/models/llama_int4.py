"""Opt-in weight-only int4 (W4A16) for the frozen Llama decoder.

Round 2 halved decode's HBM weight stream with W8A16 (models/llama_int8.py);
this halves it again: each stacked linear slab [L, K, N] becomes

    {"w_p": int8 [L, K, N/2],      # two int4 values per byte
     "w_s": f32  [L, K/128, N]}    # group-wise scales (ops/int4_matmul.py)

consumed by the Pallas dequant-matmul kernel (llama._linear dispatches on
the "w_p" key; XLA has no int4 matmul path, so the CPU fallback is the
kernel's dequantize-then-matmul oracle). The embedding table and untied
lm_head stay per-row/column INT8 (llama_int8 recipe): the embed gather
wants per-row scales and contributes little stream at decode, and the tied
unembed must stay cheap to read exactly once per step.

Accuracy: int4 RTN group-128 carries ~11% per-weight relative error (the
standard W4A16 envelope — see tests/test_int4_matmul.py for the math);
3B-class LLMs typically tolerate it with ~0.1-0.5 ppl cost, but VALIDATE
end-task WER before serving (the toy-WER gate covers the mechanism;
real-weight WER needs checkpoints).

Sharding: dp generation replicates this tree (works as-is). TENSOR-parallel
generation is NOT supported: the byte packing pairs output column j with
j + N/2, which a tp shard of the packed dim would split across devices —
pack-after-shard is the future fix. make_tp_generate raises on this tree.

Reference analog: none (reference serves fp16 HF modules,
src/inference.py:24-49). Opt-in via bench.py --mode decode --int4_weights
or inference/cli.py --int4_decoder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import int4_matmul as i4
from .llama import LINEAR_NAMES, Params
from .llama_int8 import _quantize_rows, _quantize_stacked


def _quantize_stacked_int4(w: jnp.ndarray, group: int = i4.GROUP) -> dict:
    """[L, K, N] -> {'w_p' int8 [L, K, N/2], 'w_s' f32 [L, K/group, N]}."""
    packed, scales = jax.vmap(
        lambda m: i4.quantize_pack(m, group=group)
    )(w)
    return {"w_p": packed, "w_s": scales}


def quantize_llama_int4(
    params: Params, include_embed: bool = True, group: int = i4.GROUP
) -> Params:
    """Llama param tree -> weight-only-int4 tree (see module docstring)."""
    if isinstance(params["layers"]["q_proj"], dict):
        raise ValueError(
            "quantize_llama_int4 expects a full-precision tree "
            "(got an already-quantized one)"
        )
    out = dict(params)
    layers = dict(params["layers"])
    for name in LINEAR_NAMES:
        layers[name] = _quantize_stacked_int4(layers[name], group)
    out["layers"] = layers
    if include_embed:
        q, s = _quantize_rows(params["embed"]["weight"])
        out["embed"] = {"weight": q, "scale": s}
        if "lm_head" in params:
            out["lm_head"] = _quantize_stacked(params["lm_head"])
    return out


def dequantize_llama_int4(params: Params) -> Params:
    """int4 tree -> f32 tree (the numerics oracle for parity tests: the
    kernel path must match llama_forward over THIS tree)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in LINEAR_NAMES:
        w = layers[name]
        g = w["w_p"].shape[-2] // w["w_s"].shape[-2]
        layers[name] = jax.vmap(
            lambda p, s: i4.dequantize_ref(p, s, group=g)
        )(w["w_p"], w["w_s"])
    out["layers"] = layers
    if isinstance(params["embed"], dict) and "scale" in params["embed"]:
        emb = params["embed"]
        out["embed"] = {
            "weight": emb["weight"].astype(jnp.float32)
            * emb["scale"][:, None]
        }
    head = params.get("lm_head")
    if isinstance(head, dict):
        out["lm_head"] = head["w_q"].astype(jnp.float32) * head["w_s"][None, :]
    return out


def is_int4(params: Params) -> bool:
    w = params["layers"]["q_proj"]
    return isinstance(w, dict) and "w_p" in w
