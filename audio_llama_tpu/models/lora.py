"""LoRA adapters as a functional pytree overlay.

The reference builds `{name: LoRALayer}` dicts and attaches them with torch
forward hooks (reference src/models/lora.py:23-43, src/models/allm.py:27-32).
The TPU-native design is a *parameter overlay*: a second pytree, shaped to
mirror the frozen decoder's stacked layers, whose low-rank deltas are added
inside `llama_forward`'s matmuls (models/llama.py:_linear). This keeps the
whole model one pure function of (frozen_params, trainable_params, batch) —
exactly what jit/grad/pjit want.

Numerics match the reference: delta(x) = x @ A^T @ B^T * (alpha/rank) with
A [r, in] zero-init and B [out, r] ~ N(0, 0.01) (reference src/models/lora.py:
9-21). We store a = A^T [in, r], b = B^T [r, out] stacked over layers.

Targets: {q,k,v,gate,up,down}_proj — NOT o_proj, matching the reference's
target list (reference src/models/lora.py:29).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import LlamaConfig, LoraConfig

# (in_dim, out_dim) factory per supported target module.
def _module_dims(cfg: LlamaConfig) -> dict:
    D, F = cfg.hidden_size, cfg.intermediate_size
    return {
        "q_proj": (D, cfg.num_heads * cfg.head_dim),
        "k_proj": (D, cfg.num_kv_heads * cfg.head_dim),
        "v_proj": (D, cfg.num_kv_heads * cfg.head_dim),
        "o_proj": (cfg.num_heads * cfg.head_dim, D),
        "gate_proj": (D, F),
        "up_proj": (D, F),
        "down_proj": (F, D),
    }


def init_params(
    llama_cfg: LlamaConfig,
    lora_cfg: LoraConfig,
    key: jax.Array,
    dtype=jnp.float32,
) -> dict:
    """Stacked LoRA param tree: {"layers": {name: {"a": [L,in,r], "b": [L,r,out]}}}.

    Arrays only — the (static) alpha/rank scaling is NOT a leaf, so optimizers
    never touch it; `with_scaling` attaches it for the forward pass.
    """
    L, r = llama_cfg.num_layers, lora_cfg.rank
    dims = _module_dims(llama_cfg)
    layers = {}
    for name in lora_cfg.target_modules:
        if name not in dims:
            raise ValueError(f"unknown LoRA target {name!r}")
        i, o = dims[name]
        key, ka, kb = jax.random.split(key, 3)
        if lora_cfg.init == "ref":
            a = jnp.zeros((L, i, r), dtype)
            b = (jax.random.normal(kb, (L, r, o), jnp.float32) * 0.01).astype(dtype)
        elif lora_cfg.init == "standard":
            a = (jax.random.normal(ka, (L, i, r), jnp.float32) * (1.0 / r)).astype(dtype)
            b = jnp.zeros((L, r, o), dtype)
        else:
            raise ValueError(f"unknown lora init {lora_cfg.init!r}")
        layers[name] = {"a": a, "b": b}
    return {"layers": layers}


def with_scaling(lora_params: dict, lora_cfg: LoraConfig) -> dict:
    """Attach the static scaling for consumption by llama_forward."""
    return {"layers": lora_params["layers"], "scaling": lora_cfg.scaling}


def num_params(lora: dict) -> int:
    return sum(
        x.size for br in lora["layers"].values() for x in (br["a"], br["b"])
    )


def merge_into_llama(params: dict, lora: dict, scaling: float | None = None) -> dict:
    """Fold LoRA deltas into the frozen weights (w += a @ b * scaling).

    Inference-time optimization: a merged checkpoint decodes with zero LoRA
    overhead. Returns a new params tree; the input is untouched.
    """
    out = dict(params)
    out["layers"] = dict(params["layers"])
    if scaling is None:
        scaling = lora["scaling"]
    for name, br in lora["layers"].items():
        w = out["layers"][name]
        delta = jnp.einsum("lir,lro->lio", br["a"].astype(jnp.float32), br["b"].astype(jnp.float32)) * scaling
        out["layers"][name] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    return out
