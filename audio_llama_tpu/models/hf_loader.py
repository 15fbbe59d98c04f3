"""HF checkpoint ingestion: safetensors / torch state dicts -> our pytrees.

The reference loads base models with `LlamaForCausalLM.from_pretrained` /
`WhisperModel.from_pretrained(...).encoder` and freezes them (reference
src/models/base.py:19-26). We ingest the same checkpoints into our stacked
functional pytrees:

- All nn.Linear weights are transposed to (in, out).
- Per-layer tensors are stacked along a new leading layer axis (for the
  lax.scan decoder body).
- dtype is converted on the host (numpy) before device put — frozen weights
  default to bfloat16.

Works from (a) a local HF checkpoint directory (config.json + *.safetensors),
or (b) an in-memory state dict (torch or numpy) — the latter powers the golden
parity tests against tiny random HF models.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Mapping

import numpy as np

from ..config import LlamaConfig, WhisperConfig


def _to_numpy(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (host)."""
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    if hasattr(t, "detach"):
        t = t.detach()
        if t.dtype is not None and str(t.dtype) == "torch.bfloat16":
            return t.float().cpu().numpy()
        return t.cpu().numpy()
    return np.asarray(t)


def _np_dtype(dtype) -> np.dtype:
    import jax.numpy as jnp
    import ml_dtypes

    if dtype in (jnp.bfloat16, "bfloat16"):
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(dtype)


def _cast(x: np.ndarray, dtype) -> np.ndarray:
    return x.astype(_np_dtype(dtype))


def _stack(sd: Mapping[str, np.ndarray], fmt: str, n: int) -> np.ndarray:
    return np.stack([_to_numpy(sd[fmt.format(i)]) for i in range(n)], axis=0)


# ---------------------------------------------------------------------------
# Llama
# ---------------------------------------------------------------------------

def llama_params_from_state_dict(
    sd: Mapping[str, "np.ndarray"], cfg: LlamaConfig, dtype="bfloat16"
) -> dict:
    """HF LlamaForCausalLM state dict -> our stacked pytree.

    Accepts keys with or without the leading 'model.' prefix.
    """
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    L = cfg.num_layers
    pfx = "layers.{}."

    def stackT(suffix):  # linear weights: HF [out, in] -> ours [L, in, out]
        arr = _stack(sd, pfx + suffix, L)
        return _cast(np.swapaxes(arr, -1, -2), dtype)

    def stack1(suffix):  # norm scales [L, D]
        return _cast(_stack(sd, pfx + suffix, L), dtype)

    params = {
        "embed": {"weight": _cast(_to_numpy(sd["embed_tokens.weight"]), dtype)},
        "layers": {
            "input_ln": stack1("input_layernorm.weight"),
            "post_attn_ln": stack1("post_attention_layernorm.weight"),
            "q_proj": stackT("self_attn.q_proj.weight"),
            "k_proj": stackT("self_attn.k_proj.weight"),
            "v_proj": stackT("self_attn.v_proj.weight"),
            "o_proj": stackT("self_attn.o_proj.weight"),
            "gate_proj": stackT("mlp.gate_proj.weight"),
            "up_proj": stackT("mlp.up_proj.weight"),
            "down_proj": stackT("mlp.down_proj.weight"),
        },
        "final_ln": _cast(_to_numpy(sd["norm.weight"]), dtype),
    }
    if not cfg.tie_word_embeddings:
        if "lm_head.weight" in sd:
            head = _to_numpy(sd["lm_head.weight"])  # [V, D]
            params["lm_head"] = _cast(head.T, dtype)
        else:
            params["lm_head"] = _cast(
                _to_numpy(sd["embed_tokens.weight"]).T, dtype
            )
    return params


# ---------------------------------------------------------------------------
# Whisper encoder
# ---------------------------------------------------------------------------

def whisper_encoder_params_from_state_dict(
    sd: Mapping[str, "np.ndarray"], cfg: WhisperConfig, dtype="bfloat16"
) -> dict:
    """HF WhisperModel (or WhisperEncoder) state dict -> our stacked pytree.

    Accepts keys with the 'model.encoder.' / 'encoder.' prefix or bare.
    Conv weights HF layout [out_ch, in_ch, k] are kept as-is (we use
    lax.conv_general_dilated with matching dimension_numbers).
    """
    stripped = {}
    for k, v in sd.items():
        k = k.removeprefix("model.")
        if k.startswith("encoder."):
            k = k.removeprefix("encoder.")
        elif any(k.startswith(p) for p in ("decoder.", "proj_out.")):
            continue
        stripped[k] = v
    sd = stripped
    L = cfg.num_layers
    pfx = "layers.{}."

    def stackT(suffix):
        arr = _stack(sd, pfx + suffix, L)
        return _cast(np.swapaxes(arr, -1, -2), dtype)

    def stack1(suffix):
        return _cast(_stack(sd, pfx + suffix, L), dtype)

    def get(name):
        return _cast(_to_numpy(sd[name]), dtype)

    params = {
        "conv1": {"w": get("conv1.weight"), "b": get("conv1.bias")},
        "conv2": {"w": get("conv2.weight"), "b": get("conv2.bias")},
        "pos_embed": get("embed_positions.weight"),  # [max_pos, D]
        "layers": {
            "attn_ln": {
                "scale": stack1("self_attn_layer_norm.weight"),
                "bias": stack1("self_attn_layer_norm.bias"),
            },
            "q_proj": {"w": stackT("self_attn.q_proj.weight"), "b": stack1("self_attn.q_proj.bias")},
            # HF Whisper k_proj has no bias.
            "k_proj": {"w": stackT("self_attn.k_proj.weight")},
            "v_proj": {"w": stackT("self_attn.v_proj.weight"), "b": stack1("self_attn.v_proj.bias")},
            "out_proj": {"w": stackT("self_attn.out_proj.weight"), "b": stack1("self_attn.out_proj.bias")},
            "mlp_ln": {
                "scale": stack1("final_layer_norm.weight"),
                "bias": stack1("final_layer_norm.bias"),
            },
            "fc1": {"w": stackT("fc1.weight"), "b": stack1("fc1.bias")},
            "fc2": {"w": stackT("fc2.weight"), "b": stack1("fc2.bias")},
        },
        "ln_post": {"scale": get("layer_norm.weight"), "bias": get("layer_norm.bias")},
    }
    return params


# ---------------------------------------------------------------------------
# Directory loading (local HF checkpoints)
# ---------------------------------------------------------------------------

def _load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    sd: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for f in files:
        sd.update(load_file(os.path.join(path, f)))
    return sd


def load_llama(path: str, dtype="bfloat16") -> tuple[dict, LlamaConfig]:
    """Load a local HF Llama checkpoint dir -> (params, config)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = LlamaConfig.from_hf_config(json.load(f))
    sd = _load_safetensors_dir(path)
    return llama_params_from_state_dict(sd, cfg, dtype), cfg


def load_whisper_encoder(path: str, dtype="bfloat16") -> tuple[dict, WhisperConfig]:
    """Load a local HF Whisper checkpoint dir -> (encoder params, config)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = WhisperConfig.from_hf_config(json.load(f))
    sd = _load_safetensors_dir(path)
    return whisper_encoder_params_from_state_dict(sd, cfg, dtype), cfg
