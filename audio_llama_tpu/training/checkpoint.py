"""Checkpointing: trainable-only state, optimizer, schedule position, config.

Mirrors the reference's save_checkpoint layout (src/train.py:102-131): one
directory per checkpoint (`checkpoint-{step}`, `final_checkpoint`, `best_model`)
holding the projector+LoRA weights, optimizer state, step/epoch, and the run
config — base models are never saved. Adds what the reference lacks
(SURVEY.md §5): an actual RESUME path (--resume_from) restoring optimizer +
step, and a stable single-file msgpack format (flax.serialization) instead of
torch.save pickles.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..config import AudioLLMConfig

CKPT_FILE = "checkpoint.msgpack"
CONFIG_FILE = "config.json"


def save_checkpoint(
    out_dir: str,
    *,
    trainable: dict,
    opt_state: Any,
    step: int,
    epoch: int,
    model_cfg: AudioLLMConfig,
    args: Optional[dict] = None,
    dataset_config: Optional[dict] = None,
    final: bool = False,
    best: bool = False,
) -> str:
    """Write a checkpoint directory; returns its path."""
    if best:
        name = "best_model"
    elif final:
        name = "final_checkpoint"
    else:
        name = f"checkpoint-{step}"
    path = os.path.join(out_dir, name)
    os.makedirs(path, exist_ok=True)

    state = {
        "model": {"trainable": jax.tree.map(np.asarray, trainable)},
        "optimizer": jax.tree.map(np.asarray, opt_state),
        "step": step,
        "epoch": epoch,
    }
    with open(os.path.join(path, CKPT_FILE), "wb") as f:
        f.write(serialization.to_bytes(state))
    meta = {
        "model_config": model_cfg.to_dict(),
        "args": args or {},
        "dataset_config": dataset_config or {},
        "step": step,
        "epoch": epoch,
    }
    with open(os.path.join(path, CONFIG_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return path


TORCH_CKPT_FILE = "checkpoint.pt"


def _resolve_ckpt_file(path: str) -> str:
    if os.path.isdir(path):
        ours = os.path.join(path, CKPT_FILE)
        theirs = os.path.join(path, TORCH_CKPT_FILE)
        # A reference-produced checkpoint dir holds checkpoint.pt only.
        if not os.path.exists(ours) and os.path.exists(theirs):
            return theirs
        return ours
    return path


def _is_torch_checkpoint(file_path: str) -> bool:
    if file_path.endswith(".pt") or file_path.endswith(".pth"):
        return True
    try:
        with open(file_path, "rb") as f:
            magic = f.read(4)
    except OSError:
        return False
    # torch.save zip container ("PK\x03\x04") or legacy pickle protocol-2+
    # ("\x80\x02".."\x80\x05"); msgpack maps never start with either.
    return magic[:2] == b"PK" or (len(magic) >= 2 and magic[0] == 0x80)


def load_metadata(path: str) -> dict:
    d = path if os.path.isdir(path) else os.path.dirname(path)
    cfg_path = os.path.join(d, CONFIG_FILE)
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            return json.load(f)
    return {}


def load_checkpoint(
    path: str,
    *,
    trainable_template: dict,
    opt_state_template: Any = None,
) -> Tuple[dict, Any, int, int]:
    """Restore (trainable, opt_state, step, epoch) from a checkpoint dir/file.

    Templates supply the pytree structure (msgpack stores leaves only).
    opt_state restore is skipped when no template is given (inference use).
    Handles both our layout ({'model': {'trainable': ...}}) and a bare
    {'trainable': ...} dump — the analog of the reference's two checkpoint
    layout variants (reference src/inference.py:57-68).
    """
    file_path = _resolve_ckpt_file(path)
    if _is_torch_checkpoint(file_path):
        # Reference-framework torch checkpoint (projector + LoRA state
        # dicts): cross-framework import path.
        trainable, step, epoch = load_reference_checkpoint(
            file_path, trainable_template=trainable_template
        )
        return trainable, None, step, epoch

    with open(file_path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    if isinstance(raw, dict) and "model" in raw:
        trainable = serialization.from_state_dict(
            trainable_template, raw["model"]["trainable"]
        )
        opt_state = None
        if opt_state_template is not None and raw.get("optimizer") is not None:
            opt_state = serialization.from_state_dict(
                opt_state_template, raw["optimizer"]
            )
        return trainable, opt_state, int(raw["step"]), int(raw["epoch"])
    # bare-trainable variant
    trainable = serialization.from_state_dict(trainable_template, raw)
    return trainable, None, 0, 0


def _lora_target_and_layer(module_name: str):
    """Parse a reference LoRA module path like
    'model.layers.17.self_attn.q_proj' -> ('q_proj', 17)."""
    parts = module_name.split(".")
    target = parts[-1]
    for i, p in enumerate(parts):
        if p == "layers" and i + 1 < len(parts) and parts[i + 1].isdigit():
            return target, int(parts[i + 1])
    return target, None


def load_reference_checkpoint(
    path: str, *, trainable_template: dict
) -> Tuple[dict, int, int]:
    """Import a reference-framework (PyTorch) checkpoint into our trainable
    pytree. Returns (trainable, step, epoch).

    The reference writes `{model: {projector: state_dict, lora_layers:
    {module_name: state_dict}}, optimizer, scheduler, step, epoch, ...}`
    (reference src/train.py:102-131) and its inference loader also accepts
    the bare `{projector: ..., lora_layers: ...}` layout (reference
    src/inference.py:53-68). Weight-layout mapping:

      projector  layers.0.{weight,bias} -> fc1.{w,b}   (Linear W transposed)
                 layers.2.{weight,bias} -> fc2.{w,b}
                 layers.3.{weight,bias} -> ln.{scale,bias}
      lora       lora_A [r, in]  -> a[L, in, r]  (stacked, transposed)
                 lora_B [out, r] -> b[L, r, out]

    Reference LoRA module names carry the decoder layer index
    ('model.layers.{i}.self_attn.q_proj'); targets/layers absent from the
    checkpoint keep the template values (the reference zero-inits lora_A, so
    a fresh template branch is an exact zero-delta match).
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    step = int(raw.get("step", 0)) if isinstance(raw, dict) else 0
    epoch = int(raw.get("epoch", 0)) if isinstance(raw, dict) else 0
    model = raw.get("model", raw)
    if not isinstance(model, dict) or "projector" not in model:
        raise ValueError(
            f"{path}: not a recognized reference checkpoint (expected "
            "'model.projector' or top-level 'projector')"
        )

    def npy(t):
        return np.asarray(t.detach().cpu().float().numpy())

    out = jax.tree.map(np.asarray, trainable_template)

    proj_sd = model["projector"]
    proj = out["projector"]
    mapping = [
        ("layers.0.weight", proj["fc1"], "w", True),
        ("layers.0.bias", proj["fc1"], "b", False),
        ("layers.2.weight", proj["fc2"], "w", True),
        ("layers.2.bias", proj["fc2"], "b", False),
        ("layers.3.weight", proj["ln"], "scale", False),
        ("layers.3.bias", proj["ln"], "bias", False),
    ]
    for src, branch, key, transpose in mapping:
        if src not in proj_sd:
            raise ValueError(f"{path}: projector state dict missing {src!r}")
        w = npy(proj_sd[src])
        if transpose:
            w = w.T  # torch Linear stores [out, in]; we store [in, out]
        tmpl = branch[key]
        if w.shape != tmpl.shape:
            raise ValueError(
                f"{path}: projector {src} shape {w.shape} != ours {tmpl.shape}"
            )
        branch[key] = w.astype(tmpl.dtype)

    lora_sd = model.get("lora_layers") or {}
    if lora_sd and "lora" not in out:
        raise ValueError(
            f"{path} carries LoRA weights but this model was built without "
            "LoRA (cfg.lora is None)"
        )
    for module_name, sd in lora_sd.items():
        target, layer = _lora_target_and_layer(module_name)
        if layer is None:
            raise ValueError(
                f"{path}: cannot parse decoder layer index from LoRA module "
                f"name {module_name!r}"
            )
        if target not in out["lora"]["layers"]:
            import logging

            logging.getLogger(__name__).warning(
                "reference checkpoint LoRA target %r not in our target set; "
                "skipping %s", target, module_name,
            )
            continue
        br = out["lora"]["layers"][target]
        a_t, b_t = npy(sd["lora_A"]).T, npy(sd["lora_B"]).T  # [in,r], [r,out]
        L = br["a"].shape[0]
        if not (0 <= layer < L):
            raise ValueError(
                f"{path}: LoRA layer index {layer} out of range (L={L})"
            )
        if a_t.shape != br["a"].shape[1:] or b_t.shape != br["b"].shape[1:]:
            raise ValueError(
                f"{path}: LoRA {module_name} shapes {a_t.shape}/{b_t.shape} "
                f"!= ours {br['a'].shape[1:]}/{br['b'].shape[1:]} — rank or "
                "model dims mismatch"
            )
        # np.asarray over jax arrays can give read-only views: force
        # writable copies before filling the stacked per-layer slot.
        if not isinstance(br["a"], np.ndarray) or not br["a"].flags.writeable:
            br["a"] = np.array(br["a"])
        if not isinstance(br["b"], np.ndarray) or not br["b"].flags.writeable:
            br["b"] = np.array(br["b"])
        br["a"][layer] = a_t.astype(br["a"].dtype)
        br["b"][layer] = b_t.astype(br["b"].dtype)
    return out, step, epoch
