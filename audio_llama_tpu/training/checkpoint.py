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


def _resolve_ckpt_file(path: str) -> str:
    if os.path.isdir(path):
        return os.path.join(path, CKPT_FILE)
    return path


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
    with open(_resolve_ckpt_file(path), "rb") as f:
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
