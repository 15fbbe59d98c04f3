"""Observability: file/stderr logging, JSONL scalars, TensorBoard, wandb.

The reference logs through 4 channels (SURVEY.md §5): python logging to
training.log + stderr (src/train.py:19-27), TensorBoard scalars
(train.py:313-314, 334-335), wandb behind --use_wandb (train.py:317-323) —
with a bug where wandb.log is called unconditionally at train.py:331 and
crashes when wandb is off. This module reproduces the capability with the
bug fixed (every sink is properly gated) and adds a machine-readable
JSONL scalar stream plus throughput/MFU counters (the BASELINE.json metric).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional

logger = logging.getLogger("audio_llama_tpu")


def setup_logging(output_dir: Optional[str] = None, level=logging.INFO) -> logging.Logger:
    """Root logger -> stderr + {output_dir}/training.log (reference
    src/train.py:19-27)."""
    root = logging.getLogger()
    root.setLevel(level)
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    have_stream = any(
        isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler)
        for h in root.handlers
    )
    if not have_stream:
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(fmt)
        root.addHandler(sh)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        path = os.path.join(output_dir, "training.log")
        if not any(
            isinstance(h, logging.FileHandler) and getattr(h, "baseFilename", "") == os.path.abspath(path)
            for h in root.handlers
        ):
            fh = logging.FileHandler(path)
            fh.setFormatter(fmt)
            root.addHandler(fh)
    return logger


class MetricsWriter:
    """Fan-out scalar writer: JSONL (always) + TensorBoard + wandb (optional)."""

    def __init__(
        self,
        output_dir: str,
        use_tensorboard: bool = True,
        use_wandb: bool = False,
        wandb_project: str = "audio-llm",
        wandb_config: Optional[dict] = None,
    ):
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(output_dir, "logs"))
            except Exception as e:  # TB optional; never take down training
                logger.warning("tensorboard unavailable (%s); skipping", e)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=wandb_project, config=wandb_config or {})
                self._wandb = wandb
            except Exception as e:
                logger.warning("wandb unavailable (%s); continuing without", e)

    def log(self, step: int, scalars: dict):
        rec = {"step": step, "time": time.time(), **scalars}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:  # gated — the reference's crash bug, fixed
            self._wandb.log(scalars, step=step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


class NullWriter:
    """No-op MetricsWriter stand-in for non-coordinator hosts in multi-host
    runs (parallel/distributed.py): only process 0 touches disk/wandb."""

    def log(self, step: int, scalars: dict):
        pass

    def close(self):
        pass


class Throughput:
    """Windowed tokens/sec, audio-sec/sec, and MFU counters."""

    def __init__(self, flops_per_step: float = 0.0, peak_flops: float = 197e12):
        self.flops_per_step = flops_per_step
        self.peak_flops = peak_flops
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._tokens = 0
        self._audio_sec = 0.0

    def update(self, steps: int = 1, tokens: int = 0, audio_sec: float = 0.0):
        self._steps += steps
        self._tokens += tokens
        self._audio_sec += audio_sec

    def window(self) -> dict:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        out = {
            "steps_per_sec": self._steps / dt,
            "tokens_per_sec": self._tokens / dt,
            "audio_sec_per_sec": self._audio_sec / dt,
        }
        if self.flops_per_step:
            out["mfu"] = (self._steps * self.flops_per_step / dt) / self.peak_flops
        self.reset()
        return out
