"""Metrics/profiling helpers: JSONL + TensorBoard sinks, throughput windows,
timed sections, profiler trace capture."""

import json
import os

import pytest

from audio_llama_tpu.training.metrics import MetricsWriter, Throughput, setup_logging
from audio_llama_tpu.training.profiling import timed_section, trace


def test_metrics_writer_jsonl_and_tensorboard(tmp_path):
    out = str(tmp_path)
    w = MetricsWriter(out, use_tensorboard=True, use_wandb=False)
    w.log(1, {"train/loss": 2.5, "train/lr": 1e-4})
    w.log(2, {"train/loss": 2.25})
    w.close()
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert lines[0]["step"] == 1 and lines[0]["train/loss"] == 2.5
    assert lines[1]["step"] == 2
    # TensorBoard event files written when torch is present
    logs = os.path.join(out, "logs")
    if os.path.isdir(logs):
        assert any("tfevents" in f for f in os.listdir(logs))


def test_metrics_writer_wandb_gated(tmp_path):
    # use_wandb=True must never crash when wandb can't initialize (the
    # reference crashed at src/train.py:331 with wandb off).
    w = MetricsWriter(str(tmp_path), use_tensorboard=False, use_wandb=True,
                      wandb_project="nonexistent-offline")
    w.log(1, {"x": 1.0})
    w.close()


def test_throughput_window():
    t = Throughput(flops_per_step=1e12, peak_flops=2e12)
    t.update(steps=2, tokens=100, audio_sec=4.0)
    win = t.window()
    assert win["tokens_per_sec"] > 0
    assert win["audio_sec_per_sec"] > 0
    assert 0 < win["mfu"]  # 2 steps * 1e12 / dt / 2e12
    # window resets
    win2 = t.window()
    assert win2["tokens_per_sec"] == 0


def test_timed_section():
    with timed_section("unit") as t:
        sum(range(1000))
    assert t.seconds is not None and t.seconds >= 0


def test_profiler_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    with trace(str(tmp_path)):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    # xplane dump exists
    found = []
    for root, _, files in os.walk(str(tmp_path)):
        found += [f for f in files if "xplane" in f or "trace" in f]
    assert found, "no trace artifacts written"


def test_setup_logging_idempotent(tmp_path):
    lg = setup_logging(str(tmp_path))
    n = len(lg.root.handlers) if hasattr(lg, "root") else None
    setup_logging(str(tmp_path))  # second call must not duplicate handlers
    import logging

    root = logging.getLogger()
    fhs = [h for h in root.handlers if isinstance(h, logging.FileHandler)]
    paths = [h.baseFilename for h in fhs]
    assert len(paths) == len(set(paths))
