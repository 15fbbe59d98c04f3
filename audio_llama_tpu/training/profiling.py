"""Profiling / tracing utilities (SURVEY.md §5: the reference has NO tracing
beyond tqdm bars; the TPU-native equivalent is jax.profiler traces + timed
sections).

Usage:
    with trace("gs://bucket/traces" or "/tmp/trace"):   # xplane dump
        step(...)

    with timed_section("prefill") as t:                  # wall-time section
        out = prefill(...)
        jax.block_until_ready(out)
    print(t.seconds)

The trainer exposes --profile_dir N:M to trace steps N..M of a run.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

logger = logging.getLogger("audio_llama_tpu")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace -> xplane protos under log_dir (TensorBoard-viewable)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class _Timer:
    def __init__(self, name: str):
        self.name = name
        self.seconds: Optional[float] = None


@contextlib.contextmanager
def timed_section(name: str, sync: bool = False) -> Iterator[_Timer]:
    """Wall-clock a section. sync=True inserts an effects barrier at exit —
    remember that on some transports only value fetches truly synchronize
    (see .claude/skills/verify/SKILL.md), so prefer timing around a scalar
    fetch for accurate device numbers."""
    t = _Timer(name)
    t0 = time.perf_counter()
    try:
        yield t
    finally:
        if sync:
            import jax

            jax.effects_barrier()
        t.seconds = time.perf_counter() - t0
        logger.info("section %s: %.4fs", name, t.seconds)
