"""Continuous-batching serving engine package.

Split by concern (round-4 refactor; the 63-test serving matrix pins
zero behavior change):
  engine.py    ServingEngine: lifecycle, submit/run/step_chunk, harvest
  admission.py bucketed/batched/prefix-suffix prefill + pool splice
  staging.py   chunked prefill (prefill_chunk_tokens)
  prefix.py    prefix KV caching (register/auto-match/evict)
  decode.py    jitted decode chunks (plain + speculative)
  sharding.py  dp/tp PartitionSpecs + shard_map wrappers
  state.py     host-side dataclasses + layout checks

Public surface: ServingEngine (import path unchanged —
audio_llama_tpu.inference.serving.ServingEngine).
"""

from .engine import ServingEngine
from .state import _check_tp_int4_layout

__all__ = ["ServingEngine", "_check_tp_int4_layout"]
