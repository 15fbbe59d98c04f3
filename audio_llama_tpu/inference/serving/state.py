"""Host-side serving dataclasses + weight-layout checks (split out of
the engine: see serving/__init__.py for the architecture overview)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class _Row:
    """Host-side bookkeeping for one pool row."""
    rid: int = -1
    budget: int = 0
    emitted: List[int] = field(default_factory=list)
    free: bool = True
    staging: bool = False  # reserved for a chunked prefill in progress


@dataclass
class _Staging:
    """A chunked-prefill admission in progress (prefill_chunk_tokens):
    the staging cache fills piece by piece across scheduling rounds while
    the pool keeps decoding; on the last piece it splices like any
    admission."""
    req: "_Pending"
    cache: object  # staging KVCache [L, 1, Hkv, comb_b, hd]
    embeds: object  # combined prompt embeds [1, Pb, D] (device)
    emask: object  # [1, Pb] int32 (device)
    total: int  # real slots STAGED here (suffix only for prefix admissions)
    written: int = 0  # slots appended so far
    tok0: object = None  # first sampled token (set by the last piece)
    embeds_bucket: int = 0  # TEXT bucket (draft prefill at completion)
    base: int = 0  # prefix real length (pieces append at base + i*c)
    d_pcache: object = None  # draft prefix slab (spec pools; captured at
    d_plen: int = 0  # staging start so eviction mid-stage is harmless)


@dataclass
class _Pending:
    rid: int
    input_ids: np.ndarray  # [T] int32
    audio_features: Optional[np.ndarray]  # [n_mels, F] or None
    max_new_tokens: int
    prefix: Optional[int] = None  # registered-prefix handle
    # per-request sampling (resolved to engine defaults at submit; ride
    # the programs as ARRAY arguments — scalars per row, so mixed
    # greedy/sampled pools share one compiled program)
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    greedy: bool = True


def samp_arrays(reqs) -> dict:
    """Per-request sampling params -> [len(reqs)] arrays (program ARGS:
    one compiled prefill/chunk serves every sampling-config mix)."""
    return {
        "temperature": np.asarray([r.temperature for r in reqs], np.float32),
        "top_p": np.asarray([r.top_p for r in reqs], np.float32),
        "top_k": np.asarray([r.top_k for r in reqs], np.int32),
        "greedy": np.asarray([r.greedy for r in reqs], np.bool_),
    }


@dataclass
class _Prefix:
    """A registered shared prompt prefix: its KV slab (computed once) plus
    the host bookkeeping admission needs. Speculative pools also store the
    draft model's slab over the prefix TEXT (audio stays target-only)."""
    cache: object  # llama KVCache [L, 1, Hkv, cap, hd] (+ scales)
    length: int  # real prompt slots (audio block + text)
    cap: int  # slab timeline (tile-rounded)
    ids: tuple = ()  # prefix TEXT token ids (auto-match key)
    has_audio: bool = False
    d_cache: object = None  # draft KVCache (speculative pools)
    d_length: int = 0  # real draft slots (text tokens)
    d_cap: int = 0


def _check_tp_int4_layout(frozen: dict, tp: int):
    """int4 trees must be pack-after-shard quantized for THIS tp
    (quantize_llama_int4(..., tp=tp, fuse=False) — models/llama_int4.py):
    canonical packing pairs output column j with j+N/2, so a tp shard of
    the packed dim would split the pairs (same check as
    make_tp_generate, inference/generate.py:241-271)."""
    lyr = frozen["llama"]["layers"]
    if isinstance(lyr.get("qkv_proj"), dict):
        raise ValueError(
            "fused int4 tree (quantize_llama_int4 fuse=True) is tp=1 "
            f"only; quantize with tp={tp}, fuse=False for tensor-parallel "
            "serving"
        )
    w = lyr.get("q_proj")
    if not (isinstance(w, dict) and "w_p" in w):
        return
    p = w["w_p"]
    if p.ndim != 4 or p.shape[2] != tp:
        got = p.shape[2] if p.ndim == 4 else 1
        raise ValueError(
            f"tensor-parallel serving (tp={tp}) needs an int4 tree "
            f"quantized with quantize_llama_int4(..., tp={tp}); this one "
            f"was packed for tp={got}"
        )
