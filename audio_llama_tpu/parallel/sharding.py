"""Partition specs for every pytree in the framework.

Megatron-style tensor parallelism over the 'tp' axis:
  column-parallel (shard the OUT dim):  q/k/v/gate/up (llama), q/k/v/fc1
    (whisper), lm_head — and the matching LoRA `b` factors;
  row-parallel (shard the IN dim):      o_proj/down (llama), out_proj/fc2
    (whisper) — and the LoRA `a` factor of down_proj.
XLA/GSPMD derives the all-reduce after each row-parallel matmul from these
annotations; nothing is hand-written.

The 'fsdp' axis (optional) additionally shards the non-tp weight dim, so with
fsdp>1 parameters are stored 2D-sharded and all-gathered on use (ZeRO-3
style); the batch axis is sharded over dp×fsdp jointly.

All functions build spec pytrees *structurally from a template pytree* via
tree_map_with_path, so optional leaves (untied lm_head, missing k_proj bias,
disabled LoRA) never desync the spec tree from the param tree.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Linears whose OUT dim is tp-sharded (column parallel) / IN dim (row parallel).
_COL = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "fc1"}
_ROW = {"o_proj", "down_proj", "out_proj", "fc2"}


def _path_names(path) -> list[str]:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
    return names


def _module_of(names: list[str]) -> Optional[str]:
    for n in names:
        if n in _COL or n in _ROW:
            return n
    return None


def _frozen_leaf_spec(path, leaf) -> P:
    names = _path_names(path)
    ndim = getattr(leaf, "ndim", None) or len(getattr(leaf, "shape", ()))
    mod = _module_of(names)
    last = names[-1] if names else ""

    if last == "weight" and "embed" in names:  # [V, D] (bf16 or int8)
        return P(None, "fsdp")
    if "lm_head" in names:
        if ndim == 1:  # int8 per-vocab-column scales [V]
            return P("tp")
        return P("fsdp", "tp")  # [D, V] (w or w_q)
    if "pos_embed" in names or "conv1" in names or "conv2" in names:
        return P()
    # int4 (W4A16) leaves — models/llama_int4.py pack-after-shard layout:
    # COL w_p [L, K, tp, N/(2tp)] shards the block axis; ROW w_p [L, K, N/2]
    # shards the contraction dim (packing pairs only out columns). The 3-D
    # group scales w_s [L, K/g, N] follow the same role. A COL w_p that is
    # still 3-D was packed tp=1 (canonical) and cannot be column-sharded —
    # replicate it (make_tp_generate rejects that tree anyway).
    if last == "w_p":
        if mod in _COL:
            return P(None, None, "tp", None) if ndim == 4 else P()
        if mod in _ROW:
            return P(None, "tp", None)
    if last == "w_s" and ndim == 3 and mod is not None:
        return P(None, None, "tp") if mod in _COL else P(None, "tp", None)
    if last == "w_r" and mod is not None:
        # int4 per-input-row equalizer [L, K] (llama_int4 smooth=True):
        # row-parallel linears shard the contraction dim K; column-parallel
        # inputs are replicated, so w_r replicates with them
        return P(None, "tp") if mod in _ROW else P()
    if mod in _COL:
        if ndim == 3:  # stacked weight [L, in, out] (w or int8 w_q)
            return P(None, "fsdp", "tp")
        if ndim == 2 and last in ("b", "bias", "w_s"):
            # stacked bias [L, out] / int8 per-out-channel scales [L, out]:
            # both ride the column shards
            return P(None, "tp")
        return P()
    if mod in _ROW:
        if ndim == 3:  # stacked weight [L, in, out] — in is the sharded dim
            return P(None, "tp", "fsdp")
        # row-parallel bias adds post-reduce and int8 w_s is per-OUT-channel
        # (psum(partial)*w_s == psum(partial*w_s)): replicate both
        return P()
    return P()  # norms, scalars


def llama_specs(params: dict) -> dict:
    """Spec tree matching a llama param tree (models/llama.py layout)."""
    return jax.tree_util.tree_map_with_path(_frozen_leaf_spec, params)


def whisper_specs(params: dict) -> dict:
    """Spec tree matching a whisper-encoder param tree (models/whisper.py)."""
    return jax.tree_util.tree_map_with_path(_frozen_leaf_spec, params)


def frozen_specs(frozen: dict) -> dict:
    """Spec tree for the {'llama': ..., 'whisper': ...} frozen bundle."""
    return jax.tree_util.tree_map_with_path(_frozen_leaf_spec, frozen)


def _trainable_leaf_spec(path, leaf) -> P:
    names = _path_names(path)
    ndim = getattr(leaf, "ndim", None) or len(getattr(leaf, "shape", ()))
    mod = _module_of(names)
    last = names[-1] if names else ""
    if "lora" in names and mod is not None and ndim == 3:
        # Match the frozen linear's output sharding so the delta adds with no
        # resharding: column-parallel targets shard b's out dim; the row-
        # parallel target (down_proj) shards a's in dim.
        if mod in _COL and last == "b":  # [L, r, out]
            return P(None, None, "tp")
        if mod in _ROW and last == "a":  # [L, in, r]
            return P(None, "tp", None)
    # Projector + everything else: replicated (≤ a few M params).
    return P()


def trainable_specs(trainable: dict) -> dict:
    return jax.tree_util.tree_map_with_path(_trainable_leaf_spec, trainable)


def batch_specs(batch: Any, accum: bool = False, seq_axis: Optional[str] = None) -> Any:
    """Batch leaves shard their batch axis over dp×fsdp.

    Leaves are [B, ...] (or [A, B, ...] microbatch-stacked when accum=True).

    seq_axis (e.g. 'sp'): additionally shard the TOKEN axis (the last dim of
    input_ids / attention_mask / labels) for sequence-parallel training —
    llama causal attention then runs as a ppermute ring
    (parallel/ring_attention.py via ops/partitioning.py). Audio waveforms
    keep batch-only sharding (mel framing crosses sample-chunk boundaries;
    the spliced sequence is resharded by GSPMD inside the step).
    """
    axis0 = ("dp", "fsdp")
    token_fields = {"input_ids", "attention_mask", "labels"}

    def spec(leaf, field: Optional[str] = None):
        ndim = getattr(leaf, "ndim", None) or len(getattr(leaf, "shape", ()))
        lead = (None,) if accum else ()
        rest = [None] * (ndim - len(lead) - 1)
        if seq_axis and field in token_fields and rest:
            rest[-1] = seq_axis
        return P(*lead, axis0, *rest)

    if hasattr(batch, "_fields"):  # AudioLLMBatch and friends
        return type(batch)(*(
            None if getattr(batch, f) is None else spec(getattr(batch, f), f)
            for f in batch._fields
        ))
    return jax.tree_util.tree_map(spec, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _to_shardings(mesh: Mesh, specs):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def frozen_shardings(mesh: Mesh, frozen: dict):
    return _to_shardings(mesh, frozen_specs(frozen))


def trainable_shardings(mesh: Mesh, trainable: dict):
    return _to_shardings(mesh, trainable_specs(trainable))


def batch_shardings(mesh: Mesh, batch, accum: bool = False,
                    seq_axis: Optional[str] = None):
    return _to_shardings(mesh, batch_specs(batch, accum, seq_axis))


def shard_frozen(mesh: Mesh, frozen: dict) -> dict:
    """Device-put the frozen bundle with its tp/fsdp layout."""
    sh = frozen_shardings(mesh, frozen)
    return jax.tree_util.tree_map(jax.device_put, frozen, sh)


def shard_frozen_for_generation(mesh: Mesh, frozen: dict) -> dict:
    """Placement for make_tp_generate: llama tp-sharded per the Megatron
    specs, whisper REPLICATED (generation's shard_map keeps the encoder
    replicated; plain shard_frozen would tp-shard it and force an all-gather
    per call)."""
    llama_sh = _to_shardings(mesh, llama_specs(frozen["llama"]))
    out = {
        "llama": jax.tree_util.tree_map(jax.device_put, frozen["llama"], llama_sh),
        "whisper": jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(mesh)), frozen["whisper"]
        ),
    }
    return out


def shard_trainable(mesh: Mesh, trainable: dict) -> dict:
    sh = trainable_shardings(mesh, trainable)
    return jax.tree_util.tree_map(jax.device_put, trainable, sh)
