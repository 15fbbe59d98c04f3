"""Flash attention for the full-sequence (non-cached) paths.

The XLA attention in ops/attention.py materializes f32 logits
[B, H, T, T] — at whisper-encoder scale (B8, H20, T1500) that is ~1.4 GB of
HBM traffic per layer, which dominates the encoder's runtime. This wraps the
TPU Pallas flash-attention kernel (jax.experimental.pallas.ops.tpu.
flash_attention: online-softmax tiling, custom VJP for training) behind the
framework's [B, T, H, hd] layout with:

  - GQA: KV heads repeated to Hq on entry (KV tensors are tiny next to the
    avoided logits; the kernel requires equal head counts);
  - sequence padding to a multiple of the tile size (1500 -> 1536,
    2014 -> 2048), masked via SegmentIds so padded keys are invisible to real
    queries — this also carries the user's padding mask;
  - f32 softmax statistics inside the kernel, bf16 in/out (same mixed
    precision recipe as the XLA path).

Used by whisper.encode (non-causal), llama_forward's full-sequence training
path (causal + padding), and generation PREFILL into a fresh KV cache
(assume_fresh_cache). Single-token cached decode uses the fused Pallas
kernel in ops/decode_attention.py (or the XLA path off-TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    SegmentIds,
    flash_attention as _flash,
)

_TILE = 512  # sequence pad granularity; all block sizes divide it


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _block_sizes(t_pad: int) -> BlockSizes:
    b = min(_TILE, t_pad)
    return BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b, block_q_dkv=b,
        block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
    )


def flash_mha(
    q: jnp.ndarray,  # [B, T, Hq, hd]
    k: jnp.ndarray,  # [B, T, Hkv, hd]
    v: jnp.ndarray,  # [B, T, Hkv, hd]
    *,
    mask: Optional[jnp.ndarray] = None,  # [B, T] 1 = attend (padding mask)
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Self-attention over a full sequence; returns [B, T, Hq, hd] in q.dtype.

    Semantically equals ops.attention.mha with causal and/or padding biases
    (up to flash's online-softmax reduction order). Padded-query rows return
    garbage — callers mask their loss/outputs, as they already must for pad
    tokens.

    Self-wraps in a nested shard_map under an active ops.partitioning
    context (batch over dp x fsdp, heads over tp) so the kernel keeps
    working inside GSPMD-sharded programs.
    """
    from . import partitioning as ptn

    ctx = ptn.current()
    if ctx is not None:
        local = functools.partial(_flash_mha_local, causal=causal, scale=scale)
        return ptn.wrap_attention(
            lambda q, k, v, m: local(q, k, v, mask=m), q, k, v, mask
        )
    return _flash_mha_local(q, k, v, mask=mask, causal=causal, scale=scale)


def _flash_mha_local(q, k, v, *, mask, causal, scale):
    B, T, Hq, hd = q.shape
    Hkv = k.shape[2]
    if scale is None:
        scale = hd ** -0.5
    if Hq != Hkv:
        g = Hq // Hkv
        k = jnp.repeat(k, g, axis=2)
        v = jnp.repeat(v, g, axis=2)

    t_pad = _round_up(T, _TILE)
    pad = t_pad - T
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))

    if mask is None and pad == 0:
        seg = None
    else:
        base = (
            mask.astype(jnp.int32)
            if mask is not None
            else jnp.ones((B, T), jnp.int32)
        )
        ids = jnp.pad(base, ((0, 0), (0, pad)))  # pads get segment 0
        seg = SegmentIds(q=ids, kv=ids)

    # kernel layout [B, H, T, hd]
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = _flash(
        qt, kt, vt,
        segment_ids=seg,
        causal=causal,
        sm_scale=scale,
        block_sizes=_block_sizes(t_pad),
    )
    out = jnp.swapaxes(out, 1, 2)  # [B, T_pad, Hq, hd]
    if pad:
        out = out[:, :T]
    return out.astype(q.dtype)


def available() -> bool:
    """Mosaic (TPU) only — interpret mode covers tests on CPU; GPU uses XLA."""
    try:
        if jax.default_backend() in ("tpu", "axon"):
            return True
        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False
