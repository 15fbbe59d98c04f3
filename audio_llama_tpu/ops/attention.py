"""Attention core (XLA path).

Design notes (TPU-first):
- Layout is [B, T, H, hd] activations; GQA is computed by grouping query heads
  over shared KV heads with einsum — KV is never materially repeated, which
  keeps HBM traffic at the GQA-reduced size and lets XLA tile the contraction
  straight onto the MXU.
- Softmax runs in f32 regardless of the compute dtype (bf16 activations in,
  bf16 out) — this is the standard TPU mixed-precision recipe.
- Masks are additive f32 biases ([B, 1, T_q, T_k] or broadcastable); builders
  below cover causal, padding, and causal+prefix cases.

A fused Pallas flash-attention kernel lives in ops/flash_attention.py; this
module is the reference XLA implementation it is tested against (and the
fallback on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def mha(
    q: jnp.ndarray,  # [B, Tq, Hq, hd]
    k: jnp.ndarray,  # [B, Tk, Hkv, hd]  (or [B, Hkv, Tk, hd] if kv_head_major)
    v: jnp.ndarray,  # same layout as k
    bias: jnp.ndarray | None = None,  # additive, broadcastable to [B, Hq, Tq, Tk]
    scale: float | None = None,
    kv_head_major: bool = False,
) -> jnp.ndarray:
    """Grouped-query attention. Returns [B, Tq, Hq, hd] in q.dtype.

    kv_head_major=True accepts K/V in the cache layout [B, Hkv, Tk, hd]
    (contiguous per-head timelines) without transposing them first.
    """
    B, Tq, Hq, hd = q.shape
    if kv_head_major:
        _, Hkv, Tk, _ = k.shape
    else:
        _, Tk, Hkv, _ = k.shape
    assert Hq % Hkv == 0, (Hq, Hkv)
    G = Hq // Hkv
    if scale is None:
        scale = hd ** -0.5

    qg = q.reshape(B, Tq, Hkv, G, hd)
    # logits [B, Hkv, G, Tq, Tk], accumulated in f32 on the MXU.
    kv_sub = "bhkd" if kv_head_major else "bkhd"
    logits = jnp.einsum(
        f"bqhgd,{kv_sub}->bhgqk", qg, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        bias = bias.astype(jnp.float32)
        if bias.ndim == 4:  # [B, H|1, Tq, Tk] -> group layout
            Hb = bias.shape[1]
            if Hb == 1:
                bias = bias[:, :, None, :, :]  # broadcast over (Hkv, G)
            else:
                bias = bias.reshape(B, Hkv, G, Tq, Tk)
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum(f"bhgqk,{kv_sub}->bqhgd", probs, v)
    return out.reshape(B, Tq, Hq, hd)


def sp_partial_attention(
    q: jnp.ndarray,  # [B, Tq, Hq, hd]
    k_local: jnp.ndarray,  # [B, Hkv, S, hd] — this shard's timeline slab
    v_local: jnp.ndarray,
    valid_local: jnp.ndarray,  # [B, S] 1 = this local slot is attendable
    scale: float,
    axis_name: str,
) -> jnp.ndarray:
    """Timeline-sharded decode attention (docs/LONG_CONTEXT.md step 3).

    Runs INSIDE shard_map over `axis_name`: each shard owns an S-slot window
    of the KV-cache timeline, computes its partial flash statistics
    (rowmax m, denominator l, numerator acc) over its slab, and the exact
    global softmax is assembled with one pmax + one psum pair — the same
    (m, l, o) merge the online-softmax kernels use, here across chips.
    f32 statistics throughout (softmax numerics policy; no bounded shift).

    A shard whose slots are ALL invalid (e.g. the timeline hasn't reached it
    yet) contributes l = 0, acc = 0 and a clamped m, so it is a no-op in the
    merge. Returns [B, Tq, Hq, hd] in q.dtype, identical on every shard.

    Reference analog: none (reference decode is single-GPU HF generate,
    src/models/allm.py:326-331).
    """
    from jax import lax

    B, Tq, Hq, hd = q.shape
    _, Hkv, S, _ = k_local.shape
    G = Hq // Hkv
    qg = q.reshape(B, Tq, Hkv, G, hd)
    s = jnp.einsum(
        "bqhgd,bhkd->bhgqk", qg, k_local, preferred_element_type=jnp.float32
    ) * scale  # [B, Hkv, G, Tq, S]
    vmask = (valid_local > 0)[:, None, None, None, :]
    s = jnp.where(vmask, s, NEG_INF)
    # clamp the all-invalid rowmax so exp(s - m) stays finite (the masked
    # lanes then exp to ~0 and the explicit where() zeroes them exactly)
    m_l = jnp.maximum(jnp.max(s, axis=-1), NEG_INF * 0.5)  # [B, Hkv, G, Tq]
    p = jnp.where(vmask, jnp.exp(s - m_l[..., None]), 0.0)
    l_l = jnp.sum(p, axis=-1)  # [B, Hkv, G, Tq]
    acc_l = jnp.einsum(
        "bhgqk,bhkd->bhgqd", p.astype(v_local.dtype), v_local,
        preferred_element_type=jnp.float32,
    )  # [B, Hkv, G, Tq, hd]
    m_g = lax.pmax(m_l, axis_name)
    corr = jnp.exp(m_l - m_g)
    l_g = lax.psum(l_l * corr, axis_name)
    acc_g = lax.psum(acc_l * corr[..., None], axis_name)
    out = acc_g / jnp.maximum(l_g, 1e-30)[..., None]
    out = jnp.moveaxis(out, 3, 1)  # [B, Tq, Hkv, G, hd]
    return out.reshape(B, Tq, Hq, hd).astype(q.dtype)


def merge_partial_stats(m, l, acc, axis_name: str, out_dtype=None):
    """Assemble the exact global softmax from per-shard unnormalized flash
    statistics (rowmax m [...], denominator l [...], numerator acc [..., hd])
    with one pmax + one psum pair over `axis_name` — the cross-chip half of
    the timeline-sharded decode kernel (decode_attention_db_stats).

    A shard whose slab was fully invalid contributes (clamped m, 0, 0) and
    drops out via corr -> 0. f32 throughout (softmax numerics policy)."""
    from jax import lax

    m_g = lax.pmax(m, axis_name)
    corr = jnp.exp(m - m_g)
    l_g = lax.psum(l * corr, axis_name)
    acc_g = lax.psum(acc * corr[..., None], axis_name)
    out = acc_g / jnp.maximum(l_g, 1e-30)[..., None]
    return out if out_dtype is None else out.astype(out_dtype)


def causal_bias(Tq: int, Tk: int, offset: int = 0) -> jnp.ndarray:
    """[1, 1, Tq, Tk] causal additive bias. Query i attends keys j <= i + offset.

    offset is the absolute position of query 0 in the key timeline (used for
    KV-cached decode where Tq << Tk).
    """
    qpos = jnp.arange(Tq)[:, None] + offset
    kpos = jnp.arange(Tk)[None, :]
    allowed = kpos <= qpos
    return jnp.where(allowed, 0.0, NEG_INF)[None, None].astype(jnp.float32)


def padding_bias(mask: jnp.ndarray) -> jnp.ndarray:
    """mask [B, Tk] (1 = attend) -> additive bias [B, 1, 1, Tk]."""
    return jnp.where(mask[:, None, None, :] != 0, 0.0, NEG_INF).astype(jnp.float32)


def combine_bias(*biases: jnp.ndarray | None) -> jnp.ndarray | None:
    out = None
    for b in biases:
        if b is None:
            continue
        out = b if out is None else out + b
    if out is None:
        return None
    # Clamp so stacked NEG_INFs do not overflow to -inf (softmax of all -inf
    # rows would produce NaN; clamped values still underflow to exactly 0 prob).
    return jnp.maximum(out, NEG_INF)
