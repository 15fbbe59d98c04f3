"""Pallas decode-attention kernel: fused KV-cache append + single-token GQA.

The XLA decode path (models/llama.py cached branch) expresses the per-token
cache append as dynamic_update_slice on a scan-carried [L, B, Hkv, max_len,
hd] cache. XLA double-buffers that carry, which (a) reserves 2x the cache's
HBM and (b) copies cache bytes every step. This kernel makes the append +
attention ONE operation whose cache operands are input_output_aliased — the
cache never leaves HBM and only the appended row is written:

  grid (B, Hkv); per invocation (one batch row, one KV head):
    DMA   K/V slab [max_len, hd] HBM -> VMEM          (the unavoidable read)
    patch slab[offset] = new K/V row (VMEM)
    DMA   the 32-row aligned window back to HBM       (the only cache write)
    MXU   logits = q_group @ K^T   [G, max_len] f32
    VPU   masked softmax (valid = slot-causal & padding mask)
    MXU   out = probs @ V          [G, hd]

Layer index and cache offset arrive via scalar prefetch so one compiled
kernel serves every (layer, step). Parity with the XLA path is tested in
interpret mode (tests/test_decode_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    li_ref,      # [1] scalar prefetch: layer index
    off_ref,     # [1] scalar prefetch: cache fill offset
    q_ref,       # [1, 1, G, hd] VMEM
    knew_ref,    # [1, 1, 1, hd] VMEM
    vnew_ref,    # [1, 1, 1, hd] VMEM
    valid_ref,   # [1, 1, max_len] VMEM int32 (1 = attend)
    ck_any,      # [L, B, Hkv, max_len, hd] HBM (aliased with ck_out)
    cv_any,      # [L, B, Hkv, max_len, hd] HBM (aliased with cv_out)
    out_ref,     # [1, 1, G, hd] VMEM
    ck_out,      # aliased cache out (HBM)
    cv_out,      # aliased cache out (HBM)
    k_vmem,      # [max_len, hd] scratch
    v_vmem,      # [max_len, hd] scratch
    sems,        # DMA semaphores (4,)
    *,
    scale: float,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    li = li_ref[0]
    off = off_ref[0]

    cp_k = pltpu.make_async_copy(ck_any.at[li, b, h], k_vmem, sems.at[0])
    cp_v = pltpu.make_async_copy(cv_any.at[li, b, h], v_vmem, sems.at[1])
    cp_k.start()
    cp_v.start()
    cp_k.wait()
    cp_v.wait()

    # Patch the new row into the slab with a masked select (Mosaic cannot
    # lower a dynamic single-row bf16 store), write the patched slab back to
    # scratch, and DMA back ONLY the tile-aligned 8-row window containing the
    # new row (HBM memrefs are (8,128)-tiled; single-row slices don't lower).
    max_len = k_vmem.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (max_len, 1), 0)
    is_new = row == off  # [max_len, 1]
    k_full = jnp.where(is_new, knew_ref[0, 0], k_vmem[:])
    v_full = jnp.where(is_new, vnew_ref[0, 0], v_vmem[:])
    k_vmem[:] = k_full
    v_vmem[:] = v_full
    # clamp so a (buggy) offset past capacity cannot DMA out of bounds;
    # 32-row windows satisfy every dtype's HBM sublane tile (f32 8, bf16 16,
    # int8 32) — KVCache.zeros rounds timelines to 32.
    off_clamped = jnp.minimum(off, k_vmem.shape[0] - 1)
    off_al = pl.multiple_of((off_clamped // 32) * 32, 32)
    wb_k = pltpu.make_async_copy(
        k_vmem.at[pl.ds(off_al, 32), :],
        ck_out.at[li, b, h, pl.ds(off_al, 32), :],
        sems.at[2],
    )
    wb_v = pltpu.make_async_copy(
        v_vmem.at[pl.ds(off_al, 32), :],
        cv_out.at[li, b, h, pl.ds(off_al, 32), :],
        sems.at[3],
    )
    wb_k.start()
    wb_v.start()

    q = q_ref[0, 0]  # [G, hd]
    logits = jax.lax.dot_general(
        q, k_full, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G, max_len]
    logits = logits * scale
    valid = valid_ref[0, 0, :]  # [max_len]
    logits = jnp.where(valid[None, :] > 0, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v_full.dtype), v_full, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G, hd]
    out_ref[0, 0] = out.astype(out_ref.dtype)

    wb_k.wait()
    wb_v.wait()


def decode_attention(
    q: jnp.ndarray,        # [B, Hq, hd] (single new token per row, rope'd)
    k_new: jnp.ndarray,    # [B, Hkv, hd]
    v_new: jnp.ndarray,    # [B, Hkv, hd]
    cache_k: jnp.ndarray,  # [L, B, Hkv, max_len, hd]
    cache_v: jnp.ndarray,  # [L, B, Hkv, max_len, hd]
    layer: jnp.ndarray,    # [] int32
    offset: jnp.ndarray,   # [] int32 — slot to append at
    valid: jnp.ndarray,    # [B, max_len] int32, 1 = attend (incl. new slot)
    scale: float,
    interpret: bool = False,
):
    """Returns (attn [B, Hq, hd], cache_k', cache_v') with the caches updated
    in place (aliased)."""
    L, B, Hkv, max_len, hd = cache_k.shape
    if max_len % 32 != 0:
        raise ValueError(
            f"decode_attention needs max_len % 32 == 0 (got {max_len}); build "
            "caches via KVCache.zeros, which tile-rounds the timeline"
        )
    Hq = q.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec((1, 1, G, hd), lambda b, h, *_: (b, h, 0, 0)),
            # Singleton trailing-block dims must EQUAL their array dims for
            # the TPU tiling rules, hence the [B, Hkv, 1, hd] / [B, 1, S]
            # shapes fed below.
            pl.BlockSpec((1, 1, 1, hd), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, hd), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, max_len), lambda b, h, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, hd), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((max_len, hd), cache_k.dtype),
            pltpu.VMEM((max_len, hd), cache_v.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out, ck, cv = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, G, hd), q.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        # input indices INCLUDE the scalar-prefetch args: (li, off, q, knew,
        # vnew, valid, ck, cv) -> ck=6, cv=7 alias onto outputs 1/2.
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(offset, jnp.int32).reshape(1),
        qg,
        k_new.astype(cache_k.dtype)[:, :, None, :],
        v_new.astype(cache_v.dtype)[:, :, None, :],
        valid.astype(jnp.int32)[:, None, :],
        cache_k,
        cache_v,
    )
    return out.reshape(B, Hq, hd), ck, cv


def _kernel_quantized(
    li_ref, off_ref,
    q_ref,        # [1, 1, G, hd] VMEM (bf16/f32)
    knew_ref,     # [1, 1, 1, hd] VMEM int8
    vnew_ref,     # [1, 1, 1, hd] VMEM int8
    ks_new_ref,   # [1, 1, 1, 1] VMEM f32 (new row's k scale)
    vs_new_ref,   # [1, 1, 1, 1] VMEM f32
    ks_ref,       # [1, 1, 1, max_len] VMEM f32 (this row+head's k scales)
    vs_ref,       # [1, 1, 1, max_len] VMEM f32
    valid_ref,    # [1, 1, max_len] VMEM int32
    ck_any, cv_any,          # [L, B, Hkv, max_len, hd] HBM int8 (aliased)
    out_ref, ck_out, cv_out,
    k_vmem, v_vmem,          # [max_len, hd] int8 scratch
    sems,
    *,
    scale: float,
):
    """int8 variant: per-row scales applied post-matmul (exact). Cache-read
    traffic halves vs bf16."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    li = li_ref[0]
    off = off_ref[0]

    cp_k = pltpu.make_async_copy(ck_any.at[li, b, h], k_vmem, sems.at[0])
    cp_v = pltpu.make_async_copy(cv_any.at[li, b, h], v_vmem, sems.at[1])
    cp_k.start()
    cp_v.start()
    cp_k.wait()
    cp_v.wait()

    max_len = k_vmem.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (max_len, 1), 0)
    is_new = row == off
    k_full = jnp.where(is_new, knew_ref[0, 0], k_vmem[:])
    v_full = jnp.where(is_new, vnew_ref[0, 0], v_vmem[:])
    k_vmem[:] = k_full
    v_vmem[:] = v_full
    # int8 tiling: write back the 32-row aligned window holding the new row
    off_clamped = jnp.minimum(off, max_len - 1)
    off_al = pl.multiple_of((off_clamped // 32) * 32, 32)
    wb_k = pltpu.make_async_copy(
        k_vmem.at[pl.ds(off_al, 32), :],
        ck_out.at[li, b, h, pl.ds(off_al, 32), :], sems.at[2],
    )
    wb_v = pltpu.make_async_copy(
        v_vmem.at[pl.ds(off_al, 32), :],
        cv_out.at[li, b, h, pl.ds(off_al, 32), :], sems.at[3],
    )
    wb_k.start()
    wb_v.start()

    # patched per-row scales (registers only; the scale arrays are updated
    # by the caller outside the kernel)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    is_new_r = row1 == off
    k_s = jnp.where(is_new_r, ks_new_ref[0, 0], ks_ref[0, 0])  # [1, max_len]
    v_s = jnp.where(is_new_r, vs_new_ref[0, 0], vs_ref[0, 0])

    q = q_ref[0, 0]  # [G, hd]
    cdt = q_ref.dtype  # bf16 in production; f32 in parity tests
    logits = jax.lax.dot_general(
        q, k_full.astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G, max_len]
    logits = logits * (k_s * scale)  # fold per-row scale + softmax scale
    valid = valid_ref[0, 0, :]
    logits = jnp.where(valid[None, :] > 0, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    pv = (p * v_s).astype(cdt)  # fold v scales into probabilities
    out = jax.lax.dot_general(
        pv, v_full.astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)

    wb_k.wait()
    wb_v.wait()


def decode_attention_quantized(
    q: jnp.ndarray,          # [B, Hq, hd]
    k_new_q: jnp.ndarray,    # [B, Hkv, hd] int8
    v_new_q: jnp.ndarray,    # [B, Hkv, hd] int8
    cache_k: jnp.ndarray,    # [L, B, Hkv, max_len, hd] int8
    cache_v: jnp.ndarray,
    k_scales: jnp.ndarray,   # [B, Hkv, max_len] f32 (THIS layer's scales)
    v_scales: jnp.ndarray,
    k_new_scale: jnp.ndarray,  # [B, Hkv] f32
    v_new_scale: jnp.ndarray,
    layer: jnp.ndarray,
    offset: jnp.ndarray,
    valid: jnp.ndarray,      # [B, max_len] int32
    scale: float,
    interpret: bool = False,
):
    """int8 cache variant; returns (attn, cache_k', cache_v'). The caller owns
    updating the scale ARRAYS (tiny DUS) — the kernel only patches registers."""
    L, B, Hkv, max_len, hd = cache_k.shape
    if max_len % 32 != 0:
        raise ValueError(
            f"quantized decode needs max_len % 32 == 0 (got {max_len})"
        )
    Hq = q.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec((1, 1, G, hd), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, hd), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, hd), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, max_len), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, max_len), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, max_len), lambda b, h, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, hd), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((max_len, hd), jnp.int8),
            pltpu.VMEM((max_len, hd), jnp.int8),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out, ck, cv = pl.pallas_call(
        functools.partial(_kernel_quantized, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, G, hd), q.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        # inputs incl. 2 scalar-prefetch args: (li, off, q, knew, vnew,
        # ks_new, vs_new, ks, vs, valid, ck, cv) -> ck=10, cv=11.
        input_output_aliases={10: 1, 11: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(offset, jnp.int32).reshape(1),
        qg,
        k_new_q[:, :, None, :],
        v_new_q[:, :, None, :],
        k_new_scale.astype(jnp.float32)[:, :, None, None],
        v_new_scale.astype(jnp.float32)[:, :, None, None],
        k_scales.astype(jnp.float32)[:, :, None, :],
        v_scales.astype(jnp.float32)[:, :, None, :],
        valid.astype(jnp.int32)[:, None, :],
        cache_k,
        cache_v,
    )
    return out.reshape(B, Hq, hd), ck, cv


def available() -> bool:
    """Mosaic (TPU) only — on GPU/CPU the XLA cached path must be used."""
    try:
        if jax.default_backend() in ("tpu", "axon"):
            return True
        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False
