"""Double-buffered variant of the decode-attention kernel.

Same math and in-place cache semantics as ops/decode_attention.py, but the
grid is flattened to (B*Hkv,) and each invocation prefetches the NEXT
(batch, head) K/V slabs while computing the current one — the slab DMA
(~0.5 MB x2 per invocation) hides behind the [G, max_len] matmul+softmax
instead of serializing in front of it (the guide's double-buffering pattern).

Kept separate from the simple kernel so the straightforward version remains
the readable reference; both are parity-tested against the same XLA math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DMA pipeline depth (round 3): at 2048-slot/hd-128 slabs (~0.25-0.5 MB)
# the transfers are LATENCY-bound, not bandwidth-bound — one-ahead
# prefetch measured only ~260 GB/s effective inside the decode step
# (BASELINE.md r3b10). Four slabs in flight hide the fixed per-DMA cost.
DEPTH = 4


def _kernel(
    li_ref, off_ref,
    q_ref,       # [1, 1, G, hd]
    knew_ref,    # [1, 1, 1, hd]
    vnew_ref,    # [1, 1, 1, hd]
    valid_ref,   # [1, 1, max_len]
    ck_any, cv_any,
    *rest,       # outs + scratch; see `stats` below
    scale: float,
    n_heads: int,
    stats: bool = False,
):
    """stats=False: rest = (out, ck_out, cv_out, k_db, v_db, sems, wsems);
    out is the NORMALIZED attention [1, 1, G, hd].

    stats=True (timeline-sharded decode, docs/LONG_CONTEXT.md step 3):
    rest = (m, l, acc, ck_out, cv_out, k_db, v_db, sems, wsems) — the
    UNNORMALIZED flash statistics over this shard's slab (f32 rowmax m
    [1,1,G,1], denominator l [1,1,G,1], numerator acc [1,1,G,hd]); the
    caller assembles the exact global softmax across shards with one
    pmax + psum pair (ops/attention.merge_partial_stats). `off` is the
    LOCAL slot — out of [0, max_len) on non-owner shards, which then
    append nothing and a fully-invalid slab yields (clamped m, 0, 0), a
    no-op in the merge."""
    if stats:
        m_ref, l_ref, acc_ref, ck_out, cv_out, k_db, v_db, sems, wsems = rest
    else:
        out_ref, ck_out, cv_out, k_db, v_db, sems, wsems = rest
    i = pl.program_id(0)  # flattened (b * Hkv + h)
    n = pl.num_programs(0)
    li = li_ref[0]
    off = off_ref[0]
    slot = jax.lax.rem(i, DEPTH)

    def slab_dma(idx, s):
        b = idx // n_heads
        h = jax.lax.rem(idx, n_heads)
        return (
            pltpu.make_async_copy(ck_any.at[li, b, h], k_db.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(cv_any.at[li, b, h], v_db.at[s], sems.at[s, 1]),
        )

    # Warm-up: the first invocation starts the first DEPTH-1 slabs.
    for j in range(DEPTH - 1):
        @pl.when((i == 0) & (j < n))
        def _(j=j):
            ka, va = slab_dma(j, j % DEPTH)
            ka.start()
            va.start()

    # Keep DEPTH slabs in flight: start slab i+DEPTH-1.
    @pl.when(i + DEPTH - 1 < n)
    def _():
        kn, vn = slab_dma(i + DEPTH - 1, jax.lax.rem(i + DEPTH - 1, DEPTH))
        kn.start()
        vn.start()

    ka, va = slab_dma(i, slot)
    ka.wait()
    va.wait()

    max_len = k_db.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (max_len, 1), 0)
    is_new = row == off
    k_full = jnp.where(is_new, knew_ref[0, 0], k_db[slot])
    v_full = jnp.where(is_new, vnew_ref[0, 0], v_db[slot])
    # (A single-row insert instead of this full-slab merged store fails to
    # lower: Mosaic cannot prove dynamic sublane-store alignment. The slab
    # store is VMEM-bandwidth — not the bottleneck.)
    k_db[slot] = k_full
    v_db[slot] = v_full
    off_clamped = jnp.clip(off, 0, max_len - 1)
    # 32-row window covers every dtype's HBM sublane tile (bf16 needs 16)
    off_al = pl.multiple_of((off_clamped // 32) * 32, 32)
    b = i // n_heads
    h = jax.lax.rem(i, n_heads)
    wb_k = pltpu.make_async_copy(
        k_db.at[slot, pl.ds(off_al, 32), :],
        ck_out.at[li, b, h, pl.ds(off_al, 32), :], wsems.at[0],
    )
    wb_v = pltpu.make_async_copy(
        v_db.at[slot, pl.ds(off_al, 32), :],
        cv_out.at[li, b, h, pl.ds(off_al, 32), :], wsems.at[1],
    )
    wb_k.start()
    wb_v.start()

    q = q_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k_full, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = logits * scale
    valid = valid_ref[0, 0, :]
    logits = jnp.where(valid[None, :] > 0, logits, -1e30)
    if stats:
        # clamp the all-invalid rowmax so exp stays finite; explicit mask
        # zeroes the invalid lanes (exp(-1e30 - m) is NOT 0 when m is the
        # sentinel itself)
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), -5e29)
        p = jnp.where(valid[None, :] > 0, jnp.exp(logits - m), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v_full.dtype), v_full, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[0, 0] = m
        l_ref[0, 0] = l
        acc_ref[0, 0] = acc
    else:
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v_full.dtype), v_full, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, 0] = out.astype(out_ref.dtype)

    wb_k.wait()
    wb_v.wait()


def _kernel_quantized(
    li_ref, off_ref,
    q_ref, knew_ref, vnew_ref,
    ks_new_ref,  # [1, 1, 1, 1] f32
    vs_new_ref,
    ks_ref,      # [1, 1, 1, max_len] f32
    vs_ref,
    valid_ref,
    ck_any, cv_any,
    *rest,       # outs + scratch; `stats` selects the layout (see _kernel)
    scale: float,
    n_heads: int,
    stats: bool = False,
):
    if stats:
        m_ref, l_ref, acc_ref, ck_out, cv_out, k_db, v_db, sems, wsems = rest
    else:
        out_ref, ck_out, cv_out, k_db, v_db, sems, wsems = rest
    i = pl.program_id(0)
    n = pl.num_programs(0)
    li = li_ref[0]
    off = off_ref[0]
    slot = jax.lax.rem(i, DEPTH)

    def slab_dma(idx, s):
        b = idx // n_heads
        h = jax.lax.rem(idx, n_heads)
        return (
            pltpu.make_async_copy(ck_any.at[li, b, h], k_db.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(cv_any.at[li, b, h], v_db.at[s], sems.at[s, 1]),
        )

    for j in range(DEPTH - 1):
        @pl.when((i == 0) & (j < n))
        def _(j=j):
            ka, va = slab_dma(j, j % DEPTH)
            ka.start()
            va.start()

    @pl.when(i + DEPTH - 1 < n)
    def _():
        kn, vn = slab_dma(i + DEPTH - 1, jax.lax.rem(i + DEPTH - 1, DEPTH))
        kn.start()
        vn.start()

    ka, va = slab_dma(i, slot)
    ka.wait()
    va.wait()

    max_len = k_db.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (max_len, 1), 0)
    is_new = row == off
    k_full = jnp.where(is_new, knew_ref[0, 0], k_db[slot])
    v_full = jnp.where(is_new, vnew_ref[0, 0], v_db[slot])
    k_db[slot] = k_full
    v_db[slot] = v_full
    off_clamped = jnp.clip(off, 0, max_len - 1)
    off_al = pl.multiple_of((off_clamped // 32) * 32, 32)  # int8 tile
    b = i // n_heads
    h = jax.lax.rem(i, n_heads)
    wb_k = pltpu.make_async_copy(
        k_db.at[slot, pl.ds(off_al, 32), :],
        ck_out.at[li, b, h, pl.ds(off_al, 32), :], wsems.at[0],
    )
    wb_v = pltpu.make_async_copy(
        v_db.at[slot, pl.ds(off_al, 32), :],
        cv_out.at[li, b, h, pl.ds(off_al, 32), :], wsems.at[1],
    )
    wb_k.start()
    wb_v.start()

    row1 = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    is_new_r = row1 == off
    k_s = jnp.where(is_new_r, ks_new_ref[0, 0], ks_ref[0, 0])
    v_s = jnp.where(is_new_r, vs_new_ref[0, 0], vs_ref[0, 0])

    q = q_ref[0, 0]
    cdt = q_ref.dtype
    logits = jax.lax.dot_general(
        q, k_full.astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits * (k_s * scale)
    valid = valid_ref[0, 0, :]
    logits = jnp.where(valid[None, :] > 0, logits, -1e30)
    if stats:
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), -5e29)
        p = jnp.where(valid[None, :] > 0, jnp.exp(logits - m), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * v_s).astype(cdt)
        acc = jax.lax.dot_general(
            pv, v_full.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[0, 0] = m
        l_ref[0, 0] = l
        acc_ref[0, 0] = acc
    else:
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * v_s).astype(cdt)
        out = jax.lax.dot_general(
            pv, v_full.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, 0] = out.astype(out_ref.dtype)

    wb_k.wait()
    wb_v.wait()


def decode_attention_quantized_db(
    q, k_new_q, v_new_q, cache_k, cache_v,
    k_scales, v_scales, k_new_scale, v_new_scale,
    layer, offset, valid, scale, interpret: bool = False,
):
    """Double-buffered int8 variant (same contract as
    decode_attention.decode_attention_quantized)."""
    L, B, Hkv, max_len, hd = cache_k.shape
    if max_len % 32 != 0:
        raise ValueError(f"max_len % 32 != 0 ({max_len})")
    Hq = q.shape[1]
    G = Hq // Hkv
    BH = B * Hkv

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, 1, G, hd), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, hd), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, hd), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, max_len), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, max_len), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, max_len), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, hd), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((DEPTH, max_len, hd), jnp.int8),
            pltpu.VMEM((DEPTH, max_len, hd), jnp.int8),
            pltpu.SemaphoreType.DMA((DEPTH, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, ck, cv = pl.pallas_call(
        functools.partial(_kernel_quantized, scale=scale, n_heads=Hkv),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((BH, 1, G, hd), q.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        # (li, off, q, knew, vnew, ks_new, vs_new, ks, vs, valid, ck, cv)
        input_output_aliases={10: 1, 11: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(offset, jnp.int32).reshape(1),
        q.reshape(BH, 1, G, hd),
        k_new_q.reshape(BH, 1, 1, hd),
        v_new_q.reshape(BH, 1, 1, hd),
        k_new_scale.astype(jnp.float32).reshape(BH, 1, 1, 1),
        v_new_scale.astype(jnp.float32).reshape(BH, 1, 1, 1),
        k_scales.astype(jnp.float32).reshape(BH, 1, 1, max_len),
        v_scales.astype(jnp.float32).reshape(BH, 1, 1, max_len),
        jnp.repeat(valid.astype(jnp.int32), Hkv, axis=0)[:, None, :],
        cache_k,
        cache_v,
    )
    return out.reshape(B, Hq, hd), ck, cv


def decode_attention_db(
    q, k_new, v_new, cache_k, cache_v, layer, offset, valid, scale,
    interpret: bool = False,
):
    """Drop-in for decode_attention with cross-step DMA/compute overlap."""
    L, B, Hkv, max_len, hd = cache_k.shape
    if max_len % 32 != 0:
        raise ValueError(f"max_len % 32 != 0 ({max_len})")
    Hq = q.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B * Hkv, 1, G, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * Hkv,),
        in_specs=[
            pl.BlockSpec((1, 1, G, hd), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, hd), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, hd), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, max_len), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, hd), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((DEPTH, max_len, hd), cache_k.dtype),
            pltpu.VMEM((DEPTH, max_len, hd), cache_v.dtype),
            pltpu.SemaphoreType.DMA((DEPTH, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # valid is per-batch-row: replicate per head on the host side of the call
    valid_bh = jnp.repeat(valid.astype(jnp.int32), Hkv, axis=0)[:, None, :]
    out, ck, cv = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_heads=Hkv),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * Hkv, 1, G, hd), q.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(offset, jnp.int32).reshape(1),
        qg,
        k_new.astype(cache_k.dtype).reshape(B * Hkv, 1, 1, hd),
        v_new.astype(cache_v.dtype).reshape(B * Hkv, 1, 1, hd),
        valid_bh,
        cache_k,
        cache_v,
    )
    return out.reshape(B, Hq, hd), ck, cv


def _stats_grid(B, Hkv, G, hd, max_len, cache_dtype, extra_specs=()):
    """Grid spec for the stats variants: same inputs as the normalized
    kernels, outputs (m, l, acc, ck, cv)."""
    bmap4 = lambda i, *_: (i, 0, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 1, G, hd), bmap4),
        pl.BlockSpec((1, 1, 1, hd), bmap4),
        pl.BlockSpec((1, 1, 1, hd), bmap4),
        *extra_specs,
        pl.BlockSpec((1, 1, max_len), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * Hkv,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, G, 1), bmap4),
            pl.BlockSpec((1, 1, G, 1), bmap4),
            pl.BlockSpec((1, 1, G, hd), bmap4),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((DEPTH, max_len, hd), cache_dtype),
            pltpu.VMEM((DEPTH, max_len, hd), cache_dtype),
            pltpu.SemaphoreType.DMA((DEPTH, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def decode_attention_db_stats(
    q, k_new, v_new, cache_k, cache_v, layer, local_offset, valid, scale,
    interpret: bool = False,
):
    """Timeline-sharded flavor (docs/LONG_CONTEXT.md step 3): attends this
    shard's LOCAL cache slab and returns the UNNORMALIZED flash statistics
    (m, l, acc) — f32 [B, Hq], [B, Hq], [B, Hq, hd] — plus the updated
    cache. `local_offset` is the append slot in LOCAL coordinates
    (offset - shard_start); out of [0, max_len) on non-owner shards, which
    append nothing. Merge across shards with
    ops.attention.merge_partial_stats. Reference analog: none."""
    L, B, Hkv, max_len, hd = cache_k.shape
    if max_len % 32 != 0:
        raise ValueError(f"max_len % 32 != 0 ({max_len})")
    Hq = q.shape[1]
    G = Hq // Hkv
    valid_bh = jnp.repeat(valid.astype(jnp.int32), Hkv, axis=0)[:, None, :]
    m, l, acc, ck, cv = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_heads=Hkv, stats=True),
        grid_spec=_stats_grid(B, Hkv, G, hd, max_len, cache_k.dtype),
        out_shape=[
            jax.ShapeDtypeStruct((B * Hkv, 1, G, 1), jnp.float32),
            jax.ShapeDtypeStruct((B * Hkv, 1, G, 1), jnp.float32),
            jax.ShapeDtypeStruct((B * Hkv, 1, G, hd), jnp.float32),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        # (li, off, q, knew, vnew, valid, ck, cv) -> outs (m, l, acc, ck, cv)
        input_output_aliases={6: 3, 7: 4},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(local_offset, jnp.int32).reshape(1),
        q.reshape(B * Hkv, 1, G, hd),
        k_new.astype(cache_k.dtype).reshape(B * Hkv, 1, 1, hd),
        v_new.astype(cache_v.dtype).reshape(B * Hkv, 1, 1, hd),
        valid_bh,
        cache_k,
        cache_v,
    )
    return (
        m.reshape(B, Hq), l.reshape(B, Hq), acc.reshape(B, Hq, hd), ck, cv
    )


def decode_attention_quantized_db_stats(
    q, k_new_q, v_new_q, cache_k, cache_v,
    k_scales, v_scales, k_new_scale, v_new_scale,
    layer, local_offset, valid, scale, interpret: bool = False,
):
    """int8 twin of decode_attention_db_stats (same contract; dequantizes
    with the per-row scales before the statistics)."""
    L, B, Hkv, max_len, hd = cache_k.shape
    if max_len % 32 != 0:
        raise ValueError(f"max_len % 32 != 0 ({max_len})")
    Hq = q.shape[1]
    G = Hq // Hkv
    BH = B * Hkv
    bmap4 = lambda i, *_: (i, 0, 0, 0)  # noqa: E731
    extra = (
        pl.BlockSpec((1, 1, 1, 1), bmap4),
        pl.BlockSpec((1, 1, 1, 1), bmap4),
        pl.BlockSpec((1, 1, 1, max_len), bmap4),
        pl.BlockSpec((1, 1, 1, max_len), bmap4),
    )
    m, l, acc, ck, cv = pl.pallas_call(
        functools.partial(
            _kernel_quantized, scale=scale, n_heads=Hkv, stats=True
        ),
        grid_spec=_stats_grid(
            B, Hkv, G, hd, max_len, cache_k.dtype, extra_specs=extra
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, 1, G, 1), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, G, 1), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, G, hd), jnp.float32),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        # inputs: (li, off, q, knew, vnew, ks_new, vs_new, ks, vs, valid,
        # ck, cv) -> outs (m, l, acc, ck, cv)
        input_output_aliases={10: 3, 11: 4},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(local_offset, jnp.int32).reshape(1),
        q.reshape(BH, 1, G, hd),
        k_new_q.reshape(BH, 1, 1, hd),
        v_new_q.reshape(BH, 1, 1, hd),
        k_new_scale.astype(jnp.float32).reshape(BH, 1, 1, 1),
        v_new_scale.astype(jnp.float32).reshape(BH, 1, 1, 1),
        k_scales.astype(jnp.float32).reshape(BH, 1, 1, max_len),
        v_scales.astype(jnp.float32).reshape(BH, 1, 1, max_len),
        jnp.repeat(valid.astype(jnp.int32), Hkv, axis=0)[:, None, :],
        cache_k,
        cache_v,
    )
    return (
        m.reshape(B, Hq), l.reshape(B, Hq), acc.reshape(B, Hq, hd), ck, cv
    )


# ---------------------------------------------------------------------------
# int4 KV: K/V-combined nibble-packed slabs
# ---------------------------------------------------------------------------

def _kernel_quantized4(
    li_ref, off_ref,
    q_ref,        # [1, 1, G, hd]
    kvnew_ref,    # [1, 1, 1, hd] int8 — K low nibble | V high nibble
    ks_new_ref,   # [1, 1, 1, 1] f32
    vs_new_ref,
    ks_ref,       # [1, 1, 1, max_len] f32
    vs_ref,
    valid_ref,    # [1, 1, max_len]
    ckv_any,      # combined cache [L, B, Hkv, max_len, hd] int8, ANY
    *rest,        # (out | m,l,acc), ckv_out, kv_db, sems, wsems
    scale: float,
    n_heads: int,
    stats: bool = False,
):
    """int4-KV decode attention over K/V-COMBINED nibble-packed slabs
    (llama.quantize_kv_rows4: byte d of a cache row = K's dim-d int4 in the
    low nibble, V's in the high nibble; per-row f32 scales ride separately).

    Why combined: a per-tensor hd/2-packed slab has a 64-lane trailing dim,
    which Mosaic cannot DMA-slice out of an HBM ref (lane tiling is 128 —
    the first int4 layout died on exactly that). Packing K with V keeps the
    slab at full [max_len, hd] lanes, halves the DMA COUNT (one slab per
    (batch, head) instead of two), and since K and V rows are always
    appended together the byte never needs read-modify-write. The cache
    stream is half the int8 kernel's bytes.
    """
    if stats:
        m_ref, l_ref, acc_ref, ckv_out, kv_db, sems, wsems = rest
    else:
        out_ref, ckv_out, kv_db, sems, wsems = rest
    i = pl.program_id(0)
    n = pl.num_programs(0)
    li = li_ref[0]
    off = off_ref[0]
    slot = jax.lax.rem(i, DEPTH)

    def slab_dma(idx, s):
        b = idx // n_heads
        h = jax.lax.rem(idx, n_heads)
        return pltpu.make_async_copy(
            ckv_any.at[li, b, h], kv_db.at[s], sems.at[s]
        )

    for j in range(DEPTH - 1):
        @pl.when((i == 0) & (j < n))
        def _(j=j):
            slab_dma(j, j % DEPTH).start()

    @pl.when(i + DEPTH - 1 < n)
    def _():
        slab_dma(i + DEPTH - 1, jax.lax.rem(i + DEPTH - 1, DEPTH)).start()

    slab_dma(i, slot).wait()

    max_len = kv_db.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (max_len, 1), 0)
    is_new = row == off
    kv_full = jnp.where(is_new, kvnew_ref[0, 0], kv_db[slot])
    kv_db[slot] = kv_full
    off_clamped = jnp.clip(off, 0, max_len - 1)
    off_al = pl.multiple_of((off_clamped // 32) * 32, 32)  # int8 tile
    b = i // n_heads
    h = jax.lax.rem(i, n_heads)
    wb = pltpu.make_async_copy(
        kv_db.at[slot, pl.ds(off_al, 32), :],
        ckv_out.at[li, b, h, pl.ds(off_al, 32), :], wsems.at[0],
    )
    wb.start()

    row1 = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    is_new_r = row1 == off
    k_s = jnp.where(is_new_r, ks_new_ref[0, 0], ks_ref[0, 0])
    v_s = jnp.where(is_new_r, vs_new_ref[0, 0], vs_ref[0, 0])

    q = q_ref[0, 0]
    cdt = q_ref.dtype
    b32 = kv_full.astype(jnp.int32)
    # K rides the low nibble OFFSET-BINARY (llama.quantize_kv_rows4)
    k_q = (jnp.bitwise_and(b32, 0xF) - 8).astype(cdt)
    v_q = jnp.right_shift(b32, 4).astype(cdt)  # hi nibble: one shr4
    logits = jax.lax.dot_general(
        q, k_q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = logits * (k_s * scale)
    valid = valid_ref[0, 0, :]
    logits = jnp.where(valid[None, :] > 0, logits, -1e30)
    if stats:
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), -5e29)
        p = jnp.where(valid[None, :] > 0, jnp.exp(logits - m), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            (p * v_s).astype(cdt), v_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[0, 0] = m
        l_ref[0, 0] = l
        acc_ref[0, 0] = acc
    else:
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            (p * v_s).astype(cdt), v_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, 0] = out.astype(out_ref.dtype)

    wb.wait()


def _quant4_in_specs(G, hd, max_len):
    bmap4 = lambda i, *_: (i, 0, 0, 0)  # noqa: E731
    return [
        pl.BlockSpec((1, 1, G, hd), bmap4),
        pl.BlockSpec((1, 1, 1, hd), bmap4),
        pl.BlockSpec((1, 1, 1, 1), bmap4),
        pl.BlockSpec((1, 1, 1, 1), bmap4),
        pl.BlockSpec((1, 1, 1, max_len), bmap4),
        pl.BlockSpec((1, 1, 1, max_len), bmap4),
        pl.BlockSpec((1, 1, max_len), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]


def _quant4_operands(q, kv_new, k_new_scale, v_new_scale, k_scales, v_scales,
                     valid, cache_kv, layer, offset, BH, G, hd, max_len, Hkv):
    return (
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(offset, jnp.int32).reshape(1),
        q.reshape(BH, 1, G, hd),
        kv_new.reshape(BH, 1, 1, hd),
        k_new_scale.astype(jnp.float32).reshape(BH, 1, 1, 1),
        v_new_scale.astype(jnp.float32).reshape(BH, 1, 1, 1),
        k_scales.astype(jnp.float32).reshape(BH, 1, 1, max_len),
        v_scales.astype(jnp.float32).reshape(BH, 1, 1, max_len),
        jnp.repeat(valid.astype(jnp.int32), Hkv, axis=0)[:, None, :],
        cache_kv,
    )


def decode_attention_quantized4_db(
    q, kv_new, cache_kv, k_scales, v_scales, k_new_scale, v_new_scale,
    layer, offset, valid, scale, interpret: bool = False,
):
    """int4-KV double-buffered decode attention.

    cache_kv [L, B, Hkv, max_len, hd] int8: K/V-combined nibble-packed rows
    (llama.quantize_kv_rows4); kv_new [B, Hkv, hd] int8 likewise. Returns
    (out [B, Hq, hd], updated cache_kv). Scales have the int8 kernel's
    shapes ([B, Hkv, max_len] slab scales, [B, Hkv] new-row scales).
    Reference analog: none (reference serves f16 HF KV)."""
    L, B, Hkv, max_len, hd = cache_kv.shape
    if max_len % 32 != 0:
        raise ValueError(f"max_len % 32 != 0 ({max_len})")
    Hq = q.shape[1]
    G = Hq // Hkv
    BH = B * Hkv
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BH,),
        in_specs=_quant4_in_specs(G, hd, max_len),
        out_specs=[
            pl.BlockSpec((1, 1, G, hd), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((DEPTH, max_len, hd), jnp.int8),
            pltpu.SemaphoreType.DMA((DEPTH,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    out, ckv = pl.pallas_call(
        functools.partial(_kernel_quantized4, scale=scale, n_heads=Hkv),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((BH, 1, G, hd), q.dtype),
            jax.ShapeDtypeStruct(cache_kv.shape, cache_kv.dtype),
        ],
        # (li, off, q, kvnew, ksn, vsn, ks, vs, valid, ckv) -> (out, ckv)
        input_output_aliases={9: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*_quant4_operands(
        q, kv_new, k_new_scale, v_new_scale, k_scales, v_scales,
        valid, cache_kv, layer, offset, BH, G, hd, max_len, Hkv,
    ))
    return out.reshape(B, Hq, hd), ckv


def decode_attention_quantized4_db_stats(
    q, kv_new, cache_kv, k_scales, v_scales, k_new_scale, v_new_scale,
    layer, local_offset, valid, scale, interpret: bool = False,
):
    """int4-KV twin of decode_attention_db_stats (timeline-sharded decode):
    UNNORMALIZED flash stats (m, l, acc) over this shard's combined-packed
    slab + the updated cache. Same owner-gating semantics as the bf16/int8
    stats kernels."""
    L, B, Hkv, max_len, hd = cache_kv.shape
    if max_len % 32 != 0:
        raise ValueError(f"max_len % 32 != 0 ({max_len})")
    Hq = q.shape[1]
    G = Hq // Hkv
    BH = B * Hkv
    bmap4 = lambda i, *_: (i, 0, 0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BH,),
        in_specs=_quant4_in_specs(G, hd, max_len),
        out_specs=[
            pl.BlockSpec((1, 1, G, 1), bmap4),
            pl.BlockSpec((1, 1, G, 1), bmap4),
            pl.BlockSpec((1, 1, G, hd), bmap4),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((DEPTH, max_len, hd), jnp.int8),
            pltpu.SemaphoreType.DMA((DEPTH,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    m, l, acc, ckv = pl.pallas_call(
        functools.partial(
            _kernel_quantized4, scale=scale, n_heads=Hkv, stats=True
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((BH, 1, G, 1), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, G, 1), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, G, hd), jnp.float32),
            jax.ShapeDtypeStruct(cache_kv.shape, cache_kv.dtype),
        ],
        input_output_aliases={9: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*_quant4_operands(
        q, kv_new, k_new_scale, v_new_scale, k_scales, v_scales,
        valid, cache_kv, jnp.asarray(layer), jnp.asarray(local_offset),
        BH, G, hd, max_len, Hkv,
    ))
    return (
        m.reshape(B, Hq), l.reshape(B, Hq), acc.reshape(B, Hq, hd), ckv
    )
