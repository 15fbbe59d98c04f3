"""Mono-grid decode-attention kernels: grid (B,), heads unrolled inside.

The double-buffered kernel (ops/decode_attention_db.py) runs one grid
program per (batch row, KV head) — at 3B dims that is B*8 programs per
layer, and the r3b10 trace attribution measured it per-program-overhead
bound: ~260 GB/s effective against an 810 GB/s cache-read floor, with the
int4-KV sweep confirming that halving the BYTES changes nothing (the cost
is fixed per program, not per byte). The head-packed kernel attacked this
with fewer+fatter DMAs and lost end-to-end (fat slabs serialize against
the concurrent weight stream — BASELINE.md late-r3).

This variant keeps the db kernel's THIN per-(b,h) slab DMAs and DEPTH-deep
pipeline but collapses the grid to (B,) with the Hkv loop UNROLLED inside
the program (Hkv is static and small): 8x fewer grid programs, so 8x less
per-program overhead, with an identical DMA pattern. Slab slots are static
inside the unrolled loop when DEPTH | Hkv (4 | 8 at llama dims).

Dispatch: attn_impl='decode_mono' (A/B against the db auto default);
`bench.py --mode decode --decode_impl decode_mono`.

Reference analog: none (reference delegates decode to HF generate,
src/models/allm.py:326-331).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from .decode_attention_db import DEPTH

# Tuning knobs (read at import; see decode_attention_quantized4_mono).
# hpd=2 measured best across batches on the VPU-lean kernel (B64 +1.2-1.8%,
# B32 +2.2%, B1 +7.3% end-to-end — half the slab DMAs per program; depth
# 2/4/8 are within noise, BASELINE.md late-r3 knob sweep).
MONO_DEPTH = int(os.environ.get("MONO_DEPTH", str(DEPTH)))
MONO_HPD = int(os.environ.get("MONO_HPD", "2"))
# chain-ILP: independent softmax chains per head in the int4 kernel
# (1 = off; 2 = two half-slab chains merged by flash-stats rescale)
MONO_ILP = int(os.environ.get("MONO_ILP", "1"))
# K-epilogue mode (int4 kernel): matmul the RAW KV byte plane and recover
# the K logits from the byte dot and the V dot (the cache stores K
# offset-binary — llama.quantize_kv_rows4):
#     q . k = q . byte - 16 (q . v) - 8 sum(q)
# Trades the K unpack's 2 VPU passes over the [max_len, hd] slab for one
# extra skinny [G, hd] x [hd, max_len] MXU dot + an O(G*max_len) epilogue.
# MEASURED NEGATIVE (round 5): B64 4058 vs 4469, B128 4247 vs ~4500 — at
# decode geometry the third skinny dot costs more than the two saved
# unpack passes (the kernel is not purely VPU-unpack-bound). Default OFF;
# kept for reproduction (tests pin kepi == direct-unpack numerics).
MONO_KEPI = int(os.environ.get("MONO_KEPI", "0"))
# batch rows per grid program (int4 kernel): the db->mono collapse won 8x
# on per-program overhead; the round-5 trace still attributes ~1.8 us of
# the 5.6 us/program B64 kernel to per-program cost (compute ~3.8 +
# slab-DMA 2.6 overlapped). bb>1 processes several batch rows per program
# with the SAME global cross-program DMA pipeline — B/bb programs total.
# 0 = AUTO from the measured round-5 sweep (BASELINE r5 session 2):
# B64 4522->4756 @bb4 (bb8 flat, bb16 -6%); B128 4839->5619 @bb8
# (bb16/32 regress) — bb8 for B>=128, bb4 for B>=16, else 1.
MONO_BB = int(os.environ.get("MONO_BB", "0"))


def _auto_bb(B: int) -> int:
    for bb in ((8, 4, 2) if B >= 128 else (4, 2) if B >= 16 else ()):
        if B % bb == 0:
            return bb
    return 1


def _kernel_mono4(
    li_ref, off_ref,
    q_ref,       # [bb, Hkv, G, hd] (this program's batch rows)
    kvnew_ref,   # [bb, Hkv, hd] int8 combined packed (llama.quantize_kv_rows4)
    ks_new_ref,  # [bb, Hkv, 1] f32
    vs_new_ref,
    ks_ref,      # [1, bb, Hkv, max_len] f32 (layer picked by the index map —
    vs_ref,      #   the XLA-side dynamic_index copied 2x4 MB per layer)
    valid_ref,   # [bb, 1, max_len] int32 (per batch row; heads share it)
    ckv_any,     # [L, B, Hkv, max_len, hd] int8, ANY
    out_ref,     # [bb, Hkv, G, hd]
    ckv_out,     # ANY (aliased)
    kv_db, wb_buf, sems, wsems,
    *,
    scale: float,
    n_heads: int,
    n_rows: int,  # B (grid size) — for the tail guard
    depth: int,
    hpd: int,     # heads per DMA (heads are contiguous in the cache layout)
    per_row: bool,  # off_ref is [B]: each batch row has its own append slot
    ilp: int = 1,  # independent softmax chains per head (chain-ILP)
    kepi: int = 1,  # K logits via raw-byte dot epilogue (see MONO_KEPI)
    bb: int = 1,   # batch rows per grid program (see MONO_BB)
):
    """VPU-lean variant (the B64 trace showed this kernel COMPUTE-bound at
    ~8.5 us/program vs ~2.6 us of slab DMA): the fresh row's contribution is
    added ANALYTICALLY (its slab slot is masked out of the logits), so the
    full-slab where-insert passes are gone; the cache write-back selects on
    a [32, hd] window only. The nibble unpack stays int32-widened — Mosaic
    fails to legalize arith.shli on i8/i16 vectors (probed:
    experiments/nibble_legal_probe.py).

    ilp=2 (chain-ILP, NEXT.md round-5 design): each head's slab is split
    into two lane-aligned timeline chunks with INDEPENDENT (m, l, acc)
    softmax chains — the unpack/QK/exp/PV dependency chain is the measured
    per-group cost (~1.5 us x 4 groups vs the ~2.6 us DMA floor), and two
    in-flight chains give the scheduler ILP to hide each other's VPU/MXU
    latency. Chains merge with one flash-stats rescale at the end (the
    sp_partial_attention math). Requires max_len >= 2*128 lanes; the
    split point is 128-lane aligned."""
    p = pl.program_id(0)
    li = li_ref[0]
    groups = n_heads // hpd
    n = n_rows * groups  # n_rows = TOTAL batch rows (grid is B/bb)

    def slab_dma(idx, s):
        rr = idx // groups
        gg = jax.lax.rem(idx, groups)
        return pltpu.make_async_copy(
            ckv_any.at[li, rr, pl.ds(gg * hpd, hpd)], kv_db.at[s], sems.at[s]
        )

    # Warm-up: program 0 starts the first depth-1 slab groups.
    for j in range(depth - 1):
        @pl.when((p == 0) & (j < n))
        def _(j=j):
            slab_dma(j, j % depth).start()

    max_len = kv_db.shape[-2]
    # chain-ILP split point: 128-lane aligned (f32 logits lanes) and
    # 32-sublane aligned (int8 slab rows); 0 disables the second chain
    split = (max_len // 256) * 128 if ilp > 1 and max_len >= 256 else 0
    row1 = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    roww0 = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    cdt = q_ref.dtype
    wbs = []  # in-flight window write-backs (static Python bookkeeping)

    for r in range(bb):
        b = p * bb + r  # global batch row
        off = off_ref[b] if per_row else off_ref[0]
        is_new_r = row1 == off
        off_clamped = jnp.clip(off, 0, max_len - 1)
        off_al = pl.multiple_of((off_clamped // 32) * 32, 32)
        valid = valid_ref[r, 0, :]
        # The fresh row participates iff its slot is in range AND marked
        # valid (same semantics as the old in-slab insert, where position
        # `off` went through the valid mask like any other slot).
        fresh_on = jnp.max(jnp.where(is_new_r, valid[None, :], 0)) > 0
        # slab slots feeding the QK/PV matmuls: valid, NOT the append slot
        dead = jnp.logical_or(valid[None, :] <= 0, is_new_r)
        roww = roww0 + off_al
        is_new_w = roww == off

        for g in range(groups):
            i = (p * bb + r) * groups + g
            # keep `depth` slab groups in flight
            @pl.when(i + depth - 1 < n)
            def _(r=r, g=g):
                idx = (p * bb + r) * groups + g + depth - 1
                slab_dma(idx, jax.lax.rem(idx, depth)).start()

            slot = jax.lax.rem(i, depth)
            if (bb * groups) % depth == 0:
                slot = (r * groups + g) % depth  # static per program
            slab_dma(i, slot).wait()

            for h2 in range(hpd):
                h = g * hpd + h2
                t = (r * groups + g) * hpd + h2  # program-local (static)
                wsl = t % 2
                if t >= 2:
                    # double-buffered staging: only wait for the copy
                    # that used THIS slot two heads ago (a serial wait
                    # per head was ~the write-back DMA latency on the
                    # critical path)
                    wbs[t - 2].wait()
                # window-only insert: the 32-row aligned window around
                # `off` goes through a scratch buffer so the full slab is
                # never rewritten (the DMA read is 32-sublane aligned)
                win = kv_db[slot, h2, pl.ds(off_al, 32), :]
                wb_buf[wsl] = jnp.where(
                    is_new_w, kvnew_ref[r, h][None, :], win
                )
                wb = pltpu.make_async_copy(
                    wb_buf.at[wsl],
                    ckv_out.at[li, b, h, pl.ds(off_al, 32), :],
                    wsems.at[wsl],
                )
                wb.start()
                wbs.append(wb)

                q = q_ref[r, h]
                # analytic fresh-row term (shared by every chain)
                n32 = kvnew_ref[r, h][None, :].astype(jnp.int32)
                # K rides the low nibble OFFSET-BINARY (quantize_kv_rows4)
                k_n = (jnp.bitwise_and(n32, 0xF) - 8).astype(cdt)
                # hi nibble: one arithmetic shr4 (n32 is the sign-extended byte)
                # — the shl24/shr28 pair costs an extra VPU pass per byte
                # (round-4 finding: +17% B1 decode in the matmul kernels)
                v_n = jnp.right_shift(n32, 4).astype(cdt)
                # f32 VPU multiply-reduce: Mosaic rejects the skinny
                # [G,hd]x[1,hd] bf16->f32 dot (vector.broadcast verify error —
                # the decode_attention_packed lesson), and at [G,hd] the VPU
                # pass is cheaper than an MXU trip anyway
                lf = jnp.sum(
                    q.astype(jnp.float32) * k_n.astype(jnp.float32),
                    axis=1, keepdims=True,
                )  # [G, 1]
                lf = lf * (ks_new_ref[r, h] * scale)
                lf = jnp.where(fresh_on, lf, -1e30)

                # kepi epilogue constant: -8 * sum_d q[g, d] (the lo-nibble
                # offset applied uniformly to every slot's byte)
                sq8 = -8.0 * jnp.sum(q.astype(jnp.float32), axis=1,
                                     keepdims=True)  # [G, 1]

                def chain(start, length):
                    """One independent (m, l, acc) softmax chain over slab
                    slots [start, start+length). start/length are static and
                    128-lane aligned."""
                    braw = kv_db[slot, h2, start:start + length, :]
                    b32 = braw.astype(jnp.int32)
                    v_q = jnp.right_shift(b32, 4).astype(cdt)  # hi: one shr4
                    if kepi:
                        # K logits from the raw byte plane: byte = 16v + (k+8),
                        # so q.k = q.byte - 16 q.v - 8 sum(q). Skips the K
                        # unpack's 2 VPU passes over [length, hd] for one more
                        # skinny MXU dot + an O(G*length) f32 epilogue.
                        d_b = jax.lax.dot_general(
                            q, braw.astype(cdt), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        d_v = jax.lax.dot_general(
                            q, v_q, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        logits = d_b - 16.0 * d_v + sq8
                    else:
                        k_q = (jnp.bitwise_and(b32, 0xF) - 8).astype(cdt)
                        logits = jax.lax.dot_general(
                            q, k_q, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    logits = logits * (
                        ks_ref[0, r, h, start:start + length][None, :] * scale
                    )
                    logits = jnp.where(
                        dead[:, start:start + length], -1e30, logits
                    )
                    mh = jnp.max(logits, axis=-1, keepdims=True)
                    p = jnp.exp(logits - mh)
                    lh = jnp.sum(p, axis=-1, keepdims=True)
                    acc = jax.lax.dot_general(
                        (p * vs_ref[0, r, h, start:start + length][None, :]
                         ).astype(cdt), v_q,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return mh, lh, acc

                if ilp <= 1 or split == 0:
                    m1, l1, acc1 = chain(0, max_len)
                    m = jnp.maximum(m1, lf)
                    a1 = jnp.exp(m1 - m)
                    pf = jnp.exp(lf - m)
                    denom = a1 * l1 + pf
                    acc = a1 * acc1
                else:
                    # two independent chains; merge with one rescale (the
                    # sp_partial_attention stats math, in-kernel)
                    m1, l1, acc1 = chain(0, split)
                    m2, l2, acc2 = chain(split, max_len - split)
                    m = jnp.maximum(jnp.maximum(m1, m2), lf)
                    a1 = jnp.exp(m1 - m)
                    a2 = jnp.exp(m2 - m)
                    pf = jnp.exp(lf - m)
                    denom = a1 * l1 + a2 * l2 + pf
                    acc = a1 * acc1 + a2 * acc2
                acc = acc + (pf * vs_new_ref[r, h]) * v_n.astype(jnp.float32)
                out = acc / denom
                out_ref[r, h] = out.astype(out_ref.dtype)

    # drain the last (up to 2) window write-backs before the program ends
    for wb in wbs[-2:]:
        wb.wait()


def decode_attention_quantized4_mono(
    q, kv_new, cache_kv, k_scales, v_scales, k_new_scale, v_new_scale,
    layer, offset, valid, scale, interpret: bool = False,
    depth: int | None = None, hpd: int | None = None,
    ilp: int | None = None, kepi: int | None = None,
    bb: int | None = None,
):
    """int4-KV mono-grid decode attention (same contract as
    decode_attention_db.decode_attention_quantized4_db).

    depth: slab groups kept in flight (default MONO_DEPTH env or db DEPTH).
    hpd: KV heads fetched per DMA — heads are contiguous in the cache
    layout, so a [hpd, max_len, hd] group is one strided copy; amortizes
    the ~per-DMA fixed cost the B64 trace showed dominating (default
    MONO_HPD env or 1; must divide Hkv, else falls back to 1).

    offset: scalar (all rows append at the same slot) or [B] int32 —
    PER-ROW append slots for divergent timelines (continuous-batching
    serving / batched speculation; models/llama.py cache_offsets).

    k_scales/v_scales: per-layer [B, Hkv, max_len] OR the FULL stacked
    slabs [L, B, Hkv, max_len] — slab mode picks the layer inside the
    BlockSpec index map (scalar prefetch), saving the XLA-side
    dynamic-slice that MATERIALIZED a copy of both scale slabs every
    layer (B64 trace: 2x ~0.19 ms/step — the int4_matmul_stacked lesson
    applied to scales).

    bb (MONO_BB env): batch rows per grid program — B/bb programs, same
    global cross-program slab-DMA pipeline, bb x less per-program
    overhead (must divide B; falls back to 1)."""
    L, B, Hkv, max_len, hd = cache_kv.shape
    if max_len % 32 != 0:
        raise ValueError(f"max_len % 32 != 0 ({max_len})")
    depth = MONO_DEPTH if depth is None else depth
    hpd = MONO_HPD if hpd is None else hpd
    ilp = MONO_ILP if ilp is None else ilp
    kepi = MONO_KEPI if kepi is None else kepi
    bb = MONO_BB if bb is None else bb
    if bb == 0:  # AUTO: the measured per-batch optimum (see MONO_BB note)
        # TPU only: in interpret mode (CPU tests) a bb-unrolled body runs
        # bb x slower per program with no hardware to amortize — auto
        # stays at 1 off-TPU (explicit bb= / MONO_BB still honored)
        from .decode_attention import available as _tpu

        bb = _auto_bb(B) if _tpu() else 1
    if Hkv % hpd:
        hpd = 1
    if bb < 1 or B % bb:
        bb = 1
    off_arr = jnp.asarray(offset, jnp.int32).reshape(-1)
    per_row = off_arr.size > 1
    if per_row and off_arr.size != B:
        raise ValueError(f"offset must be scalar or [B]; got {off_arr.shape}")
    Hq = q.shape[1]
    G = Hq // Hkv
    stacked = k_scales.ndim == 4
    smap = (lambda i, li, *_: (li[0], i, 0, 0)) if stacked else \
        (lambda i, *_: (0, i, 0, 0))
    bmap = lambda i, *_: (i, 0, 0, 0)  # noqa: E731
    bmap3 = lambda i, *_: (i, 0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, Hkv, G, hd), bmap),
            pl.BlockSpec((bb, Hkv, hd), bmap3),
            pl.BlockSpec((bb, Hkv, 1), bmap3),
            pl.BlockSpec((bb, Hkv, 1), bmap3),
            pl.BlockSpec((1, bb, Hkv, max_len), smap),
            pl.BlockSpec((1, bb, Hkv, max_len), smap),
            pl.BlockSpec((bb, 1, max_len), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((bb, Hkv, G, hd), bmap),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((depth, hpd, max_len, hd), jnp.int8),
            pltpu.VMEM((2, 32, hd), jnp.int8),  # 2x write-back staging
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, ckv = pl.pallas_call(
        functools.partial(
            _kernel_mono4, scale=scale, n_heads=Hkv, n_rows=B,
            depth=depth, hpd=hpd, per_row=per_row, ilp=ilp, kepi=kepi,
            bb=bb,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, G, hd), q.dtype),
            jax.ShapeDtypeStruct(cache_kv.shape, cache_kv.dtype),
        ],
        # (li, off, q, kvnew, ksn, vsn, ks, vs, valid, ckv) -> (out, ckv)
        input_output_aliases={9: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        off_arr,
        q.reshape(B, Hkv, G, hd),
        kv_new.reshape(B, Hkv, hd),
        k_new_scale.astype(jnp.float32).reshape(B, Hkv, 1),
        v_new_scale.astype(jnp.float32).reshape(B, Hkv, 1),
        k_scales.astype(jnp.float32).reshape(-1, B, Hkv, max_len),
        v_scales.astype(jnp.float32).reshape(-1, B, Hkv, max_len),
        valid.astype(jnp.int32)[:, None, :],
        cache_kv,
    )
    return out.reshape(B, Hq, hd), ckv


def _kernel_mono_q8(
    li_ref, off_ref,
    q_ref,       # [1, Hkv, G, hd]
    knew_ref,    # [1, Hkv, hd] int8
    vnew_ref,
    ks_new_ref,  # [1, Hkv, 1] f32
    vs_new_ref,
    ks_ref,      # [1, 1, Hkv, max_len] f32 (layer picked by the index map
    vs_ref,      #   in slab mode — see the int4 kernel)
    valid_ref,   # [1, 1, max_len]
    ck_any, cv_any,
    out_ref,     # [1, Hkv, G, hd]
    ck_out, cv_out,
    k_db, v_db, wbk_buf, wbv_buf, sems, wsems,
    *,
    scale: float,
    n_heads: int,
    n_rows: int,
    per_row: bool,
):
    """int8 twin of _kernel_mono4 (separate K and V slabs, two DMAs per
    head — still one grid program per batch row). Same VPU-lean structure:
    analytic fresh-row term + window-only write-back (no full-slab
    where-insert passes)."""
    b = pl.program_id(0)
    li = li_ref[0]
    off = off_ref[b] if per_row else off_ref[0]
    n = n_rows * n_heads

    def slab_dma(idx, s):
        bb = idx // n_heads
        hh = jax.lax.rem(idx, n_heads)
        return (
            pltpu.make_async_copy(ck_any.at[li, bb, hh], k_db.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(cv_any.at[li, bb, hh], v_db.at[s], sems.at[s, 1]),
        )

    for j in range(DEPTH - 1):
        @pl.when((b == 0) & (j < n))
        def _(j=j):
            ka, va = slab_dma(j, j % DEPTH)
            ka.start()
            va.start()

    max_len = k_db.shape[1]
    row1 = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    is_new_r = row1 == off
    off_clamped = jnp.clip(off, 0, max_len - 1)
    off_al = pl.multiple_of((off_clamped // 32) * 32, 32)
    valid = valid_ref[0, 0, :]
    fresh_on = jnp.max(jnp.where(is_new_r, valid[None, :], 0)) > 0
    dead = jnp.logical_or(valid[None, :] <= 0, is_new_r)
    roww = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0) + off_al
    is_new_w = roww == off
    cdt = q_ref.dtype

    wbs = []  # in-flight (k, v) window write-backs, static bookkeeping
    for h in range(n_heads):
        i = b * n_heads + h

        @pl.when(i + DEPTH - 1 < n)
        def _(h=h):
            idx = b * n_heads + h + DEPTH - 1
            s = jax.lax.rem(idx, DEPTH)
            ka, va = slab_dma(idx, s)
            ka.start()
            va.start()

        slot = jax.lax.rem(i, DEPTH)
        if n_heads % DEPTH == 0:
            slot = h % DEPTH
        ka, va = slab_dma(i, slot)
        ka.wait()
        va.wait()

        wsl = h % 2
        if h >= 2:
            # double-buffered staging (see the int4 kernel)
            pk, pv = wbs[h - 2]
            pk.wait()
            pv.wait()
        wbk_buf[wsl] = jnp.where(
            is_new_w, knew_ref[0, h][None, :],
            k_db[slot, pl.ds(off_al, 32), :],
        )
        wbv_buf[wsl] = jnp.where(
            is_new_w, vnew_ref[0, h][None, :],
            v_db[slot, pl.ds(off_al, 32), :],
        )
        wb_k = pltpu.make_async_copy(
            wbk_buf.at[wsl], ck_out.at[li, b, h, pl.ds(off_al, 32), :],
            wsems.at[wsl, 0],
        )
        wb_v = pltpu.make_async_copy(
            wbv_buf.at[wsl], cv_out.at[li, b, h, pl.ds(off_al, 32), :],
            wsems.at[wsl, 1],
        )
        wb_k.start()
        wb_v.start()
        wbs.append((wb_k, wb_v))

        q = q_ref[0, h]
        logits = jax.lax.dot_general(
            q, k_db[slot].astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits * (ks_ref[0, 0, h][None, :] * scale)
        logits = jnp.where(dead, -1e30, logits)
        # f32 VPU multiply-reduce (Mosaic rejects the skinny bf16->f32 dot;
        # see the int4 kernel's note)
        lf = jnp.sum(
            q.astype(jnp.float32)
            * knew_ref[0, h][None, :].astype(jnp.float32),
            axis=1, keepdims=True,
        )  # [G, 1]
        lf = lf * (ks_new_ref[0, h] * scale)
        lf = jnp.where(fresh_on, lf, -1e30)
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), lf)
        p = jnp.exp(logits - m)
        pf = jnp.exp(lf - m)
        denom = jnp.sum(p, axis=-1, keepdims=True) + pf
        acc = jax.lax.dot_general(
            (p * vs_ref[0, 0, h][None, :]).astype(cdt),
            v_db[slot].astype(cdt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + (pf * vs_new_ref[0, h]) * vnew_ref[0, h][None, :].astype(
            jnp.float32
        )
        out_ref[0, h] = (acc / denom).astype(out_ref.dtype)

    for wb_k, wb_v in wbs[-2:]:
        wb_k.wait()
        wb_v.wait()


def decode_attention_quantized_mono(
    q, k_new_q, v_new_q, cache_k, cache_v,
    k_scales, v_scales, k_new_scale, v_new_scale,
    layer, offset, valid, scale, interpret: bool = False,
):
    """int8 mono-grid decode attention (same contract as
    decode_attention_db.decode_attention_quantized_db; offset may be
    scalar or [B] per-row append slots — see the int4 wrapper).

    k_scales/v_scales: per-layer [B, Hkv, max_len] OR the FULL stacked
    slabs [L, B, Hkv, max_len] — slab mode picks the layer inside the
    BlockSpec index map (scalar prefetch), saving the XLA-side
    dynamic-slice that MATERIALIZED a copy of both scale slabs every
    layer (same as the int4 wrapper above)."""
    L, B, Hkv, max_len, hd = cache_k.shape
    if max_len % 32 != 0:
        raise ValueError(f"max_len % 32 != 0 ({max_len})")
    off_arr = jnp.asarray(offset, jnp.int32).reshape(-1)
    per_row = off_arr.size > 1
    if per_row and off_arr.size != B:
        raise ValueError(f"offset must be scalar or [B]; got {off_arr.shape}")
    Hq = q.shape[1]
    G = Hq // Hkv
    stacked = k_scales.ndim == 4
    smap = (lambda i, li, *_: (li[0], i, 0, 0)) if stacked else \
        (lambda i, *_: (0, i, 0, 0))
    bmap = lambda i, *_: (i, 0, 0, 0)  # noqa: E731
    bmap3 = lambda i, *_: (i, 0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hkv, G, hd), bmap),
            pl.BlockSpec((1, Hkv, hd), bmap3),
            pl.BlockSpec((1, Hkv, hd), bmap3),
            pl.BlockSpec((1, Hkv, 1), bmap3),
            pl.BlockSpec((1, Hkv, 1), bmap3),
            pl.BlockSpec((1, 1, Hkv, max_len), smap),
            pl.BlockSpec((1, 1, Hkv, max_len), smap),
            pl.BlockSpec((1, 1, max_len), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, Hkv, G, hd), bmap),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((DEPTH, max_len, hd), jnp.int8),
            pltpu.VMEM((DEPTH, max_len, hd), jnp.int8),
            pltpu.VMEM((2, 32, hd), jnp.int8),  # 2x K write-back staging
            pltpu.VMEM((2, 32, hd), jnp.int8),  # 2x V write-back staging
            pltpu.SemaphoreType.DMA((DEPTH, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out, ck, cv = pl.pallas_call(
        functools.partial(
            _kernel_mono_q8, scale=scale, n_heads=Hkv, n_rows=B,
            per_row=per_row,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, G, hd), q.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        # (li, off, q, knew, vnew, ksn, vsn, ks, vs, valid, ck, cv)
        input_output_aliases={10: 1, 11: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        off_arr,
        q.reshape(B, Hkv, G, hd),
        k_new_q.reshape(B, Hkv, hd),
        v_new_q.reshape(B, Hkv, hd),
        k_new_scale.astype(jnp.float32).reshape(B, Hkv, 1),
        v_new_scale.astype(jnp.float32).reshape(B, Hkv, 1),
        k_scales.astype(jnp.float32).reshape(-1, B, Hkv, max_len),
        v_scales.astype(jnp.float32).reshape(-1, B, Hkv, max_len),
        valid.astype(jnp.int32)[:, None, :],
        cache_k,
        cache_v,
    )
    return out.reshape(B, Hq, hd), ck, cv


def _kernel_mono_full(
    li_ref, off_ref,
    q_ref,       # [1, Hkv, G, hd]
    knew_ref,    # [1, Hkv, hd] cache dtype
    vnew_ref,
    valid_ref,   # [1, 1, max_len]
    ck_any, cv_any,
    out_ref,     # [1, Hkv, G, hd]
    ck_out, cv_out,
    k_db, v_db, wbk_buf, wbv_buf, sems, wsems,
    *,
    scale: float,
    n_heads: int,
    n_rows: int,
    depth: int,
    hpd: int,
    per_row: bool,
):
    """Full-precision (bf16/f32 cache) mono kernel: the VPU-lean structure
    of _kernel_mono4 (analytic fresh row, double-buffered 32-row staged
    write-back, hpd heads per DMA) with no scales and no unpack — the
    replacement for the db kernel on unquantized caches, and the first
    per-row-offset (serving pool) kernel for bf16 caches (those previously
    fell back to XLA entirely)."""
    b = pl.program_id(0)
    li = li_ref[0]
    off = off_ref[b] if per_row else off_ref[0]
    groups = n_heads // hpd
    n = n_rows * groups

    def slab_dma(idx, s):
        bb = idx // groups
        gg = jax.lax.rem(idx, groups)
        return (
            pltpu.make_async_copy(
                ck_any.at[li, bb, pl.ds(gg * hpd, hpd)], k_db.at[s],
                sems.at[s, 0],
            ),
            pltpu.make_async_copy(
                cv_any.at[li, bb, pl.ds(gg * hpd, hpd)], v_db.at[s],
                sems.at[s, 1],
            ),
        )

    for j in range(depth - 1):
        @pl.when((b == 0) & (j < n))
        def _(j=j):
            ka, va = slab_dma(j, j % depth)
            ka.start()
            va.start()

    max_len = k_db.shape[-2]
    row1 = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    is_new_r = row1 == off
    off_clamped = jnp.clip(off, 0, max_len - 1)
    off_al = pl.multiple_of((off_clamped // 32) * 32, 32)
    valid = valid_ref[0, 0, :]
    fresh_on = jnp.max(jnp.where(is_new_r, valid[None, :], 0)) > 0
    dead = jnp.logical_or(valid[None, :] <= 0, is_new_r)
    roww = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0) + off_al
    is_new_w = roww == off
    cdt = q_ref.dtype
    wbs = []

    for g in range(groups):
        i = b * groups + g

        @pl.when(i + depth - 1 < n)
        def _(g=g):
            idx = b * groups + g + depth - 1
            s = jax.lax.rem(idx, depth)
            ka, va = slab_dma(idx, s)
            ka.start()
            va.start()

        slot = jax.lax.rem(i, depth)
        if groups % depth == 0:
            slot = g % depth
        ka, va = slab_dma(i, slot)
        ka.wait()
        va.wait()

        for h2 in range(hpd):
            h = g * hpd + h2
            t = g * hpd + h2
            wsl = t % 2
            if t >= 2:
                pk, pv = wbs[t - 2]
                pk.wait()
                pv.wait()
            wbk_buf[wsl] = jnp.where(
                is_new_w, knew_ref[0, h][None, :],
                k_db[slot, h2, pl.ds(off_al, 32), :],
            )
            wbv_buf[wsl] = jnp.where(
                is_new_w, vnew_ref[0, h][None, :],
                v_db[slot, h2, pl.ds(off_al, 32), :],
            )
            wb_k = pltpu.make_async_copy(
                wbk_buf.at[wsl], ck_out.at[li, b, h, pl.ds(off_al, 32), :],
                wsems.at[wsl, 0],
            )
            wb_v = pltpu.make_async_copy(
                wbv_buf.at[wsl], cv_out.at[li, b, h, pl.ds(off_al, 32), :],
                wsems.at[wsl, 1],
            )
            wb_k.start()
            wb_v.start()
            wbs.append((wb_k, wb_v))

            q = q_ref[0, h]
            logits = jax.lax.dot_general(
                q, k_db[slot, h2].astype(cdt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            logits = jnp.where(dead, -1e30, logits)
            # analytic fresh-row term (f32 VPU multiply-reduce — Mosaic
            # rejects the skinny bf16 dot; see the int4 kernel)
            lf = jnp.sum(
                q.astype(jnp.float32)
                * knew_ref[0, h][None, :].astype(jnp.float32),
                axis=1, keepdims=True,
            ) * scale
            lf = jnp.where(fresh_on, lf, -1e30)
            m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), lf)
            p = jnp.exp(logits - m)
            pf = jnp.exp(lf - m)
            denom = jnp.sum(p, axis=-1, keepdims=True) + pf
            acc = jax.lax.dot_general(
                p.astype(cdt), v_db[slot, h2].astype(cdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + pf * vnew_ref[0, h][None, :].astype(jnp.float32)
            out_ref[0, h] = (acc / denom).astype(out_ref.dtype)

    for wb_k, wb_v in wbs[-2:]:
        wb_k.wait()
        wb_v.wait()


def decode_attention_mono(
    q, k_new, v_new, cache_k, cache_v, layer, offset, valid, scale,
    interpret: bool = False, depth: int | None = None, hpd: int | None = None,
):
    """Full-precision mono-grid decode attention (same contract as
    decode_attention_db.decode_attention_db; offset may be scalar or [B]
    per-row append slots — see decode_attention_quantized4_mono)."""
    L, B, Hkv, max_len, hd = cache_k.shape
    if max_len % 32 != 0:
        raise ValueError(f"max_len % 32 != 0 ({max_len})")
    depth = MONO_DEPTH if depth is None else depth
    hpd = MONO_HPD if hpd is None else hpd
    if Hkv % hpd:
        hpd = 1
    off_arr = jnp.asarray(offset, jnp.int32).reshape(-1)
    per_row = off_arr.size > 1
    if per_row and off_arr.size != B:
        raise ValueError(f"offset must be scalar or [B]; got {off_arr.shape}")
    Hq = q.shape[1]
    G = Hq // Hkv
    bmap = lambda i, *_: (i, 0, 0, 0)  # noqa: E731
    bmap3 = lambda i, *_: (i, 0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hkv, G, hd), bmap),
            pl.BlockSpec((1, Hkv, hd), bmap3),
            pl.BlockSpec((1, Hkv, hd), bmap3),
            pl.BlockSpec((1, 1, max_len), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, Hkv, G, hd), bmap),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((depth, hpd, max_len, hd), cache_k.dtype),
            pltpu.VMEM((depth, hpd, max_len, hd), cache_v.dtype),
            pltpu.VMEM((2, 32, hd), cache_k.dtype),
            pltpu.VMEM((2, 32, hd), cache_v.dtype),
            pltpu.SemaphoreType.DMA((depth, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out, ck, cv = pl.pallas_call(
        functools.partial(
            _kernel_mono_full, scale=scale, n_heads=Hkv, n_rows=B,
            depth=depth, hpd=hpd, per_row=per_row,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, G, hd), q.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        # (li, off, q, knew, vnew, valid, ck, cv) -> (out, ck, cv)
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        off_arr,
        q.reshape(B, Hkv, G, hd),
        k_new.reshape(B, Hkv, hd).astype(cache_k.dtype),
        v_new.reshape(B, Hkv, hd).astype(cache_v.dtype),
        valid.astype(jnp.int32)[:, None, :],
        cache_k,
        cache_v,
    )
    return out.reshape(B, Hq, hd), ck, cv
