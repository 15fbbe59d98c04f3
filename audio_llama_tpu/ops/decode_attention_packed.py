"""Head-packed, timeline-chunked decode-attention kernel.

Round-3 attribution (BASELINE.md r3b10): the double-buffered kernel
(ops/decode_attention_db.py) runs ~260 GB/s effective inside the decode
step vs the 810 GB/s HBM floor. Its grid is (B*Hkv,) — at llama geometry
that is 256 programs per layer at B32, each moving only a 0.25-0.5 MB
K/V slab pair, so fixed per-program cost (grid step, DMA issue latency,
semaphore waits) dominates the timeline read.

This kernel restructures the grid to (B * NC,) where NC chunks the cache
timeline: each program DMAs ALL Hkv heads' K/V rows for one timeline chunk
in a single strided copy ([Hkv, CH, hd] — Hkv x fewer, Hkv x fatter
transfers, contiguous per head) and accumulates attention across chunks
with an online (flash) softmax per head:

  grid (B, NC) flattened; per invocation (one batch row, one chunk):
    DMA   K/V slabs [Hkv, CH, hd] HBM -> VMEM (DEPTH-deep pipeline)
    patch slab[off - c0] = new K/V row (VMEM select, off-chunk only)
    MXU   per head: s = q_group @ K_chunk^T        [G, CH] f32
    VPU   running max/denominator rescale (exact true-max softmax)
    MXU   acc += p @ V_chunk                       [G, hd] f32
    DMA   32-row aligned window back to HBM        (off-chunk only)
  last chunk: out = acc / denom

B1 gains an NC-deep DMA pipeline (the db kernel had none at B1: 8 serial
slab pairs); B32 drops from 256 thin programs to B*NC fat ones. Same
in-place cache contract as ops/decode_attention.py (input_output_aliased
cache, scalar-prefetched layer/offset, one compiled kernel for every
step). Parity: tests/test_decode_packed.py (vs the simple kernel).

Reference analog: HF eager decode attention (reference src/models/allm.py
generate path); this is the TPU-native replacement.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention import available  # noqa: F401  (same TPU gate)

# Max DMA pipeline depth across grid programs (slabs in flight); large
# chunks reduce it to fit the ~16 MB scoped-VMEM default (we also raise
# vmem_limit_bytes to cover the slab buffers explicitly). Env knobs so TPU
# sweeps can tune the production dispatch without an API thread-through.
DEPTH = int(os.environ.get("PACKED_DEPTH", "4"))
_SLAB_BUDGET = 24 * 1024 * 1024
# Default timeline-chunk length; actual chunk is the largest divisor of
# max_len that is <= this (timelines are 32-row multiples by contract).
DEFAULT_CHUNK = int(os.environ.get("PACKED_CHUNK", "512"))

_NEG = -1e30


def _pick_chunk(max_len: int, chunk: int) -> int:
    c = (min(chunk, max_len) // 32) * 32  # 32-slot DMA/tile granularity
    while max_len % c != 0:
        c -= 32
        if c <= 32:
            return 32
    return c


def _kernel(
    li_ref, off_ref,
    q_ref,      # [1, Hkv, G, hd]
    knew_ref,   # [1, Hkv, 1, hd]
    vnew_ref,   # [1, Hkv, 1, hd]
    valid_ref,  # [1, 1, 1, CHp] (this chunk's slot validity, lane-padded)
    ck_any, cv_any,
    out_ref,    # [1, Hkv, G, hd]
    ck_out, cv_out,
    k_db,       # [DEPTH, Hkv, CH, hd] scratch
    v_db,
    m_sc,       # [Hkv, G, 1] f32 running max
    l_sc,       # [Hkv, G, 1] f32 running denominator
    acc_sc,     # [Hkv, G, hd] f32 running numerator
    sems,       # DMA semaphores (DEPTH, 2)
    wsems,      # write-back semaphores (2,)
    *,
    scale: float,
    n_chunks: int,
    quantized: bool,
    depth: int,
    ks_new_ref=None,  # [1, Hkv, 1, 1] f32   (quantized only)
    vs_new_ref=None,
    ks_ref=None,      # [1, 1, Hkv, 1, CHp] f32 (this chunk's scales)
    vs_ref=None,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    li = li_ref[0]
    off = off_ref[0]
    NC = n_chunks
    slot = jax.lax.rem(i, depth)
    c = jax.lax.rem(i, NC)
    CH = k_db.shape[2]
    hkv = k_db.shape[1]
    c0 = c * CH

    def slab_dma(idx, s):
        b = idx // NC
        cc = jax.lax.rem(idx, NC)
        src = pl.ds(cc * CH, CH)
        return (
            pltpu.make_async_copy(
                ck_any.at[li, b, :, src, :], k_db.at[s], sems.at[s, 0]
            ),
            pltpu.make_async_copy(
                cv_any.at[li, b, :, src, :], v_db.at[s], sems.at[s, 1]
            ),
        )

    # Warm-up: first invocation launches the first depth-1 slab pairs.
    for j in range(depth - 1):
        @pl.when((i == 0) & (j < n))
        def _(j=j):
            ka, va = slab_dma(j, j % depth)
            ka.start()
            va.start()

    @pl.when(i + depth - 1 < n)
    def _():
        kn, vn = slab_dma(i + depth - 1, jax.lax.rem(i + depth - 1, depth))
        kn.start()
        vn.start()

    ka, va = slab_dma(i, slot)
    ka.wait()
    va.wait()

    @pl.when(c == 0)
    def _():
        m_sc[...] = jnp.full(m_sc.shape, _NEG, jnp.float32)
        l_sc[...] = jnp.zeros(l_sc.shape, jnp.float32)
        acc_sc[...] = jnp.zeros(acc_sc.shape, jnp.float32)

    row_col = jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0) + c0
    is_new_col = row_col == off          # [CH, 1]
    row_r = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1) + c0
    is_new_r = row_r == off              # [1, CH]
    valid_row = valid_ref[0, 0][:, :CH]  # [1, CH] int32 (pad lanes dropped)

    off_cl = jnp.minimum(off, NC * CH - 1)
    is_off_chunk = (off_cl // CH) == c

    # exp/probability dtype rides the compute dtype: bf16 halves the VPU
    # pass cost on the [G, CH] tiles (f32 inputs keep f32 for tight parity)
    cdt = q_ref.dtype
    edt = cdt
    # one-hot of the appended row: the slab in HBM is STALE at column `off`
    # (the new K/V row is an operand, not yet written back). Instead of
    # merging the row into the whole [CH, hd] slab (two full VMEM passes
    # per head), fix the score column and the PV contribution directly.
    # All the skinny [*, 1] contractions below are explicit f32 VPU
    # multiply-reduces: Mosaic lowers N=1/M=1 dot_generals as
    # broadcast-multiply anyway, and the mixed bf16->f32 broadcast it
    # emits for them fails MLIR verification on real TPUs ('vector.
    # broadcast' element-type error; r3 packed-bench log).
    onehot_col = is_new_col.astype(jnp.float32)  # [CH, 1]
    onehot_row = is_new_r.astype(jnp.float32)    # [1, CH]

    last = c == NC - 1
    for h in range(hkv):
        k_h = k_db[slot, h]              # raw slab (cache dtype)
        v_h = v_db[slot, h]
        q_h = q_ref[0, h]                # [G, hd]
        kcast = k_h if k_h.dtype == cdt else k_h.astype(cdt)
        vcast = v_h if v_h.dtype == cdt else v_h.astype(cdt)
        knew = knew_ref[0, h]            # [1, hd]
        vnew = vnew_ref[0, h]
        kn_cast = knew if knew.dtype == cdt else knew.astype(cdt)
        vn_cast = vnew if vnew.dtype == cdt else vnew.astype(cdt)

        s = jax.lax.dot_general(
            q_h, kcast, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                # [G, CH]
        s_new = jnp.sum(
            q_h.astype(jnp.float32) * kn_cast.astype(jnp.float32),
            axis=1, keepdims=True,
        )                                # [G, 1]
        if quantized:
            k_srow = jnp.where(
                is_new_r, ks_new_ref[0, h], ks_ref[0, 0, h][:, :CH]
            )
            s = jnp.where(is_new_r, s_new, s) * (k_srow * scale)
        else:
            s = jnp.where(is_new_r, s_new, s) * scale
        s = jnp.where(valid_row > 0, s, _NEG)

        m_old = m_sc[h]                  # [G, 1]
        l_old = l_sc[h]
        acc_old = acc_sc[h]              # [G, hd]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)   # [G, 1]
        # explicit valid mask: a fully-masked chunk must contribute 0 even
        # when m_new is still the -1e30 sentinel (exp(0)=1 otherwise)
        p = jnp.where(
            valid_row > 0, jnp.exp((s - m_new).astype(edt)),
            jnp.zeros((), edt),
        )                                # [G, CH] edt
        lsum = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        l_new = alpha * l_old + lsum
        if quantized:
            v_srow = jnp.where(
                is_new_r, vs_new_ref[0, h], vs_ref[0, 0, h][:, :CH]
            )
            pv_in = (p.astype(jnp.float32) * v_srow).astype(cdt)
        else:
            pv_in = p
        pv = jax.lax.dot_general(
            pv_in, vcast, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                # [G, hd]
        # appended-row PV fix: swap the stale row's contribution for vnew
        pn = jnp.sum(
            pv_in.astype(jnp.float32) * onehot_row, axis=1, keepdims=True
        )                                # [G, 1] = (p*v_s)[:, off]
        v_old = jnp.sum(
            vcast.astype(jnp.float32) * onehot_col, axis=0, keepdims=True
        )                                # [1, hd] stale slab row
        pv = pv + pn * (vn_cast.astype(jnp.float32) - v_old)
        acc_new = alpha * acc_old + pv
        m_sc[h] = m_new
        l_sc[h] = l_new
        acc_sc[h] = acc_new

        @pl.when(last)
        def _(acc_new=acc_new, l_new=l_new, h=h):
            out_ref[0, h] = (acc_new / l_new).astype(out_ref.dtype)

    # Windowed write-back of the appended row (32-row aligned covers every
    # dtype's HBM sublane tile), all heads in one strided DMA pair. The
    # compute path above never merged the new row into the slab (it fixes
    # scores/PV via one-hot dots), so merge it here first — a static
    # full-slab select on exactly ONE of the B*NC programs (dynamic
    # sublane stores are unprovable in Mosaic; this select is not).
    @pl.when(is_off_chunk)
    def _():
        for h in range(hkv):
            k_db[slot, h] = jnp.where(is_new_col, knew_ref[0, h], k_db[slot, h])
            v_db[slot, h] = jnp.where(is_new_col, vnew_ref[0, h], v_db[slot, h])
        b = i // NC
        g_al = pl.multiple_of((off_cl // 32) * 32, 32)
        loc_al = pl.multiple_of(g_al - c0, 32)
        wb_k = pltpu.make_async_copy(
            k_db.at[slot, :, pl.ds(loc_al, 32), :],
            ck_out.at[li, b, :, pl.ds(g_al, 32), :], wsems.at[0],
        )
        wb_v = pltpu.make_async_copy(
            v_db.at[slot, :, pl.ds(loc_al, 32), :],
            cv_out.at[li, b, :, pl.ds(g_al, 32), :], wsems.at[1],
        )
        wb_k.start()
        wb_v.start()
        wb_k.wait()
        wb_v.wait()


def _call(
    q, k_new, v_new, cache_k, cache_v, layer, offset, valid, scale,
    chunk, interpret, quant_args=None, depth_override=None,
):
    L, B, Hkv, max_len, hd = cache_k.shape
    if max_len % 32 != 0:
        raise ValueError(f"max_len % 32 != 0 ({max_len})")
    Hq = q.shape[1]
    G = Hq // Hkv
    CH = _pick_chunk(max_len, chunk)
    NC = max_len // CH
    quantized = quant_args is not None
    esize = jnp.dtype(cache_k.dtype).itemsize
    slab_pair = 2 * Hkv * CH * hd * esize
    depth_cap = DEPTH if depth_override is None else depth_override
    depth = max(2, min(depth_cap, _SLAB_BUDGET // max(slab_pair, 1)))
    vmem_limit = min(110 * 1024 * 1024, depth * slab_pair + 8 * 1024 * 1024)

    def bmap(i, *_):
        return (i // NC, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, Hkv, G, hd), bmap),
        pl.BlockSpec((1, Hkv, 1, hd), bmap),
        pl.BlockSpec((1, Hkv, 1, hd), bmap),
    ]
    args = [
        q.reshape(B, Hkv, G, hd),
        k_new.astype(cache_k.dtype).reshape(B, Hkv, 1, hd),
        v_new.astype(cache_v.dtype).reshape(B, Hkv, 1, hd),
    ]
    # Chunk-indexed lane operands (per-slot validity, per-row scales) are
    # laid out ONE CHUNK PER BLOCK with the chunk padded up to a lane tile:
    # [B, NC, ..., CHp] with CHp = roundup(CH, 128). A [.., 1, CHp] block is
    # legal for ANY 32-multiple CH (Mosaic wants the last two block dims
    # divisible by (8, 128) or equal to the array dims — 32-slot-rounded
    # timelines like 2080 have no 128-multiple divisor, so blocking the
    # flat [.., max_len] row by CH is not). The kernel slices off the pad.
    CHp = -(-CH // 128) * 128

    def _chunked_rows(x, inner):  # [B, *inner, max_len] -> [B, NC, *inner, 1, CHp]
        x = x.reshape(x.shape[:-1] + (NC, CH))
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, CHp - CH)])
        x = jnp.moveaxis(x, -2, 1)  # NC right after B
        return x.reshape((B, NC) + inner + (1, CHp))

    kw = {}
    if quantized:
        ks, vs, ks_new, vs_new = quant_args
        in_specs += [
            pl.BlockSpec((1, Hkv, 1, 1), bmap),
            pl.BlockSpec((1, Hkv, 1, 1), bmap),
            pl.BlockSpec(
                (1, 1, Hkv, 1, CHp),
                lambda i, *_: (i // NC, jax.lax.rem(i, NC), 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, Hkv, 1, CHp),
                lambda i, *_: (i // NC, jax.lax.rem(i, NC), 0, 0, 0),
            ),
        ]
        args += [
            ks_new.astype(jnp.float32).reshape(B, Hkv, 1, 1),
            vs_new.astype(jnp.float32).reshape(B, Hkv, 1, 1),
            _chunked_rows(ks.astype(jnp.float32), (Hkv,)),
            _chunked_rows(vs.astype(jnp.float32), (Hkv,)),
        ]
    in_specs += [
        pl.BlockSpec(
            (1, 1, 1, CHp),
            lambda i, *_: (i // NC, jax.lax.rem(i, NC), 0, 0),
        ),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    args += [
        _chunked_rows(valid.astype(jnp.int32), ()), cache_k, cache_v
    ]

    # alias the cache operands (count includes the 2 scalar-prefetch args)
    n_in = 2 + len(args)
    aliases = {n_in - 2: 1, n_in - 1: 2}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * NC,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, Hkv, G, hd), bmap),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((depth, Hkv, CH, hd), cache_k.dtype),
            pltpu.VMEM((depth, Hkv, CH, hd), cache_v.dtype),
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, hd), jnp.float32),
            pltpu.SemaphoreType.DMA((depth, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    if quantized:
        def body(li, off, qr, knr, vnr, ksn, vsn, ksr, vsr, vr,
                 ck, cv, o, cko, cvo, kdb, vdb, m, l, acc, sem, wsem):
            _kernel(
                li, off, qr, knr, vnr, vr, ck, cv, o, cko, cvo,
                kdb, vdb, m, l, acc, sem, wsem,
                scale=scale, n_chunks=NC, quantized=True, depth=depth,
                ks_new_ref=ksn, vs_new_ref=vsn, ks_ref=ksr, vs_ref=vsr,
            )
    else:
        body = functools.partial(
            _kernel, scale=scale, n_chunks=NC, quantized=False, depth=depth,
        )

    out, ck2, cv2 = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, G, hd), q.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=vmem_limit
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(offset, jnp.int32).reshape(1),
        *args,
    )
    return out.reshape(B, Hq, hd), ck2, cv2


def decode_attention_packed(
    q, k_new, v_new, cache_k, cache_v, layer, offset, valid, scale,
    chunk: int = DEFAULT_CHUNK, interpret: bool = False, depth=None,
):
    """Drop-in for decode_attention_db (head-packed chunked grid)."""
    return _call(
        q, k_new, v_new, cache_k, cache_v, layer, offset, valid, scale,
        chunk, interpret, depth_override=depth,
    )


def decode_attention_quantized_packed(
    q, k_new_q, v_new_q, cache_k, cache_v,
    k_scales, v_scales, k_new_scale, v_new_scale,
    layer, offset, valid, scale,
    chunk: int = DEFAULT_CHUNK, interpret: bool = False, depth=None,
):
    """Drop-in for decode_attention_quantized_db (head-packed chunked)."""
    return _call(
        q, k_new_q, v_new_q, cache_k, cache_v, layer, offset, valid, scale,
        chunk, interpret,
        quant_args=(k_scales, v_scales, k_new_scale, v_new_scale),
        depth_override=depth,
    )
