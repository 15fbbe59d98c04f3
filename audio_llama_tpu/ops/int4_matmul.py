"""W4A16: group-wise int4 weight-only matmul (Pallas dequant kernel).

Decode at 3B dims is a weight-stream problem: every step reads every decoder
weight once, so tokens/sec tracks HBM bytes. Round 2 halved the stream with
W8A16 (models/llama_int8.py, XLA upcasts int8 inside the matmul fusion);
int4 halves it AGAIN, but XLA has no int4 matmul path — hence this kernel
(round-2 VERDICT next-step #3).

Layout ("column-pair halves packing"): a weight w [K, N] (in, out) is
quantized per (group, out-column) with groups of G=128 contraction rows —
q in [-7, 7], scale = absmax/7 — and byte-packed pairing output column j
with column j + N/2:

    packed[k, j] = (q[k, j] & 0xF) | (q[k, j + N/2] << 4)      # [K, N/2] i8

Unpacking a packed lane tile then yields TWO CONTIGUOUS half-tiles (low
nibbles -> columns [0, N/2), high nibbles -> [N/2, N)) — no lane
interleave, which TPU's VPU cannot do cheaply. The kernel writes a [2, M,
N/2] output (lo/hi planes) that the wrapper concatenates.

Why the scale factors out of the MXU: within group g the scale is constant
over the contraction rows, so

    sum_k x_k * (q_kj * s_gj) == (sum_k x_k * q_kj) * s_gj

— the MXU multiplies x by raw int4-as-bf16 values and the VPU applies one
[M_tile, N_tile] multiply per group. Dequant VPU cost is ~4 ops per weight
element; at decode (M<=32) the kernel is HBM-bound with huge VPU headroom,
and at prefill (M large) the unpack amortizes over the M tile.

Numerics: exact for the quantized weights (the kernel computes the same
sum as dequantize-then-matmul, f32 accumulation); quantization error is
the int4 group-wise error itself (~1e-2 relative — gate end-task accuracy
with the toy-WER harness before serving with it).

Reference analog: none (reference serves f16 via HF generate). Public int4
serving precedent: AWQ/GPTQ-class W4A16 kernels; this is the TPU-native
equivalent with the packing chosen for VPU-friendly unpacking.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128  # contraction rows per scale group (== MXU tile depth)

import os as _os

# output-half-column block default (tuning knob: round-4 B1 trace showed
# the qkv/o matmuls at 57% of their weight-DMA floor at M=1)
INT4_BN = int(_os.environ.get("INT4_BN", "0"))

# contraction (K) block for the STACKED decode matmuls: 0 = whole K per
# grid step (rounds 3-4). A K-split grid (mi, ni, ki-minor with scratch
# accumulation) shrinks the first-fetch pipeline-fill exposure — at M=1
# the qkv/o grids are only 3-5 steps of 1.5 MB weight blocks, so the
# unoverlapped first fetch alone costs ~1/(n+1) of the kernel (round-5
# trace: qkv/o at 65% of their weight-DMA floor; the round-4 N-block
# sweep never touched K). Must divide K and be a multiple of GROUP.
INT4_BK = int(_os.environ.get("INT4_BK", "0"))

# nibble-unpack variant (A/B knob; all three are BIT-EXACT equal):
#   i32lite — DEFAULT: lo shl28/shr28, hi = one arithmetic shr4 (3 shifts).
#             One shift fewer than 'shift' measured +17.4% B1 decode /
#             +2.5% B32 / +2.3% B64 end-to-end (the int4 kernels are
#             VPU-unpack-bound at small M, not DMA-bound — round-4 finding
#             experiments/b1_unpack_ab.sh).
#   shift   — the round-3 unpack (lo shl/shr, hi shl24/shr28), kept for A/B
#   fp      — all-bf16 (convert, *0.0625, floor, mul-sub, floor-based sign
#             fix; half the VPU lane traffic of int32). NOTE: bf16 vector
#             compare does not legalize on v5e Mosaic ("Target does not
#             support this comparison"), hence the floor-based sign fix.
INT4_UNPACK = _os.environ.get("INT4_UNPACK", "i32lite")

# pack FORMAT (not just an unpack variant — quantize_pack and the kernels
# must agree; process-level via env, explicit `fmt=` for tests):
#   pair — low nibble = signed lo, high nibble = signed hi (rounds 3-4).
#   obin — low nibble stores lo+8 (offset-binary). The sign-extended BYTE
#          is then exactly 16*hi + (lo+8), so the kernel matmuls the RAW
#          byte plane (one i8->bf16 convert, no shifts) plus the hi plane
#          (one shr4) and recovers the lo output in the f32 epilogue:
#              dot(x, lo) = dot(x, byte) - 16*dot(x, hi) - 8*sum(x_group)
#          Unpack drops from 3 shifts + 2 converts per weight byte to
#          1 shift + 2 converts; the correction runs on the [bm, nh]
#          accumulator instead of the [group, nh] weight tile. The round-4
#          finding that the int4 kernels are VPU-unpack-bound at M=1
#          (i32lite's single dropped shift = +17% B1) motivates this.
INT4_FMT = _os.environ.get("INT4_FMT", "pair")


def pack_nibbles(lo: jnp.ndarray, hi: jnp.ndarray, fmt: str | None = None
                 ) -> jnp.ndarray:
    """int4 planes (values in [-7, 7]) -> packed int8 byte per column pair.
    Shared by quantize_pack and models/llama_gptq._pack so the format flag
    has exactly one implementation."""
    fmt = fmt or INT4_FMT
    lo32 = lo.astype(jnp.int32)
    if fmt == "obin":
        lo32 = lo32 + 8  # [1, 15]: no sign bit, byte == 16*hi + (lo+8)
    return jnp.bitwise_or(
        jnp.bitwise_and(lo32, 0xF),
        jnp.left_shift(jnp.bitwise_and(hi.astype(jnp.int32), 0xF), 4),
    ).astype(jnp.int8)


def _unpack_planes(b_i8, cdt):
    """Packed int8 block -> (lo, hi) int4 planes in compute dtype.
    Variant selected by INT4_UNPACK (bit-exact equal; perf A/B)."""
    if INT4_UNPACK == "fp":
        bf = b_i8.astype(jnp.bfloat16)
        hi = jnp.floor(bf * 0.0625)
        lo_u = bf - hi * 16.0          # unsigned low nibble in [0, 15]
        # sign fix without a vector compare: floor(lo_u/8) is 1 iff the
        # nibble's sign bit is set (exact in bf16 for integers <= 15)
        lo = lo_u - 16.0 * jnp.floor(lo_u * 0.125)
        return lo.astype(cdt), hi.astype(cdt)
    b = b_i8.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(b, 28), 28)
    if INT4_UNPACK == "shift":
        hi = jnp.right_shift(jnp.left_shift(b, 24), 28)
    else:  # i32lite (default)
        hi = jnp.right_shift(b, 4)
    return lo.astype(cdt), hi.astype(cdt)


# obin strategy switch: the epilogue recovery pays a per-activation-row
# row-sum + two [bm, nh] FMAs; at decode M=1 that is ~free while the saved
# unpack shifts are the whole kernel (+6..45% B1 end-to-end across
# sessions — tunnel noise dominates; obin_ab*.sh, /tmp/b1_confirm), but
# at bm=64 the epilogue measured -6.3%. Above this block-M, unpack obin
# bytes DIRECTLY — and/sub/shr, the same op count as 'pair' i32lite — so
# one storage format serves every batch.
OBIN_EPI_M = int(_os.environ.get("OBIN_EPI_M", "32"))


def _group_dots(xg, braw, cdt, fmt):
    """One scale-group's raw int4 dots: (p_lo, p_hi) f32 [bm, nh].

    pair: unpack both nibble planes (3 shifts + 2 converts over the
    [group, nh] weight tile), two MXU dots.
    obin, bm <= OBIN_EPI_M: dot the RAW byte plane and the hi plane; the
    lo dot falls out of the f32 epilogue (see INT4_FMT). byte values are
    ints in [-127, 127] — exact in bf16; products are exact in the f32 MXU
    accumulator.
    obin, bm > OBIN_EPI_M: direct unpack (lo = (b & 0xF) - 8), same VPU op
    count as 'pair' — the epilogue's [bm]-scaling terms stop paying."""
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if fmt == "obin":
        if xg.shape[0] > OBIN_EPI_M:
            b = braw.astype(jnp.int32)
            lo = (jnp.bitwise_and(b, 0xF) - 8).astype(cdt)
            hi = jnp.right_shift(b, 4).astype(cdt)
            return dot(xg, lo), dot(xg, hi)
        b_bf = braw.astype(cdt)  # one convert, no shifts
        hi = jnp.right_shift(braw.astype(jnp.int32), 4).astype(cdt)
        p_b = dot(xg, b_bf)
        p_hi = dot(xg, hi)
        sx = jnp.sum(xg.astype(jnp.float32), axis=1)  # [bm]
        p_lo = p_b - 16.0 * p_hi - 8.0 * sx[:, None]
        return p_lo, p_hi
    lo, hi = _unpack_planes(braw, cdt)
    return dot(xg, lo), dot(xg, hi)



# ---------------------------------------------------------------------------
# quantize / pack (jit-able; runs once at load time)
# ---------------------------------------------------------------------------

def quantize_pack(
    w: jnp.ndarray, group: int = GROUP,
    clip_cands: Tuple[float, ...] | None = None,
    fmt: str | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w [K, N] float -> (packed [K, N/2] int8, scales [K/group, N] f32).

    N must be even; K must divide by `group`.

    clip_cands: optional clipped-RTN scale search — for each (group, column)
    the scale absmax*c/7 with the lowest reconstruction MSE over the
    candidates wins (AWQ/GPTQ-family clipping: shrinking the scale trades
    one outlier element's error for finer resolution on the other group-1
    elements). One-time offline cost; sequential lax.map over candidates
    bounds the transients.
    """
    K, N = w.shape
    if N % 2 or K % group:
        raise ValueError(f"int4 pack needs even N and group|K; got {w.shape}")
    wf = w.astype(jnp.float32)
    g = wf.reshape(K // group, group, N)
    absmax = jnp.max(jnp.abs(g), axis=1)  # [K/g, N]
    scales = jnp.maximum(absmax, 1e-8) / 7.0
    if clip_cands:
        def err_for(c):
            s = scales * c
            qc = jnp.clip(jnp.round(g / s[:, None, :]), -7, 7)
            return jnp.sum((g - qc * s[:, None, :]) ** 2, axis=1)  # [K/g, N]

        errs = jax.lax.map(err_for, jnp.asarray(clip_cands, jnp.float32))
        best = jnp.argmin(errs, axis=0)  # [K/g, N]
        scales = scales * jnp.asarray(clip_cands, jnp.float32)[best]
    q = jnp.clip(jnp.round(g / scales[:, None, :]), -7, 7).astype(jnp.int8)
    q = q.reshape(K, N)
    packed = pack_nibbles(q[:, : N // 2], q[:, N // 2 :], fmt)
    return packed, scales


def unpack_ref(packed: jnp.ndarray, fmt: str | None = None) -> jnp.ndarray:
    """packed [K, N/2] int8 -> q [K, N] int32 (sign-extended nibbles)."""
    fmt = fmt or INT4_FMT
    b = packed.astype(jnp.int32)
    if fmt == "obin":
        lo = jnp.bitwise_and(b, 0xF) - 8
    else:
        lo = jnp.right_shift(jnp.left_shift(b, 28), 28)  # sign-extends
    hi = jnp.right_shift(jnp.left_shift(b, 24), 28)
    return jnp.concatenate([lo, hi], axis=1)


def dequantize_ref(packed: jnp.ndarray, scales: jnp.ndarray,
                   group: int = GROUP, fmt: str | None = None) -> jnp.ndarray:
    """Inverse of quantize_pack (f32) — the parity oracle."""
    q = unpack_ref(packed, fmt).astype(jnp.float32)
    K, N = q.shape
    s = jnp.repeat(scales, group, axis=0)  # [K, N]
    return q * s


def int4_matmul_ref(x: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray,
                    group: int = GROUP, compute_dtype=jnp.bfloat16,
                    fmt: str | None = None) -> jnp.ndarray:
    """XLA fallback/oracle: x [..., K] @ dequant(packed) -> [..., N] in
    compute dtype (f32 accumulation like the kernel)."""
    w = dequantize_ref(packed, scales, group, fmt).astype(compute_dtype)
    y = jnp.einsum(
        "...k,kn->...n", x.astype(compute_dtype), w,
        preferred_element_type=jnp.float32,
    )
    return y.astype(compute_dtype)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _kernel(x_ref, p_ref, slo_ref, shi_ref, o_ref, *, group, n_groups, bm,
            nh, fmt):
    """Grid step: x block [bm, K] @ packed block [K, nh] -> o [2, bm, nh].

    Loops the scale groups (static python loop — n_groups ~ 24 at llama
    dims): per-group raw dots via _group_dots (pair: unpack + two MXU
    matmuls; obin: byte-plane + hi-plane matmuls, epilogue correction),
    one scale-multiply-accumulate each.
    """
    x = x_ref[:]  # [bm, K]
    acc_lo = jnp.zeros((bm, nh), jnp.float32)
    acc_hi = jnp.zeros((bm, nh), jnp.float32)
    for g in range(n_groups):
        rows = slice(g * group, (g + 1) * group)
        plo, phi = _group_dots(x[:, rows], p_ref[rows, :], x.dtype, fmt)
        acc_lo = acc_lo + plo * slo_ref[g, :][None, :]
        acc_hi = acc_hi + phi * shi_ref[g, :][None, :]
    o_ref[0] = acc_lo.astype(o_ref.dtype)
    o_ref[1] = acc_hi.astype(o_ref.dtype)


def _pick(n, cands):
    for c in cands:
        if n % c == 0:
            return c
    return n


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_m", "block_n", "interpret", "fmt"),
)
def int4_matmul(
    x: jnp.ndarray,  # [..., K] bf16/f32
    packed: jnp.ndarray,  # [K, N/2] int8
    scales: jnp.ndarray,  # [K/group, N] f32
    group: int = GROUP,
    block_m: int = 0,
    block_n: int = 0,
    interpret: bool = False,
    fmt: str | None = None,
) -> jnp.ndarray:
    """x @ dequant(packed, scales) -> [..., N] in x.dtype (f32 accum)."""
    fmt = fmt or INT4_FMT
    *lead, K = x.shape
    Nh = packed.shape[1]
    N = Nh * 2
    n_groups = K // group
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    # Mosaic wants the sublane (second-to-last) block dim to be a multiple
    # of 8: pad the row count to the tile (decode: B<=32 -> one 8..32-row
    # tile; prefill: e.g. B16 x 2014 rows -> 256-row tiles, <2% pad waste).
    # Block sizes must also respect the ~16 MB scoped-VMEM budget WITH
    # Mosaic's double buffering: 2*(x block + packed block + out block)
    # — at K=8192 (llama down_proj) a 256-row x block alone is 4 MB, which
    # OOM'd the first TPU compile (r3b4.log).
    def fits(bm_, nh_):
        per = bm_ * K * 2 + K * nh_ + 2 * bm_ * nh_ * 2 + 8 * nh_ * 4 * 2
        return 2 * per <= 11 * 2 ** 20

    if block_m:
        bm = block_m
    else:
        bm = 256 if M >= 256 else -(-M // 8) * 8
    nh = block_n or (INT4_BN if INT4_BN and Nh % INT4_BN == 0 else 0) \
        or _pick(Nh, (512, 256, 128))
    if not (block_m or block_n):
        while not fits(bm, nh):
            if bm > 8 and bm * K * 2 >= K * nh:
                bm //= 2
            elif nh > 128 and Nh % (nh // 2) == 0:
                nh //= 2
            elif bm > 8:
                bm //= 2
            else:
                break
    M_pad = -(-M // bm) * bm
    if M_pad != M:
        x2 = jnp.pad(x2, ((0, M_pad - M), (0, 0)))
    nm, nn = M_pad // bm, Nh // nh

    s_lo = scales[:, : N // 2]
    s_hi = scales[:, N // 2 :]

    kernel = functools.partial(
        _kernel, group=group, n_groups=n_groups, bm=bm, nh=nh, fmt=fmt
    )
    out = pl.pallas_call(
        kernel,
        grid=(nm, nn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda mi, ni: (mi, 0)),
            pl.BlockSpec((K, nh), lambda mi, ni: (0, ni)),
            pl.BlockSpec((n_groups, nh), lambda mi, ni: (0, ni)),
            pl.BlockSpec((n_groups, nh), lambda mi, ni: (0, ni)),
        ],
        out_specs=pl.BlockSpec((2, bm, nh), lambda mi, ni: (0, mi, ni)),
        out_shape=jax.ShapeDtypeStruct((2, M_pad, Nh), x.dtype),
        interpret=interpret,
    )(x2, packed, s_lo, s_hi)
    y = jnp.concatenate([out[0], out[1]], axis=-1)  # [M_pad, N]
    if M_pad != M:
        y = y[:M]
    return y.reshape(*lead, N)


def available() -> bool:
    from . import flash_attention as fa

    return fa.available()


def _kernel_stacked(li_ref, x_ref, p_ref, slo_ref, shi_ref, o_ref, *,
                    group, n_groups, bm, nh, fmt):
    """Stacked-layer variant: identical math to _kernel, but the weight
    operands are the FULL [L, ...] slabs and the layer is chosen by the
    scalar-prefetched index inside the BlockSpec index maps. This exists
    because XLA cannot fuse a dynamic-slice into a pallas_call operand: the
    scan's per-layer weight slice was MATERIALIZED as a copy of every
    layer's packed weights (decode trace: 2.3 ms/step of dynamic-slice —
    a full extra read+write pass over the weight stream, r3b8 trace)."""
    # (fmt threading: see _kernel)
    del li_ref  # consumed by the index maps
    x = x_ref[:]
    acc_lo = jnp.zeros((bm, nh), jnp.float32)
    acc_hi = jnp.zeros((bm, nh), jnp.float32)
    for g in range(n_groups):
        rows = slice(g * group, (g + 1) * group)
        plo, phi = _group_dots(x[:, rows], p_ref[0, rows, :], x.dtype, fmt)
        acc_lo = acc_lo + plo * slo_ref[0, g, :][None, :]
        acc_hi = acc_hi + phi * shi_ref[0, g, :][None, :]
    o_ref[0] = acc_lo.astype(o_ref.dtype)
    o_ref[1] = acc_hi.astype(o_ref.dtype)


def _kernel_stacked_ksplit(li_ref, x_ref, p_ref, slo_ref, shi_ref, o_ref,
                           acc, *, group, n_groups, bm, nh, nk, fmt):
    """K-split twin of _kernel_stacked: the grid's minor axis walks
    contraction blocks of n_groups scale groups each, accumulating into a
    VMEM scratch and emitting once at the last K block. Same math, same
    DMA bytes — but the per-step weight block is nk x smaller, so the
    pipeline fills (and drains) in 1/nk of the old exposure (the INT4_BK
    rationale above)."""
    del li_ref
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[:]  # [bm, block_k]
    acc_lo = jnp.zeros((bm, nh), jnp.float32)
    acc_hi = jnp.zeros((bm, nh), jnp.float32)
    for g in range(n_groups):
        rows = slice(g * group, (g + 1) * group)
        plo, phi = _group_dots(x[:, rows], p_ref[0, rows, :], x.dtype, fmt)
        acc_lo = acc_lo + plo * slo_ref[0, 0, g, :][None, :]
        acc_hi = acc_hi + phi * shi_ref[0, 0, g, :][None, :]
    acc[0] += acc_lo
    acc[1] += acc_hi

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_m", "block_n", "block_k", "interpret",
                     "return_planes", "fmt"),
)
def int4_matmul_stacked(
    x: jnp.ndarray,  # [..., K]
    packed_all: jnp.ndarray,  # [L, K, N/2] int8
    scales_all: jnp.ndarray,  # [L, K/group, N] f32
    layer,  # [] int32 traced layer index
    group: int = GROUP,
    block_m: int = 0,
    block_n: int = 0,
    block_k: int = 0,
    interpret: bool = False,
    return_planes: bool = False,
    fmt: str | None = None,
) -> jnp.ndarray:
    """x @ dequant(packed_all[layer]) with the layer chosen INSIDE the
    kernel's index maps (scalar prefetch) — no host-side slice, no copy.

    return_planes=True: return (lo, hi) — the outputs for columns
    [0, N/2) and [N/2, N) — WITHOUT the final lane concatenation. For a
    fused gate|up slab the halves ARE gate and up (N_gate == N_up), so
    the caller skips a [M, N] materialized copy — at B64 x 2048 prefill
    rows that copy transient OOM'd HBM (llama_int4 fusion note).

    block_k (or the INT4_BK env default): contraction-split grid — see
    the knob note at the top. 0 keeps the whole-K grid."""
    fmt = fmt or INT4_FMT
    *lead, K = x.shape
    L, _, Nh = packed_all.shape
    N = Nh * 2
    n_groups = K // group
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    bk = block_k or INT4_BK
    if bk and (K % bk or bk % group):
        bk = 0  # geometry doesn't allow the K split; whole-K grid

    def fits(bm_, nh_):
        per = bm_ * K * 2 + K * nh_ + 2 * bm_ * nh_ * 2 + 8 * nh_ * 4 * 2
        return 2 * per <= 11 * 2 ** 20

    if block_m:
        bm = block_m
    else:
        bm = 256 if M >= 256 else -(-M // 8) * 8
    nh = block_n or (INT4_BN if INT4_BN and Nh % INT4_BN == 0 else 0) \
        or _pick(Nh, (512, 256, 128))
    if not (block_m or block_n):
        while not fits(bm, nh):
            if bm > 8 and bm * K * 2 >= K * nh:
                bm //= 2
            elif nh > 128 and Nh % (nh // 2) == 0:
                nh //= 2
            elif bm > 8:
                bm //= 2
            else:
                break
    M_pad = -(-M // bm) * bm
    if M_pad != M:
        x2 = jnp.pad(x2, ((0, M_pad - M), (0, 0)))
    nm, nn = M_pad // bm, Nh // nh

    if bk:
        nk = K // bk
        bkg = bk // group  # scale groups per K block
        kernel = functools.partial(
            _kernel_stacked_ksplit, group=group, n_groups=bkg, bm=bm,
            nh=nh, nk=nk, fmt=fmt,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nm, nn, nk),  # ki minor: out block constant across it
            in_specs=[
                pl.BlockSpec((bm, bk), lambda mi, ni, ki, li: (mi, ki)),
                pl.BlockSpec(
                    (1, bk, nh), lambda mi, ni, ki, li: (li[0], ki, ni)
                ),
                # scale blocks: bkg (groups per K block) is < 8, which
                # Mosaic's sublane rule rejects as a 2nd-minor block size
                # — so the K-block axis becomes a MAJOR (grid-indexed)
                # axis via the [L, nk, bkg, N] reshape below and the bkg
                # block spans its whole dim (the mlp_int4 dn_scales4
                # trick; caught on TPU, invisible in interpret mode)
                pl.BlockSpec(
                    (1, 1, bkg, nh),
                    lambda mi, ni, ki, li: (li[0], ki, 0, ni),
                ),
                pl.BlockSpec(
                    (1, 1, bkg, nh),
                    lambda mi, ni, ki, li, _nn=nn: (li[0], ki, 0, ni + _nn),
                ),
            ],
            out_specs=pl.BlockSpec(
                (2, bm, nh), lambda mi, ni, ki, li: (0, mi, ni)
            ),
            scratch_shapes=[pltpu.VMEM((2, bm, nh), jnp.float32)],
        )
    else:
        kernel = functools.partial(
            _kernel_stacked, group=group, n_groups=n_groups, bm=bm, nh=nh,
            fmt=fmt,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nm, nn),
            in_specs=[
                pl.BlockSpec((bm, K), lambda mi, ni, li: (mi, 0)),
                pl.BlockSpec((1, K, nh), lambda mi, ni, li: (li[0], 0, ni)),
                # scale lo/hi halves addressed by BLOCK column offset into
                # the same [L, n_groups, N] array — no host-side slicing
                pl.BlockSpec(
                    (1, n_groups, nh), lambda mi, ni, li: (li[0], 0, ni)
                ),
                pl.BlockSpec(
                    (1, n_groups, nh),
                    lambda mi, ni, li, _nn=nn: (li[0], 0, ni + _nn)
                ),
            ],
            out_specs=pl.BlockSpec(
                (2, bm, nh), lambda mi, ni, li: (0, mi, ni)
            ),
        )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, M_pad, Nh), x.dtype),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        # scales_all rides in TWICE (lo and hi halves read different block
        # columns of the same array — one spec each, no host-side slicing)
        x2, packed_all,
        # K-split mode reads scales through the [L, nk, bkg, N] view
        # (Mosaic sublane rule — see the in_specs note above)
        *((scales_all.reshape(L, K // bk, bk // group, N),) * 2 if bk
          else (scales_all, scales_all)),
    )
    if return_planes:
        lo, hi = out[0], out[1]
        if M_pad != M:
            lo, hi = lo[:M], hi[:M]
        return lo.reshape(*lead, Nh), hi.reshape(*lead, Nh)
    y = jnp.concatenate([out[0], out[1]], axis=-1)
    if M_pad != M:
        y = y[:M]
    return y.reshape(*lead, N)


def int4_matmul_stacked_ref(x, packed_all, scales_all, layer,
                            group: int = GROUP, compute_dtype=jnp.bfloat16,
                            return_planes: bool = False,
                            fmt: str | None = None):
    """XLA fallback/oracle for the stacked variant."""
    p = jax.lax.dynamic_index_in_dim(packed_all, layer, 0, keepdims=False)
    s = jax.lax.dynamic_index_in_dim(scales_all, layer, 0, keepdims=False)
    y = int4_matmul_ref(x, p, s, group=group, compute_dtype=compute_dtype,
                        fmt=fmt)
    if return_planes:
        nh = y.shape[-1] // 2
        return y[..., :nh], y[..., nh:]
    return y
