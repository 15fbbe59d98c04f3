"""Layer-fused B1 decode megakernel: the ENTIRE decoder stack (norm -> qkv
-> rope -> KV-quantize -> attention -> o -> norm -> MLP, all L layers) as
ONE pallas_call.

Why: single-stream decode at 3B dims is weight-stream- and LAUNCH-bound.
The round-5 trace attribution (BASELINE.md "Fresh round-5 trace") put the
B1 step at 313 tok/s against a ~435 tok/s weight-byte floor, with the gap
INSIDE the per-layer kernel pipeline: 4 pallas_calls per layer (qkv matmul,
attention, o matmul, fused MLP) each drain their weight-DMA pipeline at the
call boundary, pay XLA launch latency, and leave ~10% of the step in XLA
glue (norms, rope, KV-row quantization, residual adds) that dispatches one
op at a time at M=1. The megakernel keeps ONE Mosaic pipeline alive across
every phase of every layer:

  grid = (L, S) with S phase-steps per layer:
    j in [0, nq)            qkv column block j      (BlockSpec-streamed)
    j == nq                 attention (manual KV-slab DMA ring, the
                            decode_attention_mono structure: analytic
                            fresh row, 32-row window write-back)
    j in (nq, nq+no]        o column block          (BlockSpec-streamed)
    j == nq+no+1            o residual merge
    j in [nq+no+2, ..+ngu)  MLP chunk c (gate|up dots -> SiLU*up -> down
                            rows, the ops/mlp_int4.py chunk structure)

Mosaic's revolving-buffer pipeline prefetches the NEXT grid step's weight
blocks during the current step — across phase AND layer boundaries — so
the HBM weight stream never stalls for a call boundary, and the residual
stream h lives in a VMEM scratch that persists across grid steps (scratch
persists within one pallas_call; it cannot persist ACROSS calls, which is
why per-layer fusion could never get here — STATUS.md round-4 known gap).

Scope (dispatch gate in models/llama.py): B*T == 1, fused int4 weight
slabs (quantize_llama_int4 fuse=True), int4 KV cache, head_dim == group ==
128, no LoRA / tp / sp / per-row offsets / smoothing equalizers. This is
the M=1-specialized serving latency path; batched decode keeps the
per-layer kernels (weight fetches amortize over rows there).

Numerics: identical contraction orders to the kernels it fuses
(ops/int4_matmul.py `_group_dots` group loop per column block,
ops/decode_attention_mono.py lean softmax with analytic fresh row,
ops/mlp_int4.py chunk loop), f32 accumulation, bf16 residual stream —
parity-tested against the unfused path in tests/test_megakernel.py.

Reference analog: none (the reference decodes through HF generate,
reference src/models/allm.py:326-331); this is the TPU-native answer to
its single-stream latency path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .int4_matmul import _group_dots


def _pick(n, cands):
    for c in cands:
        if n % c == 0:
            return c
    return n


def _rms(h_bf, ln_bf, eps):
    """rms_norm twin (ops/norms.py): f32 stats, HF cast order."""
    xf = h_bf.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return ln_bf * normed.astype(h_bf.dtype)


def _rope(xf, cos, sin):
    """apply_rope twin (ops/rope.py) on a [rows, hd] f32 value."""
    hd = xf.shape[-1]
    half = hd // 2
    rot = jnp.concatenate([-xf[:, half:], xf[:, :half]], axis=-1)
    return xf * cos + rot * sin


def _kernel(
    off_ref,                      # scalar prefetch: [1] int32 append slot
    x_ref,                        # [1, D] bf16 (embedded token, post-R1)
    iln_ref, pln_ref,             # [1, 1, D] input/post-attn LN scales
    cos_ref, sin_ref,             # [1, hd] f32 rope tables for this slot
    valid_ref,                    # [1, Tk] int32 slot validity
    qkvp_ref, qsl_ref, qsh_ref,   # qkv packed block + lo/hi scale blocks
    op_ref, osl_ref, osh_ref,     # o-proj blocks
    gup_ref, gsl_ref, gsh_ref,    # gate|up blocks
    dnp_ref, dsl_ref, dsh_ref,    # down blocks
    ks_ref, vs_ref,               # [1, 1, Hkv, Tk] f32 KV scale slabs
    ckv_any,                      # [L, 1, Hkv, Tk, hd] int8 cache (ANY)
    out_h_ref,                    # [1, D] bf16 final hidden
    out_fs_ref,                   # [1, Hkv, 128] f32 fresh scales (c0=k, c1=v)
    ckv_out,                      # ANY (aliased with ckv_any)
    qkv_scr, o_scr, attn_scr, h_scr, dn_acc, kv_db, wb_buf, sems, wsems,
    *,
    D, Hq, Hkv, hd, Tk, L,
    nq, no, ngu, bnq, bno, bngu,
    kg, kgo, cgd, hpd,
    scale, eps, fmt, cdt,
):
    li = pl.program_id(0)
    j = pl.program_id(1)
    G = Hq // Hkv
    gslots = Hkv // hpd
    f32 = jnp.float32

    off = off_ref[0]
    off_clamped = jnp.clip(off, 0, Tk - 1)
    off_al = pl.multiple_of((off_clamped // 32) * 32, 32)

    def wb_copy(h):
        return pltpu.make_async_copy(
            wb_buf.at[h],
            ckv_out.at[li, 0, h, pl.ds(off_al, 32)],
            wsems.at[h],
        )

    # ---- phase A: qkv column blocks (j < nq) --------------------------
    @pl.when(j == 0)
    def _():
        @pl.when(li == 0)
        def _():
            h_scr[0:1, :] = x_ref[0:1, :]

        # start this layer's KV slab fetches; waited in the attention
        # phase ~nq steps later (fully hidden behind the qkv blocks)
        for g in range(gslots):
            pltpu.make_async_copy(
                ckv_any.at[li, 0, pl.ds(g * hpd, hpd)], kv_db.at[g],
                sems.at[g],
            ).start()

    @pl.when(j < nq)
    def _():
        hn = _rms(h_scr[0:1, :], iln_ref[0].astype(cdt), eps)
        acc_lo = jnp.zeros((1, bnq), f32)
        acc_hi = jnp.zeros((1, bnq), f32)
        for g in range(kg):
            rows = slice(g * 128, (g + 1) * 128)
            plo, phi = _group_dots(hn[:, rows], qkvp_ref[0, rows, :], cdt, fmt)
            acc_lo = acc_lo + plo * qsl_ref[0, g, :][None, :]
            acc_hi = acc_hi + phi * qsh_ref[0, g, :][None, :]
        for J in range(nq):  # static-index stores (one tiny guard per block)
            @pl.when(j == J)
            def _(J=J):
                qkv_scr[J, 0, 0:1, :] = acc_lo
                qkv_scr[J, 1, 0:1, :] = acc_hi

    # ---- phase B: attention (j == nq) ---------------------------------
    @pl.when(j == nq)
    def _():
        Nh = nq * bnq  # packed qkv half-width

        def virt(c0):
            """[1, 128] lane window c0 of the virtual [lo | hi] qkv out."""
            plane, c = (0, c0) if c0 < Nh else (1, c0 - Nh)
            return qkv_scr[c // bnq, plane, 0:1, c % bnq : c % bnq + 128]

        def virt_c(c0):
            # planes accumulate in f32; the unfused path hands bf16 kernel
            # OUTPUTS downstream — round through compute dtype for parity
            return virt(c0).astype(cdt)

        cos = cos_ref[0:1, :].astype(f32)
        sin = sin_ref[0:1, :].astype(f32)
        row1 = jax.lax.broadcasted_iota(jnp.int32, (1, Tk), 1)
        is_new_r = row1 == off
        valid = valid_ref[0, :]
        fresh_on = jnp.max(jnp.where(is_new_r, valid[None, :], 0)) > 0
        dead = jnp.logical_or(valid[None, :] <= 0, is_new_r)
        roww = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0) + off_al
        is_new_w = roww == off

        fs_rows = []
        for h in range(Hkv):
            g = h // hpd
            h2 = h % hpd
            if h2 == 0:
                pltpu.make_async_copy(
                    ckv_any.at[li, 0, pl.ds(g * hpd, hpd)], kv_db.at[g],
                    sems.at[g],
                ).wait()

            # fresh q/k/v rows from the qkv planes (f32, pre-cast like the
            # XLA path: rope in f32, then cast to compute dtype)
            qf = jnp.concatenate(
                [virt_c((h * G + gg) * hd) for gg in range(G)], axis=0
            ).astype(f32)  # [G, hd]
            kf = virt_c(Hq * hd + h * hd).astype(f32)  # [1, hd]
            vf = virt_c(Hq * hd + (Hkv + h) * hd)      # [1, hd] cdt
            qh = _rope(qf, cos, sin).astype(cdt)
            # rope output rounds through compute dtype BEFORE quantization
            # (the unfused path quantizes the bf16 k/v tensors)
            kfr = _rope(kf, cos, sin).astype(cdt).astype(f32)
            vfr = vf.astype(f32)

            # per-row int4 KV quantization (models/llama.quantize_kv_rows4)
            k_s = jnp.maximum(jnp.max(jnp.abs(kfr)), 1e-8) / 7.0
            v_s = jnp.maximum(jnp.max(jnp.abs(vfr)), 1e-8) / 7.0
            kq = jnp.clip(jnp.round(kfr / k_s), -7, 7).astype(jnp.int32)
            vq = jnp.clip(jnp.round(vfr / v_s), -7, 7).astype(jnp.int32)
            kvnew = jnp.bitwise_or(
                jnp.bitwise_and(kq + 8, 0xF),
                jnp.left_shift(jnp.bitwise_and(vq, 0xF), 4),
            ).astype(jnp.int8)  # [1, hd]
            fs_rows.append(
                jnp.concatenate(
                    [k_s.reshape(1, 1), v_s.reshape(1, 1),
                     jnp.zeros((1, 126), f32)], axis=1,
                )
            )

            # staged 32-row window write-back (mono's double-buffer idea,
            # one slot per head; drained at the first o step next phase)
            win = kv_db[g, h2, pl.ds(off_al, 32), :]
            wb_buf[h] = jnp.where(is_new_w, kvnew, win)
            wb_copy(h).start()

            # lean softmax with the analytic fresh row (mono ilp=1 path)
            lf = jnp.sum(
                qh.astype(f32) * kq.astype(f32), axis=1, keepdims=True
            )  # [G, 1]
            lf = lf * (k_s * scale)
            lf = jnp.where(fresh_on, lf, -1e30)

            braw = kv_db[g, h2]
            b32 = braw.astype(jnp.int32)
            v_sl = jnp.right_shift(b32, 4).astype(cdt)
            k_sl = (jnp.bitwise_and(b32, 0xF) - 8).astype(cdt)
            logits = jax.lax.dot_general(
                qh, k_sl, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
            logits = logits * (ks_ref[0, 0, h, :][None, :] * scale)
            logits = jnp.where(dead, -1e30, logits)
            m1 = jnp.max(logits, axis=-1, keepdims=True)
            m = jnp.maximum(m1, lf)
            a1 = jnp.exp(m1 - m)
            pexp = jnp.exp(logits - m1)
            l1 = jnp.sum(pexp, axis=-1, keepdims=True)
            pf = jnp.exp(lf - m)
            denom = a1 * l1 + pf
            acc = a1 * jax.lax.dot_general(
                (pexp * vs_ref[0, 0, h, :][None, :]).astype(cdt), v_sl,
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            acc = acc + (pf * v_s) * vq.astype(f32)
            attn_scr[h * G : (h + 1) * G, :] = (acc / denom).astype(cdt)

        out_fs_ref[0] = jnp.concatenate(fs_rows, axis=0)  # [Hkv, 128]

    # ---- phase C: o column blocks (nq < j <= nq+no) -------------------
    @pl.when(j == nq + 1)
    def _():
        for h in range(Hkv):  # cross-step drain (sems persist)
            wb_copy(h).wait()

    @pl.when((j > nq) & (j <= nq + no))
    def _():
        acc_lo = jnp.zeros((1, bno), f32)
        acc_hi = jnp.zeros((1, bno), f32)
        for g in range(kgo):
            rows = slice(g * 128, (g + 1) * 128)
            plo, phi = _group_dots(
                attn_scr[g : g + 1, :], op_ref[0, rows, :], cdt, fmt
            )
            acc_lo = acc_lo + plo * osl_ref[0, g, :][None, :]
            acc_hi = acc_hi + phi * osh_ref[0, g, :][None, :]
        for J in range(no):
            @pl.when(j == nq + 1 + J)
            def _(J=J):
                o_scr[J, 0, 0:1, :] = acc_lo
                o_scr[J, 1, 0:1, :] = acc_hi

    # ---- phase D: o residual merge (j == nq+no+1) ---------------------
    @pl.when(j == nq + no + 1)
    def _():
        o_lo = jnp.concatenate(
            [o_scr[J, 0, 0:1, :] for J in range(no)], axis=1
        )
        o_hi = jnp.concatenate(
            [o_scr[J, 1, 0:1, :] for J in range(no)], axis=1
        )
        o_full = jnp.concatenate([o_lo, o_hi], axis=1).astype(cdt)
        h_scr[0:1, :] = h_scr[0:1, :] + o_full

    # ---- phase E: MLP chunks (j >= nq+no+2) ---------------------------
    c0 = nq + no + 2

    @pl.when(j >= c0)
    def _():
        c = j - c0

        @pl.when(c == 0)
        def _():
            dn_acc[...] = jnp.zeros_like(dn_acc)

        hn2 = _rms(h_scr[0:1, :], pln_ref[0].astype(cdt), eps)
        g_acc = jnp.zeros((1, bngu), f32)
        u_acc = jnp.zeros((1, bngu), f32)
        for g in range(kg):
            rows = slice(g * 128, (g + 1) * 128)
            pg, pu = _group_dots(hn2[:, rows], gup_ref[0, rows, :], cdt, fmt)
            g_acc = g_acc + pg * gsl_ref[0, g, :][None, :]
            u_acc = u_acc + pu * gsh_ref[0, g, :][None, :]
        a = (g_acc * jax.nn.sigmoid(g_acc) * u_acc).astype(cdt)  # [1, bngu]
        for g2 in range(cgd):
            rows = slice(g2 * 128, (g2 + 1) * 128)
            plo, phi = _group_dots(a[:, rows], dnp_ref[0, rows, :], cdt, fmt)
            dn_acc[0, 0:1, :] += plo * dsl_ref[0, 0, g2, :][None, :]
            dn_acc[1, 0:1, :] += phi * dsh_ref[0, 0, g2, :][None, :]

        @pl.when(c == ngu - 1)
        def _():
            d_full = jnp.concatenate(
                [dn_acc[0, 0:1, :], dn_acc[1, 0:1, :]], axis=1
            ).astype(cdt)
            h_scr[0:1, :] = h_scr[0:1, :] + d_full

            @pl.when(li == L - 1)
            def _():
                out_h_ref[0:1, :] = h_scr[0:1, :]


@functools.partial(
    jax.jit,
    static_argnames=("eps", "scale", "fmt", "interpret"),
)
def decode_megakernel(
    x,            # [1, D] compute-dtype embedded token (post-R1 rotation)
    qkv, o, gu, dn,  # int4 slab dicts {'w_p', 'w_s'} (fused tree)
    input_ln, post_attn_ln,  # [L, D]
    cos, sin,     # [1, hd] rope tables at the append position
    cache_kv,     # [L, 1, Hkv, Tk, hd] int8 combined int4 cache
    k_scales, v_scales,  # [L, 1, Hkv, Tk] f32
    offset,       # [] int32 append slot
    valid,        # [1, Tk] int32
    *,
    eps: float,
    scale: float,
    fmt: str,
    interpret: bool = False,
):
    """One fused decode step over all layers.

    Returns (hidden [1, D], new_cache_kv, fresh_scales [L, Hkv, 128] —
    lane 0 = fresh k scale, lane 1 = fresh v scale; the caller scatters
    them into the scale slabs at `offset`).
    """
    L, _, Hkv, Tk, hd = cache_kv.shape
    D = x.shape[-1]
    Nh = qkv["w_p"].shape[-1]
    Hq = (2 * Nh - 2 * Hkv * hd) // hd
    F = gu["w_p"].shape[-1]
    Dh = dn["w_p"].shape[-1]
    cdt = x.dtype

    bnq = _pick(Nh, (512, 256, 128))
    bno = _pick(Dh, (512, 256, 128))
    bngu = _pick(F, (512, 256, 128))
    nq, no, ngu = Nh // bnq, Dh // bno, F // bngu
    kg = D // 128
    kgo = (Hq * hd) // 128
    cgd = bngu // 128
    hpd = 2 if Hkv % 2 == 0 else 1
    gslots = Hkv // hpd
    S = nq + no + ngu + 2

    dsl4 = dn["w_s"].reshape(L, ngu, cgd, 2 * Dh)

    kernel = functools.partial(
        _kernel,
        D=D, Hq=Hq, Hkv=Hkv, hd=hd, Tk=Tk, L=L,
        nq=nq, no=no, ngu=ngu, bnq=bnq, bno=bno, bngu=bngu,
        kg=kg, kgo=kgo, cgd=cgd, hpd=hpd,
        scale=scale, eps=eps, fmt=fmt, cdt=cdt,
    )

    c1 = lambda li, j, off: (0, 0)  # noqa: E731
    jq = lambda j: jnp.minimum(j, nq - 1)  # noqa: E731

    # o / gate|up / down blocks HOLD the previous layer's last block index
    # until the step before their phase: Mosaic fetches a block at the
    # step whose index map first names it (prefetching it one step
    # earlier) and waits for EVERY mapped block before running a step's
    # body — a naive clip() map names each phase's block 0 at the
    # layer-start step, stalling it on ~7 MB of fetches the qkv body
    # never touches. With the hold, block 0 of each phase is named at the
    # step just before its phase and prefetches behind attention / the
    # merge step instead.
    def _hold(first_use, nblocks):
        def bmap(li, j):
            use = jnp.clip(j - first_use, 0, nblocks - 1)
            hold = j < (first_use - 1)
            return (
                jnp.where(hold, jnp.maximum(li - 1, 0), li),
                jnp.where(hold, nblocks - 1, use),
            )
        return bmap

    o_b = _hold(nq + 1, no)
    c_b = _hold(nq + no + 2, ngu)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, S),
        in_specs=[
            pl.BlockSpec((1, D), c1),                      # x
            # [L, 1, D] view: a (1, D) block of a [L, D] array violates
            # Mosaic's sublane rule (2nd-minor block must be 8-divisible
            # or span the dim); the singleton axis makes the block span
            pl.BlockSpec((1, 1, D), lambda li, j, off: (li, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda li, j, off: (li, 0, 0)),
            pl.BlockSpec((1, hd), c1),                     # cos
            pl.BlockSpec((1, hd), c1),                     # sin
            pl.BlockSpec((1, Tk), c1),                     # valid
            pl.BlockSpec((1, D, bnq), lambda li, j, off: (li, 0, jq(j))),
            pl.BlockSpec((1, kg, bnq), lambda li, j, off: (li, 0, jq(j))),
            pl.BlockSpec((1, kg, bnq), lambda li, j, off: (li, 0, nq + jq(j))),
            pl.BlockSpec(
                (1, Hq * hd, bno),
                lambda li, j, off: (o_b(li, j)[0], 0, o_b(li, j)[1]),
            ),
            pl.BlockSpec(
                (1, kgo, bno),
                lambda li, j, off: (o_b(li, j)[0], 0, o_b(li, j)[1]),
            ),
            pl.BlockSpec(
                (1, kgo, bno),
                lambda li, j, off: (o_b(li, j)[0], 0, no + o_b(li, j)[1]),
            ),
            pl.BlockSpec(
                (1, D, bngu),
                lambda li, j, off: (c_b(li, j)[0], 0, c_b(li, j)[1]),
            ),
            pl.BlockSpec(
                (1, kg, bngu),
                lambda li, j, off: (c_b(li, j)[0], 0, c_b(li, j)[1]),
            ),
            pl.BlockSpec(
                (1, kg, bngu),
                lambda li, j, off: (c_b(li, j)[0], 0, ngu + c_b(li, j)[1]),
            ),
            pl.BlockSpec(
                (1, bngu, Dh),
                lambda li, j, off: (c_b(li, j)[0], c_b(li, j)[1], 0),
            ),
            pl.BlockSpec(
                (1, 1, cgd, Dh),
                lambda li, j, off: (c_b(li, j)[0], c_b(li, j)[1], 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, cgd, Dh),
                lambda li, j, off: (c_b(li, j)[0], c_b(li, j)[1], 0, 1),
            ),
            pl.BlockSpec((1, 1, Hkv, Tk), lambda li, j, off: (li, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, Tk), lambda li, j, off: (li, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),          # ckv
        ],
        out_specs=[
            pl.BlockSpec((1, D), c1),                      # final hidden
            pl.BlockSpec((1, Hkv, 128), lambda li, j, off: (li, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),          # ckv (aliased)
        ],
        scratch_shapes=[
            pltpu.VMEM((nq, 2, 8, bnq), jnp.float32),      # qkv planes
            pltpu.VMEM((no, 2, 8, bno), jnp.float32),      # o planes
            pltpu.VMEM((32, hd), cdt),                     # attention out
            pltpu.VMEM((16, D), cdt),                      # residual stream
            pltpu.VMEM((2, 8, Dh), jnp.float32),           # down accum
            pltpu.VMEM((gslots, hpd, Tk, hd), jnp.int8),   # KV slab ring
            pltpu.VMEM((Hkv, 32, hd), jnp.int8),           # wb staging
            pltpu.SemaphoreType.DMA((gslots,)),
            pltpu.SemaphoreType.DMA((Hkv,)),
        ],
    )

    hidden, fresh, ckv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, D), cdt),
            jax.ShapeDtypeStruct((L, Hkv, 128), jnp.float32),
            jax.ShapeDtypeStruct(cache_kv.shape, cache_kv.dtype),
        ],
        # inputs: (off, x, iln, pln, cos, sin, valid, qkvp, qsl, qsh, op,
        #          osl, osh, gup, gsl, gsh, dnp, dsl, dsh, ks, vs, ckv)
        input_output_aliases={21: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(offset, jnp.int32).reshape(1),
        x.reshape(1, D),
        input_ln.reshape(L, 1, D), post_attn_ln.reshape(L, 1, D),
        cos.reshape(1, hd).astype(jnp.float32),
        sin.reshape(1, hd).astype(jnp.float32),
        valid.astype(jnp.int32).reshape(1, Tk),
        # scale arrays ride in TWICE (lo/hi halves are different BLOCK
        # columns of the same array — the int4_matmul_stacked trick, no
        # host-side slicing that XLA would materialize per decode step)
        qkv["w_p"], qkv["w_s"], qkv["w_s"],
        o["w_p"], o["w_s"], o["w_s"],
        gu["w_p"], gu["w_s"], gu["w_s"],
        dn["w_p"], dsl4, dsl4,
        k_scales.astype(jnp.float32), v_scales.astype(jnp.float32),
        cache_kv,
    )
    return hidden, ckv, fresh


def ok_for(cfg, slabs, Tk: int) -> bool:
    """Geometry gate for the megakernel dispatch (llama_forward)."""
    if set(slabs) < {"qkv_proj", "o_proj", "gateup_proj", "down_proj"}:
        return False
    if any("w_r" in slabs[n] for n in slabs):
        return False  # smoothing equalizers not absorbed
    if cfg.head_dim != 128:
        return False
    w = slabs["qkv_proj"]
    if w["w_p"].shape[-2] // w["w_s"].shape[-2] != 128:
        return False  # group must equal head_dim (o-phase group slicing)
    if cfg.hidden_size % 128 or (cfg.num_heads * cfg.head_dim) % 128:
        return False
    if cfg.num_heads > 32:
        return False  # attention-out scratch rows
    return Tk % 32 == 0
