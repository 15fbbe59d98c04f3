"""Encoder attention kernel: non-causal, short-sequence, hd-64-aware.

Why not the stock flash kernel: the breakdown (experiments/enc_breakdown.py,
BASELINE.md round 2) showed whisper-encoder attention is VPU-bound, not
MXU-bound — at B8/H20/T1536/hd64 the stock online-softmax kernel runs
~35 TF/s (2.8 ms/layer) while the surrounding projections hit 192 TF/s.
Online softmax pays for its streaming generality with extra elementwise
passes over the [bq, bk] score tiles (running-max updates, accumulator
rescales, segment-id masking), and at T=1536 the whole key timeline fits in
VMEM — streaming buys nothing.

This kernel exploits the encoder's static shape instead:

  - one grid step per (batch·head, q-block): K and V stay resident in VMEM
    across the q-blocks of a (b, h) pair (Mosaic skips re-fetch when the
    block index is unchanged);
  - TWO-PASS softmax over the full [bq, T] score matrix in VMEM — exactly
    one max-reduce and one fused subtract+exp elementwise pass; no running
    rescaling;
  - compile-time padding: the valid key length is STATIC (1500 of 1536), so
    masking is a constant [1, T] f32 bias row added inside the exp chain —
    no segment-id tensors, comparisons, or selects;
  - the softmax DENOMINATOR rides the PV matmul: V gets a ones column
    appended in VMEM, so `P @ [V | 1]` yields both the output and the row
    sums in one MXU pass (output lanes 64->65 round to the same 128-lane
    MXU tile — the sum is literally free) and the VPU never runs a
    [bq, T] sum-reduce.

The remaining ~50% MXU underutilization on Q·K^T (contraction dim 64 vs the
128-deep systolic array) is inherent to hd=64; Q·K^T is ~18% of encoder
FLOPs, so the ceiling loss is ~9% — acceptable against a 2x kernel win.

Gradients: not defined — the ONLY consumers are the frozen Whisper encoder
(reference src/models/base.py:22-24 keeps it under no_grad; our training
path treats encoder output as a constant w.r.t. trainables, so autodiff
never differentiates through this op). Llama training/prefill keep using
ops/flash_attention.py (causal + custom VJP).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _kernel_v2(q_ref, k_ref, v_ref, kn_ref, o_ref, *, n_valid, chunk):
    """Bounded-shift streaming softmax — no max pass, no online rescaling.

    softmax(s) == softmax(s - c) for any per-row constant c; numerical
    stability only needs c >= row-max. Cauchy-Schwarz gives a FREE bound:
    s_ij = q_i . k_j <= ||q_i||_2 * max_j ||k_j||_2  (q pre-scaled). Using
    that bound instead of the true max removes the [bq, T] max-reduce pass
    entirely and — unlike flash's running max — never rescales the output
    accumulator, so the kernel streams k/v chunks with a single fused
    (sub, exp, cast) elementwise chain per score element. The bound is loose
    by the best-alignment angle (layernormed encoder heads: a few nats), so
    exp stays comfortably inside f32/bf16 range; an all-underflow row would
    need ~90 nats of looseness and is guarded by the where() below.

    Padding: keys >= n_valid (STATIC) live in the last chunk; only that
    chunk pays a mask-multiply.
    """
    q = q_ref[0]  # [bq, hd] pre-scaled
    kn = kn_ref[0]  # [1, 1] f32: max_j ||k_j||
    qn = jnp.sqrt(
        jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    )  # [bq, 1]
    bound = qn * kn[0, 0]
    T, hd = k_ref.shape[1], q.shape[1]
    n_chunks = T // chunk
    acc = jnp.zeros((q.shape[0], hd + 1), jnp.float32)
    for j in range(n_chunks):  # static; Mosaic overlaps MXU/VPU across chunks
        kj = k_ref[0, j * chunk : (j + 1) * chunk]
        vj = v_ref[0, j * chunk : (j + 1) * chunk]
        s = jax.lax.dot_general(
            q, kj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, chunk]
        p = jnp.exp(s - bound)
        if (j + 1) * chunk > n_valid:  # only the padded tail pays a mask
            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + j * chunk
            p = jnp.where(col < n_valid, p, 0.0)
        v_ext = jnp.concatenate(
            [vj, jnp.ones((chunk, 1), vj.dtype)], axis=1
        )  # ones column: P @ [V | 1] -> output and row-sum in one MXU pass
        acc = acc + jax.lax.dot_general(
            p.astype(vj.dtype), v_ext, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    l = acc[:, hd:]
    out = jnp.where(l > 0, acc[:, :hd] / jnp.where(l > 0, l, 1.0), 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def _kernel_v3(q_ref, k_ref, v_ref, kn_ref, o_ref, *, n_valid, chunk, n_heads,
               softmax="safe"):
    """Transpose-free variant: [B, T, D] blocks straight from the projection
    outputs (grid over batch × q-block), heads carved out of the lane
    dimension INSIDE the kernel (static 64-lane slices — on-chip relayouts
    instead of the four [B,T,H,hd] <-> [B,H,T,hd] HBM round trips every
    kernel-layout wrapper, including stock flash, pays per layer). The
    unrolled head loop also hands the scheduler ~20 independent
    QK-softmax-PV chains, so MXU matmuls of one head can overlap VPU
    softmax of another. Output is [bq, D] — exactly the layout the
    out-projection consumes, so the model-side head merge is free.

    softmax='safe' (production, round 3): a TRUE row max per score tile —
    in the unchunked production config (chunk == T) this is exact two-pass
    softmax with no rescaling at all; the chunked path keeps a running max
    with accumulator rescale. 'bounded' is the round-2 Cauchy-Schwarz
    shift, kept for A/B: it silently zeroes rows once the bound exceeds
    the true max by ~87 nats (f32 exp underflow) — reachable by outlier
    activations (same failure class the llama causal kernel fixed,
    round-2 ADVICE)."""
    T = k_ref.shape[1]
    hd = q_ref.shape[2] // n_heads
    n_chunks = T // chunk
    outs = []
    for h in range(n_heads):
        q = q_ref[0, :, h * hd : (h + 1) * hd]  # [bq, hd] pre-scaled
        if softmax == "bounded":
            qn = jnp.sqrt(
                jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
            )
            bound = qn * kn_ref[0, 0, h]
        acc = jnp.zeros((q.shape[0], hd + 1), jnp.float32)
        m_run = jnp.full((q.shape[0], 1), NEG, jnp.float32)
        for j in range(n_chunks):
            kj = k_ref[0, j * chunk : (j + 1) * chunk, h * hd : (h + 1) * hd]
            vj = v_ref[0, j * chunk : (j + 1) * chunk, h * hd : (h + 1) * hd]
            s = jax.lax.dot_general(
                q, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            masked_tail = (j + 1) * chunk > n_valid
            if softmax == "bounded":
                p = jnp.exp(s - bound)
                if masked_tail:
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * chunk
                    p = jnp.where(col < n_valid, p, 0.0)
            else:  # 'safe'
                if masked_tail:
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * chunk
                    s = jnp.where(col < n_valid, s, NEG)
                m_new = jnp.maximum(m_run, jnp.max(s, axis=1, keepdims=True))
                p = jnp.exp(s - m_new)
                if n_chunks > 1:  # rescale only in the chunked path
                    acc = acc * jnp.exp(m_run - m_new)
                m_run = m_new
            v_ext = jnp.concatenate(
                [vj, jnp.ones((chunk, 1), vj.dtype)], axis=1
            )
            acc = acc + jax.lax.dot_general(
                p.astype(vj.dtype), v_ext, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        l = acc[:, hd:]
        out = jnp.where(l > 0, acc[:, :hd] / jnp.where(l > 0, l, 1.0), 0.0)
        outs.append(out.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)  # [bq, D]


def _kernel_v3q(q_ref, k_ref, v_ref, sq_ref, sv_ref, o_ref, *, n_valid,
                n_heads):
    """int8 twin of _kernel_v3 (unchunked only): QK and PV run on the int8
    MXU at 2x bf16 throughput.

    Quantization scheme (SageAttention-family, arranged so the softmax
    stays exact-shape and the extra VPU work is minimal):
      - K is mean-subtracted over the timeline BEFORE quantization (done by
        the wrapper) — subtracting a constant from every key adds q.mu to
        every logit of a row, which softmax cancels EXACTLY; it centers the
        int8 range where whisper's K mass actually is.
      - K per-(batch, head) TENSOR scale, FOLDED into the q row scales by
        the wrapper: the per-row logit scale c_i = sq_i * sk_h * softmax
        scale arrives as sq_ref. Column-constant scaling is what lets the
        row max run on the RAW int32 scores (max commutes with one
        positive per-row constant) — one convert+mul pass instead of a
        materialized scaled score tile.
      - P quantized to uint-ish int8 (p in (0, 1] -> round(p * 127)): the
        ones-column denominator is computed from the SAME quantized P, so
        out = (sum pq V) / (sum pq) — the 1/127 cancels and the P
        quantization error self-normalizes.
      - V per-(batch, head, channel) scales applied on the [bq, hd]
        accumulator (epilogue, ~free).
    """
    T = k_ref.shape[1]
    hd = q_ref.shape[2] // n_heads
    outs = []
    col = None
    if n_valid < T:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    for h in range(n_heads):
        q = q_ref[0, :, h * hd : (h + 1) * hd]  # [bq, hd] int8
        kj = k_ref[0, :, h * hd : (h + 1) * hd]  # [T, hd] int8
        vj = v_ref[0, :, h * hd : (h + 1) * hd]  # [T, hd] int8
        s_i = jax.lax.dot_general(
            q, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [bq, T] int32 — int8 MXU
        if col is not None:
            s_i = jnp.where(col < n_valid, s_i, jnp.int32(-(2 ** 30)))
        m_i = jnp.max(s_i, axis=1, keepdims=True)  # scale-invariant per row
        c = sq_ref[0, :, h][:, None]  # [bq, 1] f32 per-row logit scale
        p = jnp.exp((s_i - m_i).astype(jnp.float32) * c)
        if col is not None:
            p = jnp.where(col < n_valid, p, 0.0)
        pq = jnp.round(p * 127.0).astype(jnp.int8)  # in [0, 127]
        v_ext = jnp.concatenate(
            [vj, jnp.ones((T, 1), jnp.int8)], axis=1
        )
        acc = jax.lax.dot_general(
            pq, v_ext, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [bq, hd+1] int32
        den = acc[:, hd:].astype(jnp.float32)  # sum pq (the 127 cancels)
        num = acc[:, :hd].astype(jnp.float32) * sv_ref[
            0, 0, h * hd : (h + 1) * hd
        ][None, :]
        out = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
        outs.append(out.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)  # [bq, D]


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, exp_dtype):
    q = q_ref[0]  # [bq, hd]
    k = k_ref[0]  # [T, hd]
    v = v_ref[0]  # [T, hd]
    # scores on the MXU; contraction over hd (64: accepted half-util, see
    # module docstring)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, T]
    s = s + bias_ref[0][None, :]  # static padding bias (0 / NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    # fused subtract+exp chain; optional bf16 exp (inputs are <= 0 so bf16's
    # range is safe; P is cast to bf16 for the MXU anyway)
    p = jnp.exp((s - m).astype(exp_dtype)).astype(v.dtype)
    # ones column -> P @ [V | 1] gives output AND row sums in one MXU pass
    v_ext = jnp.concatenate([v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
    o = jax.lax.dot_general(
        p, v_ext, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, hd+1]
    hd = v.shape[1]
    out = o[:, :hd] / o[:, hd:]
    o_ref[0] = out.astype(o_ref.dtype)


def _pick_block_q(t: int) -> int:
    for b in (512, 256, 128):
        if t % b == 0:
            return b
    return t


@functools.partial(
    jax.jit,
    static_argnames=(
        "valid_len", "scale", "block_q", "exp_dtype", "interpret", "algo",
        "chunk_k", "softmax",
    ),
)
def _enc_attention_jit(
    q: jnp.ndarray,  # [B, T, H, hd]
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    valid_len: Optional[int] = None,  # STATIC: keys >= valid_len are padding
    scale: Optional[float] = None,
    block_q: int = 0,  # 0 = auto
    exp_dtype=jnp.float32,
    interpret: bool = False,
    algo: str = "v3",  # 'v3' (transpose-free, fastest) | 'bounded' | 'twopass'
    chunk_k: int = 0,  # k-chunk for bounded/v3 (0 = auto; v3 prefers unchunked)
    softmax: str = "safe",  # v3 shift: 'safe' (true max) | 'bounded' (r2 A/B)
) -> jnp.ndarray:
    """Full non-causal self-attention, [B, T, H, hd] in/out.

    Semantically equals ops.attention.mha with a shared right-padding mask
    (keys/queries at positions >= valid_len padded); padded-query rows return
    garbage by the same contract as flash_mha. T must be a multiple of 128
    (whisper's stack is padded to the 512 tile already).

    algo='bounded' replaces the softmax max-reduce with a Cauchy-Schwarz
    upper bound (see _kernel_v2) — exact up to float rounding, one fewer
    VPU pass per score element, and streams k/v chunks; 'twopass' is the
    classical max/exp/sum kernel (_kernel).
    """
    B, T, H, hd = q.shape
    if T % 128:
        raise ValueError(f"enc_attention: T={T} must be a multiple of 128")
    if scale is None:
        scale = hd ** -0.5
    bq = block_q or _pick_block_q(T)

    # head-major for clean [T, hd] tiles; fold the scale into q (one cheap
    # elementwise op that XLA fuses into the projection producing q)
    qh = jnp.swapaxes(q * jnp.asarray(scale, q.dtype), 1, 2).reshape(B * H, T, hd)
    kh = jnp.swapaxes(k, 1, 2).reshape(B * H, T, hd)
    vh = jnp.swapaxes(v, 1, 2).reshape(B * H, T, hd)

    nvalid = T if valid_len is None else int(valid_len)

    if algo == "v3":
        # transpose-free: [B, T, D] blocks (the projections' natural layout);
        # heads are static 64-lane slices inside the kernel
        D = H * hd
        qs = (q * jnp.asarray(scale, q.dtype)).reshape(B, T, D)
        kn = jnp.sqrt(
            jnp.max(jnp.sum(k.astype(jnp.float32) ** 2, axis=-1), axis=1)
        ).reshape(B, 1, H)
        k3 = k.reshape(B, T, D)
        v3 = v.reshape(B, T, D)
        # auto: unchunked when the per-head [bq, T] f32 score tile fits
        # comfortably in VMEM — one QK and one PV matmul per head, measured
        # 2x the 512-chunk variant (0.906 vs 1.803 ms at whisper dims)
        if chunk_k:
            chunk = chunk_k
        elif bq * T * 4 <= 4 * 1024 * 1024:
            chunk = T
        else:
            chunk = 512 if T % 512 == 0 else T
        if T % chunk:
            raise ValueError(f"chunk_k={chunk} must divide T={T}")
        out = pl.pallas_call(
            functools.partial(
                _kernel_v3, n_valid=nvalid, chunk=chunk, n_heads=H,
                softmax=softmax,
            ),
            grid=(B, T // bq),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, T, D), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, T, D), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, 1, H), lambda b, qi: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda b, qi: (b, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(qs, k3, v3, kn)
        return out.reshape(B, T, H, hd)

    if algo == "v3q":
        # int8 QK + int8 PV on the int8 MXU (2x bf16). See _kernel_v3q for
        # the quantization scheme; all quantization here is XLA (fused into
        # the projections producing q/k/v). Unchunked only — at whisper
        # dims the [bq, T] tile fits VMEM (the v3 auto rule).
        D = H * hd
        if bq * T * 4 > 4 * 1024 * 1024:
            raise ValueError(
                f"v3q is unchunked-only: [bq={bq}, T={T}] tile too large"
            )
        qf = q.astype(jnp.float32)
        sq = jnp.max(jnp.abs(qf), axis=-1) / 127.0  # [B, T, H]
        sq = jnp.maximum(sq, 1e-8)
        q_i8 = jnp.round(qf / sq[..., None]).astype(jnp.int8)
        kf = k.astype(jnp.float32)
        mu = jnp.mean(kf, axis=1, keepdims=True)  # [B, 1, H, hd]
        kc = kf - mu  # softmax-exact K smoothing
        sk = jnp.max(jnp.abs(kc), axis=(1, 3)) / 127.0  # [B, H]
        sk = jnp.maximum(sk, 1e-8)
        k_i8 = jnp.round(kc / sk[:, None, :, None]).astype(jnp.int8)
        vf = v.astype(jnp.float32)
        sv = jnp.max(jnp.abs(vf), axis=1) / 127.0  # [B, H, hd]
        sv = jnp.maximum(sv, 1e-8)
        v_i8 = jnp.round(vf / sv[:, None]).astype(jnp.int8)
        # per-row logit scale: q row scale x k tensor scale x softmax scale
        c = (sq * sk[:, None, :] * jnp.float32(scale)).astype(jnp.float32)
        out = pl.pallas_call(
            functools.partial(_kernel_v3q, n_valid=nvalid, n_heads=H),
            grid=(B, T // bq),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, T, D), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, T, D), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, bq, H), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, 1, D), lambda b, qi: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda b, qi: (b, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            q_i8.reshape(B, T, D), k_i8.reshape(B, T, D),
            v_i8.reshape(B, T, D), c, sv.reshape(B, 1, D),
        )
        return out.reshape(B, T, H, hd)

    grid = (B * H, T // bq)

    if algo == "bounded":
        kn = jnp.sqrt(
            jnp.max(jnp.sum(kh.astype(jnp.float32) ** 2, axis=-1), axis=-1)
        ).reshape(B * H, 1, 1)  # max_j ||k_j|| per (b, h); fused by XLA
        chunk = chunk_k or (512 if T % 512 == 0 else T)
        out = pl.pallas_call(
            functools.partial(_kernel_v2, n_valid=nvalid, chunk=chunk),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, hd), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec((1, T, hd), lambda bh, qi: (bh, 0, 0)),
                pl.BlockSpec((1, T, hd), lambda bh, qi: (bh, 0, 0)),
                pl.BlockSpec((1, 1, 1), lambda bh, qi: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, hd), lambda bh, qi: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((B * H, T, hd), q.dtype),
            interpret=interpret,
        )(qh, kh, vh, kn)
        return jnp.swapaxes(out.reshape(B, H, T, hd), 1, 2)

    bias = np.zeros((1, T), np.float32)
    bias[:, nvalid:] = NEG
    bias = jnp.asarray(bias)

    out = pl.pallas_call(
        functools.partial(_kernel, exp_dtype=exp_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, T, hd), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, T, hd), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, T), lambda bh, qi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, T, hd), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, bias)

    return jnp.swapaxes(out.reshape(B, H, T, hd), 1, 2)


def enc_attention(
    q: jnp.ndarray,  # [B, T, H, hd]
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    valid_len: Optional[int] = None,
    scale: Optional[float] = None,
    block_q: int = 0,
    exp_dtype=jnp.float32,
    interpret: bool = False,
    algo: str = "v3",
    chunk_k: int = 0,
    softmax: str = "safe",
) -> jnp.ndarray:
    """Public entry — see _enc_attention_jit for the kernel contract.

    Self-wraps in a nested shard_map under an active ops.partitioning
    context (batch over dp x fsdp, heads over tp): encoder attention is
    batch/head-parallel, so each shard runs the kernel on its local block
    inside GSPMD-sharded train steps. NOTE for algo='v3': heads are sliced
    inside the kernel from the folded [B, T, H*hd] layout, so head-sharding
    simply narrows the fold — n_heads becomes the local count."""
    from . import partitioning as ptn

    ctx = ptn.current()
    kw = dict(
        valid_len=valid_len, scale=scale, block_q=block_q,
        exp_dtype=exp_dtype, interpret=interpret, algo=algo, chunk_k=chunk_k,
        softmax=softmax,
    )
    if ctx is not None:
        return ptn.wrap_attention(
            lambda q, k, v, m: _enc_attention_jit(q, k, v, **kw), q, k, v, None
        )
    return _enc_attention_jit(q, k, v, **kw)
