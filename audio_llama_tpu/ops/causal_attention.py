"""Causal GQA flash attention with a custom VJP — the llama training path.

Why not the stock kernel: measured at llama training geometry (Hq24/Hkv8/
hd128/T2560 causal) the stock pallas flash runs 73 TF/s forward and only
~54 TF/s fwd+bwd (experiments/llama_attn_bench.py) against a 192 TF/s
matmul ceiling — the single largest contributor to the train step's MFU gap
(BASELINE.md round-2 attribution). This kernel applies the lessons from
ops/enc_attention.py to the causal case:

  - softmax shift (round 3): the production mode is a per-row running TRUE
    max with online rescaling ('online') — safe at any activation magnitude
    because exp arguments never exceed 0. The original rescaling-free
    bounded-shift mode (softmax(s) == softmax(s - c) with the Cauchy-Schwarz
    c = ||q_i||·max_j||k_j||) is kept as softmax_mode='bounded' for A/B: it
    silently zeroes rows once the bound exceeds the true max by ~87 nats
    (f32 exp underflow), which real-checkpoint outlier activations at hd=128
    can reach (round-2 ADVICE, severity medium);
  - causal chunk skipping: k-chunks entirely in the future are skipped at
    runtime (@pl.when on grid indices); only diagonal-overlapping chunks
    pay the triangular iota mask;
  - GQA via index maps: K/V stay [B·Hkv, T, hd] — the q->kv head mapping
    lives in the BlockSpec index_map, so the 3x head repeat the stock
    wrapper materializes (HBM traffic and capacity) never exists. The
    backward accumulates dk/dv across the query-head group inside the
    kernel for the same reason;
  - hd=128 means BOTH matmuls run a full 128-deep MXU contraction (the
    whisper kernel's hd-64 penalty does not apply here); the softmax
    denominator uses an explicit rowsum (the ones-column trick would push
    PV to 129 -> 256 padded lanes and double its cost at hd=128).

Backward: the standard flash decomposition with the bounded shift —
residuals are (l, o) plus the recomputable bound; D = rowsum(dO·O) is a
cheap XLA prologue; a dq kernel accumulates over k-chunks and a dkv kernel
accumulates over (group, q-block) pairs, both recomputing P from q/k/l.

Contract matches ops/flash_attention.flash_mha(causal=True): mask [B, T]
hides PADDED KEYS; padded-QUERY rows return garbage (their loss/cotangents
are masked upstream, which the backward relies on — safe reciprocals keep
them finite, never NaN).

Parity: tests/test_causal_attention.py (forward vs ops.attention.mha,
gradients vs jax.grad through the XLA path, GQA + padding + odd lengths).

STATUS — measured, NOT the production path: on the v5e this kernel runs
46 TF/s fwd / 44.8 fwd+bwd vs the stock kernel's 73 / 54.4 at llama
geometry (experiments/causal_kernel_bench.py). The encoder win did not
transfer because (a) at hd=128 the exp-per-FLOP ratio is half of whisper's
hd=64, so eliminating VPU softmax passes buys little, and (b) the chunked
k-grid still fetches K/V blocks for causally-skipped steps (Mosaic DMAs are
not predicated by @pl.when), wasting bandwidth the stock kernel's
pipeline avoids. llama_forward keeps ops/flash_attention.py.

PRODUCTION STATUS (round 2 final): this IS the llama training-path
attention (llama_forward attn_impl='auto' on TPU). The early variants
measured 46.0 ('blocks') / 48.7 ('dma') / 37.8 ('dma2') TF/s fwd vs stock
73 — until a diagnostic showed the per-tile `lax.cond` around the
triangular mask cost ~35% of the kernel (Mosaic evaluates/serializes
around both branches). With an UNCONDITIONAL iota mask:

  fwd:      81.9 TF/s @B2 / 65.2 @B8   (stock 73.0 / 63.2)
  fwd+bwd:  76.5 TF/s @B2 / 58.0 @B8   (stock 54.4 / 48.3)  — +41% / +20%

Train-step effect: 5889 -> 6091 tok/s @B2 (MFU 53.4% -> 55.2%), 4861 ->
5254 @B8. Lesson recorded for every kernel in this repo: never branch on
grid indices with lax.cond inside a Mosaic kernel — predicate with
@pl.when or compute unconditionally. 'dma'/'dma2' remain as measured
references (the skipped-chunk DMA hypothesis was worth only ~6%).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _row_bound(q, kn):
    """Per-row shift c >= max_j q_i.k_j (q pre-scaled): ||q_i|| * max||k||."""
    qn = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True))
    return qn * kn


def _tri_mask(s, q0, k0, *, neg=NEG):
    """Causal mask for a [bq, ck] tile whose global offsets are (q0, k0)."""
    bq, ck = s.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, ck), 0) + q0
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, ck), 1) + k0
    return jnp.where(col <= row, s, neg)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, mb_ref, kn_ref, o_ref, l_ref, c_ref,
                acc_ref, lsum_ref, m_ref, *, bq, ck, nk, tri="cond",
                softmax="online"):
    qi, kj = pl.program_id(1), pl.program_id(2)

    @pl.when(kj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if softmax == "bounded":
            lsum_ref[:] = jnp.zeros_like(lsum_ref)
        else:
            m_ref[:] = jnp.full_like(m_ref, NEG)

    # tri='never' (ring full-attention hops): every chunk contributes,
    # no triangular mask — the block-level causal structure is the ring's.
    @pl.when((kj * ck <= qi * bq + bq - 1) | (tri == "never"))
    def _():
        q = q_ref[0]  # [bq, hd] pre-scaled
        k = k_ref[0]  # [ck, hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, ck]
        s = s + mb_ref[0, 0][None, :]  # key padding bias (0 / NEG)
        # triangular mask only where the chunk overlaps the diagonal
        if tri == "cond":  # lax.cond (Mosaic may evaluate both branches)
            s = jax.lax.cond(
                kj * ck + ck - 1 > qi * bq,
                lambda s: _tri_mask(s, qi * bq, kj * ck),
                lambda s: s,
                s,
            )
        elif tri == "never":
            pass
        else:  # unconditional iota mask every step
            s = _tri_mask(s, qi * bq, kj * ck)
        if softmax == "bounded":
            bound = _row_bound(q, kn_ref[0, 0, 0])
            p = jnp.exp(s - bound)
            lsum_ref[:] = lsum_ref[:] + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:  # 'online': running true max with rescaling — p <= 1 always,
            # so neither the underflow (bound >> true max) nor overflow
            # regime exists at ANY activation magnitude. The kernel is
            # VPU-pass-bound (fwd 42 vs bounded's 64 TF/s with a naive
            # 3-pass softmax), so two VPU passes ride other units instead:
            #   - the row-sum rides the PV matmul via a ones column
            #     (P @ [V | 1] -> output AND denominator; the MXU runs at
            #     ~30% duty here, so the extra 128->129 lane tile is free);
            #   - exp runs in bf16 when V is bf16 (args <= 0, so bf16's
            #     range is safe; P is cast to bf16 for the MXU anyway).
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            r = jnp.exp(m_prev - m_new)  # <= 1; first chunk: exp(-huge) = 0
            v = v_ref[0]
            exp_dtype = (
                jnp.bfloat16 if v.dtype == jnp.bfloat16 else jnp.float32
            )
            p = jnp.exp((s - m_new).astype(exp_dtype)).astype(v.dtype)
            ck_ = v.shape[0]
            v_ext = jnp.concatenate(
                [v, jnp.ones((ck_, 1), v.dtype)], axis=1
            )  # [ck, hd+1]
            acc_ref[:] = acc_ref[:] * r + jax.lax.dot_general(
                p, v_ext, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[:] = m_new

    @pl.when(kj == nk - 1)
    def _():
        hd = o_ref.shape[2]
        if softmax == "bounded":
            l = lsum_ref[:]
            out = acc_ref[:]
            c_ref[0, 0] = _row_bound(q_ref[0], kn_ref[0, 0, 0])[:, 0]
        else:  # denominator lives in the accumulator's ones-column lane
            l = acc_ref[:, hd : hd + 1]
            out = acc_ref[:, :hd]
            c_ref[0, 0] = m_ref[:][:, 0]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0] = jnp.where(l > 0, out / safe, 0.0).astype(o_ref.dtype)
        l_ref[0, 0] = l[:, 0]


def _fwd_kernel_twopass(q_ref, k_ref, v_ref, mb_ref, kn_ref, o_ref, l_ref,
                        c_ref, acc_ref, lsum_ref, m_ref, *, bq, ck, nk):
    """Two-pass alternative to 'online': the k-grid runs TWICE (grid
    (BHq, nq, 2*nk)); pass 1 (kj < nk) computes the global per-row TRUE
    max (QK + mask + one max pass — the MXU runs far under capacity in
    this kernel, so the repeated QK rides its idle duty), pass 2 does
    exp(s - m_global) with NO rescaling: exp args stay <= 0 (exactly as
    safe as 'online'), the accumulator update is a pure add, and the
    serial m/acc rescale carry between chunks is gone. Residuals (l,
    c = global max) are identical to 'online', so the backward is shared.
    Cost: K/V chunks are fetched twice and the bias+mask VPU passes run
    twice (lsum_ref is unused — kept for a uniform scratch list)."""
    qi, kj = pl.program_id(1), pl.program_id(2)
    j = jax.lax.rem(kj, nk)

    @pl.when(kj == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = j * ck <= qi * bq + bq - 1  # skip fully-future chunks

    def scores():
        q = q_ref[0]  # [bq, hd] pre-scaled
        s = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, ck]
        s = s + mb_ref[0, 0][None, :]
        return _tri_mask(s, qi * bq, j * ck)  # unconditional (cond is slow)

    @pl.when(valid & (kj < nk))
    def _():
        m_ref[:] = jnp.maximum(
            m_ref[:], jnp.max(scores(), axis=1, keepdims=True)
        )

    @pl.when(valid & (kj >= nk))
    def _():
        v = v_ref[0]
        exp_dtype = jnp.bfloat16 if v.dtype == jnp.bfloat16 else jnp.float32
        p = jnp.exp((scores() - m_ref[:]).astype(exp_dtype)).astype(v.dtype)
        ck_ = v.shape[0]
        v_ext = jnp.concatenate(
            [v, jnp.ones((ck_, 1), v.dtype)], axis=1
        )  # [ck, hd+1]: denominator rides the PV matmul
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p, v_ext, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kj == 2 * nk - 1)
    def _():
        hd = o_ref.shape[2]
        l = acc_ref[:, hd : hd + 1]
        out = acc_ref[:, :hd]
        c_ref[0, 0] = m_ref[:][:, 0]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0] = jnp.where(l > 0, out / safe, 0.0).astype(o_ref.dtype)
        l_ref[0, 0] = l[:, 0]


def _fwd_kernel_dma(q_ref, mb_ref, kn_ref, k_any, v_any, o_ref, l_ref, c_ref,
                    k_db, v_db, sems, *, bq, ck, Hq, Hkv, nk):
    """Forward with MANUAL double-buffered K/V chunk DMA over ONLY the
    causally-valid chunks — the BlockSpec grid version fetches K/V for
    @pl.when-skipped future chunks anyway (DMAs are not predicated), which
    is why it lost to stock flash. Grid is (B*Hq, nq); the chunk loop is a
    traced fori_loop of length qi+... (the number of chunks covering keys
    0..qi*bq+bq-1)."""
    i, qi = pl.program_id(0), pl.program_id(1)
    G = Hq // Hkv
    kv_row = (i // Hq) * Hkv + jax.lax.rem(i, Hq) // G
    last_key = qi * bq + bq - 1
    nv = last_key // ck + 1  # valid chunks

    def chunk_dma(j, slot):
        return (
            pltpu.make_async_copy(
                k_any.at[kv_row, pl.ds(j * ck, ck)], k_db.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_any.at[kv_row, pl.ds(j * ck, ck)], v_db.at[slot],
                sems.at[slot, 1],
            ),
        )

    ka, va = chunk_dma(0, 0)
    ka.start()
    va.start()

    q = q_ref[0]  # [bq, hd] pre-scaled
    bound = _row_bound(q, kn_ref[0, 0, 0])

    def body(j, carry):
        acc, lsum = carry
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < nv)
        def _():
            kn_, vn_ = chunk_dma(j + 1, nxt)
            kn_.start()
            vn_.start()

        ka, va = chunk_dma(j, slot)
        ka.wait()
        va.wait()

        k = k_db[slot]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + mb_ref[0, j][None, :]
        s = _tri_mask_dyn(s, qi * bq, j * ck)  # unconditional (cond is slow)
        p = jnp.exp(s - bound)
        lsum = lsum + jnp.sum(p, axis=1, keepdims=True)
        acc = acc + jax.lax.dot_general(
            p.astype(v_db.dtype), v_db[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, lsum

    acc0 = jnp.zeros((bq, q_ref.shape[2]), jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, l = jax.lax.fori_loop(0, nv, body, (acc0, l0))
    safe = jnp.where(l > 0, l, 1.0)
    o_ref[0] = jnp.where(l > 0, acc / safe, 0.0).astype(o_ref.dtype)
    l_ref[0, 0] = l[:, 0]
    c_ref[0, 0] = bound[:, 0]


def _fwd_kernel_dma2(q_ref, mb_ref, kn_ref, k_any, v_any, o_ref, l_ref, c_ref,
                     k_db, v_db, sems, *, bq, ck, Hq, Hkv, nk):
    """Software-pipelined variant of _fwd_kernel_dma: the loop body carries
    chunk j's SCORES and emits chunk j+1's QK matmul (MXU) as work
    independent of chunk j's softmax chain (VPU), so the scheduler can
    overlap the two units; K/V are triple-buffered (chunk j's V must
    outlive the j+2 prefetch)."""
    i, qi = pl.program_id(0), pl.program_id(1)
    G = Hq // Hkv
    kv_row = (i // Hq) * Hkv + jax.lax.rem(i, Hq) // G
    nv = (qi * bq + bq - 1) // ck + 1

    def chunk_dma(j, slot):
        return (
            pltpu.make_async_copy(
                k_any.at[kv_row, pl.ds(j * ck, ck)], k_db.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_any.at[kv_row, pl.ds(j * ck, ck)], v_db.at[slot],
                sems.at[slot, 1],
            ),
        )

    q = q_ref[0]
    bound = _row_bound(q, kn_ref[0, 0, 0])

    def scores(j, slot):
        s = jax.lax.dot_general(
            q, k_db[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + mb_ref[0, j][None, :]
        return _tri_mask_dyn(s, qi * bq, j * ck)  # unconditional

    # prologue: fetch chunk 0, compute its scores, start fetch of chunk 1
    ka, va = chunk_dma(0, 0)
    ka.start()
    va.start()

    @pl.when(nv > 1)
    def _():
        kb, vb = chunk_dma(1, 1)
        kb.start()
        vb.start()

    ka, va = chunk_dma(0, 0)
    ka.wait()
    va.wait()
    s0 = scores(0, 0)

    def body(j, carry):
        acc, lsum, s_j = carry
        slot_j = jax.lax.rem(j, 3)
        slot_n = jax.lax.rem(j + 1, 3)
        slot_p = jax.lax.rem(j + 2, 3)

        @pl.when(j + 2 < nv)
        def _():
            kp, vp = chunk_dma(j + 2, slot_p)
            kp.start()
            vp.start()

        # softmax of chunk j (VPU) ...
        p = jnp.exp(s_j - bound)
        lsum = lsum + jnp.sum(p, axis=1, keepdims=True)
        # ... is independent of chunk j+1's QK (MXU): both emitted here so
        # the scheduler can overlap the units
        kn_, vn_ = chunk_dma(j + 1, slot_n)
        kn_.wait()
        vn_.wait()
        s_next = scores(j + 1, slot_n)
        acc = acc + jax.lax.dot_general(
            p.astype(v_db.dtype), v_db[slot_j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, lsum, s_next

    acc0 = jnp.zeros((bq, q_ref.shape[2]), jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, lsum, s_last = jax.lax.fori_loop(0, nv - 1, body, (acc0, l0, s0))

    # epilogue: chunk nv-1
    p = jnp.exp(s_last - bound)
    lsum = lsum + jnp.sum(p, axis=1, keepdims=True)
    slot_last = jax.lax.rem(nv - 1, 3)
    acc = acc + jax.lax.dot_general(
        p.astype(v_db.dtype), v_db[slot_last], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    safe = jnp.where(lsum > 0, lsum, 1.0)
    o_ref[0] = jnp.where(lsum > 0, acc / safe, 0.0).astype(o_ref.dtype)
    l_ref[0, 0] = lsum[:, 0]
    c_ref[0, 0] = bound[:, 0]


def _tri_mask_dyn(s, q0, k0, *, neg=NEG):
    """_tri_mask with traced offsets (fori_loop chunk index)."""
    bq, ck = s.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, ck), 0) + q0
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, ck), 1) + k0
    return jnp.where(col <= row, s, neg)


def _fwd_call_dma(qs, k, v, mb, kn, Hq, Hkv, *, bq, ck, interpret,
                  pipelined=False):
    BHq, T, hd = qs.shape
    nq, nk = T // bq, T // ck
    # mb reshaped to [B, nk, ck] so chunk j is a sublane index, not a
    # dynamic lane slice
    B = mb.shape[0]
    mb_c = mb.reshape(B, nk, ck)

    kfn = _fwd_kernel_dma2 if pipelined else _fwd_kernel_dma
    kernel = functools.partial(kfn, bq=bq, ck=ck, Hq=Hq, Hkv=Hkv, nk=nk)
    o, l, c = pl.pallas_call(
        kernel,
        grid=(BHq, nq),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, nk, ck), lambda bh, qi: (bh // Hq, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda bh, qi: (
                (bh // Hq) * Hkv + (bh % Hq) // (Hq // Hkv), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hd), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, 1, bq), lambda bh, qi: (bh, 0, qi)),
            pl.BlockSpec((1, 1, bq), lambda bh, qi: (bh, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BHq, T, hd), qs.dtype),
            jax.ShapeDtypeStruct((BHq, 1, T), jnp.float32),
            jax.ShapeDtypeStruct((BHq, 1, T), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3 if pipelined else 2, ck, hd), k.dtype),
            pltpu.VMEM((3 if pipelined else 2, ck, hd), v.dtype),
            pltpu.SemaphoreType.DMA((3 if pipelined else 2, 2)),
        ],
        interpret=interpret,
    )(qs, mb_c, kn, k, v)
    return o, l, c


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, mb_ref, c_ref, do_ref, l_ref, d_ref,
               dq_ref, dq_acc, *, bq, ck, nk, tri="always"):
    qi, kj = pl.program_id(1), pl.program_id(2)

    @pl.when(kj == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    @pl.when((kj * ck <= qi * bq + bq - 1) | (tri == "never"))
    def _():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + mb_ref[0, 0][None, :]
        # unconditional iota mask: a lax.cond here costs ~35% of the whole
        # kernel (measured — Mosaic evaluates/serializes around both
        # branches). tri='never': ring full-attention hop, no mask.
        if tri != "never":
            s = _tri_mask(s, qi * bq, kj * ck)
        # c = the forward's per-row softmax shift (true running max in
        # 'online' mode, Cauchy-Schwarz bound in 'bounded') — reusing it
        # keeps the recomputed P bit-consistent with the forward.
        shift = c_ref[0, 0][:, None]  # [bq, 1]
        l = l_ref[0, 0][:, None]  # [bq, 1]
        inv_l = jnp.where(l > 0, 1.0 / jnp.where(l > 0, l, 1.0), 0.0)
        p = jnp.exp(s - shift) * inv_l  # P [bq, ck]
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, ck]
        ds = p * (dp - d_ref[0, 0][:, None])
        dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kj == nk - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, mb_ref, c_ref, do_ref, l_ref, d_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, bq, ck, n_inner, nq,
                tri="always"):
    kj, i = pl.program_id(1), pl.program_id(2)
    qi = i % nq

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when((qi * bq + bq - 1 >= kj * ck) | (tri == "never"))
    def _():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + mb_ref[0, 0][None, :]
        if tri != "never":  # ring full-attention hops skip the mask
            s = _tri_mask(s, qi * bq, kj * ck)  # unconditional (cond is slow)
        shift = c_ref[0, 0][:, None]  # forward's per-row softmax shift
        l = l_ref[0, 0][:, None]
        inv_l = jnp.where(l > 0, 1.0 / jnp.where(l > 0, l, 1.0), 0.0)
        p = jnp.exp(s - shift) * inv_l  # P [bq, ck]
        pb = p.astype(do_ref.dtype)
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            pb, do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # P^T @ dO -> [ck, hd]
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - d_ref[0, 0][:, None])).astype(q.dtype)
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # dS^T @ q -> [ck, hd]

    @pl.when(i == n_inner - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wiring
#
# Flattened layouts: qs/o/do [B*Hq, T, hd] (row = b*Hq + h),
# k/v [B*Hkv, T, hd] (row = b*Hkv + h//G), mask bias mb [B, T],
# kn [B*Hkv, 1] (max key norm per kv head), l/D [B*Hq, T] f32.
# The q-head -> kv-head / batch mappings live in the index maps.
# ---------------------------------------------------------------------------


def _fwd_call(qs, k, v, mb, kn, Hq, Hkv, *, bq, ck, interpret, tri="always",
              softmax="online"):
    BHq, T, hd = qs.shape
    G = Hq // Hkv
    nq, nk = T // bq, T // ck

    def kv_i(bh):
        return (bh // Hq) * Hkv + (bh % Hq) // G

    if softmax == "twopass":
        # the k-grid runs twice (max pass, then exp/PV pass); K/V/mb
        # blocks revisit via kj % nk
        kernel = functools.partial(_fwd_kernel_twopass, bq=bq, ck=ck, nk=nk)
        nks = 2 * nk
        kmap = lambda bh, qi, kj: (kv_i(bh), kj % nk, 0)  # noqa: E731
        mbmap = lambda bh, qi, kj: (bh // Hq, 0, kj % nk)  # noqa: E731
    else:
        kernel = functools.partial(
            _fwd_kernel, bq=bq, ck=ck, nk=nk, tri=tri, softmax=softmax
        )
        nks = nk
        kmap = lambda bh, qi, kj: (kv_i(bh), kj, 0)  # noqa: E731
        mbmap = lambda bh, qi, kj: (bh // Hq, 0, kj)  # noqa: E731
    o, l, c = pl.pallas_call(
        kernel,
        grid=(BHq, nq, nks),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda bh, qi, kj: (bh, qi, 0)),
            pl.BlockSpec((1, ck, hd), kmap),
            pl.BlockSpec((1, ck, hd), kmap),
            pl.BlockSpec((1, 1, ck), mbmap),
            pl.BlockSpec((1, 1, 1), lambda bh, qi, kj: (kv_i(bh), 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hd), lambda bh, qi, kj: (bh, qi, 0)),
            pl.BlockSpec((1, 1, bq), lambda bh, qi, kj: (bh, 0, qi)),
            pl.BlockSpec((1, 1, bq), lambda bh, qi, kj: (bh, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BHq, T, hd), qs.dtype),
            jax.ShapeDtypeStruct((BHq, 1, T), jnp.float32),
            jax.ShapeDtypeStruct((BHq, 1, T), jnp.float32),
        ],
        scratch_shapes=[
            # online mode: the accumulator carries the denominator in an
            # extra ones-column lane (P @ [V | 1])
            pltpu.VMEM((bq, hd + (0 if softmax == "bounded" else 1)), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qs, k, v, mb, kn)
    return o, l, c


def _dq_call(qs, k, v, mb, c, do, l, d, Hq, Hkv, *, bq, ck, interpret,
             tri="always"):
    BHq, T, hd = qs.shape
    G = Hq // Hkv
    nq, nk = T // bq, T // ck

    def kv_i(bh):
        return (bh // Hq) * Hkv + (bh % Hq) // G

    kernel = functools.partial(_dq_kernel, bq=bq, ck=ck, nk=nk, tri=tri)
    return pl.pallas_call(
        kernel,
        grid=(BHq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda bh, qi, kj: (bh, qi, 0)),
            pl.BlockSpec((1, ck, hd), lambda bh, qi, kj: (kv_i(bh), kj, 0)),
            pl.BlockSpec((1, ck, hd), lambda bh, qi, kj: (kv_i(bh), kj, 0)),
            pl.BlockSpec((1, 1, ck), lambda bh, qi, kj: (bh // Hq, 0, kj)),
            pl.BlockSpec((1, 1, bq), lambda bh, qi, kj: (bh, 0, qi)),
            pl.BlockSpec((1, bq, hd), lambda bh, qi, kj: (bh, qi, 0)),
            pl.BlockSpec((1, 1, bq), lambda bh, qi, kj: (bh, 0, qi)),
            pl.BlockSpec((1, 1, bq), lambda bh, qi, kj: (bh, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda bh, qi, kj: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BHq, T, hd), qs.dtype),
        scratch_shapes=[pltpu.VMEM((bq, hd), jnp.float32)],
        interpret=interpret,
    )(qs, k, v, mb, c, do, l, d)


def _dkv_call(qs, k, v, mb, c, do, l, d, Hq, Hkv, *, bq, ck, interpret,
              tri="always"):
    BHq, T, hd = qs.shape
    BHkv = k.shape[0]
    G = Hq // Hkv
    nq, nk = T // bq, T // ck
    n_inner = G * nq

    def q_i(bkv, i):
        # inner index i = g * nq + qi; q row = b*Hq + kvh*G + g
        g = i // nq
        return (bkv // Hkv) * Hq + (bkv % Hkv) * G + g

    kernel = functools.partial(
        _dkv_kernel, bq=bq, ck=ck, n_inner=n_inner, nq=nq, tri=tri
    )
    dk, dv = pl.pallas_call(
        kernel,
        grid=(BHkv, nk, n_inner),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda bkv, kj, i: (q_i(bkv, i), i % nq, 0)),
            pl.BlockSpec((1, ck, hd), lambda bkv, kj, i: (bkv, kj, 0)),
            pl.BlockSpec((1, ck, hd), lambda bkv, kj, i: (bkv, kj, 0)),
            pl.BlockSpec((1, 1, ck), lambda bkv, kj, i: (bkv // Hkv, 0, kj)),
            pl.BlockSpec((1, 1, bq), lambda bkv, kj, i: (q_i(bkv, i), 0, i % nq)),
            pl.BlockSpec((1, bq, hd), lambda bkv, kj, i: (q_i(bkv, i), i % nq, 0)),
            pl.BlockSpec((1, 1, bq), lambda bkv, kj, i: (q_i(bkv, i), 0, i % nq)),
            pl.BlockSpec((1, 1, bq), lambda bkv, kj, i: (q_i(bkv, i), 0, i % nq)),
        ],
        out_specs=[
            pl.BlockSpec((1, ck, hd), lambda bkv, kj, i: (bkv, kj, 0)),
            pl.BlockSpec((1, ck, hd), lambda bkv, kj, i: (bkv, kj, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BHkv, T, hd), k.dtype),
            jax.ShapeDtypeStruct((BHkv, T, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((ck, hd), jnp.float32),
            pltpu.VMEM((ck, hd), jnp.float32),
        ],
        interpret=interpret,
    )(qs, k, v, mb, c, do, l, d)
    return dk, dv


# ---------------------------------------------------------------------------
# custom-VJP core over flattened operands
# ---------------------------------------------------------------------------

def _fwd_dispatch(fwd_impl, softmax):
    # The manual-DMA variants are measured references and support only the
    # 'bounded' softmax (their loop structure has no running-max carry).
    if fwd_impl == "dma":
        return _fwd_call_dma
    if fwd_impl == "dma2":
        return functools.partial(_fwd_call_dma, pipelined=True)
    if fwd_impl == "blocks_cond":
        # the measured ~35%-slower per-tile lax.cond variant, kept
        # reproducible (see module docstring / ADVICE round 2)
        return functools.partial(_fwd_call, tri="cond", softmax=softmax)
    return functools.partial(_fwd_call, softmax=softmax)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11)
)
def _core(qs, k, v, mb, kn, Hq, Hkv, bq, ck, interpret, fwd_impl, softmax):
    o, _, _ = _fwd_dispatch(fwd_impl, softmax)(
        qs, k, v, mb, kn, Hq, Hkv, bq=bq, ck=ck, interpret=interpret
    )
    return o


def _core_fwd(qs, k, v, mb, kn, Hq, Hkv, bq, ck, interpret, fwd_impl, softmax):
    o, l, c = _fwd_dispatch(fwd_impl, softmax)(
        qs, k, v, mb, kn, Hq, Hkv, bq=bq, ck=ck, interpret=interpret
    )
    return o, (qs, k, v, mb, o, l, c)


def _core_bwd(Hq, Hkv, bq, ck, interpret, fwd_impl, softmax, res, do):
    qs, k, v, mb, o, l, c = res
    # D_i = sum_d dO_id * O_id (cheap XLA prologue)
    d = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )[:, None, :]  # [BHq, 1, T] (singleton sublane for clean tiling)
    dq = _dq_call(qs, k, v, mb, c, do, l, d, Hq, Hkv, bq=bq, ck=ck,
                  interpret=interpret)
    dk, dv = _dkv_call(qs, k, v, mb, c, do, l, d, Hq, Hkv, bq=bq, ck=ck,
                       interpret=interpret)
    kn_zero = jnp.zeros((k.shape[0], 1, 1), jnp.float32)
    return dq, dk, dv, jnp.zeros_like(mb), kn_zero


_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _pick(n, cands):
    for c in cands:
        if n % c == 0:
            return c
    return n


def causal_mha(
    q: jnp.ndarray,  # [B, T, Hq, hd]
    k: jnp.ndarray,  # [B, T, Hkv, hd]
    v: jnp.ndarray,  # [B, T, Hkv, hd]
    *,
    mask: Optional[jnp.ndarray] = None,  # [B, T] 1 = attend (key padding)
    scale: Optional[float] = None,
    block_q: int = 0,
    chunk_k: int = 0,
    interpret: bool = False,
    fwd_impl: str = "blocks",  # | 'blocks_cond' | 'dma' | 'dma2' (all slower)
    softmax_mode: str = "online",  # | 'twopass' | 'bounded' (unsafe)
) -> jnp.ndarray:
    """Causal GQA self-attention, [B, T, Hq, hd] in/out, differentiable.

    Same contract as flash_mha(causal=True): padded-query rows are garbage
    (callers mask their loss, and therefore this op's cotangents, at pad
    positions). Odd T is padded to the 128 tile internally (e.g. the 2014-
    token generation prefill), mirroring flash_mha's self-padding.

    softmax_mode='online' (default) keeps a per-row running TRUE max with
    rescaling — exp arguments are always <= 0, so it is numerically safe at
    any activation magnitude. 'bounded' uses the rescaling-free
    Cauchy-Schwarz shift: measurably similar speed, but when the bound
    exceeds the true row max by > ~87 nats (real-checkpoint outlier/
    attention-sink activations at hd=128 — see round-2 ADVICE) the f32 exp
    underflows and the row silently zeroes. 'twopass' is exactly as safe
    as 'online' (exp args <= 0 against the global true max) but computes
    the max in a separate first k-pass — trading a repeated QK matmul
    (MXU idle duty) for the online mode's serial rescale carry.
    Production paths use 'online'; 'bounded' remains for A/B measurement
    ('dma'/'dma2' impls are bounded-only).

    Under an active ops.partitioning context (GSPMD-sharded train steps)
    the call self-wraps in a nested shard_map: batch over dp x fsdp, heads
    over tp — attention is batch/head-parallel, so each shard runs this
    kernel on its local block with no collectives.
    """
    from . import partitioning as ptn

    ctx = ptn.current()
    if ctx is not None:
        if ptn.seq_ring_applicable(q.shape):
            # sequence-parallel training: T sharded over 'sp' — causal
            # attention runs as a ppermute ring (LONG_CONTEXT step 2)
            return ptn.wrap_ring_causal(
                q, k, v, mask,
                scale if scale is not None else q.shape[-1] ** -0.5,
                interpret=interpret,
            )
        local = functools.partial(
            _causal_mha_local, scale=scale, block_q=block_q, chunk_k=chunk_k,
            interpret=interpret, fwd_impl=fwd_impl, softmax_mode=softmax_mode,
        )
        return ptn.wrap_attention(
            lambda q, k, v, m: local(q, k, v, mask=m), q, k, v, mask
        )
    return _causal_mha_local(
        q, k, v, mask=mask, scale=scale, block_q=block_q, chunk_k=chunk_k,
        interpret=interpret, fwd_impl=fwd_impl, softmax_mode=softmax_mode,
    )


def _causal_mha_local(
    q, k, v, *, mask, scale, block_q, chunk_k, interpret, fwd_impl,
    softmax_mode,
):
    B, T, Hq, hd = q.shape
    Hkv = k.shape[2]
    if Hq % Hkv:
        raise ValueError("Hq must be a multiple of Hkv")
    if scale is None:
        scale = hd ** -0.5

    T_real = T
    pad = (-T) % 128
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        base = (
            mask.astype(jnp.int32)
            if mask is not None
            else jnp.ones((B, T), jnp.int32)
        )
        mask = jnp.pad(base, ((0, 0), (0, pad)))  # pads invisible as keys
        T = T + pad

    bq = block_q or _pick(T, (512, 256, 128))
    ck = chunk_k or _pick(T, (512, 256, 128))

    qs = jnp.swapaxes(q * jnp.asarray(scale, q.dtype), 1, 2).reshape(
        B * Hq, T, hd
    )
    kh = jnp.swapaxes(k, 1, 2).reshape(B * Hkv, T, hd)
    vh = jnp.swapaxes(v, 1, 2).reshape(B * Hkv, T, hd)

    if mask is None:
        mb = jnp.zeros((B, 1, T), jnp.float32)
    else:
        mb = jnp.where(
            mask.astype(bool), 0.0, NEG
        ).astype(jnp.float32)[:, None, :]
    kn = jnp.sqrt(
        jnp.max(jnp.sum(kh.astype(jnp.float32) ** 2, axis=-1), axis=-1)
    ).reshape(B * Hkv, 1, 1)

    if fwd_impl in ("dma", "dma2") and softmax_mode != "bounded":
        softmax_mode = "bounded"  # the DMA reference impls have no online path
    o = _core(
        qs, kh, vh, mb, kn, Hq, Hkv, bq, ck, interpret, fwd_impl, softmax_mode
    )
    out = jnp.swapaxes(o.reshape(B, Hq, T, hd), 1, 2)
    return out[:, :T_real] if T_real != T else out


def available() -> bool:
    from . import flash_attention as fa

    return fa.available()
