"""Ring causal attention PERF TIER: the Pallas flash kernels per hop.

parallel/ring_attention.py's XLA ring is the correctness tier — every hop
runs stock XLA attention and materializes [B, H, Tl, Tk] score blocks. This
module runs each hop through the production causal-attention flash kernels
(ops/causal_attention.py) instead:

  hop 0 (the local block)     -> the standard causal kernel (tri mask);
  hops from earlier shards    -> the same kernel in tri='never' mode
                                 (full attention — the ring's block-level
                                 causality replaces the triangular mask);
  hops from later shards      -> skipped entirely under lax.cond (the XLA
                                 tier pays for them with a -inf bias; the
                                 kernel tier doesn't even run the matmul —
                                 half the ring's FLOPs at large sp).

Forward: each hop's kernel returns its own (o, l, m) flash statistics;
hops merge with the standard online rescale (the sp_partial_attention
math), so no shard ever materializes more than its [B, Tl, H, hd] slice.

Backward (exact, not stop-gradient): flash attention's backward decomposes
per K/V block GIVEN the global row statistics — p_blk = exp(s_blk - m*)/l*
and ds_blk = p_blk * (dp_blk - D*) need only (m*, l*, D*), all [B, H, Tl]
and already merged by the forward. So the ring backward re-rotates the
K/V blocks, calls the existing _dq/_dkv kernels per hop with the GLOBAL
stats, and rotates each block's (dk, dv) accumulator alongside the block
so it arrives home after a full cycle. Gradients are numerically the
single-device kernel's (CPU-mesh parity: tests/test_ring_kernel.py).

Reference analog: none — the reference is single-GPU with a 2k-token cap
(SURVEY.md §5 'Long-context'). Ring attention literature: the blockwise
ring (Liu et al.) + flash-stats decomposition; built here from our own
kernel's (o, l, c) surface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

NEG = -1e30


def _perm(n):
    return [(i, (i + 1) % n) for i in range(n)]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9)
)
def _ring_core(qs, kh, vh, mb, axis_name, Hq, Hkv, bq, ck, interpret):
    o, _, _ = _ring_fwd_impl(
        qs, kh, vh, mb, axis_name, Hq, Hkv, bq, ck, interpret
    )
    return o


def _ring_fwd_impl(qs, kh, vh, mb, axis_name, Hq, Hkv, bq, ck, interpret):
    """-> (o [BHq, Tl, hd], l* [BHq, 1, Tl], m* [BHq, 1, Tl]) with stats
    merged over the ring."""
    from ..ops.causal_attention import _fwd_call

    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    kn = jnp.zeros((kh.shape[0], 1, 1), jnp.float32)

    call = functools.partial(
        _fwd_call, Hq=Hq, Hkv=Hkv, bq=bq, ck=ck, interpret=interpret,
        softmax="online",
    )

    # hop 0: the local block, standard causal kernel
    o0, l0, m0 = call(qs, kh, vh, mb, kn, tri="always")
    acc = o0.astype(jnp.float32) * l0[:, 0, :, None]  # unnormalized

    def hop(carry, h):
        k_cur, v_cur, mb_cur, m_acc, l_acc, acc = carry
        p = _perm(n)
        k_cur = lax.ppermute(k_cur, axis_name, p)
        v_cur = lax.ppermute(v_cur, axis_name, p)
        mb_cur = lax.ppermute(mb_cur, axis_name, p)

        def live(_):
            o_h, l_h, m_h = call(qs, k_cur, v_cur, mb_cur, kn, tri="never")
            return o_h.astype(jnp.float32) * l_h[:, 0, :, None], l_h, m_h

        def dead(_):
            return (
                jnp.zeros_like(acc),
                jnp.zeros_like(l_acc),
                jnp.full_like(m_acc, NEG),
            )

        # after h rotations this shard holds the block of shard
        # (idx - h) mod n; it participates iff that shard precedes us
        acc_h, l_h, m_h = lax.cond(h <= idx, live, dead, 0)
        m_new = jnp.maximum(m_acc, m_h)
        r_old = jnp.exp(m_acc - m_new)
        r_new = jnp.exp(m_h - m_new)
        l_out = l_acc * r_old + l_h * r_new
        acc = (
            acc * r_old[:, 0, :, None] + acc_h * r_new[:, 0, :, None]
        )
        return (k_cur, v_cur, mb_cur, m_new, l_out, acc), None

    (_, _, _, m_f, l_f, acc), _ = lax.scan(
        hop, (kh, vh, mb, m0, l0, acc), jnp.arange(1, n)
    )
    lcol = l_f[:, 0, :, None]
    safe = jnp.where(lcol > 0, lcol, 1.0)
    o = jnp.where(lcol > 0, acc / safe, 0.0).astype(qs.dtype)
    return o, l_f, m_f


def _ring_core_fwd(qs, kh, vh, mb, axis_name, Hq, Hkv, bq, ck, interpret):
    o, l, m = _ring_fwd_impl(
        qs, kh, vh, mb, axis_name, Hq, Hkv, bq, ck, interpret
    )
    return o, (qs, kh, vh, mb, o, l, m)


def _ring_core_bwd(axis_name, Hq, Hkv, bq, ck, interpret, res, do):
    from ..ops.causal_attention import _dq_call, _dkv_call

    qs, kh, vh, mb, o, l, m = res
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    d = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )[:, None, :]  # [BHq, 1, Tl]

    dq_call = functools.partial(
        _dq_call, Hq=Hq, Hkv=Hkv, bq=bq, ck=ck, interpret=interpret
    )
    dkv_call = functools.partial(
        _dkv_call, Hq=Hq, Hkv=Hkv, bq=bq, ck=ck, interpret=interpret
    )

    # hop 0: local block, causal masks
    dq = _f32(dq_call(qs, kh, vh, mb, m, do, l, d, tri="always"))
    dk0, dv0 = dkv_call(qs, kh, vh, mb, m, do, l, d, tri="always")

    def hop(carry, h):
        k_cur, v_cur, mb_cur, dk_acc, dv_acc, dq_acc = carry
        p = _perm(n)
        # the block AND its gradient accumulator rotate together, so each
        # block's (dk, dv) arrives back home after the full cycle
        k_cur = lax.ppermute(k_cur, axis_name, p)
        v_cur = lax.ppermute(v_cur, axis_name, p)
        mb_cur = lax.ppermute(mb_cur, axis_name, p)
        dk_acc = lax.ppermute(dk_acc, axis_name, p)
        dv_acc = lax.ppermute(dv_acc, axis_name, p)

        def live(_):
            dq_h = _f32(dq_call(qs, k_cur, v_cur, mb_cur, m, do, l, d,
                                tri="never"))
            dk_h, dv_h = dkv_call(qs, k_cur, v_cur, mb_cur, m, do, l, d,
                                  tri="never")
            return dq_h, _f32(dk_h), _f32(dv_h)

        def dead(_):
            return (
                jnp.zeros(qs.shape, jnp.float32),
                jnp.zeros(k_cur.shape, jnp.float32),
                jnp.zeros(v_cur.shape, jnp.float32),
            )

        dq_h, dk_h, dv_h = lax.cond(h <= idx, live, dead, 0)
        return (
            k_cur, v_cur, mb_cur, dk_acc + dk_h, dv_acc + dv_h,
            dq_acc + dq_h,
        ), None

    (k_cur, v_cur, mb_cur, dk_acc, dv_acc, dq), _ = lax.scan(
        hop, (kh, vh, mb, _f32(dk0), _f32(dv0), dq), jnp.arange(1, n)
    )
    # blocks have rotated n-1 times; one more rotation brings each (dk,
    # dv) accumulator home to its block's owner
    p = _perm(n)
    dk_acc = lax.ppermute(dk_acc, axis_name, p)
    dv_acc = lax.ppermute(dv_acc, axis_name, p)
    return (
        dq.astype(qs.dtype), dk_acc.astype(kh.dtype),
        dv_acc.astype(vh.dtype), jnp.zeros_like(mb),
    )


def _f32(x):
    return x.astype(jnp.float32)


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def ring_causal_mha_kernel(
    q: jnp.ndarray,  # [B, Tl, Hq, hd] LOCAL slice
    k: jnp.ndarray,  # [B, Tl, Hkv, hd]
    v: jnp.ndarray,
    *,
    axis_name: str,
    mask: jnp.ndarray | None = None,  # [B, Tl] LOCAL key-padding mask
    scale: float | None = None,
    block_q: int = 0,
    chunk_k: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Kernel-tier twin of ring_attention.ring_causal_mha (same contract:
    call INSIDE shard_map where q/k/v are local sequence slices)."""
    from ..ops.causal_attention import _pick

    B, Tl, Hq, hd = q.shape
    Hkv = k.shape[2]
    if Hq % Hkv:
        raise ValueError("Hq must be a multiple of Hkv")
    if scale is None:
        scale = hd ** -0.5

    T_real = Tl
    pad = (-Tl) % 128
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        base = (
            mask.astype(jnp.int32) if mask is not None
            else jnp.ones((B, Tl), jnp.int32)
        )
        mask = jnp.pad(base, ((0, 0), (0, pad)))
        Tl = Tl + pad

    bq = block_q or _pick(Tl, (512, 256, 128))
    ck = chunk_k or _pick(Tl, (512, 256, 128))

    qs = jnp.swapaxes(q * jnp.asarray(scale, q.dtype), 1, 2).reshape(
        B * Hq, Tl, hd
    )
    kh = jnp.swapaxes(k, 1, 2).reshape(B * Hkv, Tl, hd)
    vh = jnp.swapaxes(v, 1, 2).reshape(B * Hkv, Tl, hd)
    if mask is None:
        mb = jnp.zeros((B, 1, Tl), jnp.float32)
    else:
        mb = jnp.where(
            mask.astype(bool), 0.0, NEG
        ).astype(jnp.float32)[:, None, :]

    o = _ring_core(qs, kh, vh, mb, axis_name, Hq, Hkv, bq, ck, interpret)
    out = jnp.swapaxes(o.reshape(B, Hq, Tl, hd), 1, 2)
    return out[:, :T_real] if T_real != Tl else out


def ring_kernel_sharded(mesh, axis_name: str = "sp",
                        interpret: bool = False):
    """Standalone shard_map wrapper (tests / benches): global q/k/v
    [B, T, H, hd] + mask [B, T] -> [B, T, H, hd], T sharded over
    `axis_name`, batch over 'dp' when present (the kernel twin of
    ring_attention.ring_attention_sharded)."""
    from jax.sharding import PartitionSpec as P

    ba = "dp" if "dp" in mesh.axis_names else None
    qspec = P(ba, axis_name, None, None)

    def local(q, k, v, mask):
        return ring_causal_mha_kernel(
            q, k, v, axis_name=axis_name, mask=mask, interpret=interpret
        )

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(qspec, qspec, qspec, P(ba, axis_name)),
        out_specs=qspec, check_vma=False,
    )
