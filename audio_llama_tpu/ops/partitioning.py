"""Trace-time kernel-partitioning context: Pallas kernels inside GSPMD jits.

GSPMD cannot partition a `pallas_call` — without help, a multi-chip train
step either fails to lower or replicates full-shape kernels per device
(round-2 VERDICT, missing #1). Generation solved this with hand-written
shard_map wrappers around the WHOLE program (inference/generate.py
make_dp_generate/make_tp_generate); training can't do that wholesale — its
step is an autodiff'd, GSPMD-sharded program whose collectives (gradient
psums over dp, tp all-reduces, fsdp all-gathers) the compiler derives from
sharding annotations.

So instead each kernel call wraps ITSELF in a nested `shard_map` whose specs
shard only the batch dim (over dp x fsdp) and the head dim (over tp):
attention, LayerNorm and log-mel are batch- and head-parallel with zero
cross-shard terms, so the nested region needs no collectives, every shard
runs the kernel on its local block, and reverse-mode AD through the
shard_map (including the kernels' custom VJPs) shards the same way. The
result is numerically identical to the unpartitioned kernel.

Usage (parallel/sharded_train.py): trace the step body under

    with kernel_partitioning(mesh):
        ... make_train_step(...)(state, frozen, batch) ...

Each kernel entry point (ops.causal_attention.causal_mha,
ops.flash_attention.flash_mha, ops.enc_attention.enc_attention,
ops.ln_pallas.layer_norm_pallas, ops.mel_pallas.log_mel) consults
`current()` at trace time; when a context is active it dispatches through
the wrap_* helpers below. Dims that don't divide the relevant mesh axes are
left replicated (shard_map then runs the kernel redundantly per shard on
gathered operands — correct, just not partitioned).

Reference analog: none — the reference is single-GPU torch (SURVEY.md §2
'Parallelism strategies'). This is TPU-native machinery.
"""

from __future__ import annotations

import contextlib
import functools
import math
import threading
from typing import Any, NamedTuple, Optional, Sequence

from jax.sharding import PartitionSpec as P


class KernelPartitionContext(NamedTuple):
    mesh: Any  # jax.sharding.Mesh
    batch_axes: tuple  # mesh axes sharding batch dims, e.g. ('dp', 'fsdp')
    head_axis: Optional[str]  # mesh axis sharding head dims ('tp') or None
    seq_axis: Optional[str]  # mesh axis sharding the decoder TIME dim ('sp')


_TLS = threading.local()


def current() -> Optional[KernelPartitionContext]:
    return getattr(_TLS, "ctx", None)


@contextlib.contextmanager
def kernel_partitioning(
    mesh, batch_axes: Sequence[str] = ("dp", "fsdp"), head_axis: str = "tp",
    seq_axis: str = "sp",
):
    """Activate kernel self-partitioning for everything traced inside.

    Only mesh axes that actually exist are used; missing axes degrade
    gracefully (a pure-dp mesh simply never head-shards). A present,
    >1-sized seq_axis makes llama CAUSAL attention run as a ppermute ring
    over sequence shards (parallel/ring_attention.py) instead of
    batch/head-sharded local kernels.
    """
    ba = tuple(a for a in batch_axes if a in mesh.axis_names)
    ha = head_axis if head_axis in mesh.axis_names else None
    sa = (
        seq_axis
        if seq_axis in mesh.axis_names and mesh.shape[seq_axis] > 1
        else None
    )
    prev = current()
    _TLS.ctx = KernelPartitionContext(mesh, ba, ha, sa)
    try:
        yield
    finally:
        _TLS.ctx = prev


def _batch_entry(ctx: KernelPartitionContext, n: int):
    """The PartitionSpec entry for a batch dim of global size n (None if the
    mesh batch axes don't divide it)."""
    if not ctx.batch_axes:
        return None
    total = math.prod(ctx.mesh.shape[a] for a in ctx.batch_axes)
    if total <= 1 or n % total:
        return None
    return ctx.batch_axes


def _head_entry(ctx: KernelPartitionContext, *head_counts: int):
    """The spec entry for head dims — only if 'tp' divides EVERY head count
    involved (q and kv heads must split consistently for GQA index maps)."""
    if ctx.head_axis is None:
        return None
    tp = ctx.mesh.shape[ctx.head_axis]
    if tp <= 1 or any(h % tp for h in head_counts):
        return None
    return ctx.head_axis


def _smap(fn, ctx, in_specs, out_specs):
    import jax

    return jax.shard_map(
        fn, mesh=ctx.mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )


def wrap_attention(local_fn, q, k, v, mask=None):
    """shard_map an attention kernel: q [B, T, Hq, hd], k/v [B, T, Hkv, hd],
    optional mask [B, T]. local_fn(q, k, v, mask) computes per-shard."""
    ctx = current()
    assert ctx is not None
    ba = _batch_entry(ctx, q.shape[0])
    ha = _head_entry(ctx, q.shape[2], k.shape[2])
    qkv = P(ba, None, ha, None)
    if mask is None:
        fn = _smap(
            lambda q, k, v: local_fn(q, k, v, None),
            ctx, in_specs=(qkv, qkv, qkv), out_specs=qkv,
        )
        return fn(q, k, v)
    fn = _smap(
        local_fn, ctx, in_specs=(qkv, qkv, qkv, P(ba, None)), out_specs=qkv
    )
    return fn(q, k, v, mask)


def wrap_rows(local_fn, x, *params):
    """shard_map a row-parallel kernel (LayerNorm): x [B, ...] sharded on
    batch, params replicated. local_fn(x, *params) -> same-shape-as-x."""
    ctx = current()
    assert ctx is not None
    ba = _batch_entry(ctx, x.shape[0])
    xs = P(ba, *([None] * (x.ndim - 1)))
    ps = tuple(P(*([None] * p.ndim)) for p in params)
    fn = _smap(local_fn, ctx, in_specs=(xs,) + ps, out_specs=xs)
    return fn(x, *params)


def wrap_batch(local_fn, x, out_ndim: int):
    """shard_map a batch-parallel kernel (log-mel): x [B, ...] -> out with
    the batch leading and out_ndim dims total."""
    ctx = current()
    assert ctx is not None
    ba = _batch_entry(ctx, x.shape[0])
    xs = P(ba, *([None] * (x.ndim - 1)))
    os = P(ba, *([None] * (out_ndim - 1)))
    fn = _smap(local_fn, ctx, in_specs=(xs,), out_specs=os)
    return fn(x)


def seq_ring_applicable(q_shape) -> bool:
    """True when the active context wants sequence-parallel CAUSAL attention
    and the (padded) sequence length splits evenly over the sp axis."""
    ctx = current()
    if ctx is None or ctx.seq_axis is None:
        return False
    sp = ctx.mesh.shape[ctx.seq_axis]
    return sp > 1 and q_shape[1] % sp == 0


def wrap_ring_causal(q, k, v, mask, scale, interpret: bool = False,
                     use_kernel: bool | None = None):
    """Sequence-parallel causal attention: T sharded over seq_axis, each
    shard holding its slice of q/k/v, K/V rotating around the ring.
    Heads are NOT additionally sharded here (ring + head sharding composes
    but is left to a later tier).

    Two tiers: the flash-kernel ring (parallel/ring_kernel.py — per-hop
    Pallas kernels, causally-empty hops skipped entirely) when kernels are
    available or interpret mode is requested, else the XLA correctness
    ring (parallel/ring_attention.py)."""
    ctx = current()
    assert ctx is not None and ctx.seq_axis is not None
    # function-scope import: parallel imports models imports ops — the
    # cycle is resolved by call time
    from ..parallel.ring_attention import ring_causal_mha
    from ..parallel.ring_kernel import ring_causal_mha_kernel

    if use_kernel is None:
        from . import causal_attention as _ca  # self-import safe at call time

        use_kernel = interpret or _ca.available()
    if use_kernel:
        ring = functools.partial(ring_causal_mha_kernel, interpret=interpret)
    else:
        ring = ring_causal_mha

    ba = _batch_entry(ctx, q.shape[0])
    qspec = P(ba, ctx.seq_axis, None, None)

    if mask is None:
        fn = _smap(
            lambda q, k, v: ring(
                q, k, v, axis_name=ctx.seq_axis, mask=None, scale=scale
            ),
            ctx, in_specs=(qspec, qspec, qspec), out_specs=qspec,
        )
        return fn(q, k, v)
    fn = _smap(
        lambda q, k, v, m: ring(
            q, k, v, axis_name=ctx.seq_axis, mask=m, scale=scale
        ),
        ctx,
        in_specs=(qspec, qspec, qspec, P(ba, ctx.seq_axis)),
        out_specs=qspec,
    )
    return fn(q, k, v, mask)
