"""Ring causal attention over an `sp` mesh axis (docs/LONG_CONTEXT.md
step 2: decoder-training sequence parallelism).

Each shard holds the queries for its T/sp sequence slice plus its local
K/V block. K/V blocks rotate around the ring with `lax.ppermute`; every hop
contributes a partial attention (m, l, o) that merges online across hops,
so no shard ever materializes more than its [B, T/sp, H, hd] slice of
activations — the standard blockwise/ring pattern (the Pallas guide's
bidirectional-ring recipe is the perf follow-up; this is the canonical
single-direction ring).

Causality across shards is coarse: a hop whose K/V originated from shard
s contributes fully when s < my shard index, triangularly when s == mine,
and not at all when s > mine (those hops still rotate — skipping them is
the ~2x "striped"/bidirectional optimization, deliberately not done yet).

Differentiability: everything here is jnp math + ppermute (whose transpose
is the reverse permute) around `ops.attention.mha`, so reverse-mode AD
through the shard_map works out of the box — dK/dV partials ring back
automatically. That makes this op usable in the LoRA training path today;
a Pallas-kernel-per-hop variant (the causal kernel's custom VJP composes
through the hop scan) is the measured-perf follow-up.

Usage: call INSIDE shard_map/kernel-partition regions where q/k/v are the
LOCAL sequence slices and `axis_name` names the sp mesh axis. The wrapper
`ring_attention_sharded` builds the shard_map for standalone use/tests.

Reference analog: none — the reference is single-GPU with a 2k-token cap
(SURVEY.md §5 'Long-context'). This is TPU-native scale machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

NEG = -1e30


def ring_causal_mha(
    q: jnp.ndarray,  # [B, Tl, H, hd] LOCAL query slice (pre-scale applied here)
    k: jnp.ndarray,  # [B, Tl, Hkv, hd] LOCAL keys
    v: jnp.ndarray,  # [B, Tl, Hkv, hd]
    *,
    axis_name: str,
    mask: jnp.ndarray | None = None,  # [B, Tl] LOCAL key-padding mask
    scale: float | None = None,
) -> jnp.ndarray:
    """Causal GQA attention whose key/value timeline is sharded over
    `axis_name`; returns the local [B, Tl, H, hd] output slice.

    Globally equivalent to causal attention over the concatenated sequence
    (shard order = sequence order), up to softmax reduction order.
    """
    B, Tl, H, hd = q.shape
    Hkv = k.shape[2]
    if H % Hkv:
        raise ValueError("H must be a multiple of Hkv")
    if scale is None:
        scale = hd ** -0.5
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    qf = (q.astype(jnp.float32) * scale)
    g = H // Hkv

    def partial_attn(k_blk, v_blk, m_blk, src):
        """Scores of local q against one K/V block from shard `src`;
        returns (m [B,H,Tl], l [B,H,Tl], o [B,H,Tl,hd]) partials."""
        kf = k_blk.astype(jnp.float32)
        # GQA: expand kv heads by repeat on the fly (XLA tier; the kernel
        # tier uses index maps instead)
        kfh = jnp.repeat(kf, g, axis=2)  # [B, Tk, H, hd]
        vfh = jnp.repeat(v_blk.astype(jnp.float32), g, axis=2)
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kfh)  # [B, H, Tl, Tk]
        # causal structure across shards: src < idx full, == triangular,
        # > none. (Tl is equal on every shard.)
        rows = jnp.arange(Tl)[:, None]
        cols = jnp.arange(Tl)[None, :]
        tri = jnp.where(cols <= rows, 0.0, NEG)  # [Tl, Tl]
        blk_bias = jnp.where(
            src < idx, 0.0, jnp.where(src == idx, tri, NEG)
        )  # [] or [Tl, Tl]
        blk_bias = jnp.broadcast_to(blk_bias, (Tl, Tl))
        s = s + blk_bias[None, None]
        if m_blk is not None:
            s = s + jnp.where(m_blk.astype(bool), 0.0, NEG)[:, None, None, :]
        m = jnp.max(s, axis=-1)  # [B, H, Tl]
        p = jnp.exp(s - m[..., None])
        l = jnp.sum(p, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bhqd", p, vfh)
        return m, l, o

    def hop(carry, h):
        k_cur, v_cur, m_cur, m_acc, l_acc, o_acc = carry
        src = jax.lax.rem(idx - h + n, n)  # origin shard of k_cur
        pm, pl_, po = partial_attn(k_cur, v_cur, m_cur, src)
        # online merge of (m, l, o) partials
        m_new = jnp.maximum(m_acc, pm)
        r_old = jnp.exp(m_acc - m_new)
        r_new = jnp.exp(pm - m_new)
        l_out = l_acc * r_old + pl_ * r_new
        o_out = o_acc * r_old[..., None] + po * r_new[..., None]
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        m_nxt = (
            lax.ppermute(m_cur, axis_name, perm) if m_cur is not None else None
        )
        return (k_nxt, v_nxt, m_nxt, m_new, l_out, o_out), None

    m0 = jnp.full((B, H, Tl), NEG, jnp.float32)
    l0 = jnp.zeros((B, H, Tl), jnp.float32)
    o0 = jnp.zeros((B, H, Tl, hd), jnp.float32)
    (_, _, _, m_f, l_f, o_f), _ = lax.scan(
        hop, (k, v, mask, m0, l0, o0), jnp.arange(n)
    )
    safe = jnp.where(l_f > 0, l_f, 1.0)
    out = jnp.where(l_f[..., None] > 0, o_f / safe[..., None], 0.0)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)  # [B, Tl, H, hd]


def ring_attention_sharded(mesh, axis_name: str = "sp"):
    """Standalone shard_map wrapper (tests / direct use): global
    q/k/v [B, T, H, hd] + mask [B, T] -> [B, T, H, hd], T sharded over
    `axis_name` (must divide T), batch over 'dp' when present."""
    ba = "dp" if "dp" in mesh.axis_names else None
    qspec = P(ba, axis_name, None, None)

    def local(q, k, v, mask):
        return ring_causal_mha(q, k, v, axis_name=axis_name, mask=mask)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(qspec, qspec, qspec, P(ba, axis_name)),
        out_specs=qspec,
        check_vma=False,
    )
