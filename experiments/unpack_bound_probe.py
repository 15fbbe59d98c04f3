"""Upper bound on int4-unpack optimization: time the production mono4
kernel vs a NUMERICS-WRONG twin whose nibble unpack (int8->int32 widen +
4 shifts + 2 converts) is replaced by ONE direct int8->bf16 convert —
same DMAs, same matmul shapes, same softmax. The delta bounds what ANY
smarter unpack (e.g. the bitcast-i32 byte-group cache layout in NEXT.md)
could buy, before committing to a cache-layout migration touching every
int4-KV consumer.

    nohup python -u experiments/unpack_bound_probe.py > /tmp/unpack_bound.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from experiments.enc_kernel_bench import timed_loop, report  # noqa: E402
from audio_llama_tpu.ops import decode_attention_mono as mono  # noqa: E402
from audio_llama_tpu.models.llama import quantize_kv_rows4  # noqa: E402


def _kernel_nounpack(
    li_ref, off_ref, q_ref, kvnew_ref, ks_new_ref, vs_new_ref,
    ks_ref, vs_ref, valid_ref, ckv_any, out_ref, ckv_out,
    kv_db, wb_buf, sems, wsems, *,
    scale, n_heads, n_rows, depth, hpd, per_row,
):
    """_kernel_mono4 with the unpack stubbed (WRONG numerics)."""
    b = pl.program_id(0)
    li = li_ref[0]
    off = off_ref[b] if per_row else off_ref[0]
    groups = n_heads // hpd
    n = n_rows * groups

    def slab_dma(idx, s):
        bb = idx // groups
        gg = jax.lax.rem(idx, groups)
        return pltpu.make_async_copy(
            ckv_any.at[li, bb, pl.ds(gg * hpd, hpd)], kv_db.at[s], sems.at[s]
        )

    for j in range(depth - 1):
        @pl.when((b == 0) & (j < n))
        def _(j=j):
            slab_dma(j, j % depth).start()

    max_len = kv_db.shape[-2]
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

    for g in range(groups):
        i = b * groups + g

        @pl.when(i + depth - 1 < n)
        def _(g=g):
            idx = b * groups + g + depth - 1
            slab_dma(idx, jax.lax.rem(idx, depth)).start()

        slot = jax.lax.rem(i, depth)
        if groups % depth == 0:
            slot = g % depth
        slab_dma(i, slot).wait()

        for h2 in range(hpd):
            h = g * hpd + h2
            win = kv_db[slot, h2, pl.ds(off_al, 32), :]
            wb_buf[...] = jnp.where(is_new_w, kvnew_ref[0, h][None, :], win)
            wb = pltpu.make_async_copy(
                wb_buf, ckv_out.at[li, b, h, pl.ds(off_al, 32), :],
                wsems.at[0],
            )
            wb.start()

            # >>> NERF: one direct convert instead of the nibble unpack
            k_q = kv_db[slot, h2].astype(cdt)
            v_q = k_q
            q = q_ref[0, h]
            logits = jax.lax.dot_general(
                q, k_q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits * (ks_ref[0, h][None, :] * scale)
            logits = jnp.where(dead, -1e30, logits)
            kvn = kvnew_ref[0, h][None, :]
            k_n = kvn.astype(cdt)  # NERF
            v_n = k_n
            lf = jnp.sum(
                q.astype(jnp.float32) * k_n.astype(jnp.float32),
                axis=1, keepdims=True,
            )
            lf = lf * (ks_new_ref[0, h] * scale)
            lf = jnp.where(fresh_on, lf, -1e30)
            m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), lf)
            p = jnp.exp(logits - m)
            pf = jnp.exp(lf - m)
            denom = jnp.sum(p, axis=-1, keepdims=True) + pf
            acc = jax.lax.dot_general(
                (p * vs_ref[0, h][None, :]).astype(cdt), v_q,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + (pf * vs_new_ref[0, h]) * v_n.astype(jnp.float32)
            out_ref[0, h] = (acc / denom).astype(out_ref.dtype)
            wb.wait()


def run(B, nerf):
    Hq, Hkv, hd, max_len = 24, 8, 128, 2048
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, Hq, hd), jnp.bfloat16)
    offset = jnp.asarray(2014, jnp.int32)
    valid = jnp.asarray(
        (np.arange(max_len)[None, :] <= 2014).astype(np.int32).repeat(B, 0)
    )
    sc = hd ** -0.5
    kv_new, ksn, vsn = quantize_kv_rows4(
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
        jnp.asarray(rng.randn(B, Hkv, hd), jnp.float32),
    )
    ckv, ks, vs = quantize_kv_rows4(
        jnp.asarray(rng.randn(1, B, Hkv, max_len, hd), jnp.float32) * 0.5,
        jnp.asarray(rng.randn(1, B, Hkv, max_len, hd), jnp.float32) * 0.5,
    )
    ks, vs = ks[0], vs[0]

    orig = mono._kernel_mono4
    if nerf:
        mono._kernel_mono4 = _kernel_nounpack
    try:
        def fstep(a, ckv=ckv):
            q, = a
            o, _ = mono.decode_attention_quantized4_mono(
                q, kv_new, ckv, ks, vs, ksn, vsn,
                jnp.asarray(0, jnp.int32), offset, valid, sc,
            )
            bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(q.dtype)
            return bump.astype(jnp.float32), (q + bump,)

        sec = timed_loop(fstep, (q,), 50)
    finally:
        mono._kernel_mono4 = orig
    report(f"mono4_B{B}_{'nounpack' if nerf else 'prod'}", sec)
    return sec


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    s_prod = run(B, nerf=False)
    s_nerf = run(B, nerf=True)
    print(json.dumps({
        "B": B,
        "unpack_cost_pct_of_kernel": round((s_prod / s_nerf - 1) * 100, 1),
    }), flush=True)
