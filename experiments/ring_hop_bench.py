"""Ring-attention per-hop benchmark on ONE chip (VERDICT r3 #7).

The ring itself needs real ICI; its HOP BODIES are single-device programs
and fully measurable here. Arms, at sp-shard geometry (llama Hq24/Hkv8/
hd128, Tl = T/sp):

  kernel_full_fwd   : the flash fwd kernel in tri='never' mode (an
                      earlier-shard hop) — o, l, m stats out;
  kernel_full_bwd   : its backward (_dq_call + _dkv_call, tri='never');
  xla_full_fwd/bwd  : the XLA ring's partial_attn hop (einsum + stats
                      merge math) and its AD, same shapes;
  kernel_causal_*   : hop 0 (the local causal block) — already-benched
                      causal_mha geometry, timed at Tl for reference.

Timing: chained fori_loop with a data dependency + small-n subtraction
(bench.py methodology). TF/s uses 4*B*Hq*Tl^2*hd per fwd attention pass
(2 matmuls; the causal arm halves it for the triangular skip) and
2.5x fwd FLOPs for bwd.

Run: nohup python -u experiments/ring_hop_bench.py > log 2>&1 &
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed_loop(fn, args, iters):
    """fn must return a scalar-reducible pytree; iterations chained by a
    data dependency through the first arg."""
    @jax.jit
    def loop(a0, rest, n):
        def body(_, carry):
            a0, acc = carry
            out = fn(a0, *rest)
            bump = out * 1e-9
            return (a0 + bump.astype(a0.dtype), acc + bump)

        a0, acc = jax.lax.fori_loop(0, n, body, (a0, jnp.float32(0)))
        return acc

    a0, rest = args[0], args[1:]
    float(loop(a0, rest, 2))  # compile
    n_small = max(2, iters // 10)
    t0 = time.perf_counter()
    float(loop(a0, rest, n_small))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(a0, rest, iters))
    d2 = time.perf_counter() - t0
    return (d2 - d1) / (iters - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--B", type=int, default=2)
    ap.add_argument("--T", type=int, default=2560)
    ap.add_argument("--sp", type=int, nargs="*", default=[2, 4])
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

    from audio_llama_tpu.ops.causal_attention import (
        _dkv_call, _dq_call, _fwd_call,
    )

    B, Hq, Hkv, hd = args.B, 24, 8, 128
    interp = jax.default_backend() == "cpu"

    for sp in args.sp:
        Tl = args.T // sp
        Tl = ((Tl + 127) // 128) * 128
        bq = ck = 512 if Tl % 512 == 0 else (256 if Tl % 256 == 0 else 128)
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        sh_q = (B * Hq, Tl, hd)
        sh_kv = (B * Hkv, Tl, hd)
        qs = jax.random.normal(ks[0], sh_q, jnp.bfloat16) * 0.1
        kh = jax.random.normal(ks[1], sh_kv, jnp.bfloat16) * 0.1
        vh = jax.random.normal(ks[2], sh_kv, jnp.bfloat16) * 0.1
        mb = jnp.zeros((B, 1, Tl), jnp.float32)
        kn = jnp.zeros((B * Hkv, 1, 1), jnp.float32)
        do = jax.random.normal(ks[3], sh_q, jnp.bfloat16) * 0.1
        lrow = jnp.abs(jax.random.normal(ks[4], (B * Hq, 1, Tl))) + 1.0
        crow = jnp.abs(jax.random.normal(ks[5], (B * Hq, 1, Tl))) + 3.0
        drow = jax.random.normal(ks[6], (B * Hq, 1, Tl)) * 0.1
        o_sav = jax.random.normal(ks[7], sh_q, jnp.bfloat16) * 0.1

        fwd_flops = 4.0 * B * Hq * Tl * Tl * hd

        def k_fwd(qs, kh, vh):
            o, l, c = _fwd_call(qs, kh, vh, mb, kn, Hq, Hkv, bq=bq, ck=ck,
                                interpret=interp, tri="never")
            # keep BOTH outputs live (a *0 here lets XLA DCE the PV matmul
            # in the einsum arm — round-4 first run measured exactly that)
            return jnp.sum(o.astype(jnp.float32)) * 1e-9 + jnp.sum(l) * 1e-9

        def k_bwd(qs, kh, vh):
            dq = _dq_call(qs, kh, vh, mb, crow, do, lrow, drow, Hq, Hkv,
                          bq=bq, ck=ck, interpret=interp, tri="never")
            dk, dv = _dkv_call(qs, kh, vh, mb, crow, do, lrow, drow, Hq,
                               Hkv, bq=bq, ck=ck, interpret=interp,
                               tri="never")
            return (jnp.sum(dq.astype(jnp.float32)) +
                    jnp.sum(dk.astype(jnp.float32)) +
                    jnp.sum(dv.astype(jnp.float32))) * 1e-9

        def k_causal(qs, kh, vh):
            o, l, c = _fwd_call(qs, kh, vh, mb, kn, Hq, Hkv, bq=bq, ck=ck,
                                interpret=interp, tri="always")
            return jnp.sum(o.astype(jnp.float32)) * 1e-9 + jnp.sum(l) * 1e-9

        # the XLA ring hop (ring_attention.partial_attn shapes)
        q4 = qs.reshape(B, Hq, Tl, hd).transpose(0, 2, 1, 3)
        k4 = kh.reshape(B, Hkv, Tl, hd).transpose(0, 2, 1, 3)
        v4 = vh.reshape(B, Hkv, Tl, hd).transpose(0, 2, 1, 3)

        def xla_hop(q4, k4, v4):
            # bf16 matmuls + f32 stats: the same precision contract as the
            # kernel (bf16 MXU, f32 softmax statistics)
            g = Hq // Hkv
            kfh = jnp.repeat(k4, g, axis=2)
            vfh = jnp.repeat(v4, g, axis=2)
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", q4, kfh,
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(s, axis=-1)
            p = jnp.exp(s - m[..., None])
            l = jnp.sum(p, axis=-1)
            o = jnp.einsum(
                "bhqk,bkhd->bhqd", p.astype(q4.dtype), vfh,
                preferred_element_type=jnp.float32,
            )
            return m, l, o

        def x_fwd(q4, k4, v4):
            m, l, o = xla_hop(q4, k4, v4)
            return jnp.sum(o) * 1e-9 + jnp.sum(l) * 1e-9

        def x_bwd(q4, k4, v4):
            def f(q4, k4, v4):
                m, l, o = xla_hop(q4, k4, v4)
                return jnp.sum(o * 1e-3) + jnp.sum(l * 1e-6)

            g = jax.grad(f, argnums=(0, 1, 2))(q4, k4, v4)
            return sum(jnp.sum(x) for x in g) * 1e-9

        rows = {}
        for name, fn, a, fl in (
            ("kernel_full_fwd", k_fwd, (qs, kh, vh), fwd_flops),
            ("kernel_full_bwd", k_bwd, (qs, kh, vh), 2.5 * fwd_flops),
            ("kernel_causal_fwd", k_causal, (qs, kh, vh), fwd_flops / 2),
            ("xla_full_fwd", x_fwd, (q4, k4, v4), fwd_flops),
            ("xla_full_bwd", x_bwd, (q4, k4, v4), 2.5 * fwd_flops),
        ):
            dt = timed_loop(fn, a, args.iters)
            rows[name] = {"ms": round(dt * 1e3, 3),
                          "tfs": round(fl / dt / 1e12, 1)}
        print(json.dumps({"sp": sp, "Tl": Tl, "B": B, **rows}), flush=True)


if __name__ == "__main__":
    main()
