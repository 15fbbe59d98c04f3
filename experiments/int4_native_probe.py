"""Probe: does this Mosaic/libtpu support NATIVE s4 (jnp.int4) vector loads
+ converts inside a Pallas kernel? If yes, the int4 dequant matmul can drop
the manual nibble unpack (~3 VPU ops/weight — measured to cost more than
the halved HBM stream saves: int4 decode B1 170.8 tok/s vs int8's 199.8,
r3b4r.log) for a hardware convert.

Also times the manual-unpack kernel against the XLA int8-upcast matmul at
decode geometry to quantify the unpack overhead directly.

    nohup python -u experiments/int4_native_probe.py > /tmp/int4probe.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from experiments.enc_kernel_bench import timed_loop, report


def probe_s4():
    """Minimal kernel: load an int4 tile, convert to bf16, matmul."""
    try:
        def kernel(x_ref, w_ref, o_ref):
            w = w_ref[:].astype(jnp.bfloat16)
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        x = jnp.ones((8, 256), jnp.bfloat16)
        w4 = jnp.ones((256, 256), jnp.int4)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 256), jnp.bfloat16),
        )(x, w4)
        s = float(jnp.sum(out.astype(jnp.float32)))
        print(json.dumps({"exp": "s4_native_pallas", "ok": True, "sum": s}),
              flush=True)
        return True
    except Exception as e:
        print(json.dumps({"exp": "s4_native_pallas", "ok": False,
                          "error": str(e)[:400]}), flush=True)
        return False


def probe_s4_xla():
    """Does plain XLA (no Pallas) do int4->bf16 convert + matmul on TPU?"""
    try:
        @jax.jit
        def f(x, w4):
            return x @ w4.astype(jnp.bfloat16)

        x = jnp.ones((8, 256), jnp.bfloat16)
        w4 = jnp.ones((256, 256), jnp.int4)
        s = float(jnp.sum(f(x, w4).astype(jnp.float32)))
        print(json.dumps({"exp": "s4_xla_matmul", "ok": True, "sum": s}),
              flush=True)
        return True
    except Exception as e:
        print(json.dumps({"exp": "s4_xla_matmul", "ok": False,
                          "error": str(e)[:400]}), flush=True)
        return False


def time_unpack_overhead():
    """Manual-unpack int4 kernel vs int8-upcast XLA matmul at a decode-like
    single-linear geometry (M=8, K=3072, N=8192 — the gate/up slab)."""
    from audio_llama_tpu.ops.int4_matmul import int4_matmul, quantize_pack

    K, N = 3072, 8192
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    packed, scales = quantize_pack(w)
    w8 = jnp.clip(jnp.round(w / 0.001), -127, 127).astype(jnp.int8)
    s8 = jnp.full((N,), 0.001, jnp.float32)
    x = jax.random.normal(key, (8, K), jnp.bfloat16)
    flops = 2 * 8 * K * N

    def i4_step(a):
        x, = a
        y = int4_matmul(x, packed, scales)
        bump = (jnp.mean(y.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
        return bump.astype(jnp.float32), (x + bump,)

    sec = timed_loop(i4_step, (x,), 50)
    report("int4_kernel_m8", sec, flops=flops,
           note=f"bytes={K*N//2 + K//128*N*4}")

    def i8_step(a):
        x, = a
        y = (x @ w8.astype(jnp.bfloat16)) * s8.astype(jnp.bfloat16)
        bump = (jnp.mean(y.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
        return bump.astype(jnp.float32), (x + bump,)

    sec = timed_loop(i8_step, (x,), 50)
    report("int8_xla_m8", sec, flops=flops, note=f"bytes={K*N}")


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    probe_s4_xla()
    probe_s4()
    time_unpack_overhead()
    print(json.dumps({"done": True}), flush=True)
