"""Probe: nibble unpack in the bf16 domain (half the VPU register traffic
of the int32-shift path). int8 bytes are exactly representable in bf16
(|x| <= 128 < 2^8 mantissa), x/16 is exact (power of two), and
floor(x/16) == arithmetic-shift-right-4; the low nibble follows by exact
nmsub and a signed-fix select. Checks Mosaic legality + bit-exactness +
isolated speed vs the int32 path at slab shape.

    python -u experiments/nibble_bf16_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from experiments.enc_kernel_bench import timed_loop, report  # noqa: E402


def unpack_i32(x, cdt):
    b32 = x.astype(jnp.int32)
    k = jnp.right_shift(jnp.left_shift(b32, 28), 28).astype(cdt)
    v = jnp.right_shift(jnp.left_shift(b32, 24), 28).astype(cdt)
    return k, v


def unpack_bf16(x, cdt):
    xf = x.astype(jnp.float32).astype(cdt)  # exact: |x| <= 128
    v = jnp.floor(xf * cdt.type(1 / 16))    # == x >> 4 (arithmetic)
    lo = xf - cdt.type(16) * v               # low nibble in [0, 15]
    k = jnp.where(lo >= cdt.type(8), lo - cdt.type(16), lo)
    return k, v


def mk(body):
    def kernel(x_ref, q_ref, o_ref):
        k, v = body(x_ref[...], jnp.dtype(jnp.bfloat16))
        q = q_ref[...]
        lg = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = jax.lax.dot_general(
            jnp.exp(lg - jnp.max(lg)).astype(jnp.bfloat16), v,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    def run(x, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((q.shape[0], x.shape[1]),
                                           jnp.bfloat16),
        )(x, q)

    return run


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    rng = np.random.RandomState(0)
    xs = rng.randint(-128, 128, size=(2048, 128)).astype(np.int8)
    x = jnp.asarray(xs)
    q0 = jnp.asarray(rng.randn(8, 128), jnp.bfloat16)
    outs = {}
    for name, body in (("i32", unpack_i32), ("bf16", unpack_bf16)):
        try:
            f = mk(body)
            o = jax.jit(f)(x, q0)
            outs[name] = np.asarray(o, np.float32)
            print(json.dumps({"cand": name, "compiled": True}), flush=True)

            def fstep(a, f=f, x=x):
                q, = a
                o = f(x, q)
                bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(q.dtype)
                return bump.astype(jnp.float32), (q + bump,)

            sec = timed_loop(fstep, (q0,), 100)
            report(f"unpack_{name}", sec, elems=xs.size)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"cand": name,
                              "err": str(e).split(chr(10))[0][:200]}),
                  flush=True)
    if len(outs) == 2:
        d = float(np.abs(outs["i32"] - outs["bf16"]).max())
        print(json.dumps({"max_delta": d, "exact": d == 0.0}), flush=True)
