"""Which nibble-unpack forms legalize in Mosaic on int8 vectors?

The VPU-lean mono kernel wanted int8-domain shifts; arith.shli on i8
vectors fails to legalize. Probe the candidates cheapest-first; each
failure is fast (AOT compile error), successes print parity vs numpy.

    python -u experiments/nibble_legal_probe.py
"""

import json
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")


def mk(body):
    def kernel(x_ref, k_ref, v_ref):
        k, v = body(x_ref[...])
        k_ref[...] = k.astype(jnp.bfloat16)
        v_ref[...] = v.astype(jnp.bfloat16)

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
                jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
            ],
        )(x)

    return jax.jit(run)


def unpack_i32(x):
    b32 = x.astype(jnp.int32)
    return (
        jnp.right_shift(jnp.left_shift(b32, 28), 28),
        jnp.right_shift(jnp.left_shift(b32, 24), 28),
    )


def unpack_i8_shr(x):
    # K low nibble via and/xor/sub (no shifts); V high nibble via shrsi i8
    k = ((x & 15) ^ 8) - 8
    return k, jnp.right_shift(x, 4)


def unpack_i8_noshift(x):
    # no shifts at all: V = (x - low_nibble) / 16 exact in int domain is a
    # shift... instead sign-extended high nibble via i16 widen + shrsi
    k = ((x & 15) ^ 8) - 8
    v = jnp.right_shift(x.astype(jnp.int16), 4)
    return k, v


def unpack_i16(x):
    b16 = x.astype(jnp.int16)
    return (
        jnp.right_shift(jnp.left_shift(b16, 12), 12),
        jnp.right_shift(jnp.left_shift(b16, 8), 12),
    )


CANDS = [
    ("i8_and_shr", unpack_i8_shr),
    ("i8_and_i16shr", unpack_i8_noshift),
    ("i16_shifts", unpack_i16),
    ("i32_shifts", unpack_i32),
]

if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    rng = np.random.RandomState(0)
    xs = rng.randint(-128, 128, size=(256, 128)).astype(np.int8)
    x = jnp.asarray(xs)
    b32 = xs.astype(np.int32)
    want_k = ((b32 << 28) >> 28).astype(np.float32)
    want_v = ((b32 << 24) >> 28).astype(np.float32)
    for name, fn in CANDS:
        try:
            k, v = mk(fn)(x)
            dk = float(np.abs(np.asarray(k, np.float32) - want_k).max())
            dv = float(np.abs(np.asarray(v, np.float32) - want_v).max())
            print(json.dumps({"cand": name, "ok": dk == 0 and dv == 0,
                              "dk": dk, "dv": dv}), flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(json.dumps({"cand": name, "ok": False, "err": msg}),
                  flush=True)
