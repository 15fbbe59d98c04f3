"""Fused LayerNorm Pallas kernel for the encoder hot loop.

XLA's layer_norm at whisper scale ([8, 1536, 1280] bf16) measured 0.22 ms
per call (experiments/enc_breakdown.py: 0.44 ms for the layer's two LNs) —
~1.7x the HBM roundtrip floor, because XLA materializes intermediate
f32 tensors between the stats and normalize stages. This kernel reads each
row block once, computes one-pass moments (E[x], E[x^2]) in f32, and writes
the normalized/affine output — one HBM read + one write total.

Numerics: one-pass variance E[x^2] - E[x]^2 in f32 is safe here (layernorm
inputs are residual-stream activations, |x| small); parity-tested against
ops.norms.layer_norm at bf16-appropriate tolerance.

Used by models/whisper.py on TPU; ops.norms.layer_norm remains the parity
reference and CPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)  # [rows, D]
    d = x.shape[1]
    mu = jnp.sum(x, axis=1, keepdims=True) * (1.0 / d)
    ex2 = jnp.sum(x * x, axis=1, keepdims=True) * (1.0 / d)
    var = ex2 - mu * mu
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def layer_norm_pallas(
    x: jnp.ndarray,  # [..., D]
    scale: jnp.ndarray,  # [D]
    bias: jnp.ndarray,  # [D]
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused LN; self-wraps in shard_map (batch-sharded rows) under an
    active ops.partitioning context so it lowers inside GSPMD programs."""
    from . import partitioning as ptn

    ctx = ptn.current()
    if ctx is not None and x.ndim >= 2:
        return ptn.wrap_rows(
            lambda x, s, b: _layer_norm_pallas_jit(x, s, b, eps, interpret),
            x, scale, bias,
        )
    return _layer_norm_pallas_jit(x, scale, bias, eps, interpret)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _layer_norm_pallas_jit(
    x: jnp.ndarray,  # [..., D]
    scale: jnp.ndarray,  # [D]
    bias: jnp.ndarray,  # [D]
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    orig_shape = x.shape
    D = x.shape[-1]
    n = x.size // D
    rows = 256
    if n % rows:  # fall back for ragged row counts (tests, odd shapes)
        from .norms import layer_norm

        return layer_norm(x, scale, bias, eps)
    x2 = x.reshape(n, D)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, D), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, D), bias.reshape(1, D))
    return out.reshape(orig_shape)
