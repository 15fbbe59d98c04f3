"""GPTQ-style error-feedback int4 quantization for the frozen Llama decoder.

Round-4's outlier gate measured plain int4-RTN at KL 0.66 under injected
outlier weights; row equalization / clipped-RTN (models/llama_int4.py
smooth=/clip=) each cut it to ~0.37, and a scaling argument says no diagonal
rescaling can do better: for any diagonal smoother the dominant error terms
sum |x_k| * |W_k| is invariant. Reducing them needs SECOND-ORDER error
feedback — quantize the contraction rows sequentially and fold each row's
rounding error into the not-yet-quantized rows using the calibration Gram
matrix H = sum_t x_t x_t^T (the GPTQ/OBQ recipe). This module implements
that for our stacked [L, K, N] slabs, emitting EXACTLY the fused int4 tree
layout of models/llama_int4.quantize_llama_int4(fuse=True) — the Pallas
kernels, serving pool, and dequant oracle consume it unchanged.

Calibration stats come from llama_forward(collect_quant_stats=roles): the
scan emits per-layer masked input Grams for the qkv / o / gateup / down
inputs ([L, K, K] f32 each; at 3B dims the down Gram is [28, 8192, 8192]
f32 = 7.5 GB — collect it in its own pass if HBM is tight).

Group-scale layout constraint: our kernels index scales by CONTIGUOUS
128-row groups, so GPTQ's act-order permutation (which would reorder rows)
is intentionally not supported; damped Cholesky feedback alone recovers
most of its benefit at group granularity.

Reference analog: none (reference serves fp16 HF modules). Public
precedent: GPTQ (Frantar et al.), IST-DASLab/gptq.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import int4_matmul as i4
from .llama import Params


def _pack(q: jnp.ndarray, fmt: str | None = None) -> jnp.ndarray:
    """int4 values [K, N] -> column-pair-halves packed [K, N/2] int8
    (ops/int4_matmul.pack_nibbles — shared so the pack format has exactly
    one packing implementation)."""
    K, N = q.shape
    return i4.pack_nibbles(q[:, : N // 2], q[:, N // 2 :], fmt=fmt)


@functools.partial(jax.jit, static_argnames=("group", "damp", "clip_cands", "fmt"))
def gptq_pack(
    w: jnp.ndarray,        # [K, N] float
    H: jnp.ndarray,        # [K, K] f32 input Gram (sum x x^T)
    group: int = i4.GROUP,
    damp: float = 0.01,
    clip_cands: Tuple[float, ...] | None = None,
    fmt: str | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GPTQ row-sequential int4 quantization with error feedback.

    Processes the K contraction rows group-by-group: each group's scales
    come from the CURRENT (error-fed) values, each row's rounding error is
    propagated into all later rows via the upper-Cholesky factor of the
    damped H^{-1} (within-group row loop + one tail matmul per group —
    the blocked GPTQ formulation). Returns (packed [K, N/2] int8,
    scales [K/group, N] f32) in the standard kernel layout.
    """
    K, N = w.shape
    if N % 2 or K % group:
        raise ValueError(f"gptq_pack needs even N and group|K; got {w.shape}")
    W = w.astype(jnp.float32)
    Hf = H.astype(jnp.float32)

    # dead inputs (never activated in calibration): keep them inert
    dg = jnp.diag(Hf)
    dead = dg <= 0.0
    Hf = Hf + jnp.diag(jnp.where(dead, 1.0, 0.0))
    W = W * (~dead)[:, None]

    # damped inverse, upper-Cholesky factor: Hinv = U^T U with U upper
    mean_d = jnp.mean(jnp.diag(Hf))
    Hf = Hf + damp * mean_d * jnp.eye(K, dtype=jnp.float32)
    Hinv = jnp.linalg.inv(Hf)
    # symmetrize against inv() asymmetry before Cholesky
    Hinv = 0.5 * (Hinv + Hinv.T)
    U = jnp.linalg.cholesky(Hinv).T  # upper triangular

    n_groups = K // group
    Q = jnp.zeros((K, N), jnp.int8)
    scales = jnp.zeros((n_groups, N), jnp.float32)

    def quant_row(wj, s):
        return jnp.clip(jnp.round(wj / s), -7, 7)

    for g in range(n_groups):  # static python loop (<= 64 at our dims)
        r0 = g * group
        Wg = jax.lax.dynamic_slice_in_dim(W, r0, group, 0)  # [group, N]
        Ug = jax.lax.dynamic_slice(U, (r0, r0), (group, group))
        s_g = jnp.maximum(jnp.max(jnp.abs(Wg), axis=0), 1e-8) / 7.0  # [N]
        if clip_cands:
            # clipped-RTN scale search per column on the error-fed group
            # values (same MSE criterion as int4_matmul.quantize_pack)
            def err_for(c):
                sc = s_g * c
                qc = jnp.clip(jnp.round(Wg / sc[None, :]), -7, 7)
                return jnp.sum((Wg - qc * sc[None, :]) ** 2, axis=0)  # [N]

            errs = jax.lax.map(err_for, jnp.asarray(clip_cands, jnp.float32))
            s_g = s_g * jnp.asarray(clip_cands, jnp.float32)[
                jnp.argmin(errs, axis=0)
            ]

        def inner(j, st):
            Wg_, Qg_, Err_ = st
            wj = jax.lax.dynamic_slice_in_dim(Wg_, j, 1, 0)[0]  # [N]
            qj = quant_row(wj, s_g)
            dj = Ug[j, j]
            err = (wj - qj * s_g) / dj  # [N]
            # feed the error into the group's LATER rows only
            rows = jnp.arange(group)
            coef = jnp.where(rows > j, Ug[j, :], 0.0)  # [group]
            Wg_ = Wg_ - coef[:, None] * err[None, :]
            Qg_ = jax.lax.dynamic_update_slice_in_dim(
                Qg_, qj[None, :].astype(jnp.int8), j, 0
            )
            Err_ = jax.lax.dynamic_update_slice_in_dim(
                Err_, err[None, :], j, 0
            )
            return Wg_, Qg_, Err_

        Wg2, Qg, Err = jax.lax.fori_loop(
            0, group, inner,
            (Wg, jnp.zeros((group, N), jnp.int8),
             jnp.zeros((group, N), jnp.float32)),
        )
        Q = jax.lax.dynamic_update_slice_in_dim(Q, Qg, r0, 0)
        scales = scales.at[g, :].set(s_g)
        # tail update: all rows past this group get the accumulated feedback
        tail = K - (r0 + group)
        if tail > 0:
            U_tail = jax.lax.dynamic_slice(U, (r0, r0 + group), (group, tail))
            Wt = jax.lax.dynamic_slice_in_dim(W, r0 + group, tail, 0)
            Wt = Wt - U_tail.T @ Err
            W = jax.lax.dynamic_update_slice_in_dim(W, Wt, r0 + group, 0)

    return _pack(Q.astype(jnp.int32), fmt=fmt), scales


def gptq_proxy_loss(w, packed, scales, H, group: int = i4.GROUP):
    """tr((W - What)^T H (W - What)) — the objective GPTQ minimizes; used
    by tests to assert error feedback beats RTN under correlated inputs."""
    err = (w.astype(jnp.float32)
           - i4.dequantize_ref(packed, scales, group))
    return jnp.einsum("kn,kl,ln->", err, H.astype(jnp.float32), err)


def collect_llama_stats(
    params: Params, cfg, input_ids, attention_mask,
    roles: tuple = ("qkv", "o", "gateup", "down"),
    compute_dtype=jnp.float32, batch_chunk: int = 0,
):
    """Run teacher-forced calibration forwards and return the per-layer
    input Grams {role: [L, K_role, K_role] f32}. input_ids/attention_mask
    are [B, T]; batch_chunk > 0 accumulates in row chunks (HBM relief —
    the Grams are additive over examples). attn_impl is pinned to 'xla'
    so no flash tile padding rows leak into the stats."""
    from . import llama as lm

    B = input_ids.shape[0]
    chunk = batch_chunk or B
    stats = None
    for b0 in range(0, B, chunk):
        ids = input_ids[b0 : b0 + chunk]
        msk = attention_mask[b0 : b0 + chunk]
        _, _, st = lm.llama_forward(
            params, cfg, input_ids=ids, attention_mask=msk,
            compute_dtype=compute_dtype, attn_impl="xla",
            collect_quant_stats=tuple(roles),
        )
        stats = st if stats is None else jax.tree_util.tree_map(
            jnp.add, stats, st
        )
    return stats


def quantize_llama_int4_gptq(
    params: Params, stats: dict, include_embed: bool = True,
    group: int = i4.GROUP, damp: float = 0.01,
    clip_cands: Tuple[float, ...] | None = None,
    fmt: str | None = None,
) -> Params:
    """Full-precision llama tree + calibration Grams -> fused int4 tree
    (identical layout/consumers to quantize_llama_int4(fuse=True):
    'qkv_proj'/'gateup_proj' concatenated slabs + o/down, int8 embed and
    lm_head). Roles missing from `stats` fall back to plain RTN."""
    from .llama import LINEAR_NAMES  # noqa: F401  (layout parity)
    from .llama_int8 import _quantize_rows, _quantize_stacked

    first = params["layers"].get("qkv_proj", params["layers"].get("q_proj"))
    if isinstance(first, dict):
        raise ValueError("quantize_llama_int4_gptq expects a full-precision tree")
    fmt = fmt or i4.INT4_FMT

    layers = dict(params["layers"])
    slabs = {
        "qkv_proj": (jnp.concatenate(
            [layers.pop("q_proj"), layers.pop("k_proj"),
             layers.pop("v_proj")], axis=-1), "qkv"),
        "gateup_proj": (jnp.concatenate(
            [layers.pop("gate_proj"), layers.pop("up_proj")], axis=-1),
            "gateup"),
        "o_proj": (layers.pop("o_proj"), "o"),
        "down_proj": (layers.pop("down_proj"), "down"),
    }
    for name, (w, role) in slabs.items():
        if role in stats:
            H = stats[role]

            def per_layer(args, _g=group, _d=damp, _c=clip_cands):
                m, h = args
                return gptq_pack(m, h, group=_g, damp=_d, clip_cands=_c,
                                 fmt=fmt)

            packed, sc = jax.lax.map(per_layer, (w, H))
        else:
            packed, sc = jax.lax.map(
                lambda m, _g=group: i4.quantize_pack(m, group=_g, fmt=fmt), w
            )
        layers[name] = {"w_p": packed, "w_s": sc}

    out = dict(params)
    if fmt == "obin":
        out["int4_obin"] = jnp.zeros((), jnp.int8)  # forward dispatch marker
    out["layers"] = layers
    if include_embed:
        q, s = _quantize_rows(params["embed"]["weight"])
        out["embed"] = {"weight": q, "scale": s}
        if "lm_head" in params:
            out["lm_head"] = _quantize_stacked(params["lm_head"])
    return out
