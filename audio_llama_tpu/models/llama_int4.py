"""Opt-in weight-only int4 (W4A16) for the frozen Llama decoder.

Round 2 halved decode's HBM weight stream with W8A16 (models/llama_int8.py);
this halves it again: each stacked linear slab [L, K, N] becomes

    {"w_p": int8 [L, K, N/2],      # two int4 values per byte
     "w_s": f32  [L, K/128, N]}    # group-wise scales (ops/int4_matmul.py)

consumed by the Pallas dequant-matmul kernel (llama._linear dispatches on
the "w_p" key; XLA has no int4 matmul path, so the CPU fallback is the
kernel's dequantize-then-matmul oracle). The embedding table and untied
lm_head stay per-row/column INT8 (llama_int8 recipe): the embed gather
wants per-row scales and contributes little stream at decode, and the tied
unembed must stay cheap to read exactly once per step.

Accuracy: int4 RTN group-128 carries ~11% per-weight relative error (the
standard W4A16 envelope — see tests/test_int4_matmul.py for the math);
3B-class LLMs typically tolerate it with ~0.1-0.5 ppl cost, but VALIDATE
end-task WER before serving (the toy-WER gate covers the mechanism;
real-weight WER needs checkpoints).

Sharding: dp generation replicates this tree (works as-is). Tensor-parallel
generation uses PACK-AFTER-SHARD: quantize with tp=N and column-parallel
slabs become 4-D [L, K, tp, N/(2*tp)] — each tp block is the canonical
packing of that shard's output columns, so sharding the block axis hands
every device a self-contained slab (llama_forward squeezes the singleton
block axis inside the shard). Row-parallel slabs shard the contraction dim,
which the packing never pairs across. make_tp_generate validates the
layout matches its mesh tp.

Reference analog: none (reference serves fp16 HF modules,
src/inference.py:24-49). Opt-in via bench.py --mode decode --int4_weights
or inference/cli.py --int4_decoder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import int4_matmul as i4
from .llama import LINEAR_NAMES, Params
from .llama_int8 import _quantize_rows, _quantize_stacked


# Megatron roles for pack-after-shard (mirror parallel/sharding.py):
# column-parallel linears shard the OUT dim — exactly the dim the byte
# packing pairs across — so their packing must be blockwise per tp shard.
_COL_NAMES = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")

# Clipped-RTN scale-search candidates (ops/int4_matmul.quantize_pack):
# MSE-optimal clip per (group, column). 1.0 keeps plain RTN reachable.
CLIP_CANDS = (1.0, 0.92, 0.84, 0.76, 0.68)


def _equalize_rows(m: jnp.ndarray, eps: float = 1e-6):
    """[K, N] -> (m / r[:, None], r [K]): per-input-row magnitude
    equalization. Effective weight stays diag(r) @ quantized(m/r); consumers
    multiply the matmul INPUT by r (bf16 activations have the dynamic range
    to spare), so a hot input row (real-checkpoint outlier regime,
    models/outliers.py) no longer inflates its whole group's absmax and
    crushes the other group-1 rows' int4 resolution. r is geometric-mean
    normalized so activations stay near their original scale."""
    mf = m.astype(jnp.float32)
    mag = jnp.max(jnp.abs(mf), axis=-1)  # [K]
    r = mag / jnp.exp(jnp.mean(jnp.log(jnp.maximum(mag, eps))))
    r = jnp.maximum(r, eps)
    return (mf / r[:, None]).astype(m.dtype), r


def _quantize_stacked_int4(
    w: jnp.ndarray, group: int = i4.GROUP, tp: int = 1,
    col_parallel: bool = False, smooth: bool = False,
    clip: bool = False, fmt: str | None = None,
) -> dict:
    """[L, K, N] -> {'w_p' int8 [L, K, N/2], 'w_s' f32 [L, K/group, N]}.

    tp > 1 + col_parallel: PACK-AFTER-SHARD layout — w_p becomes 4-D
    [L, K, tp, N/(2*tp)] where block s is the canonical packing of out
    columns [s*N/tp, (s+1)*N/tp). Sharding axis 2 over 'tp' hands every
    shard a self-contained canonically-packed slab (llama_forward squeezes
    the singleton block axis). w_s stays canonical [L, K/g, N] — scales
    carry no pairing, so a plain last-dim shard aligns.

    smooth: adds 'w_r' f32 [L, K] — per-input-row equalizer (_equalize_rows;
    consumers multiply the matmul input by w_r[layer]).
    clip: clipped-RTN scale search (CLIP_CANDS).
    """
    cands = CLIP_CANDS if clip else None
    if tp > 1 and col_parallel:
        L, K, N = w.shape
        if N % (2 * tp):
            raise ValueError(
                f"int4 pack-after-shard needs (2*tp) | N; got N={N} tp={tp}"
            )
        r_all = None
        if smooth:
            # equalize on the FULL row (r is shared by every tp block —
            # the input rows are not column-sharded)
            w, r_all = jax.lax.map(_equalize_rows, w)
        blocks = w.reshape(L, K, tp, N // tp).transpose(0, 2, 1, 3)
        packed, scales = jax.vmap(jax.vmap(
            lambda m: i4.quantize_pack(m, group=group, clip_cands=cands, fmt=fmt)
        ))(blocks)                       # [L, tp, K, N/2tp], [L, tp, K/g, N/tp]
        packed = packed.transpose(0, 2, 1, 3)           # [L, K, tp, N/2tp]
        scales = scales.transpose(0, 2, 1, 3).reshape(L, K // group, N)
        out = {"w_p": packed, "w_s": scales}
        if r_all is not None:
            out["w_r"] = r_all
        return out
    # lax.map (sequential over layers), not vmap: the fused gate|up slab is
    # [L, 3072, 16384] at 3B dims and quantize_pack's f32 intermediates
    # under vmap peak at ~5.6 GB — enough to OOM HBM next to a B64 cache.
    # One-time setup cost; per-layer peak is ~200 MB.
    if smooth:
        def per_layer(m):
            m2, r = _equalize_rows(m)
            p, s = i4.quantize_pack(m2, group=group, clip_cands=cands, fmt=fmt)
            return p, s, r

        packed, scales, r_all = jax.lax.map(per_layer, w)
        return {"w_p": packed, "w_s": scales, "w_r": r_all}
    packed, scales = jax.lax.map(
        lambda m: i4.quantize_pack(m, group=group, clip_cands=cands, fmt=fmt), w
    )
    return {"w_p": packed, "w_s": scales}


def quantize_llama_int4(
    params: Params, include_embed: bool = True, group: int = i4.GROUP,
    tp: int = 1, fuse: bool | None = None, smooth: bool = False,
    clip: bool | None = None, fmt: str | None = None,
) -> Params:
    """Llama param tree -> weight-only-int4 tree (see module docstring).

    fmt (None = the INT4_FMT env default): nibble pack format, recorded IN
    the tree as the scalar marker leaf 'int4_obin' so forward dispatch
    always matches the storage (a process-level-only flag could silently
    decode a tree packed under the other format). 'obin' wins at decode B1
    (epilogue lo recovery, ops/int4_matmul.py; +6%..+45% across sessions —
    tunnel noise dominates sub-ms steps, clean idle-host reps +6-11%) and
    loses ~5% at B64 / ties at B128 — pick per pool batch (bench.py
    auto-picks obin for B <= 32).

    tp > 1: pack-after-shard layout for tensor-parallel generation
    (make_tp_generate) — column-parallel slabs pack per tp block (4-D w_p);
    row-parallel slabs shard the contraction dim, which the packing never
    pairs across, but their group scales must stay shard-aligned:
    (K/tp) % group == 0 is validated here.

    clip (default None = AUTO: on for plain trees, OFF for rotated ones):
    clipped-RTN scale search (CLIP_CANDS) — zero runtime or layout cost,
    one-time quantize cost, measured outlier-gate KL 0.657 -> 0.376 on
    plain trees. On QuaRot-ROTATED trees ("rot" in params) clipping HURTS
    (gate 0.284 vs plain-RTN 0.197: post-rotation weights are near-
    Gaussian, so per-(group,col) MSE-optimal shrinkage just adds tail
    error), hence the auto default. smooth: per-input-row weight
    equalization ('w_r' in each slab dict — see _equalize_rows; ~= clip's
    win, does NOT stack with it, adds a runtime input multiply — kept for
    A/B). Accuracy ladder under the outlier gate
    (experiments/int4_rotate_gate.py): clip 0.376 < rotate+RTN 0.197 <
    rotate+GPTQ+clip 0.125 (models/llama_gptq.py, calibrated) — the
    rotated arms PASS the < 0.2 int4-serving bar; unrotated int4 stays
    opt-in. Numerics stay W4A16-exact given the quantized values.

    fuse (default: tp == 1): merge the shared-input projections into ONE
    kernel call each — 'qkv_proj' = [q|k|v] out-columns, 'gateup_proj' =
    [gate|up] — quantized as single matrices (canonical packing over the
    concatenated N, so unpacking restores column order and llama_forward
    just slices the output). Decode at B1 spends ~3.0 ms/step in 196 int4
    matmul calls against a ~2.0 ms weight-stream floor (B1 mono trace);
    fusion cuts the launches to 112/step. tp trees stay unfused (the tp
    block packing is per-matrix).
    """
    first = params["layers"].get("qkv_proj", params["layers"].get("q_proj"))
    if isinstance(first, dict):
        raise ValueError(
            "quantize_llama_int4 expects a full-precision tree "
            "(got an already-quantized one)"
        )
    if fuse is None:
        fuse = tp == 1
    if clip is None:
        clip = "rot" not in params  # see docstring: clip hurts rotated trees
    fmt = fmt or i4.INT4_FMT
    if fuse and tp > 1:
        raise ValueError("fused int4 trees are tp=1 only (dp/single-chip)")
    out = dict(params)
    if fmt == "obin":
        out["int4_obin"] = jnp.zeros((), jnp.int8)  # forward dispatch marker
    layers = dict(params["layers"])
    if fuse:
        import jax.numpy as _jnp

        layers["qkv_proj"] = _quantize_stacked_int4(
            _jnp.concatenate(
                [layers.pop("q_proj"), layers.pop("k_proj"),
                 layers.pop("v_proj")], axis=-1,
            ),
            group, smooth=smooth, clip=clip, fmt=fmt,
        )
        layers["gateup_proj"] = _quantize_stacked_int4(
            _jnp.concatenate(
                [layers.pop("gate_proj"), layers.pop("up_proj")], axis=-1
            ),
            group, smooth=smooth, clip=clip, fmt=fmt,
        )
        for name in ("o_proj", "down_proj"):
            layers[name] = _quantize_stacked_int4(
                layers[name], group, smooth=smooth, clip=clip, fmt=fmt
            )
        out["layers"] = layers
        if include_embed:
            q, s = _quantize_rows(params["embed"]["weight"])
            out["embed"] = {"weight": q, "scale": s}
            if "lm_head" in params:
                out["lm_head"] = _quantize_stacked(params["lm_head"])
        return out
    for name in LINEAR_NAMES:
        col = name in _COL_NAMES
        if tp > 1 and not col:
            K = layers[name].shape[1]
            if K % tp or (K // tp) % group:
                raise ValueError(
                    f"int4 row-parallel slab {name}: need group "
                    f"({group}) | K/tp ({K}/{tp})"
                )
        layers[name] = _quantize_stacked_int4(
            layers[name], group, tp=tp, col_parallel=col,
            smooth=smooth, clip=clip, fmt=fmt,
        )
    out["layers"] = layers
    if include_embed:
        q, s = _quantize_rows(params["embed"]["weight"])
        out["embed"] = {"weight": q, "scale": s}
        if "lm_head" in params:
            out["lm_head"] = _quantize_stacked(params["lm_head"])
    return out


def dequantize_llama_int4(params: Params) -> Params:
    """int4 tree -> f32 tree (the numerics oracle for parity tests: the
    kernel path must match llama_forward over THIS tree). Fused trees
    ('qkv_proj'/'gateup_proj') are split back to the canonical names."""
    fmt = "obin" if "int4_obin" in params else "pair"
    out = {k: v for k, v in params.items() if k != "int4_obin"}
    layers = dict(params["layers"])
    if "qkv_proj" in layers:
        def deq(w):
            g = w["w_p"].shape[-2] // w["w_s"].shape[-2]
            d = jax.vmap(
                lambda p, s: i4.dequantize_ref(p, s, group=g, fmt=fmt)
            )(w["w_p"], w["w_s"])
            if "w_r" in w:  # effective weight = diag(w_r) @ dequant
                d = d * w["w_r"][:, :, None]
            return d

        qkv = deq(layers.pop("qkv_proj"))
        gu = deq(layers.pop("gateup_proj"))
        nk = qkv.shape[-1]  # Nq + 2*Nkv with Nq = 3*Nkv at GQA dims? no —
        # recover split points from o_proj/down_proj contraction dims
        nq = layers["o_proj"]["w_p"].shape[1]  # o_proj K == Hq*hd
        nkv = (nk - nq) // 2
        layers["q_proj"] = qkv[..., :nq]
        layers["k_proj"] = qkv[..., nq : nq + nkv]
        layers["v_proj"] = qkv[..., nq + nkv :]
        nf = gu.shape[-1] // 2
        layers["gate_proj"] = gu[..., :nf]
        layers["up_proj"] = gu[..., nf:]
        for name in ("o_proj", "down_proj"):
            layers[name] = deq(layers[name])
        out["layers"] = layers
        if isinstance(params["embed"], dict) and "scale" in params["embed"]:
            emb = params["embed"]
            out["embed"] = {
                "weight": emb["weight"].astype(jnp.float32)
                * emb["scale"][:, None]
            }
        head = params.get("lm_head")
        if isinstance(head, dict):
            out["lm_head"] = (
                head["w_q"].astype(jnp.float32) * head["w_s"][None, :]
            )
        return out
    for name in LINEAR_NAMES:
        w = layers[name]
        if w["w_p"].ndim == 4:  # pack-after-shard blocks [L, K, tp, N/2tp]
            L, K, tp, nh = w["w_p"].shape
            g = K // w["w_s"].shape[-2]
            nl = 2 * nh
            pb = w["w_p"].transpose(0, 2, 1, 3)           # [L, tp, K, nh]
            sb = w["w_s"].reshape(L, K // g, tp, nl).transpose(0, 2, 1, 3)
            deq = jax.vmap(jax.vmap(
                lambda p, s: i4.dequantize_ref(p, s, group=g, fmt=fmt)
            ))(pb, sb)                                    # [L, tp, K, nl]
            d4 = deq.transpose(0, 2, 1, 3).reshape(L, K, tp * nl)
            if "w_r" in w:
                d4 = d4 * w["w_r"][:, :, None]
            layers[name] = d4
            continue
        g = w["w_p"].shape[-2] // w["w_s"].shape[-2]
        d = jax.vmap(
            lambda p, s: i4.dequantize_ref(p, s, group=g, fmt=fmt)
        )(w["w_p"], w["w_s"])
        if "w_r" in w:
            d = d * w["w_r"][:, :, None]
        layers[name] = d
    out["layers"] = layers
    if isinstance(params["embed"], dict) and "scale" in params["embed"]:
        emb = params["embed"]
        out["embed"] = {
            "weight": emb["weight"].astype(jnp.float32)
            * emb["scale"][:, None]
        }
    head = params.get("lm_head")
    if isinstance(head, dict):
        out["lm_head"] = head["w_q"].astype(jnp.float32) * head["w_s"][None, :]
    return out


def is_int4(params: Params) -> bool:
    w = params["layers"].get("qkv_proj") or params["layers"].get("q_proj")
    return isinstance(w, dict) and "w_p" in w
