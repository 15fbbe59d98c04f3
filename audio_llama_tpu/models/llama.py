"""Llama-3.x decoder, TPU-native functional implementation.

Re-designed (not ported) from the reference's use of HF `LlamaForCausalLM`
(reference src/models/base.py:19-26 loads it frozen; LoRA is attached via
forward hooks in src/models/allm.py:27-32). Here:

- Parameters live in a plain nested-dict pytree with **stacked layers**
  (leading axis = layer), so the decoder body is a single `lax.scan` — one
  compiled layer program regardless of depth, fast XLA compiles, and clean
  `PartitionSpec`s for tensor parallelism (shard the head/ffn axis).
- LoRA is a functional overlay: a second (trainable) pytree whose deltas are
  added to the frozen matmul outputs inside the forward — the JAX-native
  replacement for the reference's `register_forward_hook` mechanism
  (reference src/models/lora.py:41-43).
- KV cache is a preallocated ring of static shape, updated with
  `lax.dynamic_update_slice` — jit-friendly autoregressive decode.
- Mixed precision: frozen weights stored bf16, activations bf16, softmax and
  norm statistics f32 (TPU-idiomatic replacement for the reference's fp16
  GradScaler AMP, reference src/train.py:254).

Weight layout convention: all linear weights are stored **(in_dim, out_dim)**
(transposed from HF's nn.Linear) so forward is `x @ w` with no transposes in
the hot path.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import LlamaConfig
from ..ops.attention import (
    NEG_INF,
    causal_bias,
    combine_bias,
    mha,
    padding_bias,
    sp_partial_attention,
)
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_for_config, rope_tables

Params = dict
LINEAR_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(
    cfg: LlamaConfig, key: jax.Array, dtype=jnp.float32
) -> Params:
    """Random-init a Llama param tree (tests / from-scratch training).

    Production weights come from `models.hf_loader.load_llama`.
    """
    k_embed, k_layers, k_head = jax.random.split(key, 3)
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    Hq, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def dense(key, shape):
        fan_in = shape[-2]
        return (jax.random.normal(key, shape, jnp.float32) * fan_in ** -0.5).astype(dtype)

    ks = jax.random.split(k_layers, 7)
    params = {
        "embed": {"weight": (jax.random.normal(k_embed, (cfg.vocab_size, D), jnp.float32) * 0.02).astype(dtype)},
        "layers": {
            "input_ln": jnp.ones((L, D), dtype),
            "post_attn_ln": jnp.ones((L, D), dtype),
            "q_proj": dense(ks[0], (L, D, Hq * hd)),
            "k_proj": dense(ks[1], (L, D, Hkv * hd)),
            "v_proj": dense(ks[2], (L, D, Hkv * hd)),
            "o_proj": dense(ks[3], (L, Hq * hd, D)),
            "gate_proj": dense(ks[4], (L, D, F)),
            "up_proj": dense(ks[5], (L, D, F)),
            "down_proj": dense(ks[6], (L, F, D)),
        },
        "final_ln": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(k_head, (D, cfg.vocab_size))
    return params


def resize_embeddings(params: Params, new_vocab: int, cfg: LlamaConfig) -> Params:
    """Grow the embedding table (and untied lm_head) for added special tokens.

    Mirrors the capability of `resize_token_embeddings` the reference calls for
    <audio>/</audio> (reference src/train.py:230, src/inference.py:44-46). New
    rows are initialized to the mean of existing rows (deterministic).
    """
    if "scale" in params["embed"]:
        raise ValueError(
            "resize_embeddings on a weight-only-int8 tree: resize first, "
            "then models.llama_int8.quantize_llama"
        )
    emb = params["embed"]["weight"]
    old_vocab = emb.shape[0]
    if new_vocab <= old_vocab:
        return params
    n_new = new_vocab - old_vocab
    mean_row = jnp.mean(emb.astype(jnp.float32), axis=0, keepdims=True)
    new_rows = jnp.tile(mean_row, (n_new, 1)).astype(emb.dtype)
    params = dict(params)
    params["embed"] = {"weight": jnp.concatenate([emb, new_rows], axis=0)}
    if "lm_head" in params:
        head = params["lm_head"]
        mean_col = jnp.mean(head.astype(jnp.float32), axis=1, keepdims=True)
        new_cols = jnp.tile(mean_col, (1, n_new)).astype(head.dtype)
        params["lm_head"] = jnp.concatenate([head, new_cols], axis=1)
    return params


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    """Static-shape KV ring for jit-compiled decode.

    k/v: [L, B, Hkv, max_len, hd] (head-major: each (batch, head) timeline is
    a contiguous [max_len, hd] slab, the unit the Pallas decode-attention
    kernel DMAs); length: [] int32 current fill.

    Quantized mode (zeros(quantized=True)): k/v are int8 with per-row scales
    k_scale/v_scale [L, B, Hkv, max_len] f32 — halves cache HBM (and decode
    cache-read traffic) for ~1e-2 relative K/V error. Scales are exact to
    apply post-matmul: q·(int8·s) == (q·int8)·s per key row.

    int4 mode (zeros(quantized=4)): `k` holds ONE K/V-COMBINED nibble-packed
    int8 array [L, B, Hkv, max_len, hd] (byte d of a row = K's dim-d int4
    offset-binary in the low nibble, V's signed in the high nibble —
    quantize_kv_rows4) and `v`
    is None (the int4 marker); both per-row f32 scale sets remain. Combined
    packing keeps the slab at a full 128-lane trailing dim (a hd/2-packed
    slab cannot DMA: Mosaic HBM lane tiling is 128), halves cache HBM and
    the decode cache-read stream vs int8 (~7e-2 relative row error,
    absmax/7), and needs no read-modify-write because K and V rows are
    always appended together. Gate end-task accuracy before serving.
    """

    k: jnp.ndarray
    v: Optional[jnp.ndarray]  # None in int4 mode (combined packing in k)
    length: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def kv_bits(self) -> int:
        if not self.quantized:
            return 16
        return 4 if self.v is None else 8

    @staticmethod
    def rounded_len(max_len: int) -> int:
        """Timeline slots after the 32-sublane tile rounding zeros()
        applies — lets callers size bookkeeping without allocating."""
        return -(-max_len // 32) * 32

    @classmethod
    def zeros(cls, cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
              kv_heads: int | None = None, quantized=False):
        # Round the timeline up to the 32-sublane tile (int8's requirement;
        # also satisfies bf16's 16 and f32's 8) so the decode kernel can DMA
        # whole (batch, head) slabs; extra slots are never attendable (masks
        # zero-pad to the cache length). kv_heads overrides the head count
        # for tensor-parallel shards (num_kv_heads / tp local heads).
        # quantized: False (store `dtype`), True or 8 (int8 rows), 4
        # (nibble-packed int4 rows — k/v trailing dim becomes hd//2).
        max_len = cls.rounded_len(max_len)
        heads = kv_heads if kv_heads is not None else cfg.num_kv_heads
        shape = (cfg.num_layers, batch, heads, max_len, cfg.head_dim)
        if quantized == 4:
            return cls(
                k=jnp.zeros(shape, jnp.int8),  # K/V combined packed
                v=None,
                length=jnp.zeros((), jnp.int32),
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(shape[:-1], jnp.float32),
            )
        if quantized:
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                length=jnp.zeros((), jnp.int32),
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(shape[:-1], jnp.float32),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((), jnp.int32),
        )


def quantize_kv_rows(x: jnp.ndarray):
    """[..., hd] -> (int8 values [..., hd], f32 scales [...]): symmetric
    per-row max-abs quantization."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_kv_rows4(k: jnp.ndarray, v: jnp.ndarray):
    """(k, v) [..., hd] -> (combined packed int8 [..., hd],
    k_scale f32 [...], v_scale f32 [...]).

    K/V-COMBINED int4 packing: byte d of a row holds K's dim-d int4
    OFFSET-BINARY (k+8, in [1, 15]) in the low nibble and V's signed int4
    in the high nibble (symmetric per-row absmax/7 each). K and V rows are
    always written together, so the byte never needs read-modify-write;
    the combined slab keeps a full 128-lane trailing dim, which a
    per-tensor hd/2 packing cannot (Mosaic HBM lane tiling is 128 — a
    64-lane slab slice refuses to DMA).

    Why offset-binary K (same trick as the weight kernels' INT4_FMT=obin,
    ops/int4_matmul.py): the sign-extended BYTE is then exactly
    16*v + (k+8), so a decode kernel can matmul the RAW byte plane (one
    i8->bf16 convert, zero shifts) and recover the K logits from the byte
    dot and the V dot it needs anyway:
        q . k_row = q . byte_row - 16 (q . v_row) - 8 sum(q)
    Direct unpack stays the same VPU op count as the signed layout
    ((b & 0xF) - 8 vs shl28/shr28)."""
    def q4(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scale = jnp.maximum(absmax, 1e-8) / 7.0
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale[..., None]), -7, 7
        ).astype(jnp.int32)
        return q, scale

    kq, ks = q4(k)
    vq, vs = q4(v)
    packed = jnp.bitwise_or(
        jnp.bitwise_and(kq + 8, 0xF),
        jnp.left_shift(jnp.bitwise_and(vq, 0xF), 4),
    ).astype(jnp.int8)
    return packed, ks, vs


def unpack_kv4(packed: jnp.ndarray):
    """Combined-packed int8 [..., hd] -> (k, v) int32 [..., hd]
    (K offset-binary lo nibble, V sign-extended hi; scales not applied)."""
    b = packed.astype(jnp.int32)
    k = jnp.bitwise_and(b, 0xF) - 8  # offset-binary low nibble
    v = jnp.right_shift(b, 4)  # hi nibble: b is sign-extended, one shr4
    return k, v


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _linear(x, w, lora_branch, compute_dtype):
    """x @ w with optional LoRA delta: x @ a @ b * scaling.

    The frozen matmul runs in compute dtype on the MXU; the LoRA branch is two
    skinny matmuls (rank-r) — negligible FLOPs, fused by XLA.

    w may be a weight-only-int8 dict {'w_q' int8, 'w_s' f32 per-out-channel}
    from models.llama_int8.quantize_llama: the int8 tiles upcast to compute
    dtype inside the matmul fusion (HBM streams int8 — half the bytes, the
    decode bottleneck) and the column scales apply to the f32-accumulated
    output exactly: x @ (q * s_col) == (x @ q) * s_col.

    Or a weight-only-int4 dict {'w_p' packed int8, 'w_s' group-wise f32}
    from models.llama_int4.quantize_llama_int4 — dispatched to the Pallas
    dequant-matmul kernel (ops/int4_matmul.py; XLA cannot consume int4), or
    its XLA dequant oracle off-TPU.
    """
    if isinstance(w, dict) and "w_p" in w:
        from ..ops import int4_matmul as i4

        if w["w_p"].ndim == 3:  # per-layer pack-after-shard blocks
            p3 = w["w_p"]
            if p3.shape[1] != 1:
                raise ValueError(
                    f"int4 weight packed for tp={p3.shape[1]} used without "
                    "tensor-parallel sharding (models/llama_int4.py)"
                )
            w = dict(w)
            w["w_p"] = p3.reshape(p3.shape[0], p3.shape[2])
        # smoothed tree (quantize_llama_int4 smooth=True): the per-input-row
        # equalizer multiplies the FROZEN matmul's input only — the LoRA
        # branch below keeps the original x (exact LoRA semantics)
        xq = x * w["w_r"].astype(x.dtype) if "w_r" in w else x
        # group size is encoded in the shapes: w_p [K, N/2], w_s [K/g, N]
        g = w["w_p"].shape[-2] // w["w_s"].shape[-2]
        if i4.available():
            y = i4.int4_matmul(
                xq.astype(compute_dtype), w["w_p"], w["w_s"], group=g
            )
        else:
            y = i4.int4_matmul_ref(
                xq, w["w_p"], w["w_s"], group=g, compute_dtype=compute_dtype
            )
    elif isinstance(w, dict):
        y = (x @ w["w_q"].astype(compute_dtype)) * w["w_s"].astype(compute_dtype)
    else:
        y = x @ w.astype(compute_dtype)
    if lora_branch is not None:
        a, b, scaling = lora_branch
        y = y + (x @ a.astype(compute_dtype)) @ b.astype(compute_dtype) * scaling
    return y


def _squeeze_int4_blocks(w: dict) -> dict:
    """Pack-after-shard int4 slabs arrive 4-D [L, K, tp, N/(2*tp)]
    (models/llama_int4.py); inside a tensor-parallel shard the block axis is
    a singleton — squeeze back to the canonical [L, K, N/2] the kernel
    consumes. A multi-block slab on an unsharded path means a tree quantized
    for tp is being used without tensor-parallel sharding: the byte layout
    would silently permute output columns, so refuse."""
    p = w["w_p"]
    if p.ndim == 4:
        if p.shape[2] != 1:
            raise ValueError(
                f"int4 tree packed for tp={p.shape[2]} used without "
                "tensor-parallel sharding (make_tp_generate); quantize with "
                "tp=1 for dp/single-chip serving"
            )
        w = dict(w)
        w["w_p"] = p.reshape(p.shape[0], p.shape[1], p.shape[3])
    return w


def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    *,
    input_ids: Optional[jnp.ndarray] = None,  # [B, T] int32
    inputs_embeds: Optional[jnp.ndarray] = None,  # [B, T, D]
    attention_mask: Optional[jnp.ndarray] = None,  # [B, T_total] 1=attend
    positions: Optional[jnp.ndarray] = None,  # [B, T] int32
    kv_cache: Optional[KVCache] = None,
    cache_offsets: Optional[jnp.ndarray] = None,  # [B] int32 per-row append offsets
    lora: Optional[dict] = None,
    compute_dtype=jnp.bfloat16,
    return_hidden: bool = False,
    attn_impl: str = "auto",
    remat: bool = False,
    assume_fresh_cache: bool = False,
    tp_axis: Optional[str] = None,
    sp_axis: Optional[str] = None,
    sp_size: int = 1,
    unembed_logits: bool = True,
    collect_quant_stats: tuple = (),
):
    """Decoder forward.

    collect_quant_stats: subset of ("qkv", "o", "gateup", "down") — also
    return per-layer input Gram matrices H = sum_t x_t x_t^T (masked, f32)
    for those linears' inputs, stacked [L, K, K], as a third output
    (models/llama_gptq.py consumes them; full-precision trees only).

    remat=True wraps each scanned layer in jax.checkpoint so the backward
    pass recomputes layer activations instead of saving them — O(1-layer)
    activation memory, the standard trade for training deep stacks.

    Without kv_cache: full causal self-attention over T positions; returns
    (logits [B, T, V], None).
    With kv_cache: appends the T new positions at cache.length and attends over
    the whole cache timeline; returns (logits, updated_cache). attention_mask,
    if given, covers the full cache timeline [B, max_len].

    cache_offsets ([B] int32) overrides cache.length with PER-ROW physical
    append offsets — rows whose timelines have diverged (batched speculative
    decoding: per-row acceptance lengths; continuous-batching serving) each
    write their T new K/V rows at their own slot and attend slot-causally
    relative to it. XLA-path writes go through per-row dynamic_update_slice
    (B static, unrolled). Single-token steps on a QUANTIZED cache run the
    production mono decode kernels (they take a [B] offset vector); the
    scalar-offset db/packed kernels fall back to XLA. The returned
    cache.length is max(offsets) + T — an upper bound; per-row bookkeeping
    lives with the caller.

    tp_axis: set when running INSIDE shard_map with Megatron-sharded weights
    (column-parallel q/k/v/gate/up, row-parallel o/down — parallel/sharding.py
    specs). Head counts are then derived from the local weight shapes and the
    two row-parallel matmuls are psum'd over the axis. Embedding/unembedding
    stay replicated.

    sp_axis (+ static sp_size): timeline-sharded decode (docs/LONG_CONTEXT.md
    step 3) — set when running INSIDE shard_map with the KV-cache TIMELINE
    sharded over `sp_axis` (kv_cache holds this shard's [.., max_len/sp, ..]
    window; contexts larger than one chip's HBM). Weights/activations stay
    replicated; `offset` stays the GLOBAL fill. Two call shapes:
      - fresh prefill (assume_fresh_cache, T>1): attention runs over the
        fresh tokens (kernels or XLA, unchanged); each shard stores only its
        window of the new K/V rows. attention_mask = prompt mask [B, T].
      - decode (T==1): the owning shard appends the new row; every shard
        computes partial flash stats over its slab and the global softmax is
        merged with one pmax + one psum pair per layer
        (ops.attention.sp_partial_attention). attention_mask = the GLOBAL
        timeline mask (the shard's window is sliced internally), or an
        already-local [B, max_len/sp] window.
    """
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params, input_ids, compute_dtype)
    x = inputs_embeds.astype(compute_dtype)
    # QuaRot sandwich (models/llama_rotate.py): a rotated tree carries the
    # stream rotation as params["rot"]; rotate once here, un-rotate once
    # before the final norm. Embedding/unembedding stay in the original
    # basis, so tied tables and the audio-spliced inputs_embeds need no
    # special handling.
    _rot = params.get("rot")
    if _rot is not None:
        x = x @ _rot.astype(compute_dtype)
    B, T, D = x.shape

    if cache_offsets is not None:
        if kv_cache is None:
            raise ValueError("cache_offsets requires kv_cache")
        if assume_fresh_cache:
            raise ValueError("cache_offsets contradicts assume_fresh_cache")
    sp_g0 = None
    sp_fresh = False
    if sp_axis is not None:
        if kv_cache is None:
            raise ValueError("sp_axis requires kv_cache (timeline-sharded)")
        if cache_offsets is not None:
            raise ValueError("sp_axis does not compose with cache_offsets")
        if sp_size <= 1:
            raise ValueError("sp_axis needs its static sp_size (> 1)")
        sp_fresh = assume_fresh_cache and T > 1
        if not sp_fresh and T != 1:
            raise ValueError("sp decode supports fresh prefill or T==1 steps")
        sp_g0 = lax.axis_index(sp_axis) * kv_cache.k.shape[3]
    if kv_cache is not None:
        offset = kv_cache.length if cache_offsets is None else cache_offsets
        Tk = kv_cache.k.shape[3]
        if (
            sp_axis is None
            and attention_mask is not None
            and attention_mask.shape[1] < Tk
        ):
            # cache timelines are tile-rounded; the extra slots never attend
            attention_mask = jnp.pad(
                attention_mask, ((0, 0), (0, Tk - attention_mask.shape[1]))
            )
    else:
        offset = 0
        Tk = T
    # [1, 1] (shared scalar offset) or [B, 1] (per-row): downstream position
    # defaults, validity masks, and bias all broadcast over this column.
    off_col = jnp.reshape(jnp.asarray(offset, jnp.int32), (-1, 1))

    # Full-sequence paths can use flash attention: training/scoring (no
    # cache) and PREFILL into a fresh cache (assume_fresh_cache=True promises
    # cache.length == 0, so self-attention over the T new tokens is the whole
    # story and K/V are written to the cache separately). Decode keeps the
    # XLA path (Tq=1).
    from ..ops import causal_attention as ca
    from ..ops import flash_attention as fa

    full_seq = kv_cache is None or (assume_fresh_cache and T > 1)
    # Full-sequence causal attention prefers our cond-free GQA kernel
    # (ops/causal_attention.py: 76.5 vs stock's 54.4 TF/s fwd+bwd at
    # training geometry, no 3x K/V head repeat); stock flash remains the
    # forced-'flash' path and the fallback for odd head dims.
    use_causal_kernel = full_seq and (
        attn_impl in ("causal_kernel", "causal_kernel_interpret")
        or (
            attn_impl == "auto"
            and fa.available()
            and cfg.head_dim % 64 == 0
        )
    )
    use_flash = full_seq and not use_causal_kernel and (
        attn_impl == "flash" or (attn_impl == "auto" and fa.available())
    )

    # Training/scoring under the kernels: pad the whole stack to the kernel
    # tile ONCE (e.g. 2014 -> 2048) instead of copying q/k/v in every layer;
    # pad rows are masked out of attention and sliced off at the end.
    T_real = T
    if (use_flash or use_causal_kernel) and kv_cache is None:
        T_pad = fa._round_up(T, fa._TILE)
        if T_pad != T:
            x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
            base_mask = (
                attention_mask.astype(jnp.int32)
                if attention_mask is not None
                else jnp.ones((B, T), jnp.int32)
            )
            attention_mask = jnp.pad(base_mask, ((0, 0), (0, T_pad - T)))
            if positions is not None:
                positions = jnp.pad(
                    positions, ((0, 0), (0, T_pad - T)), mode="edge"
                )
            T = T_pad
            Tk = T

    if positions is None:
        # Stays [1, T] when the offset is shared (training / scalar decode):
        # the RoPE tables are then [1, T, hd] and broadcast over batch inside
        # the per-layer apply instead of materializing B copies (the B8 train
        # trace showed RoPE fusions scaling x5-13 with batch — table traffic,
        # not FLOPs; BASELINE.md round-4 attribution).
        positions = jnp.arange(T)[None, :] + off_col  # [1|B, T]

    inv_freq = rope_for_config(cfg)
    cos, sin = rope_tables(positions, inv_freq)  # [1|B, T, hd]

    # Single-token decode uses the fused Pallas append+attention kernel: the
    # cache operands are input_output_aliased, so the cache stays in HBM with
    # only the new row written (no carry double-buffering, no slab copies).
    from ..ops import decode_attention as da

    use_decode_kernel = (
        kv_cache is not None
        and T == 1
        and not (use_flash or use_causal_kernel)
        and (
            attn_impl in ("decode_kernel", "decode_packed", "decode_mono")
            # auto additionally requires lane-tiling-friendly geometry: the
            # decode kernels DMA [*, max_len, hd] slabs whose minor dim must
            # be a multiple of the 128-lane tile. Toy dims (hd=16) lower
            # fine in interpret mode but crash Mosaic on real TPU
            # ("slice shape along dim 4 must be aligned to tiling (128)");
            # auto falls back to the XLA cached path there.
            or (attn_impl == "auto" and da.available()
                and cfg.head_dim % 128 == 0)
        )
    )
    # Timeline-sharded decode runs the db kernel's STATS variant per shard
    # (unnormalized m/l/acc over the local slab, owner-gated append via a
    # local offset) and merges the exact global softmax in XLA with one
    # pmax+psum pair (ops.attention.merge_partial_stats).
    sp_decode_kernel = use_decode_kernel and sp_axis is not None
    # Head-packed chunked grid (ops/decode_attention_packed.py): measured
    # NEGATIVE end-to-end at every batch (fat slab DMAs serialize against
    # the weight stream — BASELINE.md late-r3 A/B); dispatchable for A/B
    # only, db stays the auto default. No stats variant: sp uses db.
    # KV-cache element precision: int8 rows, or K/V-combined nibble-packed
    # int4 rows (cache.v is None — see KVCache docstring). The decode
    # kernel choice and the XLA fallbacks below both branch on this.
    kv_bits = kv_cache.kv_bits if kv_cache is not None else 16
    use_packed_kernel = (
        use_decode_kernel and attn_impl == "decode_packed" and sp_axis is None
    )
    # Mono-grid kernels (ops/decode_attention_mono.py): grid (B,) with the
    # Hkv loop unrolled inside — 8x fewer grid programs than db (the
    # measured per-program overhead), same thin slab DMAs, plus the
    # VPU-lean softmax (analytic fresh row) and double-buffered staged
    # write-backs. Measured +16/+26/+35% over db at B16/32/64 before the
    # lean/write-back rounds (int4 w + int4 KV, BASELINE.md; the staging
    # fix alone was +19% at B64) — the AUTO choice for EVERY cache dtype
    # (int4/int8/bf16/f32); db stays reachable via
    # attn_impl='decode_kernel'.
    use_mono_kernel = (
        use_decode_kernel
        and sp_axis is None
        and attn_impl in ("decode_mono", "auto")
    )
    if use_packed_kernel and kv_bits == 4:
        raise ValueError(
            "attn_impl='decode_packed' has no int4-KV variant; use the "
            "default db kernel (attn_impl='auto'/'decode_kernel')"
        )
    # Per-row append offsets (divergent timelines: continuous-batching
    # serving, batched speculation): only the mono kernels take a [B]
    # offset vector; db/packed stay scalar-offset and fall back to XLA.
    if cache_offsets is not None and not use_mono_kernel:
        use_decode_kernel = False
        use_packed_kernel = False
    decode_valid = None
    if use_decode_kernel and sp_axis is None:
        kpos = jnp.arange(Tk)[None, :]
        decode_valid = (kpos <= off_col).astype(jnp.int32)
        decode_valid = jnp.broadcast_to(decode_valid, (B, Tk))
        if attention_mask is not None:
            decode_valid = decode_valid * attention_mask.astype(jnp.int32)

    # sp decode: per-shard slot validity over the LOCAL timeline window
    # (global slot-causality vs the global offset + the local mask window);
    # attention itself is the cross-shard partial-stats merge.
    sp_valid = None
    if sp_axis is not None and not sp_fresh:
        kpos_g = sp_g0 + jnp.arange(Tk)[None, :]
        sp_valid = (kpos_g <= offset).astype(jnp.int32)
        sp_valid = jnp.broadcast_to(sp_valid, (B, Tk))
        if attention_mask is not None:
            am = attention_mask
            if am.shape[1] != Tk:  # GLOBAL timeline mask: take our window
                full = Tk * sp_size
                if am.shape[1] < full:
                    # slots past the declared timeline can never satisfy
                    # slot-causality (> offset), so the pad value is moot
                    am = jnp.pad(
                        am, ((0, 0), (0, full - am.shape[1])),
                        constant_values=1,
                    )
                am = lax.dynamic_slice(am, (0, sp_g0), (am.shape[0], Tk))
            sp_valid = sp_valid * am.astype(jnp.int32)

    # Fresh-cache prefill WITHOUT the flash/causal kernels (attn_impl='xla',
    # or CPU fallback): attend the fresh k/v instead of reading the
    # just-written cache back — exact under quantized caches and skips a
    # full slab read.
    xla_fresh = (
        kv_cache is not None
        and assume_fresh_cache
        and T > 1
        and not (use_flash or use_causal_kernel)
        and sp_axis is None
        and cache_offsets is None
    )

    # Attention bias over the (possibly cached) key timeline.
    if use_flash or use_causal_kernel or use_decode_kernel:
        bias = None
    elif sp_axis is not None:
        if sp_fresh:
            # fresh-cache prefill under sp attends the fresh tokens only
            # (the cache holds nothing yet); plain causal + prompt padding
            bias = causal_bias(T, T)
            if attention_mask is not None:
                bias = combine_bias(
                    bias, padding_bias(attention_mask[:, :T])
                )
        else:
            bias = None  # sp_partial_attention masks via sp_valid
    elif xla_fresh:
        # Fresh-cache prefill on the XLA path attends the FRESH tokens
        # directly (layer_step below): the cache holds only (possibly
        # quantized copies of) these same rows, so reading it back would
        # add KV-quantization error to prefill attention that the kernel
        # prefill paths — and therefore production TPU — never see.
        bias = causal_bias(T, T)
        if attention_mask is not None:
            bias = combine_bias(bias, padding_bias(attention_mask[:, :T]))
    elif kv_cache is not None:
        # Causality is over PHYSICAL cache slots (append order), not the
        # logical `positions` used for RoPE — with right-padded prompts the
        # logical position of a decode token is smaller than its slot, and
        # slot-causality keeps earlier decode tokens visible while the
        # padding mask hides pad slots.
        kpos = jnp.arange(Tk)[None, :]
        qslot = off_col + jnp.arange(T)[None, :]  # [1|B, T] physical
        allowed = kpos[:, None, :] <= qslot[:, :, None]  # [1|B, T, Tk]
        written = kpos < (off_col + T)  # [1|B, Tk]
        allowed = allowed & written[:, None, :]
        bias = jnp.where(allowed, 0.0, NEG_INF)
        bias = bias[:, None, :, :].astype(jnp.float32)
        if attention_mask is not None:
            bias = combine_bias(bias, padding_bias(attention_mask))
    else:
        bias = causal_bias(T, Tk)
        if attention_mask is not None:
            bias = combine_bias(bias, padding_bias(attention_mask))

    lp = params["layers"]
    lora_scaling = lora["scaling"] if lora is not None else None

    # int4 trees: keep the stacked [L, ...] weight slabs OUT of the scanned
    # xs — scan would dynamic-slice them per layer, and XLA cannot fuse a
    # dynamic-slice into a pallas_call operand, so every layer's packed
    # weights got MATERIALIZED as copies (decode trace r3b8: 2.3 ms/step of
    # dynamic-slice, a full extra pass over the weight stream). The stacked
    # kernel selects the layer inside its index maps instead (scalar
    # prefetch, ops/int4_matmul.py:int4_matmul_stacked).
    int4_slabs = {}
    if isinstance(lp.get("qkv_proj"), dict):
        # Fused int4 tree (quantize_llama_int4 fuse=True, tp=1): q|k|v and
        # gate|up each quantized as ONE matrix — one kernel launch per
        # group instead of per projection (196 -> 112 calls per decode
        # step; the B1 trace put 3.0 of 4.06 ms in int4 matmul calls
        # against a ~2.0 ms weight-stream floor).
        fused_names = ("qkv_proj", "gateup_proj", "o_proj", "down_proj")
        int4_slabs = {n: lp[n] for n in fused_names}
        lp = {k: v for k, v in lp.items() if k not in fused_names}
    elif isinstance(lp.get("q_proj"), dict) and "w_p" in lp["q_proj"]:
        int4_slabs = {
            n: _squeeze_int4_blocks(lp[n]) for n in LINEAR_NAMES
        }
        lp = {k: v for k, v in lp.items() if k not in LINEAR_NAMES}
    # nibble pack format is a TREE property (quantize_llama_int4 fmt=,
    # marker leaf 'int4_obin') so dispatch always matches the storage
    _i4fmt = "obin" if "int4_obin" in params else "pair"
    if "int4_obin" in lp:
        lp = {k: v for k, v in lp.items() if k != "int4_obin"}

    def _int4_smooth_in(x_in, w, li):
        """Smoothed int4 trees (quantize_llama_int4 smooth=True) carry a
        per-input-row equalizer w_r [L, K]; the effective weight is
        diag(w_r[li]) @ dequant, applied as an input multiply (the [K]
        slice is ~12 KB — nothing like the weight-slab dynamic-slice
        materialization the stacked kernel exists to avoid)."""
        if "w_r" not in w:
            return x_in
        r = jax.lax.dynamic_index_in_dim(w["w_r"], li, 0, keepdims=False)
        return x_in * r.astype(x_in.dtype)

    def _int4_planes(x_in, name, li):
        """Fused-slab matmul returning the (lo, hi) column-half planes
        WITHOUT the final lane concat — the [M, N] materialized copy it
        avoids transiently OOM'd B64 prefill (gate|up at 2F = 16 k cols)."""
        from ..ops import int4_matmul as i4

        w = int4_slabs[name]
        x_in = _int4_smooth_in(x_in, w, li)
        g = w["w_p"].shape[-2] // w["w_s"].shape[-2]
        if i4.available():
            return i4.int4_matmul_stacked(
                x_in.astype(compute_dtype), w["w_p"], w["w_s"], li, group=g,
                return_planes=True, fmt=_i4fmt,
            )
        return i4.int4_matmul_stacked_ref(
            x_in, w["w_p"], w["w_s"], li, group=g,
            compute_dtype=compute_dtype, return_planes=True, fmt=_i4fmt,
        )

    def _int4_linear(x_in, name, li, lora_branch):
        from ..ops import int4_matmul as i4

        w = int4_slabs[name]
        xq = _int4_smooth_in(x_in, w, li)
        g = w["w_p"].shape[-2] // w["w_s"].shape[-2]
        if i4.available():
            y = i4.int4_matmul_stacked(
                xq.astype(compute_dtype), w["w_p"], w["w_s"], li, group=g,
                fmt=_i4fmt,
            )
        else:
            y = i4.int4_matmul_stacked_ref(
                xq, w["w_p"], w["w_s"], li, group=g,
                compute_dtype=compute_dtype, fmt=_i4fmt,
            )
        if lora_branch is not None:
            a, b, scaling = lora_branch
            y = y + (x_in @ a.astype(compute_dtype)) @ b.astype(
                compute_dtype
            ) * scaling
        return y

    def _cache_write(buf, val, li):
        """Append val [1, B, Hkv, T, ...] into the [L, B, Hkv, Tk, ...] slab.

        Scalar offset: one dynamic_update_slice (all rows share the slot).
        Per-row offsets, T == 1 (decode/serving): ONE scatter over the
        (row, slot) pairs — the unrolled per-row form ballooned the HLO
        (B x slabs updates per scanned layer) and its compile time.
        Per-row offsets, T > 1 (speculative verify windows): B unrolled
        windowed updates (B is static)."""
        if cache_offsets is None:
            idx = (li, 0, 0, offset) + (0,) * (buf.ndim - 4)
            return lax.dynamic_update_slice(buf, val.astype(buf.dtype), idx)
        if val.shape[3] == 1:
            rows = jnp.arange(val.shape[1])
            return buf.at[li, rows, :, cache_offsets].set(
                val[0, :, :, 0].astype(buf.dtype)
            )
        for b in range(val.shape[1]):
            idx = (li, b, 0, cache_offsets[b]) + (0,) * (buf.ndim - 4)
            buf = lax.dynamic_update_slice(
                buf, val[:, b : b + 1].astype(buf.dtype), idx
            )
        return buf

    def _sp_window_write(buf, val, li):
        """Fresh-prefill write under sp: store only this shard's window
        (global slots [sp_g0, sp_g0 + Tk)) of the T new K/V rows. Rank-
        agnostic over the trailing dims (5-D value slabs, 4-D scale slabs —
        the timeline is axis 3 in both)."""
        pad_to = Tk * sp_size
        v = val.astype(buf.dtype)
        pad = [(0, 0)] * v.ndim
        pad[3] = (0, pad_to - v.shape[3])
        v = jnp.pad(v, pad)
        start = (0, 0, 0, sp_g0) + (0,) * (v.ndim - 4)
        win = lax.dynamic_slice(v, start, v.shape[:3] + (Tk,) + v.shape[4:])
        return lax.dynamic_update_slice(buf, win, (li,) + (0,) * (v.ndim - 1))

    def _sp_row_write(buf, val, li):
        """Decode append under sp: only the shard owning global slot
        `offset` stores the new row; the rest re-write their own row
        unchanged (a one-row read/select/write, not a slab-wide select)."""
        loc = jnp.clip(offset - sp_g0, 0, Tk - 1)
        idx = (li, 0, 0, loc) + (0,) * (val.ndim - 4)
        cur = lax.dynamic_slice(buf, idx, val.shape)
        owner = (offset >= sp_g0) & (offset < sp_g0 + Tk)
        return lax.dynamic_update_slice(
            buf, jnp.where(owner, val.astype(buf.dtype), cur), idx
        )

    # Fused decode-MLP kernel gate (env MLP_FUSED: '1' auto, '0' off,
    # 'interp' force-interpret for CPU parity tests). Decode-size rows
    # only; the lb-dependent LoRA check happens per layer_step call.
    import os as _os

    _mlp_fused_mode = _os.environ.get("MLP_FUSED", "1")

    def _fused_mlp_ok(lb):
        if _mlp_fused_mode == "0" or "gateup_proj" not in int4_slabs:
            return False
        if B * T > 64:
            return False
        if any(
            lb(n) is not None for n in ("gate_proj", "up_proj", "down_proj")
        ):
            return False
        from ..ops import mlp_int4 as mlp4

        if not (mlp4.available() or _mlp_fused_mode == "interp"):
            return False
        gu = int4_slabs["gateup_proj"]
        dn = int4_slabs["down_proj"]
        grp = gu["w_p"].shape[-2] // gu["w_s"].shape[-2]
        if _mlp_fused_mode == "interp":
            return mlp4.pick_chunk(gu["w_p"].shape[-1], grp) is not None
        # TPU lowering additionally needs lane-divisible scale blocks
        return mlp4.geometry_ok(
            gu["w_p"].shape[-2], gu["w_p"].shape[-1],
            2 * dn["w_p"].shape[-1], grp,
        )

    def layer_step(carry, scanned):
        # Carry holds (x, full_k_cache, full_v_cache): the cache is updated
        # with a per-layer dynamic_update_slice ON THE CARRY, which XLA
        # aliases in place across the scan's while-loop iterations. Returning
        # per-layer cache slabs as scan ys instead would re-materialize the
        # whole [L, B, max_len, Hkv, hd] cache every call — at 3B/2k-ctx
        # decode that is ~5 GB of pointless HBM traffic per token.
        x, ck_all, cv_all, ks_all, vs_all = carry
        (p, lor, li) = scanned
        h = rms_norm(x, p["input_ln"].astype(compute_dtype), cfg.rms_norm_eps)
        qstats = {}

        def _gram(v):
            """Masked input Gram sum_t x_t x_t^T [K, K] f32 (calibration
            statistics for GPTQ error feedback, models/llama_gptq.py)."""
            vf = v.astype(jnp.float32)
            if attention_mask is not None:
                vf = vf * attention_mask[:, :T, None].astype(jnp.float32)
            v2 = vf.reshape(-1, vf.shape[-1])
            return v2.T @ v2

        if "qkv" in collect_quant_stats:
            qstats["qkv"] = _gram(h)

        def lb(name):
            if lor is None:
                return None
            br = lor.get(name)
            if br is None:
                return None
            return (br["a"], br["b"], lora_scaling)

        def lora_add(y, name, x_in):
            """LoRA overlays stay per-projection under fused int4 slabs:
            the rank-r branch is two skinny matmuls added AFTER the fused
            output split (identical math to the unfused path)."""
            br = lb(name)
            if br is None:
                return y
            a, bb, scaling = br
            return y + (x_in @ a.astype(compute_dtype)) @ bb.astype(
                compute_dtype
            ) * scaling

        if "qkv_proj" in int4_slabs:
            nq = cfg.num_heads * cfg.head_dim
            nkv = cfg.num_kv_heads * cfg.head_dim
            lo, hi = _int4_planes(h, "qkv_proj", li)
            half = lo.shape[-1]  # (nq + 2*nkv) // 2

            def vslice(start, size):
                # slice [start, start+size) of the virtual [lo | hi] concat
                if start >= half:
                    return hi[..., start - half : start - half + size]
                if start + size <= half:
                    return lo[..., start : start + size]
                return jnp.concatenate(
                    [lo[..., start:], hi[..., : start + size - half]], -1
                )

            q = lora_add(vslice(0, nq), "q_proj", h)
            k = lora_add(vslice(nq, nkv), "k_proj", h)
            v = lora_add(vslice(nq + nkv, nkv), "v_proj", h)
        elif int4_slabs:
            q = _int4_linear(h, "q_proj", li, lb("q_proj"))
            k = _int4_linear(h, "k_proj", li, lb("k_proj"))
            v = _int4_linear(h, "v_proj", li, lb("v_proj"))
        else:
            q = _linear(h, p["q_proj"], lb("q_proj"), compute_dtype)
            k = _linear(h, p["k_proj"], lb("k_proj"), compute_dtype)
            v = _linear(h, p["v_proj"], lb("v_proj"), compute_dtype)
        # -1 head counts: under tp_axis the projections are column-sharded,
        # so each shard sees num_heads/tp local heads.
        q = q.reshape(B, T, -1, cfg.head_dim)
        k = k.reshape(B, T, -1, cfg.head_dim)
        v = v.reshape(B, T, -1, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        quantized = ks_all is not None

        def write_scales(ks_all, vs_all, kq_s, vq_s):
            """Append-slot scale write (kernels only write cache VALUES).
            ORDER IS LOAD-BEARING: mono kernels read the slabs with the
            fresh scale already written (safe — mono masks the append slot
            dead and adds the fresh row analytically, so the written scale
            is never read this step), which lets XLA update the f32 slabs
            in place on the scan carry; db kernels must be called BEFORE
            this write (they read the append slot's old contents). The
            mask-dead invariant is pinned by
            test_decode_mono.py::test_mono_ignores_poisoned_append_scale."""
            ks_all = _cache_write(ks_all, kq_s[None, :, :, None], li)
            vs_all = _cache_write(vs_all, vq_s[None, :, :, None], li)
            return ks_all, vs_all

        if sp_decode_kernel:
            from ..ops.attention import merge_partial_stats
            from ..ops.decode_attention_db import (
                decode_attention_db_stats,
                decode_attention_quantized_db_stats,
            )

            sp_loc = offset - sp_g0  # local slot; out of range off-owner
            if quantized and kv_bits == 4:
                from ..ops.decode_attention_db import (
                    decode_attention_quantized4_db_stats,
                )

                kvp, kq_s, vq_s = quantize_kv_rows4(k[:, 0], v[:, 0])
                m_l, l_l, acc_l, ck_all = decode_attention_quantized4_db_stats(
                    q[:, 0], kvp, ck_all,
                    lax.dynamic_index_in_dim(ks_all, li, 0, keepdims=False),
                    lax.dynamic_index_in_dim(vs_all, li, 0, keepdims=False),
                    kq_s, vq_s,
                    li, sp_loc, sp_valid, cfg.head_dim ** -0.5,
                )
                ks_all = _sp_row_write(ks_all, kq_s[None, :, :, None], li)
                vs_all = _sp_row_write(vs_all, vq_s[None, :, :, None], li)
            elif quantized:
                kq, kq_s = quantize_kv_rows(k[:, 0])  # [B,Hkv,hd], [B,Hkv]
                vq, vq_s = quantize_kv_rows(v[:, 0])
                m_l, l_l, acc_l, ck_all, cv_all = (
                    decode_attention_quantized_db_stats(
                        q[:, 0], kq, vq, ck_all, cv_all,
                        lax.dynamic_index_in_dim(ks_all, li, 0, keepdims=False),
                        lax.dynamic_index_in_dim(vs_all, li, 0, keepdims=False),
                        kq_s, vq_s,
                        li, sp_loc, sp_valid, cfg.head_dim ** -0.5,
                    )
                )
                # owner-gated scale append (kernel only writes values)
                ks_all = _sp_row_write(ks_all, kq_s[None, :, :, None], li)
                vs_all = _sp_row_write(vs_all, vq_s[None, :, :, None], li)
            else:
                m_l, l_l, acc_l, ck_all, cv_all = decode_attention_db_stats(
                    q[:, 0], k[:, 0], v[:, 0], ck_all, cv_all,
                    li, sp_loc, sp_valid, cfg.head_dim ** -0.5,
                )
            attn = merge_partial_stats(
                m_l, l_l, acc_l, sp_axis, out_dtype=q.dtype
            )[:, None]  # [B, 1, Hq, hd]
        elif use_decode_kernel:
            if quantized and kv_bits == 4:
                if use_mono_kernel:
                    from ..ops.decode_attention_mono import (
                        decode_attention_quantized4_mono as _dq4,
                    )
                else:
                    from ..ops.decode_attention_db import (
                        decode_attention_quantized4_db as _dq4,
                    )

                kvp, kq_s, vq_s = quantize_kv_rows4(k[:, 0], v[:, 0])
                if use_mono_kernel:
                    # mono takes the FULL scale slabs (layer picked in its
                    # BlockSpec index maps) — the dynamic_index below
                    # MATERIALIZED a copy of both slabs every layer. The
                    # write_scales write→read order lets XLA update the
                    # f32 slabs in place on the scan carry; the old
                    # read→write order forced a full slab copy per layer
                    # (2x ~0.19 ms/step at B64 — the round-5 trace's
                    # "scale write-back dus" glue).
                    ks_all, vs_all = write_scales(ks_all, vs_all, kq_s, vq_s)
                    attn_flat, ck_all = _dq4(
                        q[:, 0], kvp, ck_all, ks_all, vs_all, kq_s, vq_s,
                        li, offset, decode_valid, cfg.head_dim ** -0.5,
                    )
                else:
                    attn_flat, ck_all = _dq4(
                        q[:, 0], kvp, ck_all,
                        lax.dynamic_index_in_dim(ks_all, li, 0, keepdims=False),
                        lax.dynamic_index_in_dim(vs_all, li, 0, keepdims=False),
                        kq_s, vq_s,
                        li, offset, decode_valid, cfg.head_dim ** -0.5,
                    )
                    ks_all, vs_all = write_scales(ks_all, vs_all, kq_s, vq_s)
            elif quantized:
                if use_packed_kernel:
                    from ..ops.decode_attention_packed import (
                        decode_attention_quantized_packed as _dq,
                    )
                elif use_mono_kernel:
                    from ..ops.decode_attention_mono import (
                        decode_attention_quantized_mono as _dq,
                    )
                else:
                    from ..ops.decode_attention_db import (
                        decode_attention_quantized_db as _dq,
                    )

                kq, kq_s = quantize_kv_rows(k[:, 0])  # [B,Hkv,hd], [B,Hkv]
                vq, vq_s = quantize_kv_rows(v[:, 0])
                if use_mono_kernel:
                    # slab-mode scales, write BEFORE the kernel read (see
                    # the int4 branch): full stacked slabs ride the kernel
                    # via li-indexed BlockSpecs, no per-layer slice copy.
                    ks_all, vs_all = write_scales(ks_all, vs_all, kq_s, vq_s)
                    attn_flat, ck_all, cv_all = _dq(
                        q[:, 0], kq, vq, ck_all, cv_all, ks_all, vs_all,
                        kq_s, vq_s,
                        li, offset, decode_valid, cfg.head_dim ** -0.5,
                    )
                else:
                    attn_flat, ck_all, cv_all = _dq(
                        q[:, 0], kq, vq, ck_all, cv_all,
                        lax.dynamic_index_in_dim(ks_all, li, 0, keepdims=False),
                        lax.dynamic_index_in_dim(vs_all, li, 0, keepdims=False),
                        kq_s, vq_s,
                        li, offset, decode_valid, cfg.head_dim ** -0.5,
                    )
                    ks_all, vs_all = write_scales(ks_all, vs_all, kq_s, vq_s)
            else:
                if use_packed_kernel:
                    from ..ops.decode_attention_packed import (
                        decode_attention_packed as _d,
                    )
                elif use_mono_kernel:
                    from ..ops.decode_attention_mono import (
                        decode_attention_mono as _d,
                    )
                else:
                    from ..ops.decode_attention_db import (
                        decode_attention_db as _d,
                    )

                attn_flat, ck_all, cv_all = _d(
                    q[:, 0], k[:, 0], v[:, 0], ck_all, cv_all,
                    li, offset, decode_valid, cfg.head_dim ** -0.5,
                )
            attn = attn_flat[:, None]  # [B, 1, Hq, hd]
        elif ck_all is not None:
            kh = jnp.swapaxes(k, 1, 2)[None]  # [1,B,Hkv,T,hd]
            vh = jnp.swapaxes(v, 1, 2)[None]
            if sp_axis is not None:
                _w = _sp_window_write if sp_fresh else _sp_row_write
                if quantized and kv_bits == 4:
                    kvh, khs, vhs = quantize_kv_rows4(kh, vh)
                    ck_all = _w(ck_all, kvh, li)
                    ks_all = _w(ks_all, khs, li)
                    vs_all = _w(vs_all, vhs, li)
                elif quantized:
                    khq, khs = quantize_kv_rows(kh)
                    vhq, vhs = quantize_kv_rows(vh)
                    ck_all = _w(ck_all, khq, li)
                    cv_all = _w(cv_all, vhq, li)
                    ks_all = _w(ks_all, khs, li)
                    vs_all = _w(vs_all, vhs, li)
                else:
                    ck_all = _w(ck_all, kh, li)
                    cv_all = _w(cv_all, vh, li)
            elif quantized and kv_bits == 4:
                kvh, khs, vhs = quantize_kv_rows4(kh, vh)
                ck_all = _cache_write(ck_all, kvh, li)
                ks_all = _cache_write(ks_all, khs, li)
                vs_all = _cache_write(vs_all, vhs, li)
            elif quantized:
                khq, khs = quantize_kv_rows(kh)
                vhq, vhs = quantize_kv_rows(vh)
                ck_all = _cache_write(ck_all, khq, li)
                cv_all = _cache_write(cv_all, vhq, li)
                ks_all = _cache_write(ks_all, khs, li)
                vs_all = _cache_write(vs_all, vhs, li)
            else:
                ck_all = _cache_write(ck_all, kh, li)
                cv_all = _cache_write(cv_all, vh, li)
            if use_flash or use_causal_kernel:
                # kernel prefill attends over the fresh k/v directly; the
                # cache timeline is only written, never read here
                attn_k = attn_v = None
            elif (sp_axis is not None and sp_fresh) or xla_fresh:
                # fresh-prefill attention runs over the fresh tokens — under
                # sp no shard holds the full timeline; on the plain XLA path
                # this keeps prefill exact when the cache is quantized
                attn_k, attn_v = k, v
            else:
                if kv_bits == 4:  # combined-packed: both live in ck_all
                    attn_k, attn_v = unpack_kv4(
                        lax.dynamic_index_in_dim(ck_all, li, 0, keepdims=False)
                    )  # int32 [B, Hkv, Tk, hd] each
                else:
                    attn_k = lax.dynamic_index_in_dim(
                        ck_all, li, axis=0, keepdims=False
                    )  # [B, Hkv, Tk, hd]
                    attn_v = lax.dynamic_index_in_dim(
                        cv_all, li, axis=0, keepdims=False
                    )
                attn_k = attn_k.astype(compute_dtype)
                attn_v = attn_v.astype(compute_dtype)
                if quantized:  # dequantize with per-row scales
                    k_s = lax.dynamic_index_in_dim(ks_all, li, 0, keepdims=False)
                    v_s = lax.dynamic_index_in_dim(vs_all, li, 0, keepdims=False)
                    attn_k = attn_k * k_s[..., None].astype(compute_dtype)
                    attn_v = attn_v * v_s[..., None].astype(compute_dtype)
        else:
            attn_k, attn_v = k, v

        if use_decode_kernel:
            pass  # attn already computed by the fused kernel above
        elif use_flash or use_causal_kernel:
            # Fresh-cache prefill attends only over the T new tokens (k, v),
            # never the (empty) cache timeline; slice the mask accordingly.
            fmask = attention_mask
            if fmask is not None and fmask.shape[1] != T:
                fmask = fmask[:, :T]
            if use_causal_kernel:
                attn = ca.causal_mha(
                    q, k, v,
                    mask=fmask, scale=cfg.head_dim ** -0.5,
                    interpret=attn_impl == "causal_kernel_interpret",
                )
            else:
                attn = fa.flash_mha(
                    q, k, v,
                    mask=fmask, causal=True, scale=cfg.head_dim ** -0.5,
                )
        elif sp_axis is not None:
            if sp_fresh:  # fresh tokens, [B, T, Hkv, hd] layout
                attn = mha(
                    q, attn_k, attn_v, bias=bias, scale=cfg.head_dim ** -0.5
                )
            else:  # cross-shard partial-softmax merge over the timeline
                attn = sp_partial_attention(
                    q, attn_k, attn_v, sp_valid, cfg.head_dim ** -0.5,
                    sp_axis,
                )
        elif ck_all is not None and not xla_fresh:
            attn = mha(
                q, attn_k, attn_v, bias=bias, scale=cfg.head_dim ** -0.5,
                kv_head_major=True,
            )
        else:  # no cache, or xla_fresh ([B, T, Hkv, hd] fresh k/v)
            attn = mha(q, attn_k, attn_v, bias=bias, scale=cfg.head_dim ** -0.5)
        attn = attn.reshape(B, T, -1)
        if "o" in collect_quant_stats:
            qstats["o"] = _gram(attn)
        if int4_slabs:
            attn = _int4_linear(attn, "o_proj", li, lb("o_proj"))
        else:
            attn = _linear(attn, p["o_proj"], lb("o_proj"), compute_dtype)
        if tp_axis is not None:  # row-parallel output projection
            attn = lax.psum(attn, tp_axis)
        x = x + attn

        h = rms_norm(x, p["post_attn_ln"].astype(compute_dtype), cfg.rms_norm_eps)
        if "gateup" in collect_quant_stats:
            qstats["gateup"] = _gram(h)
        if "gateup_proj" in int4_slabs and _fused_mlp_ok(lb):
            # One pallas_call for the whole MLP (gate|up matmul + SiLU*up +
            # down matmul, ops/mlp_int4.py): halves the MLP launch
            # boundaries on the launch-bound B1 decode path. LoRA on any
            # MLP projection falls back to the two-call planes path (the
            # overlay needs the pre-activation planes).
            from ..ops import mlp_int4 as mlp4

            gu, dn = int4_slabs["gateup_proj"], int4_slabs["down_proj"]
            grp = gu["w_p"].shape[-2] // gu["w_s"].shape[-2]
            d = mlp4.mlp_int4_stacked(
                _int4_smooth_in(h, gu, li),
                gu["w_p"], gu["w_s"], dn["w_p"], dn["w_s"], li,
                group=grp,
                chunk=mlp4.pick_chunk(gu["w_p"].shape[-1], grp),
                interpret=_mlp_fused_mode == "interp",
                dn_r=dn.get("w_r"), fmt=_i4fmt,
            )
        elif "gateup_proj" in int4_slabs:
            # halves packing makes the planes EXACTLY gate and up
            g_pl, u_pl = _int4_planes(h, "gateup_proj", li)
            g = lora_add(g_pl, "gate_proj", h)
            u = lora_add(u_pl, "up_proj", h)
            d = _int4_linear(jax.nn.silu(g) * u, "down_proj", li, lb("down_proj"))
        elif int4_slabs:
            g = _int4_linear(h, "gate_proj", li, lb("gate_proj"))
            u = _int4_linear(h, "up_proj", li, lb("up_proj"))
            d = _int4_linear(jax.nn.silu(g) * u, "down_proj", li, lb("down_proj"))
        else:
            g = _linear(h, p["gate_proj"], lb("gate_proj"), compute_dtype)
            u = _linear(h, p["up_proj"], lb("up_proj"), compute_dtype)
            a_mlp = jax.nn.silu(g) * u
            if "down" in collect_quant_stats:
                qstats["down"] = _gram(a_mlp)
            d = _linear(a_mlp, p["down_proj"], lb("down_proj"), compute_dtype)
        if tp_axis is not None:  # row-parallel down projection
            d = lax.psum(d, tp_axis)
        x = x + d
        return (x, ck_all, cv_all, ks_all, vs_all), (qstats or None)

    # Assemble scanned pytrees: stacked layer params + optional stacked lora,
    # with the layer index as xs for cache addressing.
    lora_layers = lora["layers"] if lora is not None else None
    L = cfg.num_layers
    if kv_cache is not None:
        carry0 = (x, kv_cache.k, kv_cache.v, kv_cache.k_scale, kv_cache.v_scale)
    else:
        carry0 = (x, None, None, None, None)

    if collect_quant_stats and int4_slabs:
        raise ValueError(
            "collect_quant_stats calibrates FULL-PRECISION trees "
            "(quantize after capturing)"
        )

    # Layer-fused B1 decode megakernel (ops/decode_megakernel.py): the whole
    # stack in ONE pallas_call — no per-layer call boundaries, no XLA glue,
    # one continuous weight-DMA pipeline. TPU-measured +12.1% single-stream
    # (B1 313.6 -> 351.6 tok/s, BASELINE round-5 session 2) — the DEFAULT
    # when the geometry gate passes. MEGA_DECODE env: '1' auto on TPU
    # (default), '0' off, 'interp' force-interpret (CPU parity tests).
    _mega_mode = _os.environ.get("MEGA_DECODE", "1")
    use_megakernel = (
        _mega_mode != "0"
        and use_mono_kernel and B == 1 and T == 1 and kv_bits == 4
        and lora is None and tp_axis is None and sp_axis is None
        and cache_offsets is None and not collect_quant_stats
        and "qkv_proj" in int4_slabs
    )
    if use_megakernel:
        from ..ops import decode_megakernel as mk

        use_megakernel = mk.ok_for(cfg, int4_slabs, Tk) and (
            da.available() or _mega_mode == "interp"
        )
    if use_megakernel:
        hidden, ckv_new, fresh = mk.decode_megakernel(
            x[0], int4_slabs["qkv_proj"], int4_slabs["o_proj"],
            int4_slabs["gateup_proj"], int4_slabs["down_proj"],
            lp["input_ln"], lp["post_attn_ln"],
            cos[0, 0], sin[0, 0],
            kv_cache.k, kv_cache.k_scale, kv_cache.v_scale,
            offset, decode_valid,
            eps=cfg.rms_norm_eps, scale=cfg.head_dim ** -0.5, fmt=_i4fmt,
            interpret=_mega_mode == "interp",
        )
        x = hidden[None]  # [1, 1, D]
        ck_out, cv_out = ckv_new, None
        # fresh per-layer KV scales (lane 0 = k, lane 1 = v) scatter into
        # the scale slabs in ONE slice-update across all layers
        ks_out = lax.dynamic_update_slice(
            kv_cache.k_scale, fresh[:, None, :, 0:1], (0, 0, 0, offset)
        )
        vs_out = lax.dynamic_update_slice(
            kv_cache.v_scale, fresh[:, None, :, 1:2], (0, 0, 0, offset)
        )
        scan_ys = None
    else:
        step_fn = layer_step
        if remat:
            step_fn = jax.checkpoint(layer_step, prevent_cse=False)
        (x, ck_out, cv_out, ks_out, vs_out), scan_ys = lax.scan(
            step_fn, carry0, (lp, lora_layers, jnp.arange(L))
        )

    if T_real != T:  # drop the flash tile-padding rows
        x = x[:, :T_real]

    if _rot is not None:  # leave the rotated basis (QuaRot sandwich)
        x = x @ _rot.astype(compute_dtype).T

    x = rms_norm(x, params["final_ln"].astype(compute_dtype), cfg.rms_norm_eps)

    if unembed_logits:
        logits = unembed_with_tp(params, cfg, x, compute_dtype, tp_axis)
    else:
        # caller unembeds a subset of positions itself (e.g. generation
        # prefill only needs each row's last real position — full-sequence
        # logits at [B, 2014, 128k] f32 are ~15 GB of HBM temp)
        logits = None

    new_cache = None
    if kv_cache is not None:
        new_len = (
            offset + T if cache_offsets is None
            else jnp.max(cache_offsets) + T  # upper bound (caller tracks rows)
        )
        new_cache = KVCache(
            k=ck_out, v=cv_out, length=new_len,
            k_scale=ks_out, v_scale=vs_out,
        )
    if collect_quant_stats:
        if return_hidden:
            return logits, new_cache, x, scan_ys
        return logits, new_cache, scan_ys
    if return_hidden:
        return logits, new_cache, x
    return logits, new_cache


def embed_tokens(params: Params, input_ids: jnp.ndarray, compute_dtype=jnp.bfloat16):
    """Token-embedding lookup (reference: llama.model.model.embed_tokens,
    src/models/allm.py:64).

    Handles the weight-only-int8 embed ({'weight' int8 [V, D], 'scale' f32
    [V]}, models.llama_int8): gather int8 rows, then apply the per-row scale
    — exact (each gathered row is scaled by its own factor)."""
    emb = params["embed"]
    rows = emb["weight"][input_ids].astype(compute_dtype)
    if "scale" in emb:
        rows = rows * emb["scale"][input_ids][..., None].astype(compute_dtype)
    return rows


def unembed_with_tp(
    params: Params, cfg: LlamaConfig, x: jnp.ndarray, compute_dtype=jnp.bfloat16,
    tp_axis: Optional[str] = None,
):
    """unembed + the tensor-parallel vocab gather: an untied lm_head is
    vocab-column-sharded (parallel/sharding.py), so shards must all_gather
    for full logits; the tied flagship path unembeds with the replicated
    embedding table."""
    logits = unembed(params, cfg, x, compute_dtype)
    if tp_axis is not None and not cfg.tie_word_embeddings and "lm_head" in params:
        logits = lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    return logits


def unembed(params: Params, cfg: LlamaConfig, x: jnp.ndarray, compute_dtype=jnp.bfloat16):
    """Project hidden states to vocab logits (tied or untied head). f32 out.

    Quantized trees (models.llama_int8): the tied table's per-row scales
    become per-vocab-logit scales (exact); an untied lm_head carries
    per-vocab-column scales."""
    if cfg.tie_word_embeddings or "lm_head" not in params:
        emb = params["embed"]
        w = emb["weight"].astype(compute_dtype)  # [V, D]
        logits = jnp.einsum("btd,vd->btv", x, w, preferred_element_type=jnp.float32)
        if "scale" in emb:
            logits = logits * emb["scale"][None, None, :]
        return logits
    head = params["lm_head"]
    if isinstance(head, dict):
        logits = jnp.einsum(
            "btd,dv->btv", x, head["w_q"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return logits * head["w_s"][None, None, :]
    return jnp.einsum(
        "btd,dv->btv",
        x,
        head.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )


def causal_lm_loss_from_hidden(
    params: Params,
    cfg: LlamaConfig,
    hidden: jnp.ndarray,  # [B, T, D] final hidden states (post final_ln)
    labels: jnp.ndarray,  # [B, T] int32, -100 = ignore
    chunk_size: int = 256,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Shifted cross-entropy WITHOUT materializing [B, T, V] logits.

    At flagship shapes (B8, T~2014, V=128256) dense f32 logits are ~8 GB —
    more than the decoder weights. This scans over sequence chunks, computes
    each chunk's logits + logsumexp + target score under jax.checkpoint (so
    the backward recomputes the chunk unembedding instead of saving it), and
    accumulates the masked token losses. Numerically identical to
    causal_lm_loss(unembed(hidden), labels) up to reduction order.
    """
    xs = hidden[:, :-1]
    ys = labels[:, 1:]
    B, T, D = xs.shape
    n_chunks = -(-T // chunk_size)
    pad = n_chunks * chunk_size - T
    if pad:
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
        ys = jnp.pad(ys, ((0, 0), (0, pad)), constant_values=-100)

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def chunk_loss(xc, yc):
        logits = unembed(params, cfg, xc, compute_dtype)  # [B, c, V] f32
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        mask = yc != -100
        safe = jnp.where(mask, yc, 0)
        tgt = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(mask, lse - tgt, 0.0)
        return jnp.sum(nll), jnp.sum(mask)

    def body(carry, idx):
        total, count = carry
        xc = jax.lax.dynamic_slice_in_dim(xs, idx * chunk_size, chunk_size, 1)
        yc = jax.lax.dynamic_slice_in_dim(ys, idx * chunk_size, chunk_size, 1)
        s, n = chunk_loss(xc, yc)
        return (total + s, count + n), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        jnp.arange(n_chunks),
    )
    return total / jnp.maximum(count, 1)


def causal_lm_loss(
    logits: jnp.ndarray,  # [B, T, V] f32
    labels: jnp.ndarray,  # [B, T] int32, -100 = ignore
) -> jnp.ndarray:
    """Shifted cross-entropy, mean over non-ignored tokens — matches HF
    `LlamaForCausalLM`'s internal loss the reference trains with
    (reference src/models/allm.py:99-104 passes `labels=`)."""
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    mask = shift_labels != -100
    safe_labels = jnp.where(mask, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(mask, -token_ll, 0.0))
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count
