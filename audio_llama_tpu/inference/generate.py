"""KV-cached autoregressive generation, fully jit-compiled.

Reference behavior (AudioLLM.generate, src/models/allm.py:263-348): build the
combined <audio>+text embedding prefix, call HF generate with sampling config,
return only the newly generated tokens. Here the whole thing — prefill +
`lax.scan` decode loop + temperature/top-p/top-k sampling + EOS latching — is
ONE compiled XLA program with a static-shape KV cache ring, which is the
TPU-idiomatic replacement for HF's Python decode loop.

Note: the reference's post-slice `outputs[0, input_length:]` over-trims
because HF generate already returns only new tokens when fed inputs_embeds
(SURVEY.md §2 'Generation' quirk). We implement the *intended* capability:
exactly the new tokens come back.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import AudioLLMConfig
from ..models import allm, llama as llama_mod, lora as lora_mod, projector as proj_mod
from ..ops import sampling


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray  # [B, max_new_tokens] int32, pad_id after EOS
    num_generated: jnp.ndarray  # [B] int32, count of tokens up to+incl. EOS


def build_prefix(
    frozen: dict,
    trainable: Optional[dict],
    cfg: AudioLLMConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    audio_features: Optional[jnp.ndarray],
    audio_start_id: int,
    audio_end_id: int,
    compute_dtype=jnp.bfloat16,
):
    """(combined_embeds, combined_mask) for the prompt (+ optional audio).

    Honors cfg.splice_mode so generation lays the audio block out exactly the
    way the checkpoint was trained ('prepend' reference-compat default or
    'inplace' at the <audio> placeholder)."""
    if audio_features is None:
        embeds = llama_mod.embed_tokens(frozen["llama"], input_ids, compute_dtype)
        return embeds, attention_mask
    enc = allm.process_audio_features(frozen, cfg, audio_features, compute_dtype)
    audio_embeds = proj_mod.project(trainable["projector"], enc, compute_dtype)
    if cfg.splice_mode == "inplace":
        text_embeds = llama_mod.embed_tokens(
            frozen["llama"], input_ids, compute_dtype
        )
        embeds, mask, _ = allm.splice_inplace(
            text_embeds, audio_embeds, input_ids, attention_mask, None,
            audio_start_id,
        )
        return embeds, mask
    return allm.combine_text_and_audio_embeddings(
        frozen, trainable, cfg, input_ids, attention_mask, audio_embeds,
        audio_start_id, audio_end_id, compute_dtype,
    )


def _generate_impl(
    frozen: dict,
    trainable: Optional[dict],
    cfg: AudioLLMConfig,
    input_ids: jnp.ndarray,  # [B, T] int32 (right-padded)
    attention_mask: jnp.ndarray,  # [B, T]
    audio_features: Optional[jnp.ndarray],  # [B, n_mels, F] or None
    key: jax.Array,
    *,
    max_new_tokens: int = 256,
    temperature: float = 0.7,
    top_p: float = 0.9,
    top_k: int = 0,
    greedy: bool = False,
    eos_id: int = 2,
    pad_id: int = 0,
    audio_start_id: int = 0,
    audio_end_id: int = 0,
    compute_dtype=jnp.bfloat16,
    has_audio: bool = True,
    tp_axis=None,
    tp_size: int = 1,
    sp_axis=None,
    sp_size: int = 1,
    kv_quant: bool = False,
    attn_impl: str = "auto",
) -> GenerateResult:
    """Sampling defaults mirror the reference CLI (temperature 0.7, top_p 0.9,
    max_new_tokens 256; reference src/inference.py:186-194).

    sp_axis/sp_size (inside shard_map, parallel.make_sp_generate): the KV
    cache TIMELINE is sharded — each shard allocates max_len/sp slots and
    decode attention merges partial softmax stats across shards
    (models/llama.py sp_axis docs). Serves contexts larger than one chip's
    HBM cache budget."""
    lora = None
    if trainable is not None and "lora" in trainable and cfg.lora is not None:
        lora = lora_mod.with_scaling(trainable["lora"], cfg.lora)

    if not has_audio:
        audio_features = None
    embeds, mask = build_prefix(
        frozen, trainable, cfg, input_ids, attention_mask, audio_features,
        audio_start_id, audio_end_id, compute_dtype,
    )
    B, P, _ = embeds.shape
    total = P + max_new_tokens
    # The cache-timeline attention mask: prefix mask ++ ones for decode slots.
    full_mask = jnp.concatenate(
        [mask.astype(jnp.int32), jnp.ones((B, max_new_tokens), jnp.int32)], axis=1
    )

    cache = llama_mod.KVCache.zeros(
        cfg.llama, B, -(-total // sp_size), dtype=compute_dtype,
        kv_heads=cfg.llama.num_kv_heads // tp_size,
        quantized=kv_quant,
    )
    _, cache, hidden = llama_mod.llama_forward(
        frozen["llama"], cfg.llama,
        inputs_embeds=embeds,
        # sp prefill attends the fresh tokens only: the prompt mask is the
        # right shape; the timeline mask is for decode steps
        attention_mask=mask if sp_axis is not None else full_mask,
        kv_cache=cache, lora=lora, compute_dtype=compute_dtype,
        # Fresh cache: prefill self-attention can run as one flash pass
        # instead of materializing [B, H, P, total] logits.
        assume_fresh_cache=True,
        tp_axis=tp_axis,
        sp_axis=sp_axis, sp_size=sp_size,
        # Only each row's last real position feeds sampling; unembedding the
        # whole prefill would materialize [B, P, V] f32 (~15 GB at B16
        # flagship dims) and burn ~P times the needed unembed FLOPs.
        return_hidden=True,
        unembed_logits=False,
    )
    # Last *real* (non-pad) position per row holds the next-token state.
    real_len = jnp.sum(mask, axis=1).astype(jnp.int32)  # [B] logical lengths
    last_idx = real_len - 1  # [B]
    last_hidden = jnp.take_along_axis(
        hidden, last_idx[:, None, None], axis=1
    )  # [B, 1, D]
    next_logits = llama_mod.unembed_with_tp(
        frozen["llama"], cfg.llama, last_hidden, compute_dtype, tp_axis
    )[:, 0]  # [B, V]

    def sample(logits, k):
        return sampling.sample_token(
            logits, k, temperature=temperature, top_p=top_p, top_k=top_k,
            greedy=greedy,
        )

    all_keys = jax.random.split(key, max_new_tokens)
    tok0 = sample(next_logits, all_keys[0])
    done0 = tok0 == eos_id

    def step(carry, xs):
        k, i = xs
        cache, tok, done = carry
        # Logical RoPE position of tok: real prompt length + tokens already
        # generated (right-pad slots do not advance positions; the cache
        # mask is slot-causal so this decouples cleanly).
        positions = (real_len + i)[:, None]
        step_logits, cache = llama_mod.llama_forward(
            frozen["llama"], cfg.llama,
            input_ids=tok[:, None], attention_mask=full_mask,
            positions=positions,
            kv_cache=cache, lora=lora, compute_dtype=compute_dtype,
            tp_axis=tp_axis, sp_axis=sp_axis, sp_size=sp_size,
            # decode-step kernel choice only; prefill stays auto (the
            # packed/db split is a single-token-decode distinction)
            attn_impl=attn_impl,
        )
        nxt = sample(step_logits[:, 0], k)
        nxt = jnp.where(done, pad_id, nxt)
        new_done = done | (nxt == eos_id)
        return (cache, nxt, new_done), nxt

    (_, _, done), rest = jax.lax.scan(
        step, (cache, tok0, done0),
        (all_keys[1:], jnp.arange(max_new_tokens - 1)),
    )
    tokens = jnp.concatenate([tok0[:, None], rest.T], axis=1)  # [B, max_new]

    # count tokens up to and including first EOS (or all if none)
    hit_eos = tokens == eos_id
    any_eos = jnp.any(hit_eos, axis=1)
    first_eos = jnp.argmax(hit_eos, axis=1)
    num = jnp.where(any_eos, first_eos + 1, max_new_tokens).astype(jnp.int32)
    return GenerateResult(tokens=tokens, num_generated=num)


# jit entry point (the implementation is shared with make_dp_generate).
generate = functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "temperature", "top_p", "top_k", "greedy",
        "eos_id", "pad_id", "audio_start_id", "audio_end_id", "compute_dtype",
        "has_audio", "tp_axis", "tp_size", "sp_axis", "sp_size", "kv_quant",
        "attn_impl",
    ),
)(_generate_impl)


def make_tp_generate(cfg: AudioLLMConfig, mesh, **static_kw):
    """Tensor-parallel generation over the mesh's 'tp' axis (optionally with
    'dp' batch sharding on top).

    The frozen Llama stacks enter shard_map pre-sliced per the Megatron
    column/row specs (parallel/sharding.py) — each shard holds num_heads/tp
    attention heads and intermediate_size/tp FFN columns, runs the full
    generate program on its local slice (Pallas decode kernel included, since
    shapes are local), and the two row-parallel matmuls psum over 'tp'.
    The Whisper encoder and projector are replicated (a few percent of decode
    FLOPs). This is the latency scale-out: per-chip weight reads drop by tp.

    Requires num_kv_heads % tp == 0 and an fsdp-free mesh. Returns
    fn(frozen, trainable, input_ids, attention_mask, audio, key). Pre-place
    weights with parallel.sharding.shard_frozen_for_generation(mesh, frozen)
    (llama tp-sharded, whisper replicated — plain shard_frozen would
    tp-shard the encoder, which these in_specs keep replicated), or pass
    host arrays and let jit lay them out. The jitted program is built once
    on first call and cached.
    """
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    from ..parallel import sharding as shd

    tp = mesh.shape["tp"]

    def _check_int4_layout(frozen):
        """int4 trees must be pack-after-shard quantized for THIS tp:
        quantize_llama_int4(..., tp=tp) (models/llama_int4.py). Canonical
        (tp=1) packing pairs output column j with j+N/2 — a tp shard of the
        packed dim would split the pairs."""
        lyr = frozen["llama"]["layers"]
        if isinstance(lyr.get("qkv_proj"), dict):
            raise ValueError(
                "fused int4 tree (quantize_llama_int4 fuse=True) is "
                f"tp=1 only; quantize with tp={tp}, fuse=False for "
                "make_tp_generate"
            )
        w = lyr["q_proj"]
        if not (isinstance(w, dict) and "w_p" in w):
            return
        p = w["w_p"]
        if p.ndim != 4 or p.shape[2] != tp:
            got = p.shape[2] if p.ndim == 4 else 1
            raise ValueError(
                f"make_tp_generate(tp={tp}) needs an int4 tree quantized "
                f"with quantize_llama_int4(..., tp={tp}); this one was "
                f"packed for tp={got}"
            )
        dw = frozen["llama"]["layers"]["down_proj"]
        K = dw["w_p"].shape[1]
        g = K // dw["w_s"].shape[1]
        if K % tp or (K // tp) % g:
            raise ValueError(
                f"int4 row-parallel scales misalign: need group ({g}) | "
                f"K/tp ({K}/{tp})"
            )

    if cfg.llama.num_kv_heads % tp or cfg.llama.num_heads % tp:
        raise ValueError(
            f"tp={tp} must divide num_heads={cfg.llama.num_heads} and "
            f"num_kv_heads={cfg.llama.num_kv_heads}"
        )
    if mesh.shape.get("fsdp", 1) != 1:
        raise ValueError(
            "make_tp_generate needs fsdp=1: the fsdp axis shards weight "
            "contraction dims, which is incompatible with the replicated "
            "activations inside shard_map"
        )
    has_audio = static_kw.get("has_audio", True)
    batch_spec = P("dp") if mesh.shape.get("dp", 1) > 1 else P()

    def local(frozen, trainable, input_ids, attention_mask, audio, key):
        # batch_spec tolerates meshes without a 'dp' axis; the per-shard key
        # fold must too (axis_index on an absent axis fails at trace time).
        if "dp" in mesh.axis_names:
            key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        return _generate_impl(
            frozen, trainable, cfg, input_ids, attention_mask, audio, key,
            tp_axis="tp", tp_size=tp, **static_kw,
        )

    def specs_for(template_frozen, template_trainable):
        frozen_specs = {
            "llama": shd.llama_specs(template_frozen["llama"]),
            "whisper": jax.tree_util.tree_map(
                lambda _: P(), template_frozen["whisper"]
            ),
        }
        trainable_specs = shd.trainable_specs(template_trainable)
        return frozen_specs, trainable_specs

    cache = {}

    def fn(frozen, trainable, input_ids, attention_mask, audio, key):
        _check_int4_layout(frozen)
        # Build shard_map + jit ONCE (keyed by weight-tree structure): a
        # fresh jit per call would recompile the whole prefill+decode
        # program every time (minutes per compile on remote TPU).
        key_struct = (
            jax.tree_util.tree_structure(frozen),
            jax.tree_util.tree_structure(trainable),
        )
        if key_struct not in cache:
            frozen_specs, trainable_specs = specs_for(frozen, trainable)
            in_specs = (
                frozen_specs, trainable_specs, batch_spec, batch_spec,
                batch_spec if has_audio else P(), P(),
            )
            cache[key_struct] = jax.jit(shard_map(
                local, mesh=mesh, in_specs=in_specs,
                out_specs=GenerateResult(
                    tokens=batch_spec, num_generated=batch_spec
                ),
                check_vma=False,
            ))
        return cache[key_struct](
            frozen, trainable, input_ids, attention_mask, audio, key
        )

    return fn


def make_dp_generate(cfg: AudioLLMConfig, mesh, **static_kw):
    """Data-parallel batched generation over a mesh's 'dp' axis.

    Weights are replicated, the batch splits across devices, and each device
    runs the FULL single-chip generate program locally (shard_map gives every
    shard local shapes, so the Pallas decode/mel kernels keep working —
    unlike GSPMD partitioning, which cannot split a pallas_call). The PRNG
    key is folded with the shard index so sampling stays independent per row
    group. This is the serving scale-out: throughput scales with dp.

    Returns fn(frozen, trainable, input_ids, attention_mask, audio, key);
    mesh.shape['dp'] must divide the batch. With has_audio=False the audio
    argument is accepted and ignored (pass None or anything).
    """
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    if mesh.shape.get("fsdp", 1) != 1 or mesh.shape.get("tp", 1) != 1:
        raise ValueError("make_dp_generate shards over 'dp' only; use a "
                         "dp-only mesh for generation")

    has_audio = static_kw.get("has_audio", True)
    batch_spec = P("dp")

    if has_audio:
        def local(frozen, trainable, input_ids, attention_mask, audio, key):
            key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
            return _generate_impl(
                frozen, trainable, cfg, input_ids, attention_mask, audio, key,
                **static_kw,
            )

        in_specs = (P(), P(), batch_spec, batch_spec, batch_spec, P())
    else:
        def local(frozen, trainable, input_ids, attention_mask, key):
            key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
            return _generate_impl(
                frozen, trainable, cfg, input_ids, attention_mask, None, key,
                **static_kw,
            )

        in_specs = (P(), P(), batch_spec, batch_spec, P())

    inner = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=in_specs,
        out_specs=GenerateResult(tokens=batch_spec, num_generated=batch_spec),
        check_vma=False,
    ))
    if has_audio:
        return inner

    def fn(frozen, trainable, input_ids, attention_mask, audio=None, key=None):
        del audio  # ignored in text-only mode
        return inner(frozen, trainable, input_ids, attention_mask, key)

    return fn
