"""Inference: checkpoint load, audio processing, generation — function + CLI.

Reference surface (src/inference.py): load_audio_llm (13-76), process_audio
(79-111), generate_response (114-172), argparse CLI (175-220). Re-designed:
the checkpoint carries the full model config, so loading needs no flag
archaeology; audio decode/resample happens on host (native FLAC/WAV IO) but
featurization + encode + KV-cached decode run as one jitted program
(inference/generate.py). Both checkpoint layout variants load
(training/checkpoint.py handles full and bare-trainable formats, the analog
of reference src/inference.py:57-68).
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("audio_llama_tpu")


def load_audio_llm(
    checkpoint_path: Optional[str],
    llama_path: Optional[str] = None,
    whisper_path: Optional[str] = None,
    tokenizer: Optional[str] = None,
    toy_model: bool = False,
    seed: int = 0,
):
    """Returns (cfg, frozen, trainable, tokenizer).

    Mirrors reference load_audio_llm (src/inference.py:13-76): tokenizer +
    special tokens, frozen base load, embedding resize, trainable restore.
    The model config is read from the checkpoint's config.json when present.
    """
    import jax

    from ..config import AudioLLMConfig
    from ..data.tokenizer import load_tokenizer
    from ..models import allm, hf_loader
    from ..models import llama as llama_mod
    from ..training import checkpoint as ckpt

    meta = ckpt.load_metadata(checkpoint_path) if checkpoint_path else {}
    cfg = None
    if meta.get("model_config"):
        cfg = AudioLLMConfig.from_dict(meta["model_config"])

    if toy_model or (cfg is not None and llama_path is None and cfg.llama.num_layers <= 4):
        tk = load_tokenizer(tokenizer or "byte")
        if cfg is None:
            cfg = AudioLLMConfig.tiny()
        # Random frozen weights must match the training run: use the seed
        # (and outlier injection, if any) the trainer recorded in the
        # checkpoint metadata.
        meta_args = meta.get("args", {})
        frozen_seed = meta_args.get("seed", seed)
        frozen = allm.init_frozen(
            cfg, jax.random.PRNGKey(frozen_seed),
            outlier_scale=meta_args.get("toy_outliers", 0.0),
        )
    else:
        tk = load_tokenizer(tokenizer or llama_path)
        llama_params, llama_cfg = hf_loader.load_llama(llama_path)
        whisper_params, whisper_cfg = hf_loader.load_whisper_encoder(whisper_path)
        llama_params = llama_mod.resize_embeddings(
            llama_params, tk.vocab_size, llama_cfg
        )
        llama_cfg = llama_cfg.replace(
            vocab_size=max(llama_cfg.vocab_size, tk.vocab_size)
        )
        if cfg is None:
            cfg = AudioLLMConfig(llama=llama_cfg, whisper=whisper_cfg)
        else:
            cfg = cfg.replace(llama=llama_cfg, whisper=whisper_cfg)
        frozen = {"llama": llama_params, "whisper": whisper_params}

    trainable = allm.init_trainable(cfg, jax.random.PRNGKey(seed + 1))
    if checkpoint_path:
        trainable, _, step, _ = ckpt.load_checkpoint(
            checkpoint_path, trainable_template=jax.device_get(trainable)
        )
        logger.info("loaded checkpoint %s (step %d)", checkpoint_path, step)
    return cfg, frozen, trainable, tk


def load_draft_llama(path: str, vocab_size: int, seed: int = 0):
    """(draft_params, draft_cfg) for speculative decoding: a text-only Llama
    sharing the target's vocabulary. The special value 'toy' inits a random
    tiny draft (offline smoke / tests). No reference analog (the reference
    delegates decode to HF generate, src/models/allm.py:326-331)."""
    import jax

    from ..config import LlamaConfig
    from ..models import hf_loader
    from ..models import llama as llama_mod

    if path == "toy":
        cfg = LlamaConfig.tiny(vocab_size=vocab_size)
        return llama_mod.init_params(cfg, jax.random.PRNGKey(seed + 17)), cfg
    params, cfg = hf_loader.load_llama(path)
    params = llama_mod.resize_embeddings(params, vocab_size, cfg)
    cfg = cfg.replace(vocab_size=max(cfg.vocab_size, vocab_size))
    return params, cfg


def process_audio(audio_path: str, mel_cfg) -> np.ndarray:
    """Host-side audio prep: decode -> mono -> resample 16k -> crop/pad to the
    static clip length. Returns waveform [1, S] (mel runs on-device).
    Reference: process_audio, src/inference.py:79-111."""
    from ..data import audio_io

    audio = audio_io.load_audio(audio_path, target_sr=mel_cfg.sample_rate)
    S = mel_cfg.max_samples
    out = np.zeros(S, np.float32)
    n = min(len(audio), S)
    out[:n] = audio[:n]
    return out[None, :]


def generate_response(
    cfg,
    frozen,
    trainable,
    tokenizer,
    prompt: str,
    audio_path: Optional[str] = None,
    max_new_tokens: int = 256,
    temperature: float = 0.7,
    top_p: float = 0.9,
    top_k: int = 0,
    greedy: bool = False,
    seed: int = 0,
    kv_quant=False,  # False | True/8 (int8 KV) | 4 (nibble-packed int4 KV)
    draft: Optional[Tuple] = None,
    gamma: int = 4,
    decode_impl: str = "auto",
) -> str:
    """Tokenize prompt -> (optional) audio -> jitted generate -> decode.
    Reference: generate_response, src/inference.py:114-172. Returns exactly
    the newly generated text (the intended capability; see generate.py note
    about the reference's over-trim quirk).

    draft: optional (draft_params, draft_cfg) — a text Llama sharing the
    tokenizer — switches decoding to speculative draft-and-verify
    (inference/speculative.py): identical output distribution (bit-identical
    under greedy), fewer target forwards when the draft agrees. gamma =
    draft tokens proposed per verify round."""
    import jax
    import jax.numpy as jnp

    from . import generate as gen

    if (
        audio_path
        and cfg.splice_mode == "inplace"
        and cfg.audio_start_token not in prompt
    ):
        # In-place splice inserts the audio block at the <audio> placeholder;
        # mirror the training-side dataset insertion so generation sees the
        # same delimiter-bracketed layout it was trained on.
        prompt = f"{cfg.audio_start_token}{cfg.audio_end_token} {prompt}"

    ids, mask = tokenizer.encode(prompt)
    input_ids = jnp.asarray(ids[None, :], jnp.int32)
    attention_mask = jnp.asarray(mask[None, :], jnp.int32)

    audio = None
    if audio_path:
        audio = jnp.asarray(process_audio(audio_path, cfg.mel))

    if draft is not None:
        from .speculative import generate_speculative

        draft_params, draft_cfg = draft
        res = generate_speculative(
            frozen, draft_params, trainable, cfg, draft_cfg,
            input_ids, attention_mask, audio,
            jax.random.PRNGKey(seed),
            max_new_tokens=max_new_tokens, gamma=gamma,
            eos_id=tokenizer.eos_id, pad_id=tokenizer.pad_id,
            audio_start_id=tokenizer.token_to_id(cfg.audio_start_token),
            audio_end_id=tokenizer.token_to_id(cfg.audio_end_token),
            has_audio=audio is not None, greedy=greedy,
            temperature=temperature, top_p=top_p, top_k=top_k,
            kv_quant=kv_quant,
        )
        logger.info(
            "speculative: %d/%d drafts accepted over %d verify rounds",
            int(res.num_accepted), int(res.num_drafted),
            int(res.num_target_calls),
        )
        tokens = np.asarray(res.tokens[0])[: int(res.num_generated[0])]
        return tokenizer.decode(tokens, skip_special_tokens=True)

    result = gen.generate(
        frozen,
        trainable,
        cfg,
        input_ids,
        attention_mask,
        audio,
        jax.random.PRNGKey(seed),
        max_new_tokens=max_new_tokens,
        temperature=temperature,
        top_p=top_p,
        top_k=top_k,
        greedy=greedy,
        eos_id=tokenizer.eos_id,
        pad_id=tokenizer.pad_id,
        audio_start_id=tokenizer.token_to_id(cfg.audio_start_token),
        audio_end_id=tokenizer.token_to_id(cfg.audio_end_token),
        has_audio=audio is not None,
        kv_quant=kv_quant,
        attn_impl=decode_impl,
    )
    tokens = np.asarray(result.tokens[0])[: int(result.num_generated[0])]
    return tokenizer.decode(tokens, skip_special_tokens=True)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="AudioLLM inference (TPU-native)")
    # reference CLI flags (src/inference.py:176-194)
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--llama_path", type=str, default=None)
    p.add_argument("--whisper_path", type=str, default=None)
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--audio", type=str, default=None)
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top_p", type=float, default=0.9)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--toy_model", action="store_true")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax backend, e.g. 'cpu'")
    p.add_argument(
        "--kv_quant", action="store_true",
        help="quantized KV cache during generation (int8 by default; pairs "
             "with --int8_decoder/--int4_decoder for max decode throughput)",
    )
    p.add_argument(
        "--kv_bits", type=int, default=8, choices=[8, 4],
        help="KV-cache precision with --kv_quant: int8 rows or nibble-"
             "packed int4 rows (quarter cache HBM; validate WER first)",
    )
    p.add_argument(
        "--int4_decoder", action="store_true",
        help="weight-only int4 (W4A16) frozen decoder — halves the weight "
             "stream vs --int8_decoder (Pallas dequant kernel, models/"
             "llama_int4.py); validate WER first",
    )
    p.add_argument(
        "--rotate", action="store_true",
        help="QuaRot residual-stream rotation before decoder quantization "
             "(models/llama_rotate.py; exact transform, spreads outlier "
             "channels across int4/int8 scale groups)",
    )
    p.add_argument(
        "--int8_decoder", action="store_true",
        help="weight-only int8 frozen Llama (halves decode HBM traffic; "
             "models/llama_int8.py). LoRA deltas are merged into the bf16 "
             "weights first so serving sees zero LoRA overhead.",
    )
    p.add_argument(
        "--draft_llama_path", type=str, default=None,
        help="HF dir of a small text Llama sharing the tokenizer: enables "
             "speculative decoding (draft-and-verify; identical output "
             "distribution, fewer target forwards). 'toy' = random tiny "
             "draft for offline smoke runs.",
    )
    p.add_argument(
        "--gamma", type=int, default=4,
        help="speculative decoding: draft tokens proposed per verify round",
    )
    p.add_argument(
        "--decode_impl", type=str, default="auto",
        choices=["auto", "decode_kernel", "decode_packed"],
        help="decode-step attention kernel (TPU): double-buffered "
             "(decode_kernel, the auto default) or head-packed chunked "
             "(decode_packed; wins at small batch — KERNELS.md §3)",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=logging.INFO)
    cfg, frozen, trainable, tk = load_audio_llm(
        args.checkpoint_path,
        llama_path=args.llama_path,
        whisper_path=args.whisper_path,
        tokenizer=args.tokenizer,
        toy_model=args.toy_model,
        seed=args.seed,
    )
    if args.int8_decoder or args.int4_decoder:
        from ..models import llama_int8 as l8
        from ..models import lora as lora_mod

        if cfg.lora is not None and "lora" in trainable:
            frozen = dict(frozen)
            frozen["llama"] = lora_mod.merge_into_llama(
                frozen["llama"],
                lora_mod.with_scaling(trainable["lora"], cfg.lora),
            )
            trainable = {k: v for k, v in trainable.items() if k != "lora"}
        llama_tree = frozen["llama"]
        if args.rotate:
            import jax

            from ..models import llama_rotate as rt

            # LoRA was merged above, so only the base tree rotates
            llama_tree = rt.rotate_llama(
                llama_tree, cfg.llama, jax.random.PRNGKey(7)
            )
        frozen = dict(frozen)
        if args.int4_decoder:
            from ..models import llama_int4 as l4

            frozen["llama"] = l4.quantize_llama_int4(llama_tree)
        else:
            frozen["llama"] = l8.quantize_llama(llama_tree)
    draft = None
    if args.draft_llama_path:
        draft = load_draft_llama(
            args.draft_llama_path, cfg.llama.vocab_size, seed=args.seed
        )
    text = generate_response(
        cfg, frozen, trainable, tk,
        prompt=args.prompt,
        audio_path=args.audio,
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        top_p=args.top_p,
        top_k=args.top_k,
        greedy=args.greedy,
        seed=args.seed,
        kv_quant=(4 if args.kv_bits == 4 else True) if args.kv_quant else False,
        draft=draft,
        gamma=args.gamma,
        decode_impl=args.decode_impl,
    )
    print(text)
    return text


if __name__ == "__main__":
    main()
