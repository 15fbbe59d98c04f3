"""AudioLLM: frozen Whisper encoder + projector + frozen Llama with LoRA.

The composite model of the reference (`AudioLLM`, src/models/allm.py:8-348),
re-designed as pure functions over two pytrees:

    frozen    = {"llama": ..., "whisper": ...}          (bf16, no gradients)
    trainable = {"projector": ..., "lora": ...}         (f32 masters)

Pipeline per batch (reference call stack SURVEY.md §3.2):

    mel [B, n_mels, 3000]
      -> whisper.encode (stop_gradient)          [B, A, d_whisper]
      -> projector.project                        [B, A, d_llama]
      -> splice: <audio> ++ audio ++ </audio> ++ text-embeds
      -> mask extension + label -100 padding
      -> llama_forward(inputs_embeds=..., lora=...) -> logits, loss

Splice semantics: the reference's code PREPENDS the audio block before all
text regardless of where the <audio> placeholder sits in the prompt
(reference src/models/allm.py:156-170 — its docstring claims in-place splice
but the code prepends; SURVEY.md §2 'Embedding splice'). `splice_mode=
'prepend'` reproduces that; everything is static-shape so XLA never sees a
dynamic sequence length.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import AudioLLMConfig
from ..ops import mel as mel_ops
from . import llama as llama_mod
from . import lora as lora_mod
from . import projector as proj_mod
from . import whisper as whisper_mod

IGNORE_INDEX = -100


class AudioLLMBatch(NamedTuple):
    """One training batch (all static shapes; collate pads to these)."""

    input_ids: jnp.ndarray  # [B, T] int32 — prompt/instruction tokens
    attention_mask: jnp.ndarray  # [B, T] int32 1=real
    audio_features: Optional[jnp.ndarray]  # [B, n_mels, F_mel] or None
    labels: jnp.ndarray  # [B, T] int32, -100 = ignored


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_trainable(cfg: AudioLLMConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """The trainable pytree: projector + (optional) LoRA — exactly the set the
    reference returns from get_trainable_params (src/models/allm.py:244-249)."""
    kp, kl = jax.random.split(key)
    trainable = {"projector": proj_mod.init_params(cfg.projector, kp, dtype)}
    if cfg.lora is not None:
        trainable["lora"] = lora_mod.init_params(cfg.llama, cfg.lora, kl, dtype)
    return trainable


def init_frozen(
    cfg: AudioLLMConfig, key: jax.Array, dtype=jnp.bfloat16,
    outlier_scale: float = 0.0,
    outlier_targets: tuple = ("whisper",),
) -> dict:
    """Random frozen base (tests / benchmarks). Production: models.hf_loader.

    outlier_scale > 0 injects the heavy-tailed outlier-channel structure of
    real trained checkpoints (models/outliers.py) — the hard regime for the
    quantization accuracy gates. Deterministic in (key, scale, targets), so
    a trainer and a later inference load reconstruct identical frozen trees.

    outlier_targets defaults to whisper-only: that is the TRAINABLE regime
    — the projector/LoRA learn against the outlier-bearing frozen encoder,
    exactly as they would against a real Whisper checkpoint. Post-hoc
    injection into a RANDOM llama breaks the LM substrate itself (measured:
    the toy pipeline plateaus at loss ~3.3 / WER 1.0 — real models function
    with outliers only because training co-adapted everything around them),
    so llama injection is reserved for the no-training logit-KL gates
    (pass outlier_targets=("whisper", "llama"))."""
    k1, k2 = jax.random.split(key)
    frozen = {
        "llama": llama_mod.init_params(cfg.llama, k1, dtype),
        "whisper": whisper_mod.init_params(cfg.whisper, k2, dtype),
    }
    if outlier_scale:
        from . import outliers

        if "llama" in outlier_targets:
            frozen["llama"] = outliers.inject_llama_outliers(
                frozen["llama"], jax.random.fold_in(k1, 1),
                scale=outlier_scale,
            )
        if "whisper" in outlier_targets:
            frozen["whisper"] = outliers.inject_whisper_outliers(
                frozen["whisper"], jax.random.fold_in(k2, 1),
                scale=outlier_scale,
            )
    return frozen


def num_trainable_params(trainable: dict) -> int:
    leaves = [x for x in jax.tree.leaves(trainable) if hasattr(x, "size")]
    return int(sum(x.size for x in leaves))


# ---------------------------------------------------------------------------
# Audio path
# ---------------------------------------------------------------------------

def process_audio_features(
    frozen: dict, cfg: AudioLLMConfig, audio: jnp.ndarray, compute_dtype=jnp.bfloat16,
    *, enc_attn_impl: str = "auto", mel_impl: str = "auto",
) -> jnp.ndarray:
    """Frozen audio path under stop_gradient — the JAX analog of the
    reference's `with torch.no_grad()` (src/models/allm.py:214-219).

    Accepts either raw waveforms [B, S] (the default data-layer contract —
    log-mel then runs ON-DEVICE, fused into this jitted program) or
    precomputed mels [B, n_mels, F] / [B, 1, n_mels, F] (reference-style
    host featurization).

    Long audio: waveforms longer than one Whisper window (cfg.mel.max_samples,
    30 s) are encoded as N consecutive windows — [B, N*S] -> windows folded
    into the batch axis for mel+encoder, then unfolded to [B, N*A, d] encoder
    frames (the BASELINE.json stretch config's chunked encoding). S must
    divide the waveform length; the data layer pads to whole windows.
    """
    if audio.ndim == 2:  # waveform -> on-device log-mel
        from ..ops import mel_pallas

        S = cfg.mel.max_samples
        B, total = audio.shape
        n_windows = 1
        if total > S:
            if total % S != 0:
                raise ValueError(
                    f"long audio length {total} must be a multiple of the "
                    f"{S}-sample window (pad on the host)"
                )
            n_windows = total // S
            audio = audio.reshape(B * n_windows, S)
        if mel_impl == "auto":
            use_pallas, mel_interp = mel_pallas.should_use(cfg.mel), False
        elif mel_impl in ("pallas", "pallas_interpret"):
            use_pallas, mel_interp = True, mel_impl == "pallas_interpret"
        else:  # 'xla'
            use_pallas, mel_interp = False, False
        if use_pallas:
            mel = mel_pallas.log_mel(audio, cfg.mel, interpret=mel_interp)
        else:
            mel = mel_ops.log_mel(audio, cfg.mel)
        if n_windows > 1:
            enc = _encode(
                frozen["whisper"], cfg.whisper, mel, compute_dtype,
                enc_attn_impl,
            )
            enc = enc.reshape(B, n_windows * enc.shape[1], enc.shape[2])
            return jax.lax.stop_gradient(enc)
    elif audio.ndim == 4:  # tolerate a [B, 1, n_mels, F] channel dim like the ref
        mel = audio.squeeze(1)
    else:
        mel = audio
    enc = _encode(frozen["whisper"], cfg.whisper, mel, compute_dtype, enc_attn_impl)
    return jax.lax.stop_gradient(enc)


def _encode(wparams: dict, wcfg, mel, compute_dtype, attn_impl: str = "auto"):
    """Dispatch to the W8A8 encoder when the params were quantized
    (models.whisper_int8.quantize_encoder), else the bf16 encoder."""
    if "w_q" in wparams["layers"]["q_proj"]:
        from . import whisper_int8 as w8

        return w8.encode_int8(wparams, wcfg, mel, compute_dtype, attn_impl)
    return whisper_mod.encode(wparams, wcfg, mel, compute_dtype, attn_impl)


def combine_text_and_audio_embeddings(
    frozen: dict,
    trainable: dict,
    cfg: AudioLLMConfig,
    input_ids: jnp.ndarray,  # [B, T]
    attention_mask: jnp.ndarray,  # [B, T]
    audio_embeds: jnp.ndarray,  # [B, A, d_llama] — already projected
    audio_start_id: int,
    audio_end_id: int,
    compute_dtype=jnp.bfloat16,
):
    """Build (combined_embeds [B, A+2+T, D], combined_mask [B, A+2+T]).

    Reference: _combine_text_and_audio_embeddings + _extend_attention_mask
    (src/models/allm.py:109-196). Delimiter ids must be valid rows of the
    (resized) embedding table — validated at trace time against the table
    shape, mirroring the reference's ValueError (src/models/allm.py:140-141).
    """
    vocab = frozen["llama"]["embed"]["weight"].shape[0]
    if audio_start_id >= vocab or audio_end_id >= vocab:
        raise ValueError(
            f"audio delimiter ids ({audio_start_id}, {audio_end_id}) out of "
            f"range for embedding table of size {vocab} — did you forget "
            "resize_embeddings?"
        )
    B, A = audio_embeds.shape[0], audio_embeds.shape[1]
    text_embeds = llama_mod.embed_tokens(frozen["llama"], input_ids, compute_dtype)
    delim = llama_mod.embed_tokens(
        frozen["llama"],
        jnp.asarray([[audio_start_id, audio_end_id]], jnp.int32),
        compute_dtype,
    )  # [1, 2, D]
    start = jnp.broadcast_to(delim[:, 0:1], (B, 1, text_embeds.shape[-1]))
    end = jnp.broadcast_to(delim[:, 1:2], (B, 1, text_embeds.shape[-1]))
    combined = jnp.concatenate(
        [start, audio_embeds.astype(compute_dtype), end, text_embeds], axis=1
    )
    ones = jnp.ones((B, A + 2), attention_mask.dtype)
    combined_mask = jnp.concatenate([ones, attention_mask], axis=1)
    return combined, combined_mask


def splice_inplace(
    text_embeds: jnp.ndarray,  # [B, T, D]
    audio_embeds: jnp.ndarray,  # [B, A, D]
    input_ids: jnp.ndarray,  # [B, T]
    attention_mask: jnp.ndarray,  # [B, T]
    labels: Optional[jnp.ndarray],  # [B, T] or None
    audio_start_id: int,
):
    """In-place splice: insert the audio block right AFTER the first
    `<audio>` token, shifting the rest of the text (so `</audio>`, which the
    prompt already contains, ends up closing the block).

    This is the behavior the reference's docstring CLAIMS
    (src/models/allm.py:109-127) but its code never does — it always prepends
    (SURVEY.md §2 'Embedding splice'). Implemented as a static-shape
    vectorized gather (output [B, T+A, ...]): per output position j,
      j <= p        -> text[j]
      p < j <= p+A  -> audio[j-p-1]
      j > p+A       -> text[j-A]
    where p is the per-row `<audio>` position (rows without the token place
    audio at the front, i.e. degrade to prepend).

    Returns (embeds [B, T+A, D], mask [B, T+A], labels [B, T+A] | None).
    Audio positions are mask=1 and label=-100.
    """
    B, T, D = text_embeds.shape
    A = audio_embeds.shape[1]
    is_start = input_ids == audio_start_id
    has = jnp.any(is_start, axis=1)
    p = jnp.where(has, jnp.argmax(is_start, axis=1), -1)[:, None]  # [B, 1]

    j = jnp.arange(T + A)[None, :]  # [1, T+A]
    in_text_before = j <= p
    in_audio = (~in_text_before) & (j <= p + A)
    text_idx = jnp.where(in_text_before, j, j - A)
    text_idx = jnp.clip(text_idx, 0, T - 1)
    audio_idx = jnp.clip(j - p - 1, 0, A - 1)

    gathered_text = jnp.take_along_axis(text_embeds, text_idx[..., None], axis=1)
    gathered_audio = jnp.take_along_axis(
        audio_embeds.astype(text_embeds.dtype), audio_idx[..., None], axis=1
    )
    embeds = jnp.where(in_audio[..., None], gathered_audio, gathered_text)

    text_mask = jnp.take_along_axis(attention_mask, text_idx, axis=1)
    mask = jnp.where(in_audio, 1, text_mask).astype(attention_mask.dtype)

    out_labels = None
    if labels is not None:
        text_labels = jnp.take_along_axis(labels, text_idx, axis=1)
        out_labels = jnp.where(in_audio, IGNORE_INDEX, text_labels)
    return embeds, mask, out_labels


def extend_labels(labels: jnp.ndarray, audio_block_len: int) -> jnp.ndarray:
    """Prepend -100 over the audio block so those positions are loss-masked
    (reference src/models/allm.py:85-91)."""
    B = labels.shape[0]
    pad = jnp.full((B, audio_block_len), IGNORE_INDEX, labels.dtype)
    return jnp.concatenate([pad, labels], axis=1)


# ---------------------------------------------------------------------------
# Forward (+ loss)
# ---------------------------------------------------------------------------

def forward(
    frozen: dict,
    trainable: dict,
    cfg: AudioLLMConfig,
    batch: AudioLLMBatch,
    audio_start_id: int,
    audio_end_id: int,
    compute_dtype=jnp.bfloat16,
    loss_chunk_size: int = 0,
    remat: bool = False,
    attn_impl: str = "auto",
    enc_attn_impl: str = "auto",
    mel_impl: str = "auto",
):
    """Full multimodal forward. Returns (loss, logits [B, A+2+T, V]).

    With batch.audio_features=None this degenerates to a plain text LM step
    (the reference's text-only path, src/models/allm.py:93-96).

    loss_chunk_size > 0 computes the cross-entropy in sequence chunks without
    materializing the [B, T, V] logits (llama.causal_lm_loss_from_hidden —
    essential at 3B/128k-vocab scale); logits returned are then None.

    attn_impl / enc_attn_impl / mel_impl select the llama-attention,
    encoder-attention and featurizer implementations ('auto' = measured-best
    per backend; '*_interpret' variants let CPU-mesh tests run the real
    Pallas kernel paths — see ops/partitioning.py).
    """
    lora = trainable.get("lora")
    if lora is not None:
        lora = lora_mod.with_scaling(lora, cfg.lora)
    if batch.audio_features is None:
        if loss_chunk_size:
            _, _, hidden = llama_mod.llama_forward(
                frozen["llama"], cfg.llama,
                input_ids=batch.input_ids,
                attention_mask=batch.attention_mask,
                lora=lora, compute_dtype=compute_dtype, return_hidden=True,
                remat=remat, attn_impl=attn_impl,
            )
            loss = llama_mod.causal_lm_loss_from_hidden(
                frozen["llama"], cfg.llama, hidden, batch.labels,
                loss_chunk_size, compute_dtype,
            )
            return loss, None
        logits, _ = llama_mod.llama_forward(
            frozen["llama"],
            cfg.llama,
            input_ids=batch.input_ids,
            attention_mask=batch.attention_mask,
            lora=lora,
            compute_dtype=compute_dtype,
            remat=remat,
            attn_impl=attn_impl,
        )
        loss = llama_mod.causal_lm_loss(logits, batch.labels)
        return loss, logits

    enc = process_audio_features(
        frozen, cfg, batch.audio_features, compute_dtype,
        enc_attn_impl=enc_attn_impl, mel_impl=mel_impl,
    )
    audio_embeds = proj_mod.project(trainable["projector"], enc, compute_dtype)
    if cfg.splice_mode == "inplace":
        text_embeds = llama_mod.embed_tokens(
            frozen["llama"], batch.input_ids, compute_dtype
        )
        combined, combined_mask, labels = splice_inplace(
            text_embeds, audio_embeds, batch.input_ids, batch.attention_mask,
            batch.labels, audio_start_id,
        )
    else:  # 'prepend' — the reference's actual behavior
        combined, combined_mask = combine_text_and_audio_embeddings(
            frozen,
            trainable,
            cfg,
            batch.input_ids,
            batch.attention_mask,
            audio_embeds,
            audio_start_id,
            audio_end_id,
            compute_dtype,
        )
        labels = extend_labels(batch.labels, audio_embeds.shape[1] + 2)
    if loss_chunk_size:
        _, _, hidden = llama_mod.llama_forward(
            frozen["llama"], cfg.llama,
            inputs_embeds=combined, attention_mask=combined_mask,
            lora=lora, compute_dtype=compute_dtype, return_hidden=True,
            remat=remat, attn_impl=attn_impl,
        )
        loss = llama_mod.causal_lm_loss_from_hidden(
            frozen["llama"], cfg.llama, hidden, labels,
            loss_chunk_size, compute_dtype,
        )
        return loss, None
    logits, _ = llama_mod.llama_forward(
        frozen["llama"],
        cfg.llama,
        inputs_embeds=combined,
        attention_mask=combined_mask,
        lora=lora,
        compute_dtype=compute_dtype,
        remat=remat,
        attn_impl=attn_impl,
    )
    loss = llama_mod.causal_lm_loss(logits, labels)
    return loss, logits
