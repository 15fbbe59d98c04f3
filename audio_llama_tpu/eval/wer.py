"""Word-error-rate evaluation harness.

The reference repo never measured WER (old/eval.py:1-33 is dead pseudocode;
README.md:84-88 'TODO'); BASELINE.md demands it measured on LibriSpeech. This
harness runs batched greedy transcription through the jitted generate path
and scores hypothesis vs reference transcripts with standard WER (Levenshtein
over words after Whisper-style text normalization).

CLI:
  python -m audio_llama_tpu.eval.wer --checkpoint_path ckpt \
      --data_path corpus/examples.json --audio_dir corpus/audio --limit 100
"""

from __future__ import annotations

import argparse
import json
import logging
import re
import string
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger("audio_llama_tpu")


# ---------------------------------------------------------------------------
# Metric
# ---------------------------------------------------------------------------

def normalize_text(text: str) -> str:
    """Basic English normalization: lowercase, strip punctuation, collapse
    whitespace (the standard preprocessing before WER on LibriSpeech)."""
    text = text.lower()
    text = text.translate(str.maketrans("", "", string.punctuation))
    return re.sub(r"\s+", " ", text).strip()


def edit_distance(ref: Sequence[str], hyp: Sequence[str]) -> int:
    """Word-level Levenshtein distance, O(len(ref)*len(hyp)) with two rows."""
    if not ref:
        return len(hyp)
    if not hyp:
        return len(ref)
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, 1):
        cur = [i] + [0] * len(hyp)
        for j, h in enumerate(hyp, 1):
            cur[j] = min(
                prev[j] + 1,  # deletion
                cur[j - 1] + 1,  # insertion
                prev[j - 1] + (r != h),  # substitution
            )
        prev = cur
    return prev[-1]


def word_error_rate(
    refs: Sequence[str], hyps: Sequence[str], normalize: bool = True
) -> Dict[str, float]:
    """Corpus-level WER: total edits / total reference words."""
    assert len(refs) == len(hyps), "refs/hyps length mismatch"
    edits = words = 0
    for r, h in zip(refs, hyps):
        if normalize:
            r, h = normalize_text(r), normalize_text(h)
        rw, hw = r.split(), h.split()
        edits += edit_distance(rw, hw)
        words += len(rw)
    return {
        "wer": edits / max(words, 1),
        "total_edits": float(edits),
        "total_words": float(words),
        "num_utterances": float(len(refs)),
    }


# ---------------------------------------------------------------------------
# Batched transcription
# ---------------------------------------------------------------------------

def transcribe_batch(
    cfg,
    frozen,
    trainable,
    tokenizer,
    prompts: List[str],
    audio: np.ndarray,  # [B, S]
    max_new_tokens: int = 128,
    seed: int = 0,
    pad_to: Optional[int] = None,
    kv_quant=False,
) -> List[str]:
    """Greedy batched decode; prompts are right-padded to a shared length.

    Pass pad_to (e.g. the corpus-wide max prompt length) so every batch hits
    ONE compiled program — per-batch max lengths would recompile each time.
    """
    import jax
    import jax.numpy as jnp

    from ..inference import generate as gen

    encs = [tokenizer.encode(p) for p in prompts]
    T = max(len(ids) for ids, _ in encs)
    if pad_to is not None:
        T = max(T, pad_to)
    ids = np.full((len(encs), T), tokenizer.pad_id, np.int32)
    mask = np.zeros((len(encs), T), np.int32)
    for i, (e, m) in enumerate(encs):
        ids[i, : len(e)] = e
        mask[i, : len(m)] = m

    result = gen.generate(
        frozen,
        trainable,
        cfg,
        jnp.asarray(ids),
        jnp.asarray(mask),
        jnp.asarray(audio, jnp.float32),
        jax.random.PRNGKey(seed),
        max_new_tokens=max_new_tokens,
        kv_quant=kv_quant,
        greedy=True,
        eos_id=tokenizer.eos_id,
        pad_id=tokenizer.pad_id,
        audio_start_id=tokenizer.token_to_id(cfg.audio_start_token),
        audio_end_id=tokenizer.token_to_id(cfg.audio_end_token),
        has_audio=True,
    )
    tokens = np.asarray(result.tokens)
    counts = np.asarray(result.num_generated)
    return [
        tokenizer.decode(tokens[i, : counts[i]], skip_special_tokens=True)
        for i in range(len(encs))
    ]


def evaluate_wer(
    cfg,
    frozen,
    trainable,
    tokenizer,
    entries: List[dict],
    audio_dir: str,
    batch_size: int = 8,
    max_new_tokens: int = 128,
    prompt_override: Optional[str] = None,
    audio_key: str = "audio_paths",
    text_key: str = "text",
    response_key: str = "response",
    kv_quant=False,
) -> Dict[str, float]:
    """Transcribe every entry (batched, fixed shapes) and score corpus WER.

    The final ragged batch is padded by repeating the last item (extra rows
    are dropped before scoring) so one compiled program serves all batches.
    """
    from ..inference.cli import process_audio

    refs: List[str] = []
    hyps: List[str] = []
    n = len(entries)
    # Corpus-wide prompt pad length => one compiled generate program.
    all_prompts = [
        prompt_override or e.get(text_key) or "Please transcribe this audio."
        for e in entries
    ]
    pad_to = max(
        (len(tokenizer.encode(p)[0]) for p in all_prompts), default=8
    )
    for lo in range(0, n, batch_size):
        chunk = entries[lo : lo + batch_size]
        real = len(chunk)
        while len(chunk) < batch_size:
            chunk = chunk + [chunk[-1]]
        prompts = [
            prompt_override or e.get(text_key) or "Please transcribe this audio."
            for e in chunk
        ]
        audio = np.concatenate(
            [
                process_audio(_resolve(audio_dir, e[audio_key]), cfg.mel)
                for e in chunk
            ],
            axis=0,
        )
        texts = transcribe_batch(
            cfg, frozen, trainable, tokenizer, prompts, audio, max_new_tokens,
            pad_to=pad_to, kv_quant=kv_quant,
        )
        refs.extend(e[response_key] for e in chunk[:real])
        hyps.extend(texts[:real])
        logger.info("transcribed %d/%d", min(lo + batch_size, n), n)
    metrics = word_error_rate(refs, hyps)
    return metrics


def calib_mel_batch(cfg, entries: List[dict], audio_dir: str, n: int = 4,
                    audio_key: str = "audio_paths"):
    """Representative mel batch for int8-encoder SmoothQuant calibration
    (models/whisper_int8.py:quantize_encoder_smoothed): the first n eval
    clips through the production featurizer."""
    import jax
    import jax.numpy as jnp

    from ..inference.cli import process_audio
    from ..ops import mel as mel_ops

    audio = np.concatenate(
        [
            process_audio(_resolve(audio_dir, e[audio_key]), cfg.mel)
            for e in entries[: max(n, 1)]
        ],
        axis=0,
    )
    return jax.jit(lambda a: mel_ops.log_mel(a, cfg.mel))(
        jnp.asarray(audio, jnp.float32)
    )


def _resolve(audio_dir: str, rel) -> str:
    import os

    if isinstance(rel, (list, tuple)):
        rel = rel[0]
    p = os.path.join(audio_dir, rel)
    if os.path.exists(p):
        return p
    alt = os.path.join(audio_dir, "audio", rel)
    return alt if os.path.exists(alt) else p


def main(argv=None):
    p = argparse.ArgumentParser(description="LibriSpeech WER evaluation")
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--llama_path", type=str, default=None)
    p.add_argument("--whisper_path", type=str, default=None)
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--audio_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--prompt", type=str, default=None,
                   help="override per-entry instruction text")
    p.add_argument("--toy_model", action="store_true")
    p.add_argument("--int8_encoder", action="store_true",
                   help="evaluate with the W8A8 encoder (the command to run "
                        "before serving with bench --int8_encoder)")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--output", type=str, default=None, help="write metrics JSON here")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=logging.INFO)

    from ..inference.cli import load_audio_llm

    cfg, frozen, trainable, tk = load_audio_llm(
        args.checkpoint_path,
        llama_path=args.llama_path,
        whisper_path=args.whisper_path,
        tokenizer=args.tokenizer,
        toy_model=args.toy_model,
    )
    with open(args.data_path) as f:
        entries = json.load(f)
    if isinstance(entries, dict) and "examples" in entries:
        entries = entries["examples"]
    if args.limit:
        entries = entries[: args.limit]
    if args.int8_encoder:
        from ..models import whisper_int8 as w8

        frozen = dict(frozen)
        frozen["whisper"] = w8.quantize_encoder_smoothed(
            frozen["whisper"], cfg.whisper,
            calib_mel_batch(cfg, entries, args.audio_dir),
        )

    metrics = evaluate_wer(
        cfg, frozen, trainable, tk, entries, args.audio_dir,
        batch_size=args.batch_size, max_new_tokens=args.max_new_tokens,
        prompt_override=args.prompt,
    )
    print(json.dumps(metrics))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(metrics, f, indent=2)
    return metrics


if __name__ == "__main__":
    main()
