"""Minimal end-to-end example: load -> one audio file -> generate.

Reference: src/example.py:14-71 (load_audio_llm + process one clip +
generate_response with a fixed transcription prompt).

  python -m audio_llama_tpu.inference.example --checkpoint_path ckpt \
      --audio clip.flac
"""

from __future__ import annotations

import argparse
import logging

from .cli import generate_response, load_audio_llm

DEFAULT_PROMPT = "Please transcribe this audio: <audio>"


def main(argv=None):
    p = argparse.ArgumentParser(description="AudioLLM minimal example")
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--llama_path", type=str, default=None)
    p.add_argument("--whisper_path", type=str, default=None)
    p.add_argument("--audio", type=str, required=True)
    p.add_argument("--prompt", type=str, default=DEFAULT_PROMPT)
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--toy_model", action="store_true")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=logging.INFO)
    cfg, frozen, trainable, tk = load_audio_llm(
        args.checkpoint_path,
        llama_path=args.llama_path,
        whisper_path=args.whisper_path,
        toy_model=args.toy_model,
    )
    text = generate_response(
        cfg, frozen, trainable, tk,
        prompt=args.prompt,
        audio_path=args.audio,
        max_new_tokens=args.max_new_tokens,
        greedy=True,
    )
    print(text)
    return text


if __name__ == "__main__":
    main()
