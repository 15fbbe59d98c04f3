"""End-to-end inference CLI tests: trained toy checkpoint -> load -> audio ->
generated text (the reference example.py flow, fully offline)."""

import json
import os

import numpy as np
import pytest

from audio_llama_tpu.data.audio_io import write_wav
from audio_llama_tpu.inference.cli import (
    generate_response,
    load_audio_llm,
    main as cli_main,
)
from audio_llama_tpu.training.train import parse_args, train


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("inf")
    audio_dir = root / "audio"
    audio_dir.mkdir()
    rng = np.random.RandomState(0)
    entries = []
    for i in range(6):
        rel = f"c{i}.wav"
        write_wav(str(audio_dir / rel), (rng.randn(8000) * 0.05).astype(np.float32), 16000)
        entries.append({"text": "Transcribe: <audio>", "audio_paths": rel,
                        "response": f"clip {i}"})
    data = root / "ex.json"
    data.write_text(json.dumps(entries))
    out = str(root / "run")
    res = train(parse_args([
        "--data_path", str(data), "--audio_dir", str(audio_dir),
        "--output_dir", out, "--toy_model", "--tokenizer", "byte",
        "--batch_size", "2", "--grad_accum_steps", "1", "--num_epochs", "1",
        "--max_steps", "2", "--eval_steps", "0", "--save_steps", "0",
        "--log_steps", "1", "--no_tensorboard", "--compute_dtype", "float32",
        "--num_workers", "1",
    ]))
    return res["final_checkpoint"], str(audio_dir / "c0.wav")


def test_generate_from_checkpoint(trained):
    ckpt_path, wav = trained
    cfg, frozen, trainable, tk = load_audio_llm(ckpt_path, toy_model=True)
    text = generate_response(
        cfg, frozen, trainable, tk,
        prompt="Transcribe: <audio>",
        audio_path=wav,
        max_new_tokens=8,
        greedy=True,
    )
    assert isinstance(text, str)  # toy model => gibberish, but the path runs


def test_generate_text_only(trained):
    ckpt_path, _ = trained
    cfg, frozen, trainable, tk = load_audio_llm(ckpt_path, toy_model=True)
    t1 = generate_response(cfg, frozen, trainable, tk, prompt="hello",
                           max_new_tokens=8, greedy=True)
    t2 = generate_response(cfg, frozen, trainable, tk, prompt="hello",
                           max_new_tokens=8, greedy=True)
    assert t1 == t2  # greedy decode is deterministic


def test_cli_speculative_matches_plain_greedy(trained):
    """--draft_llama_path toy routes through speculative decoding; greedy
    output must be IDENTICAL to the plain greedy path (losslessness at the
    CLI surface, audio and text-only)."""
    ckpt_path, wav = trained
    cfg, frozen, trainable, tk = load_audio_llm(ckpt_path, toy_model=True)
    from audio_llama_tpu.inference.cli import load_draft_llama

    draft = load_draft_llama("toy", cfg.llama.vocab_size, seed=0)
    for audio in (None, wav):
        plain = generate_response(
            cfg, frozen, trainable, tk, prompt="Transcribe: <audio>",
            audio_path=audio, max_new_tokens=8, greedy=True,
        )
        spec = generate_response(
            cfg, frozen, trainable, tk, prompt="Transcribe: <audio>",
            audio_path=audio, max_new_tokens=8, greedy=True,
            draft=draft, gamma=3,
        )
        assert spec == plain


def test_cli_speculative_kv_quant_composes(trained):
    """Speculative decoding composes with the int8 KV cache at the CLI
    surface: greedy output identical to the plain greedy kv_quant path."""
    ckpt_path, _ = trained
    cfg, frozen, trainable, tk = load_audio_llm(ckpt_path, toy_model=True)
    from audio_llama_tpu.inference.cli import load_draft_llama

    draft = load_draft_llama("toy", cfg.llama.vocab_size)
    plain = generate_response(
        cfg, frozen, trainable, tk, prompt="x", max_new_tokens=4,
        greedy=True, kv_quant=True,
    )
    spec = generate_response(
        cfg, frozen, trainable, tk, prompt="x", max_new_tokens=4,
        greedy=True, draft=draft, kv_quant=True,
    )
    assert spec == plain


def test_cli_main(trained, capsys):
    ckpt_path, wav = trained
    out = cli_main([
        "--checkpoint_path", ckpt_path, "--toy_model",
        "--prompt", "Transcribe: <audio>", "--audio", wav,
        "--max_new_tokens", "4", "--greedy",
    ])
    assert isinstance(out, str)
    assert out in capsys.readouterr().out
