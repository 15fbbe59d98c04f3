"""WER metric unit tests + end-to-end harness run on the toy model."""

import json

import numpy as np
import pytest

from audio_llama_tpu.eval.wer import (
    edit_distance,
    evaluate_wer,
    normalize_text,
    word_error_rate,
)


def test_edit_distance():
    assert edit_distance([], []) == 0
    assert edit_distance(["a"], []) == 1
    assert edit_distance([], ["a", "b"]) == 2
    assert edit_distance("the cat sat".split(), "the cat sat".split()) == 0
    assert edit_distance("the cat sat".split(), "the bat sat".split()) == 1
    assert edit_distance("a b c".split(), "b c d".split()) == 2


def test_normalize_text():
    assert normalize_text("Hello, World!") == "hello world"
    assert normalize_text("  A   B\tC ") == "a b c"


def test_word_error_rate():
    m = word_error_rate(["the cat sat"], ["the cat sat"])
    assert m["wer"] == 0.0
    m = word_error_rate(["the cat sat on the mat"], ["the bat sat on mat"])
    # 1 substitution (cat->bat) + 1 deletion (the) over 6 ref words
    assert m["wer"] == pytest.approx(2 / 6)
    # punctuation/case insensitive by default
    m = word_error_rate(["Hello, world."], ["hello world"])
    assert m["wer"] == 0.0
    # corpus-level pooling: edits and words accumulate across utterances
    m = word_error_rate(["a b", "c d"], ["a b", "c x"])
    assert m["wer"] == pytest.approx(1 / 4)
    assert m["num_utterances"] == 2


def test_evaluate_wer_end_to_end(tmp_path):
    """Toy model transcribing noise: WER is garbage, but the harness must run
    batched with a ragged final batch and return well-formed metrics."""
    import jax

    from audio_llama_tpu.config import AudioLLMConfig
    from audio_llama_tpu.data.audio_io import write_wav
    from audio_llama_tpu.data.tokenizer import ByteTokenizer
    from audio_llama_tpu.models import allm

    cfg = AudioLLMConfig.tiny()
    tk = ByteTokenizer()
    cfg = cfg.replace(llama=cfg.llama.replace(vocab_size=max(tk.vocab_size, 384)))
    frozen = allm.init_frozen(cfg, jax.random.PRNGKey(0))
    trainable = allm.init_trainable(cfg, jax.random.PRNGKey(1))

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    rng = np.random.RandomState(0)
    entries = []
    for i in range(5):  # 5 items, batch 2 -> ragged final batch
        rel = f"x{i}.wav"
        write_wav(str(audio_dir / rel), (rng.randn(6000) * 0.1).astype(np.float32), 16000)
        entries.append({"audio_paths": rel, "text": "Transcribe: <audio>",
                        "response": f"reference text {i}"})

    metrics = evaluate_wer(
        cfg, frozen, trainable, tk, entries, str(audio_dir),
        batch_size=2, max_new_tokens=6,
    )
    assert metrics["num_utterances"] == 5
    assert metrics["total_words"] == 15
    assert np.isfinite(metrics["wer"]) and metrics["wer"] >= 0
