"""End-to-end training-driver tests: CLI flags -> data -> sharded jit steps ->
eval -> checkpoints -> resume, on the toy model + byte tokenizer (offline)."""

import json
import os

import numpy as np
import pytest

from audio_llama_tpu.data.audio_io import write_wav
from audio_llama_tpu.training.train import parse_args, train


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    audio_dir = root / "audio"
    audio_dir.mkdir()
    rng = np.random.RandomState(0)
    entries = []
    for i in range(12):
        rel = f"clip_{i}.wav"
        sr = 16000
        wav = (rng.randn(int(sr * 0.8)) * 0.05).astype(np.float32)
        write_wav(str(audio_dir / rel), wav, sr)
        entries.append(
            {
                "text": f"Transcribe clip {i}: <audio>",
                "audio_paths": rel,
                "response": f"this is clip number {i}",
            }
        )
    data_path = root / "examples.json"
    data_path.write_text(json.dumps(entries))
    return str(data_path), str(audio_dir), str(root)


def _args(corpus, out, extra=()):
    data_path, audio_dir, _ = corpus
    return parse_args(
        [
            "--data_path", data_path,
            "--audio_dir", audio_dir,
            "--output_dir", out,
            "--toy_model", "--tokenizer", "byte",
            "--batch_size", "2", "--eval_batch_size", "2",
            "--grad_accum_steps", "2",
            "--num_epochs", "1",
            "--log_steps", "1", "--eval_steps", "2", "--save_steps", "2",
            "--warmup_steps", "1",
            "--num_workers", "2",
            "--no_tensorboard",
            "--compute_dtype", "float32",
            *extra,
        ]
    )


def test_train_end_to_end(corpus, tmp_path):
    out = str(tmp_path / "run")
    result = train(_args(corpus, out))
    assert result["steps"] >= 2
    assert os.path.isdir(result["final_checkpoint"])
    assert os.path.exists(os.path.join(out, "training.log"))
    # metrics stream exists and has train + eval scalars
    lines = [
        json.loads(l)
        for l in open(os.path.join(out, "metrics.jsonl"))
        if l.strip()
    ]
    keys = set().union(*(l.keys() for l in lines))
    assert "train/loss" in keys and "eval/loss" in keys
    assert "perf/tokens_per_sec" in keys
    # best checkpoint written on eval improvement
    assert os.path.isdir(os.path.join(out, "best_model"))
    losses = [l["train/loss"] for l in lines if "train/loss" in l]
    assert all(np.isfinite(losses))


def test_training_is_deterministic(corpus, tmp_path):
    """Same seed -> bit-identical loss trajectory (the jit-level determinism
    guarantee SURVEY.md §5 calls for in place of race detection)."""
    import json as _json

    losses = []
    for run in ("a", "b"):
        out = str(tmp_path / run)
        train(_args(corpus, out, ["--max_steps", "3", "--eval_steps", "0"]))
        lines = [
            _json.loads(l)
            for l in open(os.path.join(out, "metrics.jsonl"))
            if l.strip()
        ]
        losses.append([l["train/loss"] for l in lines if "train/loss" in l])
    assert losses[0] == losses[1]


def test_resume_from_checkpoint(corpus, tmp_path):
    out1 = str(tmp_path / "run1")
    r1 = train(_args(corpus, out1, ["--max_steps", "2", "--eval_steps", "0"]))
    assert r1["steps"] == 2
    out2 = str(tmp_path / "run2")
    r2 = train(
        _args(
            corpus,
            out2,
            [
                "--resume_from", r1["final_checkpoint"],
                "--max_steps", "3", "--eval_steps", "0",
            ],
        )
    )
    assert r2["steps"] == 3  # continued from step 2, ran 1 more


def test_group_by_modality_keeps_audio():
    """Round-1 advisor bug: a text-only microbatch in an accumulation group
    silently discarded the audio of its groupmates. Groups must now be
    modality-uniform."""
    import numpy as np
    import pytest
    from audio_llama_tpu.training.train import _to_batch, group_by_modality

    def mk(has_audio, tag):
        return {
            "input_ids": np.full((2, 4), tag, np.int32),
            "attention_mask": np.ones((2, 4), np.int32),
            "audio": np.ones((2, 8), np.float32) * tag if has_audio else None,
            "labels": np.ones((2, 4), np.int32),
        }

    # audio, text, audio, text, audio, audio -> one text group never fills,
    # two audio pairs
    stream = [mk(True, 1), mk(False, 2), mk(True, 3), mk(False, 4),
              mk(True, 5), mk(True, 6)]
    groups = list(group_by_modality(stream, accum=2))
    audio_groups = [g for g in groups if g.audio_features is not None]
    text_groups = [g for g in groups if g.audio_features is None]
    assert len(audio_groups) == 2 and len(text_groups) == 1
    for g in audio_groups:
        assert g.audio_features.shape == (2, 2, 8)  # [accum, B, ...]

    with pytest.raises(ValueError, match="mixes audio"):
        _to_batch([mk(True, 1), mk(False, 2)])
