"""Corpus-builder tests on a synthetic LibriSpeech tree (FLAC via our native
encoder/decoder round-trip), plus integration into the training dataset."""

import json
import os

import numpy as np
import pytest

from audio_llama_tpu.data import librispeech as ls
from audio_llama_tpu.data.flac_write import write_flac


@pytest.fixture(scope="module")
def fake_extraction(tmp_path_factory):
    """extracted/LibriSpeech/dev-clean/{speaker}/{chapter}/ with trans.txt."""
    root = tmp_path_factory.mktemp("ls")
    rng = np.random.RandomState(0)
    base = root / "LibriSpeech" / "dev-clean"
    for spk in ("84", "174"):
        for ch in ("121123", "50561"):
            d = base / spk / ch
            d.mkdir(parents=True)
            lines = []
            for i in range(3):
                fid = f"{spk}-{ch}-{i:04d}"
                wav = (rng.randn(4000) * 0.05).astype(np.float32)
                write_flac(str(d / f"{fid}.flac"), wav, 16000)
                lines.append(f"{fid} HELLO WORLD SAMPLE {i} FROM SPEAKER {spk}")
            (d / f"{spk}-{ch}.trans.txt").write_text("\n".join(lines))
    return str(root)


def test_clean_text():
    assert ls.clean_text("HELLO WORLD. THIS IS A TEST") == "Hello world. This is a test"
    assert ls.clean_text("Already clean text") == "Already clean text"
    assert ls.clean_text("") == ""


def test_build_pipeline(fake_extraction, tmp_path):
    out = str(tmp_path / "corpus")
    examples = ls.build(
        out, ["dev-clean"], extract_dir=fake_extraction, limit=10, parallel=2
    )
    assert len(examples) == 10  # limited from 12
    # artifacts exist
    for f in ("metadata.json", "examples.json", "dataset_config.json", "dataset_stats.txt"):
        assert os.path.exists(os.path.join(out, f)), f
    meta = json.load(open(os.path.join(out, "metadata.json")))
    assert len(meta) == 12
    ex = examples[0]
    assert ex["text"] in ls.INSTRUCTION_TEMPLATES
    assert ex["response"].startswith("Hello world sample")
    # audio copied into the organized tree and decodable
    audio_path = os.path.join(out, "audio", ex["audio_paths"])
    assert os.path.exists(audio_path)
    from audio_llama_tpu.data.audio_io import load_audio

    wav = load_audio(audio_path, target_sr=16000)
    assert wav.shape[0] == 4000
    stats = open(os.path.join(out, "dataset_stats.txt")).read()
    assert "Total examples: 10" in stats and "dev-clean" in stats


def test_build_deterministic_with_seed(fake_extraction, tmp_path):
    e1 = ls.build(str(tmp_path / "a"), ["dev-clean"], extract_dir=fake_extraction,
                  limit=5, parallel=1, seed=7)
    e2 = ls.build(str(tmp_path / "b"), ["dev-clean"], extract_dir=fake_extraction,
                  limit=5, parallel=1, seed=7)
    assert [x["file_id"] for x in e1] == [x["file_id"] for x in e2]
    assert [x["text"] for x in e1] == [x["text"] for x in e2]


def test_corpus_feeds_training_dataset(fake_extraction, tmp_path):
    """examples.json + dataset_config.json -> AudioLLMDataset items."""
    out = str(tmp_path / "corpus")
    ls.build(out, ["dev-clean"], extract_dir=fake_extraction, parallel=1)
    from audio_llama_tpu.data.dataset import AudioLLMDataset, DatasetConfig
    from audio_llama_tpu.data.tokenizer import ByteTokenizer

    cfg = DatasetConfig.from_json_file(os.path.join(out, "dataset_config.json"))
    cfg.max_audio_seconds = 1.0
    entries = json.load(open(os.path.join(out, "examples.json")))
    ds = AudioLLMDataset(entries, os.path.join(out, "audio"), ByteTokenizer(), cfg)
    item = ds[0]
    assert item["audio"] is not None and item["audio"].shape == (16000,)
    assert (item["labels"] != -100).sum() > 0
