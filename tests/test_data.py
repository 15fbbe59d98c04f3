"""Data-layer tests: tokenizer, dataset semantics (key mapping, label modes,
missing-file policies), loader split/prefetch, collate — the analog of the
reference's test_dataset.py/test_dataloaders.py (SURVEY.md §4) with the
documented reference bugs asserted FIXED.
"""

import json
import os

import numpy as np
import pytest

from audio_llama_tpu.data import audio_io, flac_write
from audio_llama_tpu.data.dataset import AudioLLMDataset, DatasetConfig, collate
from audio_llama_tpu.data.loader import DataLoader, create_dataloaders, get_sample_batch
from audio_llama_tpu.data.tokenizer import (
    AUDIO_END_TOKEN,
    AUDIO_START_TOKEN,
    ByteTokenizer,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Tiny on-disk corpus: 6 FLAC clips + JSON entries (reference layout)."""
    root = tmp_path_factory.mktemp("corpus")
    audio_dir = root / "audio"
    audio_dir.mkdir()
    entries = []
    rng = np.random.default_rng(0)
    for i in range(6):
        rel = f"clip_{i}.flac"
        n = 16000 + i * 1000
        x = (rng.normal(0, 0.1, n) * 32767).clip(-32768, 32767).astype(np.int64)
        flac_write.write_flac(str(audio_dir / rel), x, 16000)
        entries.append(
            {
                "audio_paths": f"audio/{rel}",
                "text": f"What does clip {i} say? <audio>",
                "response": f"transcript number {i}",
            }
        )
    data_path = root / "examples.json"
    with open(data_path, "w") as f:
        json.dump(entries, f)
    return root, str(data_path), str(root), entries  # audio_dir root has audio/


@pytest.fixture
def dcfg():
    return DatasetConfig(text_max_length=32, max_audio_seconds=1.5)


def test_byte_tokenizer_roundtrip():
    tk = ByteTokenizer()
    ids, mask = tk.encode("hello <audio> world", max_length=64, pad_to_max=True)
    assert ids.shape == (64,)
    assert mask.sum() < 64
    assert tk.token_to_id(AUDIO_START_TOKEN) in ids.tolist()
    text = tk.decode(ids, skip_special_tokens=True)
    assert text == "hello  world"
    assert AUDIO_START_TOKEN in tk.decode(ids, skip_special_tokens=False)


def test_dataset_item_shapes(corpus, dcfg):
    root, data_path, audio_root, entries = corpus
    ds = AudioLLMDataset(entries, audio_root, ByteTokenizer(), dcfg)
    it = ds[0]
    assert it["input_ids"].shape == (32,)
    assert it["attention_mask"].shape == (32,)
    assert it["labels"].shape == (32,)
    assert it["audio"].shape == (int(1.5 * 16000),)
    assert it["audio"].dtype == np.float32


def test_dataset_key_mapping_is_honored(corpus, dcfg):
    """The reference stored key names but hardcoded defaults (src/dataset.py:
    35-37 vs 61-82) — ours must actually use them."""
    root, _, audio_root, entries = corpus
    remapped = [
        {"wav": e["audio_paths"], "prompt": e["text"], "answer": e["response"]}
        for e in entries
    ]
    cfg = DatasetConfig(
        audio_key="wav", text_key="prompt", response_key="answer",
        text_max_length=32, max_audio_seconds=1.5,
    )
    ds = AudioLLMDataset(remapped, audio_root, ByteTokenizer(), cfg)
    it = ds[0]
    assert it["audio"] is not None
    assert "clip 0" in it["text"]


def test_label_modes(corpus):
    root, _, audio_root, entries = corpus
    tk = ByteTokenizer()
    ref = AudioLLMDataset(
        entries, audio_root, tk,
        DatasetConfig(text_max_length=64, max_audio_seconds=1.0, label_mode="reference"),
    )[0]
    # reference mode: labels are response ids (padded with -100)
    resp_ids, resp_mask = tk.encode("transcript number 0", 64, pad_to_max=True)
    valid = resp_mask == 1
    np.testing.assert_array_equal(ref["labels"][valid], resp_ids[valid])

    cat = AudioLLMDataset(
        entries, audio_root, tk,
        DatasetConfig(text_max_length=64, max_audio_seconds=1.0, label_mode="concat"),
    )[0]
    # concat mode: prompt positions masked, response supervised, eos at end
    p_ids, _ = tk.encode(entries[0]["text"], 64, pad_to_max=False)
    assert (cat["labels"][: len(p_ids)] == -100).all()
    tail = cat["labels"][cat["labels"] != -100]
    assert tail[-1] == tk.eos_id
    # supervised ids appear in input_ids at the same positions
    sup = cat["labels"] != -100
    np.testing.assert_array_equal(cat["labels"][sup], cat["input_ids"][sup])


def test_missing_file_policies(corpus, dcfg):
    root, _, audio_root, entries = corpus
    bad = entries + [
        {"audio_paths": "audio/nope.flac", "text": "x", "response": "y"}
    ]
    # skip_missing_files drops it at init
    cfg = DatasetConfig(
        text_max_length=32, max_audio_seconds=1.0, skip_missing_files=True
    )
    ds = AudioLLMDataset(bad, audio_root, ByteTokenizer(), cfg)
    assert len(ds) == len(entries)
    # use_dummy_audio swallows it at getitem
    cfg2 = DatasetConfig(
        text_max_length=32, max_audio_seconds=1.0, use_dummy_audio_for_missing=True
    )
    ds2 = AudioLLMDataset(bad, audio_root, ByteTokenizer(), cfg2)
    it = ds2[len(entries)]
    assert (it["audio"] == 0).all()
    # default: item audio becomes None -> collate keeps the batch size STATIC
    # by substituting a loss-masked copy of a valid item (ragged batches
    # would break XLA's static shapes / dp divisibility)
    ds3 = AudioLLMDataset(bad, audio_root, ByteTokenizer(), dcfg)
    items = [ds3[i] for i in range(len(ds3))]
    batch = collate(items)
    assert batch["audio"].shape[0] == len(bad)
    assert (batch["labels"][-1] == -100).all()  # filler contributes no loss
    assert not (batch["labels"][0] == -100).all()


def test_audio_path_prefix_autofix(corpus, dcfg):
    """'audio/' prefix resolution both ways (reference src/dataset.py:171-176)."""
    root, _, audio_root, entries = corpus
    noprefix = [dict(e, audio_paths=e["audio_paths"][len("audio/") :]) for e in entries]
    ds = AudioLLMDataset(noprefix, audio_root, ByteTokenizer(), dcfg)
    assert ds[0]["audio"] is not None


def test_collate_raises_on_empty():
    with pytest.raises(ValueError):
        collate([])


def test_create_dataloaders_split_and_iter(corpus, dcfg):
    root, data_path, audio_root, entries = corpus
    train, val, cfg = create_dataloaders(
        data_path, audio_root, ByteTokenizer(), batch_size=2, val_split=0.2,
        seed=0, num_workers=2,
        dataset_config=dcfg,
    )
    assert len(train.dataset) == 5  # 6 entries, 1 val (max(1, 6*0.2)=1)...
    # NB: int(6*0.2)=1 -> 5 train / 1 val
    assert len(val.dataset) == 1
    batches = list(train)
    assert len(batches) == 2  # 5 // 2 = 2 (drop_last)
    b = batches[0]
    assert b["input_ids"].shape == (2, 32)
    assert b["audio"].shape == (2, int(1.5 * 16000))
    assert len(b["metadata"]) == 2
    # val loader keeps the remainder batch
    vbatches = list(val)
    assert len(vbatches) == 1
    assert vbatches[0]["input_ids"].shape[0] == 1


def test_loader_epoch_reshuffle(corpus, dcfg):
    root, data_path, audio_root, entries = corpus
    ds = AudioLLMDataset(entries, audio_root, ByteTokenizer(), dcfg)
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=1, num_workers=1)
    dl.set_epoch(0)
    o0 = [b["metadata"][0]["audio_path"] for b in dl]
    dl.set_epoch(1)
    o1 = [b["metadata"][0]["audio_path"] for b in dl]
    dl.set_epoch(0)
    o0b = [b["metadata"][0]["audio_path"] for b in dl]
    assert o0 == o0b
    assert o0 != o1


def test_get_sample_batch(corpus, dcfg):
    root, data_path, audio_root, entries = corpus
    train, _, _ = create_dataloaders(
        data_path, audio_root, ByteTokenizer(), batch_size=2,
        dataset_config=dcfg, num_workers=1,
    )
    b = get_sample_batch(train)
    assert set(b.keys()) >= {"input_ids", "attention_mask", "labels", "audio"}


def test_process_pool_loader_matches_threaded(corpus, dcfg):
    """worker_processes=N (round-3 VERDICT #6: scale host decode past one
    core) must yield bit-identical batches in identical order vs the
    threaded loader — same seeded shuffle, same collate."""
    root, data_path, audio_root, entries = corpus
    ds = AudioLLMDataset(entries, audio_root, ByteTokenizer(), dcfg)
    dl_t = DataLoader(ds, batch_size=2, shuffle=True, seed=1, num_workers=2)
    dl_p = DataLoader(
        ds, batch_size=2, shuffle=True, seed=1, worker_processes=2
    )
    bt, bp = list(dl_t), list(dl_p)
    assert len(bt) == len(bp) == 3
    for a, b in zip(bt, bp):
        assert a.keys() == b.keys()
        for k in ("input_ids", "attention_mask", "audio", "labels"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        assert [m["audio_path"] for m in a["metadata"]] == [
            m["audio_path"] for m in b["metadata"]
        ]


def test_process_pool_loader_multihost_slices(corpus, dcfg):
    """Process-pool building composes with multi-host loader shards: the two
    host slices of each global batch concatenate to the single-host batch."""
    root, data_path, audio_root, entries = corpus
    ds = AudioLLMDataset(entries, audio_root, ByteTokenizer(), dcfg)
    full = list(DataLoader(ds, batch_size=2, shuffle=True, seed=1))
    shard0 = list(DataLoader(
        ds, batch_size=2, shuffle=True, seed=1,
        process_index=0, process_count=2, worker_processes=2,
    ))
    shard1 = list(DataLoader(
        ds, batch_size=2, shuffle=True, seed=1,
        process_index=1, process_count=2, worker_processes=2,
    ))
    for f, a, b in zip(full, shard0, shard1):
        np.testing.assert_array_equal(
            f["input_ids"], np.concatenate([a["input_ids"], b["input_ids"]])
        )
