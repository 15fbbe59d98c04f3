"""In-place embedding splice tests (splice_mode='inplace'): audio block lands
at the <audio> placeholder position, not prepended."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm
from audio_llama_tpu.models.allm import splice_inplace


def test_splice_positions_mask_labels():
    B, T, A, D = 2, 8, 3, 4
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    audio = jnp.asarray(rng.randn(B, A, D).astype(np.float32))
    START = 77
    ids = np.full((B, T), 5, np.int32)
    ids[0, 2] = START  # row 0: <audio> at position 2
    ids[1, 0] = START  # row 1: at position 0
    mask = np.ones((B, T), np.int32)
    mask[0, 6:] = 0  # row 0 padded from 6
    labels = np.full((B, T), 9, np.int32)

    emb, m, lab = splice_inplace(
        text, audio, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels), START
    )
    assert emb.shape == (B, T + A, D)
    # row 0: text[0..2], audio[0..2], text[3..]
    np.testing.assert_allclose(emb[0, :3], text[0, :3])
    np.testing.assert_allclose(emb[0, 3:6], audio[0])
    np.testing.assert_allclose(emb[0, 6:], text[0, 3:])
    # mask: audio positions are 1; shifted text pads stay 0
    assert m[0, 3:6].tolist() == [1, 1, 1]
    assert m[0].tolist() == [1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0]
    # labels: audio positions ignored
    assert lab[0, 3:6].tolist() == [-100, -100, -100]
    assert lab[0, 0] == 9 and lab[0, 6] == 9
    # row 1: audio right after position 0
    np.testing.assert_allclose(emb[1, 0:1], text[1, 0:1])
    np.testing.assert_allclose(emb[1, 1:4], audio[1])
    np.testing.assert_allclose(emb[1, 4:], text[1, 1:])


def test_splice_without_placeholder_degrades_to_prepend():
    B, T, A, D = 1, 4, 2, 3
    rng = np.random.RandomState(1)
    text = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    audio = jnp.asarray(rng.randn(B, A, D).astype(np.float32))
    ids = jnp.full((B, T), 5, jnp.int32)  # no <audio> token anywhere
    mask = jnp.ones((B, T), jnp.int32)
    emb, m, _ = splice_inplace(text, audio, ids, mask, None, 77)
    np.testing.assert_allclose(emb[0, :A], audio[0])
    np.testing.assert_allclose(emb[0, A:], text[0])


def test_forward_inplace_mode_runs_and_differs_from_prepend():
    cfg = AudioLLMConfig.tiny()
    key = jax.random.PRNGKey(0)
    kf, kt = jax.random.split(key)
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    sid, eid = 260, 261
    rng = np.random.RandomState(0)
    T = 12
    ids = rng.randint(3, 250, (2, T)).astype(np.int32)
    ids[:, 4] = sid
    ids[:, 5] = eid
    batch = allm.AudioLLMBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((2, T), jnp.int32),
        audio_features=jnp.asarray(rng.randn(2, cfg.mel.max_samples), jnp.float32) * 0.1,
        labels=jnp.asarray(rng.randint(3, 250, (2, T)), jnp.int32),
    )
    loss_pre, logits_pre = allm.forward(
        frozen, trainable, cfg, batch, sid, eid, compute_dtype=jnp.float32
    )
    cfg_in = cfg.replace(splice_mode="inplace")
    loss_in, logits_in = allm.forward(
        frozen, trainable, cfg_in, batch, sid, eid, compute_dtype=jnp.float32
    )
    # both are [B, A+2+T, V] (inplace inserts A inside T which already holds
    # the two delimiters, prepend adds A+2 in front of T)
    assert logits_pre.shape[1] == cfg.audio_seq_len + 2 + T
    assert logits_in.shape[1] == T + cfg.audio_seq_len
    assert np.isfinite(float(loss_pre)) and np.isfinite(float(loss_in))
    assert abs(float(loss_pre) - float(loss_in)) > 1e-6  # genuinely different layout


def test_generate_honors_inplace_splice():
    """Generation must lay out audio the way the checkpoint was trained."""
    from audio_llama_tpu.inference import generate as gen

    cfg = AudioLLMConfig.tiny()
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    sid, eid = 260, 261
    rng = np.random.RandomState(0)
    T = 10
    ids = rng.randint(3, 250, (1, T)).astype(np.int32)
    ids[:, 3] = sid
    ids[:, 4] = eid
    ids = jnp.asarray(ids)
    mask = jnp.ones((1, T), jnp.int32)
    audio = jnp.asarray(rng.randn(1, cfg.mel.max_samples), jnp.float32) * 0.1
    static = dict(
        max_new_tokens=5, greedy=True, eos_id=-1, pad_id=0,
        audio_start_id=sid, audio_end_id=eid, compute_dtype=jnp.float32,
        has_audio=True,
    )
    key = jax.random.PRNGKey(0)
    cfg_in = cfg.replace(splice_mode="inplace")
    r_in = gen.generate(frozen, trainable, cfg_in, ids, mask, audio, key, **static)
    r_in2 = gen.generate(frozen, trainable, cfg_in, ids, mask, audio, key, **static)
    np.testing.assert_array_equal(np.asarray(r_in.tokens), np.asarray(r_in2.tokens))

    # build_prefix must actually produce the inplace layout: T + A positions
    # (audio inserted inside the prompt) vs prepend's A + 2 + T.
    A = cfg.audio_seq_len
    emb_in, mask_in = gen.build_prefix(
        frozen, trainable, cfg_in, ids, mask, audio, sid, eid, jnp.float32
    )
    assert emb_in.shape[1] == T + A
    emb_pre, _ = gen.build_prefix(
        frozen, trainable, cfg, ids, mask, audio, sid, eid, jnp.float32
    )
    assert emb_pre.shape[1] == A + 2 + T
    # audio block sits right after the <audio> token (position 3)
    from audio_llama_tpu.models import projector as proj_mod

    enc = allm.process_audio_features(frozen, cfg_in, audio, jnp.float32)
    audio_emb = proj_mod.project(trainable["projector"], enc, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(emb_in[:, 4 : 4 + A]), np.asarray(audio_emb), atol=1e-5
    )


def test_dataset_inserts_placeholder(tmp_path):
    """audio_placeholder=True prefixes '<audio></audio>' so the tokenized
    prompt carries the delimiter pair the in-place splice anchors on."""
    from audio_llama_tpu.data.audio_io import write_wav
    from audio_llama_tpu.data.dataset import AudioLLMDataset, DatasetConfig
    from audio_llama_tpu.data.tokenizer import load_tokenizer

    sr = 16000
    wav = np.sin(np.arange(sr) * 0.05).astype(np.float32)
    adir = tmp_path / "audio"
    adir.mkdir()
    write_wav(str(adir / "a.wav"), wav, sr)
    entries = [
        {"text": "Transcribe this.", "audio_paths": "a.wav", "response": "hi"},
        {"text": "Just text.", "response": "yo"},  # no audio: no placeholder
    ]
    tk = load_tokenizer("byte")
    cfg = DatasetConfig(
        text_max_length=64, max_audio_seconds=1.0, audio_placeholder=True
    )
    ds = AudioLLMDataset(entries, str(adir), tk, cfg)
    sid = tk.token_to_id("<audio>")
    eid = tk.token_to_id("</audio>")

    item = ds[0]
    ids = item["input_ids"].tolist()
    p = ids.index(sid)
    assert ids[p + 1] == eid  # adjacent pair: splice lands between them
    assert item["audio"] is not None

    item2 = ds[1]
    assert sid not in item2["input_ids"].tolist()


def test_train_generate_inplace_end_to_end(tmp_path):
    """VERDICT item 7 acceptance: --splice_mode inplace trains via the CLI
    (placeholder auto-inserted by the dataset) and the resulting checkpoint
    generates with the delimiter-bracketed in-place layout."""
    import json

    from audio_llama_tpu.data.audio_io import write_wav
    from audio_llama_tpu.inference.cli import generate_response, load_audio_llm
    from audio_llama_tpu.training.train import parse_args, train

    sr = 16000
    adir = tmp_path / "audio"
    adir.mkdir()
    rng = np.random.RandomState(0)
    entries = []
    for i in range(8):
        write_wav(str(adir / f"{i}.wav"), rng.randn(sr // 2).astype(np.float32) * 0.1, sr)
        entries.append(
            {"text": "Transcribe.", "audio_paths": f"{i}.wav", "response": f"t{i}"}
        )
    data = tmp_path / "examples.json"
    data.write_text(json.dumps(entries))

    out = str(tmp_path / "run")
    args = parse_args(
        [
            "--data_path", str(data), "--audio_dir", str(adir),
            "--output_dir", out,
            "--toy_model", "--tokenizer", "byte",
            "--batch_size", "2", "--eval_batch_size", "2",
            "--num_epochs", "1", "--max_steps", "2",
            "--log_steps", "1", "--eval_steps", "0", "--save_steps", "0",
            "--warmup_steps", "1", "--num_workers", "1", "--no_tensorboard",
            "--compute_dtype", "float32",
            "--splice_mode", "inplace",
        ]
    )
    res = train(args)
    ckpt_path = res["final_checkpoint"]

    cfg, frozen, trainable, tk = load_audio_llm(ckpt_path, toy_model=True)
    assert cfg.splice_mode == "inplace"  # survives the checkpoint round trip
    text = generate_response(
        cfg, frozen, trainable, tk,
        prompt="Transcribe.", audio_path=str(adir / "0.wav"),
        max_new_tokens=4, greedy=True,
    )
    assert isinstance(text, str)
