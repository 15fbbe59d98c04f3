"""The hardened quantization accuracy gate (round-3 VERDICT #1).

The round-3 gates scored a pure-tone corpus on clean Gaussian random
weights — the EASY case for every quantizer. This gate runs the regime
real checkpoints occupy:

  corpus   : synthetic formant SPEECH (data/synth_speech.py — 12-word
             vocabulary, word sequences, 4 speakers, SNR 15-30 dB noise,
             broadband spectral structure across the whole mel bank);
  weights  : outlier-channel injection (models/outliers.py) at scale 20 —
             the published magnitude regime (LLM.int8/SmoothQuant);
  training : the real trainer CLI with --toy_outliers (the projector/LoRA
             learn against the outlier-bearing frozen encoder, exactly as
             they would against a real Whisper checkpoint);
  gates    : task-level WER (generation) AND distribution-level logit-KL
             (teacher-forced, eval/kl.py) for every quantized serving mode.

Calibrated findings this pins (flagship-dims twin:
experiments/int8_outlier_probe.py):
  - naive W8A8 encoder COLLAPSES here (measured WER 0.64 vs base 0.09;
    KL 0.48) — exactly why it was never made default;
  - SmoothQuant-calibrated W8A8 (the round-4 production path and bench
    default) stays within a few word-errors and KL < 0.05;
  - W8A16 decoder holds under llama outlier injection (KL ~0.03);
  - W4A16 (int4-RTN) degrades measurably under outliers at toy dims
    (KL ~0.66 vs 0.14 clean) — the honest reason int4 decode remains
    OPT-IN until real-weight WER can run (egress).

Training with llama-side outliers is excluded by design: post-hoc
injection into a RANDOM llama breaks the LM substrate itself (measured:
loss plateaus at 3.3, WER 1.0 — real models function with outliers only
because training co-adapted around them), so decoder modes gate on KL
with injected llama trees instead.
"""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_corpus(tmp_path_factory):
    from audio_llama_tpu.data import synth_speech as ss

    root = str(tmp_path_factory.mktemp("synthgate"))
    data_path, audio_dir, entries = ss.build_corpus(
        root, n_utts=96, vocab_size=12, seed=0, fmt="flac"
    )
    return data_path, audio_dir, entries


@pytest.fixture(scope="module")
def trained_outlier_run(synth_corpus, tmp_path_factory):
    """Train ONCE against outlier-injected frozen whisper (650 steps, real
    trainer CLI); every gate below scores this checkpoint."""
    from audio_llama_tpu.training.train import parse_args, train

    data_path, audio_dir, _ = synth_corpus
    out = str(tmp_path_factory.mktemp("outlier_train") / "run")
    args = parse_args([
        "--data_path", data_path,
        "--audio_dir", audio_dir,
        "--output_dir", out,
        "--toy_model", "--tokenizer", "byte",
        "--toy_outliers", "20",
        "--batch_size", "8", "--eval_batch_size", "8",
        "--grad_accum_steps", "1",
        "--num_epochs", "80", "--max_steps", "650",
        "--learning_rate", "3e-3", "--warmup_steps", "10",
        "--val_split", "0.125",
        "--eval_steps", "0", "--save_steps", "0", "--log_steps", "100",
        "--num_workers", "2", "--no_tensorboard",
        "--compute_dtype", "float32",
        "--seed", "3",
    ])
    result = train(args)
    assert result["steps"] >= 650
    return result


@pytest.fixture(scope="module")
def loaded(trained_outlier_run):
    from audio_llama_tpu.inference.cli import load_audio_llm

    return load_audio_llm(
        trained_outlier_run["final_checkpoint"], toy_model=True, seed=3
    )


@pytest.fixture(scope="module")
def calib_mel(loaded, synth_corpus):
    from audio_llama_tpu.eval.wer import calib_mel_batch

    cfg, _, _, _ = loaded
    _, audio_dir, entries = synth_corpus
    return calib_mel_batch(cfg, entries, audio_dir, n=8)


@pytest.mark.slow
def test_wer_gate_smoothed_int8_encoder(loaded, synth_corpus, calib_mel):
    """WER on outlier weights: smoothed W8A8 stays within a modest delta
    of bf16; NAIVE W8A8 collapses (the mechanism the round-4 flip rests
    on, pinned at task level)."""
    import jax.numpy as jnp

    from audio_llama_tpu.eval.wer import evaluate_wer
    from audio_llama_tpu.models import whisper_int8 as w8

    cfg, frozen, trainable, tk = loaded
    _, audio_dir, entries = synth_corpus
    ev = entries[:32]
    score = lambda fz, **kw: evaluate_wer(
        cfg, fz, trainable, tk, ev, audio_dir,
        batch_size=8, max_new_tokens=12, **kw,
    )

    base = score(frozen)
    assert base["wer"] < 0.2, base

    fz_s = dict(frozen)
    fz_s["whisper"] = w8.quantize_encoder_smoothed(
        frozen["whisper"], cfg.whisper, calib_mel,
        compute_dtype=jnp.float32,
    )
    smooth = score(fz_s)
    # calibrated margin: measured base 0.094 / smoothed 0.219 / naive 0.641
    assert smooth["wer"] <= base["wer"] + 0.16, (smooth, base)

    fz_n = dict(frozen)
    fz_n["whisper"] = w8.quantize_encoder(frozen["whisper"])
    naive = score(fz_n)
    assert naive["wer"] >= smooth["wer"] + 0.15, (
        "naive W8A8 no longer collapses under outliers — if quantization "
        "got genuinely better, re-run experiments/int8_outlier_probe.py "
        "and re-evaluate making it the default", naive, smooth,
    )

    # composed smoothed serving stack: + int8 decoder + int8 KV
    import jax

    from audio_llama_tpu.models import llama_int8 as l8

    fz_all = dict(fz_s)
    fz_all["llama"] = jax.jit(l8.quantize_llama)(frozen["llama"])
    all8 = score(fz_all, kv_quant=True)
    assert all8["wer"] <= base["wer"] + 0.2, (all8, base)


@pytest.mark.slow
def test_kl_gates_quantized_modes(loaded, synth_corpus, calib_mel):
    """Distribution-level gates (teacher-forced logit KL vs bf16) for each
    quantized mode, including the llama-outlier regime no trained WER run
    can reach (see module docstring). Thresholds ~3x the calibrated
    measurements."""
    import jax
    import jax.numpy as jnp

    from audio_llama_tpu.data.dataset import DatasetConfig
    from audio_llama_tpu.data.loader import create_dataloaders
    from audio_llama_tpu.eval.kl import batch_logit_kl
    from audio_llama_tpu.models import allm, outliers
    from audio_llama_tpu.models import llama_int4 as l4
    from audio_llama_tpu.models import llama_int8 as l8
    from audio_llama_tpu.models import whisper_int8 as w8

    cfg, frozen, trainable, tk = loaded
    data_path, audio_dir, _ = synth_corpus
    dl, _, _ = create_dataloaders(
        data_path, audio_dir, tk, batch_size=8, val_split=0.125,
        num_workers=0,
        dataset_config=DatasetConfig(
            max_audio_seconds=cfg.mel.max_audio_seconds, text_max_length=32
        ),
    )
    hb = next(iter(dl))
    batch = allm.AudioLLMBatch(
        input_ids=jnp.asarray(hb["input_ids"]),
        attention_mask=jnp.asarray(hb["attention_mask"]),
        audio_features=jnp.asarray(hb["audio"]),
        labels=jnp.asarray(hb["labels"]),
    )
    a_s = tk.token_to_id(cfg.audio_start_token)
    a_e = tk.token_to_id(cfg.audio_end_token)
    kl = lambda ref, fz: batch_logit_kl(
        cfg, ref, fz, trainable, batch, a_s, a_e
    )

    # encoder: smoothed passes, naive fails by an order of magnitude
    # (calibrated: 0.0045 vs 0.48)
    fz = dict(frozen)
    fz["whisper"] = w8.quantize_encoder_smoothed(
        frozen["whisper"], cfg.whisper, calib_mel,
        compute_dtype=jnp.float32,
    )
    kl_smooth = kl(frozen, fz)
    assert kl_smooth["kl_mean"] < 0.05, kl_smooth
    fz = dict(frozen)
    fz["whisper"] = w8.quantize_encoder(frozen["whisper"])
    kl_naive = kl(frozen, fz)
    assert kl_naive["kl_mean"] > 5 * kl_smooth["kl_mean"], (
        kl_naive, kl_smooth,
    )

    # decoder modes under OUTLIER-INJECTED llama (KL-only regime)
    lo = outliers.inject_llama_outliers(
        frozen["llama"], jax.random.PRNGKey(11), scale=20.0
    )
    fz_ref = dict(frozen)
    fz_ref["llama"] = lo

    fz = dict(fz_ref)
    fz["llama"] = l8.quantize_llama(lo)
    kl_d8 = kl(fz_ref, fz)
    assert kl_d8["kl_mean"] < 0.1, kl_d8  # calibrated 0.034

    fz = dict(fz_ref)
    fz["llama"] = l4.quantize_llama_int4(lo, group=32)  # clip default ON
    kl_d4 = kl(fz_ref, fz)
    # calibrated (round-4 follow-up): plain RTN 0.657; clipped-RTN (the
    # default since the follow-up) 0.376; calibrated GPTQ 0.336. The
    # envelope still exceeds the ~0.2 default-flip bar (NEXT #6) — int4
    # decode stays opt-in; a repo change pushing the default past 0.8 is a
    # real regression, one pulling it under ~0.2 is the flip signal.
    assert kl_d4["kl_mean"] < 0.8, kl_d4
    assert kl_d4["kl_mean"] > kl_d8["kl_mean"], (kl_d4, kl_d8)

    # plain RTN (clip=False) is measurably WORSE — pins the clip default
    fz = dict(fz_ref)
    fz["llama"] = l4.quantize_llama_int4(lo, group=32, clip=False)
    kl_rtn = kl(fz_ref, fz)
    assert kl_rtn["kl_mean"] > 1.2 * kl_d4["kl_mean"], (kl_rtn, kl_d4)

    # calibrated GPTQ error feedback: the best int4 quantizer we have —
    # must beat plain RTN decisively and not lose to clipped-RTN
    from audio_llama_tpu.models import llama_gptq as gq
    from audio_llama_tpu.models import projector as proj_mod

    enc = allm.process_audio_features(
        fz_ref, cfg, batch.audio_features, jnp.float32
    )
    audio_embeds = proj_mod.project(trainable["projector"], enc, jnp.float32)
    combined, combined_mask = allm.combine_text_and_audio_embeddings(
        fz_ref, trainable, cfg, batch.input_ids, batch.attention_mask,
        audio_embeds, a_s, a_e, jnp.float32,
    )
    from audio_llama_tpu.models import llama as lm_mod

    _, _, stats = lm_mod.llama_forward(
        lo, cfg.llama, inputs_embeds=combined, attention_mask=combined_mask,
        compute_dtype=jnp.float32, attn_impl="xla",
        collect_quant_stats=("qkv", "o", "gateup", "down"),
    )
    fz = dict(fz_ref)
    fz["llama"] = gq.quantize_llama_int4_gptq(
        lo, stats, group=32, clip_cands=l4.CLIP_CANDS
    )
    kl_gptq = kl(fz_ref, fz)
    assert kl_gptq["kl_mean"] < 0.7 * kl_rtn["kl_mean"], (kl_gptq, kl_rtn)
    assert kl_gptq["kl_mean"] < 1.15 * kl_d4["kl_mean"], (kl_gptq, kl_d4)


@pytest.mark.slow
def test_outlier_frozen_reconstruction(trained_outlier_run, loaded):
    """The checkpoint records --toy_outliers; a fresh load reconstructs the
    SAME frozen tree (seed + injection are deterministic)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_llama_tpu.models import allm

    cfg, frozen, _, _ = loaded
    again = allm.init_frozen(
        cfg, jax.random.PRNGKey(3), dtype=jnp.bfloat16, outlier_scale=20.0
    )
    # embedding resize happens inside the loader; compare a raw layer leaf
    np.testing.assert_array_equal(
        np.asarray(frozen["whisper"]["layers"]["fc1"]["w"]),
        np.asarray(again["whisper"]["layers"]["fc1"]["w"]),
    )
