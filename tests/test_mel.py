"""Golden parity: our log-mel frontend vs HF WhisperFeatureExtractor numerics."""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_llama_tpu.config import MelConfig
from audio_llama_tpu.ops import mel as mel_mod


def _rand_audio(seconds=30.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    # band-limited-ish signal: sum of tones + noise
    t = np.arange(n) / sr
    x = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 1337 * t)
        + 0.05 * rng.standard_normal(n)
    )
    return x.astype(np.float32)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_whisper_style_matches_hf_feature_extractor(n_mels):
    from transformers import WhisperFeatureExtractor

    cfg = MelConfig(num_mel_bins=n_mels, style="whisper")
    audio = _rand_audio()
    fe = WhisperFeatureExtractor(feature_size=n_mels)
    theirs = fe(
        audio, sampling_rate=16000, return_tensors="np", padding="max_length"
    ).input_features[0]
    ours = np.asarray(mel_mod.log_mel(jnp.asarray(audio[None, :]), cfg))[0]
    assert ours.shape == theirs.shape == (n_mels, 3000)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_whisper_style_short_audio_padded():
    from transformers import WhisperFeatureExtractor

    cfg = MelConfig(style="whisper")
    audio = _rand_audio(seconds=3.7, seed=1)
    padded = np.zeros(cfg.max_samples, np.float32)
    padded[: audio.shape[0]] = audio
    fe = WhisperFeatureExtractor(feature_size=128)
    theirs = fe(
        audio, sampling_rate=16000, return_tensors="np", padding="max_length"
    ).input_features[0]
    ours = np.asarray(mel_mod.log_mel(jnp.asarray(padded[None, :]), cfg))[0]
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_ref_style_shapes_and_numerics():
    """style='ref' reproduces the reference's training featurizer semantics:
    htk mel, no norm, power 2, log(x+1e-9), 128 mels, 3000 frames
    (reference src/dataset.py:125-140 — minus its 80-vs-128 pad bug)."""
    cfg = MelConfig(num_mel_bins=128, style="ref")
    audio = _rand_audio(seconds=30.0, seed=2)
    out = np.asarray(mel_mod.log_mel(jnp.asarray(audio[None, :]), cfg))[0]
    assert out.shape == (128, 3000)
    # silence floor: log(1e-9)
    silent = np.asarray(
        mel_mod.log_mel(jnp.zeros((1, cfg.max_samples), jnp.float32), cfg)
    )[0]
    np.testing.assert_allclose(silent, np.log(1e-9), rtol=1e-5)


def test_mel_filterbank_matches_librosa_values():
    """Spot-check slaney filterbank against values baked into HF's extractor."""
    from transformers.audio_utils import mel_filter_bank

    fb_hf = mel_filter_bank(
        num_frequency_bins=201,
        num_mel_filters=128,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    fb_ours = mel_mod.mel_filterbank(16000, 400, 128, fmax=8000.0)
    np.testing.assert_allclose(fb_ours, fb_hf.T, rtol=1e-5, atol=1e-7)
