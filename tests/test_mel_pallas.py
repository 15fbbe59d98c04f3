"""Pallas log-mel kernel parity vs the XLA reference featurizer (interpret
mode on CPU; the compiled kernel runs on real TPU via bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import MelConfig
from audio_llama_tpu.ops import mel as mel_ref
from audio_llama_tpu.ops import mel_pallas


@pytest.mark.parametrize("style", ["whisper", "ref"])
@pytest.mark.parametrize("n_mels", [80, 128])
def test_kernel_matches_xla(style, n_mels):
    cfg = MelConfig(num_mel_bins=n_mels, style=style)  # 30 s, 3000 frames
    assert mel_pallas.uses_pallas(cfg)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(2, cfg.max_samples).astype(np.float32) * 0.3)

    ref = np.asarray(mel_ref.log_mel(audio, cfg))
    out = np.asarray(mel_pallas.log_mel(audio, cfg, interpret=True))
    assert out.shape == ref.shape == (2, n_mels, cfg.num_frames)
    # DFT-by-matmul vs rFFT, both f32: tight but not bitwise.
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_kernel_handles_quiet_and_silent_audio():
    cfg = MelConfig()
    audio = jnp.zeros((1, cfg.max_samples), jnp.float32)
    out = np.asarray(mel_pallas.log_mel(audio, cfg, interpret=True))
    assert np.all(np.isfinite(out))


def test_fallback_for_unsupported_config():
    cfg = MelConfig(num_mel_bins=80, max_audio_seconds=1.28)  # 128 frames
    assert not mel_pallas.uses_pallas(cfg)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(1, cfg.max_samples).astype(np.float32))
    out = np.asarray(mel_pallas.log_mel(audio, cfg))
    ref = np.asarray(mel_ref.log_mel(audio, cfg))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_single_waveform_rank():
    cfg = MelConfig()
    rng = np.random.RandomState(1)
    audio = jnp.asarray(rng.randn(cfg.max_samples).astype(np.float32))
    out = mel_pallas.log_mel(audio, cfg, interpret=True)
    assert out.shape == (cfg.num_mel_bins, cfg.num_frames)
