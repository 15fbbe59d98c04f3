"""Golden parity: our JAX Whisper encoder vs HF torch WhisperModel.encoder."""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_llama_tpu.config import WhisperConfig
from audio_llama_tpu.models import whisper
from audio_llama_tpu.models.hf_loader import whisper_encoder_params_from_state_dict

from hf_ref import tiny_hf_whisper, state_dict_numpy


@pytest.fixture(scope="module")
def setup():
    cfg = WhisperConfig.tiny()
    hf = tiny_hf_whisper(cfg)
    params = whisper_encoder_params_from_state_dict(
        state_dict_numpy(hf), cfg, dtype="float32"
    )
    return cfg, hf, params


def test_encoder_parity(setup):
    import torch

    cfg, hf, params = setup
    rng = np.random.default_rng(0)
    # 2 * max_source_positions mel frames (conv stride-2 halves it).
    T_mel = 2 * cfg.max_source_positions
    mel = rng.normal(size=(2, cfg.num_mel_bins, T_mel)).astype(np.float32)
    ours = whisper.encode(params, cfg, jnp.asarray(mel), compute_dtype=jnp.float32)
    with torch.no_grad():
        theirs = hf.encoder(torch.tensor(mel)).last_hidden_state.numpy()
    assert ours.shape == theirs.shape == (2, cfg.max_source_positions, cfg.d_model)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=3e-4, atol=3e-4)


def test_sinusoid_table_matches_hf_init(setup):
    cfg, hf, _ = setup
    table = whisper.sinusoid_position_embedding(cfg.max_source_positions, cfg.d_model)
    hf_table = hf.encoder.embed_positions.weight.detach().numpy()
    np.testing.assert_allclose(table, hf_table, rtol=1e-5, atol=1e-5)


def test_encoder_bf16_close_to_f32(setup):
    cfg, _, params = setup
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(1, cfg.num_mel_bins, 2 * cfg.max_source_positions)).astype(
        np.float32
    )
    f32 = whisper.encode(params, cfg, jnp.asarray(mel), compute_dtype=jnp.float32)
    bf16 = whisper.encode(params, cfg, jnp.asarray(mel), compute_dtype=jnp.bfloat16)
    # bf16 compute should track f32 within ~1e-2 on a 2-layer toy encoder.
    err = np.abs(np.asarray(bf16, np.float32) - np.asarray(f32)).max()
    assert err < 5e-2, err
