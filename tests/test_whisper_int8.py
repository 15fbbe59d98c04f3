"""W8A8 int8 encoder: output stays close to the bf16/f32 encoder."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_llama_tpu.config import WhisperConfig
from audio_llama_tpu.models import whisper as wm
from audio_llama_tpu.models import whisper_int8 as w8


def test_int8_encoder_close_to_f32():
    cfg = WhisperConfig.tiny()
    params = wm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.num_mel_bins, 128)) * 0.5
    ref = np.asarray(wm.encode(params, cfg, mel, jnp.float32, attn_impl="xla"))
    qp = w8.quantize_encoder(params)
    out = np.asarray(w8.encode_int8(qp, cfg, mel, jnp.float32, attn_impl="xla"))
    rel = np.abs(out - ref) / (np.abs(ref).mean() + 1e-6)
    # W8A8 with per-channel weights + per-row activations: small relative error
    assert rel.mean() < 0.03, rel.mean()
    assert rel.max() < 0.5, rel.max()


def test_quantize_encoder_structure():
    cfg = WhisperConfig.tiny()
    params = wm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qp = w8.quantize_encoder(params)
    for name in w8._QUANT_TARGETS:
        assert qp["layers"][name]["w_q"].dtype == jnp.int8
        assert "w" not in qp["layers"][name]
    # untouched parts intact
    assert qp["conv1"]["w"].dtype == params["conv1"]["w"].dtype


def test_smoothed_quantization_close_on_clean_weights():
    """Smoothing must cost nothing on easy Gaussian weights (probe row
    scale=0: naive 0.0297 vs smoothed 0.0273 at flagship dims)."""
    cfg = WhisperConfig.tiny()
    params = wm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.num_mel_bins, 128)) * 0.5
    ref = np.asarray(wm.encode(params, cfg, mel, jnp.float32, attn_impl="xla"))
    qp = w8.quantize_encoder_smoothed(params, cfg, mel, compute_dtype=jnp.float32)
    out = np.asarray(w8.encode_int8(qp, cfg, mel, jnp.float32, attn_impl="xla"))
    rel = np.abs(out - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel.mean() < 0.03, rel.mean()
    # production fold: only fc2 (behind the GELU nonlinearity) keeps a
    # runtime smoother; the other five folded into LN scales / v columns
    for name in w8._QUANT_TARGETS:
        assert ("a_s" in qp["layers"][name]) == (name == "fc2"), name
    # unfolded parity twin: every linear carries its runtime smoother
    stats = w8.calibrate_encoder(params, cfg, mel, jnp.float32)
    qp_nf = w8.quantize_encoder(params, stats, fold=False)
    for name in w8._QUANT_TARGETS:
        assert "a_s" in qp_nf["layers"][name]
    out_nf = np.asarray(
        w8.encode_int8(qp_nf, cfg, mel, jnp.float32, attn_impl="xla")
    )
    rel_nf = np.abs(out_nf - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel_nf.mean() < 0.03, rel_nf.mean()


def test_smoothing_rescues_outlier_regime():
    """The round-4 finding, pinned at toy dims: with outlier-channel
    weights (models/outliers.py), naive W8A8 degrades hard and SmoothQuant
    smoothing restores accuracy (flagship-dims numbers:
    experiments/int8_outlier_probe.py — naive 12.3% vs smoothed 2.1%
    at outlier scale 20)."""
    from audio_llama_tpu.models import outliers

    cfg = WhisperConfig.tiny()
    params = wm.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    params = outliers.inject_whisper_outliers(
        params, jax.random.PRNGKey(7), scale=30.0
    )
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.num_mel_bins, 128)) * 0.5
    ref = np.asarray(wm.encode(params, cfg, mel, jnp.float32, attn_impl="xla"))

    def err(qp):
        out = np.asarray(
            w8.encode_int8(qp, cfg, mel, jnp.float32, attn_impl="xla")
        )
        return float((np.abs(out - ref) / (np.abs(ref).mean() + 1e-6)).mean())

    naive = err(w8.quantize_encoder(params))
    smooth = err(w8.quantize_encoder_smoothed(
        params, cfg, mel, compute_dtype=jnp.float32))
    assert smooth < naive * 0.7, (naive, smooth)
    assert smooth < 0.05, smooth


def test_quantized_encoder_through_model_path():
    """allm.process_audio_features auto-dispatches on quantized params; the
    AudioLLM facade exposes it as .quantize_encoder()."""
    from audio_llama_tpu.config import AudioLLMConfig
    from audio_llama_tpu.data.tokenizer import ByteTokenizer
    from audio_llama_tpu.models import allm
    from audio_llama_tpu.models.api import AudioLLM

    cfg = AudioLLMConfig.tiny()
    tk = ByteTokenizer()
    cfg = cfg.replace(llama=cfg.llama.replace(vocab_size=max(tk.vocab_size, 384)))
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    model = AudioLLM(
        cfg, allm.init_frozen(cfg, kf, dtype=jnp.float32),
        allm.init_trainable(cfg, kt), tk,
    )
    rng = np.random.RandomState(0)
    batch = allm.AudioLLMBatch(
        input_ids=jnp.asarray(rng.randint(3, 250, (1, 8)), jnp.int32),
        attention_mask=jnp.ones((1, 8), jnp.int32),
        audio_features=jnp.asarray(rng.randn(1, cfg.mel.max_samples), jnp.float32) * 0.1,
        labels=jnp.asarray(rng.randint(3, 250, (1, 8)), jnp.int32),
    )
    loss_ref, _ = model(batch, compute_dtype=jnp.float32)
    q = model.quantize_encoder()
    loss_q, _ = q(batch, compute_dtype=jnp.float32)
    assert abs(float(loss_q) - float(loss_ref)) < 0.1
