"""audio_llama_tpu — a TPU-native (JAX/XLA/Pallas/pjit) audio-LLM framework.

A from-scratch rebuild of the capabilities of cdreetz/audio-llama
(reference: /root/reference, see SURVEY.md):

  audio -> log-mel (Pallas kernel / jnp fallback)
        -> frozen Whisper encoder (JAX, HF-weight-loadable)
        -> trainable MLP projector into Llama embedding space
        -> spliced between <audio>/</audio> special tokens
        -> frozen Llama-3.2 decoder with trainable LoRA adapters.

Only {projector, LoRA} train. The training loop is bf16-on-TPU (no GradScaler
needed), AdamW + cosine warmup, grad accumulation + clipping, eval loss/ppl,
trainable-only checkpoints, and data-parallel/tensor-parallel sharding over a
`jax.sharding.Mesh`.

Top-level subpackages:
  models/    functional model definitions (llama, whisper, projector, lora, allm)
  ops/       numerics: rope, attention, mel frontend, sampling, pallas kernels
  data/      dataset, audio IO (incl. native FLAC decoder), loaders, corpus builder
  training/  train driver, optimizer, checkpointing, metrics
  inference/ checkpoint load, KV-cached generation, CLIs
  parallel/  mesh + sharding rules (dp/fsdp/tp axes)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level conveniences: audio_llama_tpu.AudioLLM, .AudioLLMConfig
    # (lazy so `import audio_llama_tpu` stays dependency-light).
    if name == "AudioLLM":
        from .models.api import AudioLLM

        return AudioLLM
    if name in (
        "AudioLLMConfig", "LlamaConfig", "WhisperConfig", "MelConfig",
        "LoraConfig",
    ):
        from . import config

        return getattr(config, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
