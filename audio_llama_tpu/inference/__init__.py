"""Inference: checkpoint load, KV-cached generation, CLIs.

Entry points:
  generate                  jitted single-host generation (prefill + decode)
  make_dp_generate          batch-sharded generation over a mesh 'dp' axis
  make_tp_generate          Megatron tensor-parallel generation over 'tp'
  cli.load_audio_llm        checkpoint -> (cfg, frozen, trainable, tokenizer)
  cli.generate_response     prompt/audio -> text
"""

from .generate import GenerateResult, generate, make_dp_generate, make_tp_generate

__all__ = [
    "GenerateResult",
    "generate",
    "make_dp_generate",
    "make_tp_generate",
]
