"""Inference: checkpoint load, KV-cached generation, CLIs.

Entry points:
  generate.generate         jitted single-host generation (prefill + decode)
  make_dp_generate          batch-sharded generation over a mesh 'dp' axis
  make_tp_generate          Megatron tensor-parallel generation over 'tp'
  speculative.generate_speculative   lossless greedy draft-and-verify (B=1)
  cli.load_audio_llm        checkpoint -> (cfg, frozen, trainable, tokenizer)
  cli.generate_response     prompt/audio -> text

NOTE: the jitted `generate` function is NOT re-exported at package level —
that name must keep referring to the `inference.generate` SUBMODULE
(`from audio_llama_tpu.inference import generate as gen; gen.generate(...)`
is the established import pattern; a function re-export would shadow it).
"""

from .generate import GenerateResult, make_dp_generate, make_tp_generate

__all__ = [
    "GenerateResult",
    "make_dp_generate",
    "make_tp_generate",
]
