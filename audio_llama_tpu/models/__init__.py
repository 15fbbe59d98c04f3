"""Functional model definitions: llama, whisper, projector, lora, composite allm.

The object-style facade (`AudioLLM`) lives in models.api; everything else is
pure functions over parameter pytrees.
"""

from .api import AudioLLM

__all__ = ["AudioLLM"]
