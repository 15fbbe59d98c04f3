"""Functional model definitions: llama, whisper, projector, lora, composite allm."""
