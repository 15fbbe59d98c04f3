"""Inference: checkpoint load, KV-cached generation, CLIs."""
