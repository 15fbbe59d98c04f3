"""Evaluation harnesses (WER; the reference's eval was a dead stub, old/eval.py)."""
