"""Numerics: rope, norms, attention, mel frontend, sampling, Pallas kernels."""
