"""Sequence parallelism, step 1: encoder-window SP (docs/LONG_CONTEXT.md).

Long audio is encoded as N independent 30 s Whisper windows (chunked
encoding, models/allm.py:process_audio_features). Those windows never attend
to each other, so sharding the WINDOW axis over an `sp` mesh axis is
communication-free until the decoder needs the concatenated frames — one
all-gather of [N/sp, 1500, D] blocks over ICI, inserted by GSPMD when the
consumer (projector -> splice) reads the output.

This is the same shard_map pattern as inference.generate.make_dp_generate:
each shard runs the full single-chip mel+encoder program (Pallas kernels
included — shapes stay per-device local), just over its slice of windows
instead of its slice of the batch. Combine with a 'dp' axis to shard batch
and windows at once.

Reference analog: none (reference is single-GPU, 30 s max). This unlocks the
BASELINE.json stretch config (30-min chunked audio) once one chip's HBM or
latency budget can't hold N windows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import AudioLLMConfig
from ..models import allm


def make_sp_encode(
    cfg: AudioLLMConfig,
    mesh,
    compute_dtype=jnp.bfloat16,
    enc_attn_impl: str = "auto",
    mel_impl: str = "auto",
):
    """Returns fn(frozen, audio [B, N*S]) -> encoder frames [B, N*A, d].

    The mesh must have an 'sp' axis; its size must divide the window count
    N. If a 'dp' axis exists it shards the batch too. Weights are
    replicated (the whisper encoder is ~600M bf16 at flagship dims — cheap
    next to sharding activations for 30-min clips).

    Output equals allm.process_audio_features(frozen, cfg, audio) exactly:
    windows are data-independent, so the split is invisible
    (tests/test_seq_parallel.py asserts bit-level shape + numerics parity).
    """
    if "sp" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'sp' axis")
    sp = mesh.shape["sp"]
    S = cfg.mel.max_samples
    batch_axis = "dp" if "dp" in mesh.axis_names else None

    def local(frozen, audio):
        # audio arrives [B/dp, (N/sp)*S] — whole windows per shard; the
        # standard chunked-encode path handles the local fold.
        return allm.process_audio_features(
            frozen, cfg, audio, compute_dtype,
            enc_attn_impl=enc_attn_impl, mel_impl=mel_impl,
        )

    smapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(batch_axis, "sp")),
        out_specs=P(batch_axis, "sp", None),
        check_vma=False,
    )

    def fn(frozen, audio):
        B, total = audio.shape
        if total % S:
            raise ValueError(
                f"audio length {total} must be whole {S}-sample windows"
            )
        n_windows = total // S
        if n_windows % sp:
            raise ValueError(
                f"sp={sp} must divide the window count {n_windows}"
            )
        return smapped(frozen, audio)

    return fn
