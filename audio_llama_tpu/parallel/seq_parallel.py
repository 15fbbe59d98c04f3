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


def make_sp_generate(cfg: AudioLLMConfig, mesh, **static_kw):
    """Timeline-sharded generation (docs/LONG_CONTEXT.md step 3): the KV
    cache — the decode memory ceiling for long contexts — is sharded over the
    'sp' axis, each shard holding max_len/sp slots of every timeline.

    Weights and activations stay replicated (decode is weight-stream-bound;
    sp buys MEMORY, not per-token FLOPs): every shard computes the same
    q/k/v, the shard owning the current slot appends the row, and per-layer
    attention assembles the exact global softmax from per-shard flash
    statistics with one pmax + one psum pair over 'sp'
    (ops.attention.sp_partial_attention). Composes with a 'dp' batch axis.

    Same calling convention as make_dp_generate: fn(frozen, trainable,
    input_ids, attention_mask, audio, key) -> GenerateResult, replicated
    (identical on every sp shard). Reference analog: none (reference decode
    is single-GPU HF generate, src/models/allm.py:326-331).
    """
    from jax.sharding import PartitionSpec as P

    from ..inference import generate as gen

    if "sp" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'sp' axis")
    extra = {
        k: v for k, v in mesh.shape.items()
        if k not in ("sp", "dp") and v != 1
    }
    if extra:
        raise ValueError(
            f"make_sp_generate shards over 'sp' (+ optional 'dp'); mesh has "
            f"extra non-trivial axes {extra}"
        )
    sp = mesh.shape["sp"]
    has_audio = static_kw.get("has_audio", True)
    batch_axis = "dp" if "dp" in mesh.axis_names else None
    bspec = P(batch_axis)
    kw = dict(static_kw, sp_axis="sp", sp_size=sp)

    if has_audio:
        def local(frozen, trainable, input_ids, attention_mask, audio, key):
            if batch_axis is not None:
                key = jax.random.fold_in(key, jax.lax.axis_index(batch_axis))
            return gen._generate_impl(
                frozen, trainable, cfg, input_ids, attention_mask, audio,
                key, **kw,
            )

        in_specs = (P(), P(), bspec, bspec, bspec, P())
    else:
        def local(frozen, trainable, input_ids, attention_mask, key):
            if batch_axis is not None:
                key = jax.random.fold_in(key, jax.lax.axis_index(batch_axis))
            return gen._generate_impl(
                frozen, trainable, cfg, input_ids, attention_mask, None,
                key, **kw,
            )

        in_specs = (P(), P(), bspec, bspec, P())

    inner = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=in_specs,
        out_specs=gen.GenerateResult(tokens=bspec, num_generated=bspec),
        check_vma=False,
    ))
    if has_audio:
        return inner

    def fn(frozen, trainable, input_ids, attention_mask, audio=None, key=None):
        del audio  # ignored in text-only mode
        return inner(frozen, trainable, input_ids, attention_mask, key)

    return fn
