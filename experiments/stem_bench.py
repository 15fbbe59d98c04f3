"""Attribute the encoder's fixed (non-layer) time: conv stem via XLA conv
vs a shifted-matmul formulation (the mel kernel's framing trick), plus the
mel+projector overheads.

    nohup python -u experiments/stem_bench.py > /tmp/stem_bench.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audio_llama_tpu.config import WhisperConfig
from audio_llama_tpu.models import whisper as wm
from experiments.enc_kernel_bench import timed_loop, report


def main():
    cfg = WhisperConfig.large_v3_turbo()
    B, D, M = 8, cfg.d_model, cfg.num_mel_bins
    T = 3000
    key = jax.random.PRNGKey(0)
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    k1, k2 = jax.random.split(key)
    w1 = jax.random.normal(k1, (D, M, 3), jnp.bfloat16) * 0.05
    b1 = jnp.zeros((D,), jnp.bfloat16)
    w2 = jax.random.normal(k2, (D, D, 3), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((D,), jnp.bfloat16)
    mel = jax.random.normal(key, (B, M, T), jnp.bfloat16) * 0.1

    stem_flops = 2 * B * T * M * D * 3 + 2 * B * (T // 2) * D * D * 3

    def stem_xla(a):
        x, = a
        h = jax.nn.gelu(wm._conv1d(x, w1, b1, 1), approximate=True)
        h = jax.nn.gelu(wm._conv1d(h, w2, b2, 2), approximate=True)
        bump = (jnp.mean(h.astype(jnp.float32)) * 1e-6).astype(x.dtype)
        return bump.astype(jnp.float32), (x + bump,)

    sec = timed_loop(stem_xla, (mel,), 30)
    report("stem_xla_conv", sec, flops=stem_flops)

    def stem_matmul(a):
        x, = a
        xt = jnp.swapaxes(x, 1, 2)  # [B, T, M]
        x3 = jnp.concatenate(
            [
                jnp.pad(xt, ((0, 0), (1, 0), (0, 0)))[:, :T],
                xt,
                jnp.pad(xt, ((0, 0), (0, 1), (0, 0)))[:, 1:],
            ],
            axis=-1,
        )  # [B, T, 3M]
        W1 = jnp.transpose(w1, (2, 1, 0)).reshape(3 * M, D)
        h = jax.nn.gelu(x3 @ W1 + b1, approximate=True)  # [B, T, D]
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))  # [B, T+2, D]
        h3 = jnp.concatenate(
            [hp[:, 0:T:2], hp[:, 1 : T + 1 : 2], hp[:, 2 : T + 2 : 2]], axis=-1
        )  # [B, T//2, 3D]
        W2 = jnp.transpose(w2, (2, 1, 0)).reshape(3 * D, D)
        h = jax.nn.gelu(h3 @ W2 + b2, approximate=True)  # [B, T//2, D]
        bump = (jnp.mean(h.astype(jnp.float32)) * 1e-6).astype(x.dtype)
        return bump.astype(jnp.float32), (x + bump,)

    sec = timed_loop(stem_matmul, (mel,), 30)
    report("stem_shifted_matmul", sec, flops=stem_flops)

    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
