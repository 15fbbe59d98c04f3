"""Measure the llama training-path flash attention (causal, GQA, hd=128)
at the multimodal sequence length — fwd and fwd+bwd, B2 vs B8 — to test
the NEXT.md hypothesis that it owns the train-step MFU gap.

    nohup python -u experiments/llama_attn_bench.py > /tmp/llama_attn.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments.enc_kernel_bench import timed_loop, report


def main():
    Hq, Hkv, hd = 24, 8, 128
    T = 2560  # 2526-token multimodal rounded to the flash tile
    print(json.dumps({"backend": jax.default_backend(),
                      "dims": dict(Hq=Hq, Hkv=Hkv, hd=hd, T=T)}), flush=True)

    from audio_llama_tpu.ops.flash_attention import flash_mha

    for B in (2, 8):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, T, Hq, hd), jnp.bfloat16) * 0.05
        k = jax.random.normal(key, (B, T, Hkv, hd), jnp.bfloat16) * 0.05
        v = jax.random.normal(key, (B, T, Hkv, hd), jnp.bfloat16) * 0.05
        mask = jnp.ones((B, T), jnp.int32)
        # causal: ~half the score matrix is live
        fwd_flops = 2 * 2 * B * Hq * T * T * hd // 2

        def fstep(a):
            q, k, v = a
            o = flash_mha(q, k, v, mask=mask, causal=True, scale=hd ** -0.5)
            bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(jnp.bfloat16)
            return bump.astype(jnp.float32), (q + bump, k + bump, v + bump)

        sec = timed_loop(fstep, (q, k, v), 20)
        report(f"llama_flash_fwd_B{B}", sec, flops=fwd_flops)

        def loss_fn(q, k, v):
            o = flash_mha(q, k, v, mask=mask, causal=True, scale=hd ** -0.5)
            return jnp.sum(o.astype(jnp.float32)) * 1e-6

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))

        # keep the grads live via a cheap reduction
        def gstep2(a):
            q, k, v = a
            val, (dq, dk, dv) = grad_fn(q, k, v)
            gsum = (
                jnp.mean(dq.astype(jnp.float32))
                + jnp.mean(dk.astype(jnp.float32))
                + jnp.mean(dv.astype(jnp.float32))
            )
            bump = ((val + gsum) * 1e-3).astype(jnp.bfloat16)
            return val + gsum, (q + bump, k + bump, v + bump)

        sec = timed_loop(gstep2, (q, k, v), 12)
        report(f"llama_flash_fwdbwd_B{B}", sec, flops=int(fwd_flops * 3.5),
               note="flops ~ 3.5x fwd (bwd recomputes + dq/dkv)")

    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
