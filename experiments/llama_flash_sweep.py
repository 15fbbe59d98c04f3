"""Stock-flash block-size sweep at llama training geometry (fwd+bwd) —
the cheap fraction of the train-MFU lever (NEXT.md item 1).

    nohup python -u experiments/llama_flash_sweep.py > /tmp/llama_sweep.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments.enc_kernel_bench import timed_loop, report


def main():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention as _flash,
    )

    Hq, Hkv, hd, T, B = 24, 8, 128, 2560, 2
    G = Hq // Hkv
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Hq, T, hd), jnp.bfloat16) * 0.05
    k = jax.random.normal(key, (B, Hkv, T, hd), jnp.bfloat16) * 0.05
    v = jax.random.normal(key, (B, Hkv, T, hd), jnp.bfloat16) * 0.05
    k = jnp.repeat(k, G, axis=1)
    v = jnp.repeat(v, G, axis=1)
    fwd_flops = 2 * 2 * B * Hq * T * T * hd // 2
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    def mk(bq, bk):
        bs = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk,
            block_k_dkv=bk, block_q_dkv=bq,
            block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
        )

        def loss_fn(q, k, v):
            o = _flash(q, k, v, causal=True, sm_scale=hd ** -0.5, block_sizes=bs)
            return jnp.sum(o.astype(jnp.float32)) * 1e-6

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))

        def gstep(a):
            q, k, v = a
            val, (dq, dk, dv) = grad_fn(q, k, v)
            gsum = (jnp.mean(dq.astype(jnp.float32))
                    + jnp.mean(dk.astype(jnp.float32))
                    + jnp.mean(dv.astype(jnp.float32)))
            bump = ((val + gsum) * 1e-3).astype(jnp.bfloat16)
            return val + gsum, (q + bump, k + bump, v + bump)

        return gstep

    for bq, bk in [(256, 256), (1024, 512), (512, 1024), (256, 1024), (1024, 1024)]:
        try:
            sec = timed_loop(mk(bq, bk), (q, k, v), 12)
            report(f"llama_fwdbwd_q{bq}_k{bk}", sec, flops=int(fwd_flops * 3.5))
        except Exception as e:
            print(json.dumps({"exp": f"q{bq}_k{bk}", "error": str(e)[:200]}), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
