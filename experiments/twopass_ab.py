"""Within-session A/B: causal kernel softmax_mode 'online' (production)
vs 'twopass' (global-max first k-pass, no rescale chain; see
ops/causal_attention.py) at llama train geometry. fwd and fwd+bwd
(the backward is shared — fwd+bwd isolates the forward delta in the
3-kernel aggregate), B2 and B8.

    nohup python -u experiments/twopass_ab.py > /tmp/twopass_ab.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from experiments.enc_kernel_bench import timed_loop, report  # noqa: E402
from audio_llama_tpu.ops.causal_attention import causal_mha  # noqa: E402


def main():
    Hq, Hkv, hd, T = 24, 8, 128, 2560
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    for B in (2, 8):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, T, Hq, hd), jnp.bfloat16) * 0.05
        k = jax.random.normal(key, (B, T, Hkv, hd), jnp.bfloat16) * 0.05
        v = jax.random.normal(key, (B, T, Hkv, hd), jnp.bfloat16) * 0.05
        mask = jnp.ones((B, T), jnp.int32)
        fwd_flops = 2 * 2 * B * Hq * T * T * hd // 2
        tot_flops = fwd_flops * 3.5  # fwd + dq + dkv (standard flash tally)

        res = {}
        for mode in ("online", "twopass"):
            def fstep(a, mode=mode):
                q, k, v = a
                o = causal_mha(q, k, v, mask=mask, softmax_mode=mode)
                bump = (jnp.mean(o.astype(jnp.float32)) * 1e-6).astype(
                    jnp.bfloat16)
                return bump.astype(jnp.float32), (q + bump, k + bump, v + bump)

            sec = timed_loop(fstep, (q, k, v), 20)
            report(f"causal_fwd_B{B}_{mode}", sec, flops=fwd_flops)
            res[("fwd", mode)] = sec

            def loss_fn(q, k, v, mode=mode):
                o = causal_mha(q, k, v, mask=mask, softmax_mode=mode)
                return jnp.sum(o.astype(jnp.float32)) * 1e-6

            grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))

            def gstep(a, grad_fn=grad_fn):
                q, k, v = a
                val, (dq, dk, dv) = grad_fn(q, k, v)
                gsum = (jnp.mean(dq.astype(jnp.float32))
                        + jnp.mean(dk.astype(jnp.float32))
                        + jnp.mean(dv.astype(jnp.float32)))
                bump = ((val + gsum) * 1e-3).astype(jnp.bfloat16)
                return val + gsum, (q + bump, k + bump, v + bump)

            sec = timed_loop(gstep, (q, k, v), 20)
            report(f"causal_fwdbwd_B{B}_{mode}", sec, flops=tot_flops)
            res[("fwdbwd", mode)] = sec

        for what in ("fwd", "fwdbwd"):
            print(json.dumps({
                "B": B, "what": what,
                "twopass_speedup_pct": round(
                    (res[(what, "online")] / res[(what, "twopass")] - 1)
                    * 100, 1),
            }), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
